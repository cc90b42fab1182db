#!/usr/bin/env python3
"""Quality gate: train the REFERENCE implementation and this framework on
identical activations with identical configs, compare recon MSE and L0.

This is BASELINE.json's quality clause made executable offline, at the
blueprint's actual scale (reference configs/tiny_test.yaml: 500 clips x
1500 tokens = 750k activations, 3 epochs, batch 64, k=32, 8x expansion,
encoder layer 0): the reference's own models (imported at runtime from
/root/reference — used as an oracle, not copied) train on activations
extracted by this framework's pipeline; our trainers run the same config
on the same data from the same initial parameters.

Families (--family):
  sae         reference TopKSAE + its own SAETrainer (training.py:161-217)
  relu-sae    reference ReLUSAE (model.py:260-322) + its own SAETrainer
  transcoder  reference TopKTranscoder (transcoder.py:139-175) under the
              same training contract our trainer applies (AdamW +
              global-norm clip + post-step decoder renorm) — the
              reference ships no trainer for it
  crosscoder  reference TopKCrossLayerCrosscoder (crosscoder.py:287-379),
              same contract
  relu-crosscoder  reference CrossLayerCrosscoder (crosscoder.py:38-284,
              decoder-norm-weighted L1), same contract

Both sides start from IDENTICAL parameters and consume IDENTICAL
per-epoch batch orders (the ``np.random.default_rng(0)`` permutation
stream: a numpy-driven torch Sampler on the oracle side, replayed via
``train_epoch_fused(perm=...)`` on ours), so the residual mse_ratio
measures numerics, not batch-order noise.

Modes (--modes, comma list) run OUR side repeatedly against ONE oracle
run, isolating where any AMP quality delta comes from:
  f32          composed XLA forward, f32 throughout
  amp          bf16 AMP with the fused Pallas training forward (the
               production configuration)
  amp-nofused  bf16 AMP with the fused kernels disabled
               (WST_DISABLE_FUSED_CODER=1) — composed XLA bf16; if this
               matches `amp`, the delta is bf16 numerics, not the kernel

    python tools/quality_gate.py --family sae --modes f32,amp --out quality_gate_sae.json
    python tools/quality_gate.py --family transcoder --tokens 750000

Prints one JSON line:
    {"family": ..., "config": {...}, "reference": {"mse": ..., "l0": ...},
     "modes": {"f32": {"mse": ..., "l0": ..., "mse_ratio": ..., "pass": true}, ...},
     "pass": true}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "src"))
REFERENCE = Path("/root/reference/src")

EVAL_CHUNK = 65_536  # rows per eval forward (the dense [B, H] latent at
# 750k rows would be ~9 GB — chunk on both frameworks)


def log(msg: str) -> None:
    print(f"[gate +{time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


T0 = time.perf_counter()


# ---------------------------------------------------------------------------
# data: identical activations from OUR extraction pipeline, chunked so the
# gate scales to 500+ clips (device-side layer slicing keeps D2H small)
# ---------------------------------------------------------------------------

def extract_tokens(family: str, tokens: int, n_layers: int):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from whisper_sae_tpu.data.librispeech import SyntheticSpeechDataset
    from whisper_sae_tpu.models.whisper import (
        WhisperArch,
        extract_activations,
        init_whisper,
    )

    arch = WhisperArch()
    params = init_whisper(jax.random.PRNGKey(0), arch)
    n_clips = max(1, -(-tokens // 1500))
    ds = SyntheticSpeechDataset(num_samples=n_clips, seed=0)

    chunks = []
    chunk = 50
    for start in range(0, n_clips, chunk):
        idx = range(start, min(start + chunk, n_clips))
        mels = jnp.stack([jnp.asarray(ds[i]["input_features"]) for i in idx])
        acts = extract_activations(
            params, mels, arch, with_decoder=False,
            with_mlp=family == "transcoder",
        )
        if family in ("sae", "relu-sae"):
            # encoder layer 0 (tiny_test.yaml: encoder_layers: [0])
            chunks.append(np.asarray(acts["encoder"][0]).reshape(-1, arch.d_model))
        elif family == "transcoder":
            chunks.append((
                np.asarray(acts["encoder_mlp_in"][0]).reshape(-1, arch.d_model),
                np.asarray(acts["encoder_mlp_out"][0]).reshape(-1, arch.d_model),
            ))
        else:  # crosscoder: all encoder layers, token-major [N, L, D]
            enc = np.asarray(acts["encoder"][:n_layers])  # [L, B, T, D]
            chunks.append(
                enc.transpose(1, 2, 0, 3).reshape(-1, enc.shape[0], arch.d_model)
            )
        log(f"extracted clips {start}..{idx[-1]}")

    if family == "transcoder":
        x = np.concatenate([c[0] for c in chunks])[:tokens]
        y = np.concatenate([c[1] for c in chunks])[:tokens]
        return (x, y)
    return np.concatenate(chunks)[:tokens]


# ---------------------------------------------------------------------------
# reference oracles (torch, imported at runtime from /root/reference)
# ---------------------------------------------------------------------------

def _torch_contract_loop(model, params_t, batches_fn, epochs, lr, renorm,
                         total_steps, warmup_steps):
    """The training contract both repos share for coder families (AdamW,
    wd=0, global-norm clip 1.0, post-step decoder renorm, warmup+cosine
    LR — reference training.py:136-217 semantics; the reference has no
    coder trainer, so this loop applies its SAE trainer's contract to the
    reference coder models)."""
    import torch
    from torch.optim.lr_scheduler import CosineAnnealingLR, LinearLR, SequentialLR

    opt = torch.optim.AdamW(params_t, lr=lr, weight_decay=0.0)
    warmup = min(warmup_steps, total_steps // 10)
    sched = SequentialLR(
        opt,
        schedulers=[
            LinearLR(opt, start_factor=0.01, end_factor=1.0, total_iters=warmup),
            CosineAnnealingLR(opt, T_max=total_steps - warmup, eta_min=lr * 0.1),
        ],
        milestones=[warmup],
    )
    for ep in range(epochs):
        for loss in batches_fn(ep, model):
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(params_t, 1.0)
            opt.step()
            sched.step()
            with torch.no_grad():
                renorm()
        log(f"oracle epoch {ep + 1}/{epochs} done")


def _seeded_oracle(one_run, ref_seeds: int):
    """Run the oracle once per shuffle seed (seed 0 = the shared-order
    stream numpy rng 0, replayed by run_ours; seeds > 0 vary ONLY the
    batch order) and fold the spread into the reference record — the
    family's own batch-order noise floor at this scale (VERDICT r4 #3:
    per-family floors, not the TopK SAE's borrowed one)."""
    runs = []
    for seed in range(max(ref_seeds, 1)):
        runs.append(one_run(seed))
        log(f"oracle seed {seed}: mse={runs[-1]['mse']:.6f}")
    ref = dict(runs[0])
    if len(runs) > 1:
        ms = [r["mse"] for r in runs]
        ref["seed_mses"] = ms
        ref["seed_spread"] = max(ms) / min(ms)
    return ref


def _oracle_or_cached(one_run, args):
    """``--oracle-from FILE`` reuses a previous run's reference record
    instead of retraining the torch oracle (it is deterministic for a
    given config: torch.manual_seed init + numpy-rng-0 batch order), so
    A/B runs that vary only OUR side (backend, matmul precision) cost
    minutes instead of the oracle's ~40 min.  Prefers the full-precision
    ``mse_exact`` field when the source run recorded it."""
    if args.oracle_from:
        prev = json.loads(Path(args.oracle_from).read_text())
        pref = prev["reference"]
        ref = {
            "mse": pref.get("mse_exact", pref["mse"]),
            "l0": pref.get("l0_exact", pref["l0"]),
            "cached_from": str(args.oracle_from),
        }
        for key in ("seed_mses", "seed_spread"):
            if key in pref:
                ref[key] = pref[key]
        log(f"oracle reused from {args.oracle_from}: mse={ref['mse']:.6g}")
        return ref
    return _seeded_oracle(one_run, args.ref_seeds)


def _shuffle_rng(seed: int):
    import numpy as np

    return np.random.default_rng(0 if seed == 0 else 1000 + seed)


def run_reference(family: str, data, args):
    import numpy as np

    sys.path.insert(0, str(REFERENCE))
    import torch

    torch.manual_seed(0)
    if family == "relu-sae":
        # the reference's own trainer can't run its ReLUSAE (train_step
        # calls get_dead_feature_ratio, which only TopKSAE defines —
        # training.py:212 vs model.py:192), so the ReLU oracle goes
        # through the shared contract loop like the coder families
        from whisper_sae.sae.model import ReLUSAE as RefReLUSAE

        d = data.shape[1]
        ref_model = RefReLUSAE(input_dim=d, hidden_dim=d * args.expansion)
        init_sd = {k: v.detach().clone() for k, v in ref_model.state_dict().items()}

        def one_run(seed: int) -> dict:
            model = ref_model
            if seed > 0:
                model = RefReLUSAE(input_dim=d, hidden_dim=d * args.expansion)
                model.load_state_dict(init_sd)
            rng = _shuffle_rng(seed)

            def relu_batches(ep, m):
                perm = rng.permutation(len(data))
                for s in range(0, len(data), args.batch_size):
                    batch = torch.from_numpy(data[perm[s : s + args.batch_size]])
                    if args.oracle_amp:
                        # the reference's own production precision is CUDA
                        # AMP (training.py use_amp); autocast-bf16 here
                        # measures the REFERENCE's bf16 training cost for
                        # this family, so ours-amp/oracle-amp compares
                        # equal precisions (backward + optimizer stay f32,
                        # like torch AMP and like our AMP trainer)
                        with torch.autocast("cpu", dtype=torch.bfloat16):
                            loss = m(batch).loss
                        yield loss.float()
                    else:
                        yield m(batch).loss

            _torch_contract_loop(
                model, list(model.parameters()), relu_batches, args.epochs,
                args.lr, model.normalize_decoder_weights,
                total_steps=args.epochs * -(-len(data) // args.batch_size),
                warmup_steps=args.warmup_steps,
            )
            model.eval()
            with torch.no_grad():
                mses, l0s = [], []
                for s in range(0, len(data), EVAL_CHUNK):
                    out = model(torch.from_numpy(data[s : s + EVAL_CHUNK]))
                    rows = min(s + EVAL_CHUNK, len(data)) - s
                    mses.append(float(out.reconstruction_loss) * rows)
                    l0s.append(float(out.l0) * rows)
            return {"mse": sum(mses) / len(data), "l0": sum(l0s) / len(data)}

        return init_sd, _oracle_or_cached(one_run, args)

    if family == "sae":
        from whisper_sae.config import TrainingConfig as RefTrainingConfig
        from whisper_sae.sae.model import TopKSAE as RefTopKSAE
        from whisper_sae.sae.training import SAETrainer as RefSAETrainer

        d = data.shape[1]

        def make_ref_model():
            return RefTopKSAE(
                input_dim=d, hidden_dim=d * args.expansion, k=args.k
            )

        ref_model = make_ref_model()
        init_sd = {k: v.detach().clone() for k, v in ref_model.state_dict().items()}
        ref_cfg = RefTrainingConfig(
            batch_size=args.batch_size, learning_rate=args.lr, epochs=args.epochs,
            warmup_steps=args.warmup_steps, use_amp=False,
        )
        from torch.utils.data import DataLoader, Sampler, TensorDataset

        class _NumpyPermSampler(Sampler):
            """Epoch shuffle driven by a numpy Generator: each __iter__
            draws one permutation, so the oracle's batch order is the
            exact stream ``np.random.default_rng(seed)`` produces — the
            same stream run_ours replays through train_epoch_fused(perm=),
            making the gate a same-order numerics comparison."""

            def __init__(self, n: int, np_seed: int):
                self.n = n
                self.rng = np.random.default_rng(np_seed)

            def __iter__(self):
                return iter(self.rng.permutation(self.n).tolist())

            def __len__(self):
                return self.n

        def one_run(seed: int) -> dict:
            # seed 0 trains ref_model itself in the shared batch order
            # (numpy rng 0, replayed by run_ours); seeds > 0 vary ONLY
            # the shuffle order — the oracle's own batch-order noise
            # floor at this scale
            if seed == 0:
                model = ref_model
            else:
                model = make_ref_model()
                model.load_state_dict(init_sd)
            with tempfile.TemporaryDirectory() as td:
                trainer = RefSAETrainer(model, ref_cfg, device="cpu", run_dir=Path(td))
                loader = DataLoader(
                    TensorDataset(torch.from_numpy(data)),
                    batch_size=args.batch_size,
                    sampler=_NumpyPermSampler(len(data), 0 if seed == 0 else 1000 + seed),
                )
                trainer.train(loader, epochs=args.epochs, checkpoint_every=10_000_000)
            model.eval()
            with torch.no_grad():
                mses, l0s = [], []
                for s in range(0, len(data), EVAL_CHUNK):
                    out = model(torch.from_numpy(data[s : s + EVAL_CHUNK]))
                    n = min(s + EVAL_CHUNK, len(data)) - s
                    mses.append(float(out.reconstruction_loss) * n)
                    l0s.append(float(out.l0) * n)
            return {"mse": sum(mses) / len(data), "l0": sum(l0s) / len(data)}

        return init_sd, _oracle_or_cached(one_run, args)

    if family == "transcoder":
        from whisper_sae.sae.transcoder import TopKTranscoder as RefTranscoder

        x, y = data
        d = x.shape[1]

        def make_tc():
            return RefTranscoder(
                input_dim=d, output_dim=y.shape[1],
                hidden_dim=d * args.expansion, k=args.k,
            )

        ref_model = make_tc()
        init_sd = {k: v.detach().clone() for k, v in ref_model.state_dict().items()}

        def one_run(seed: int) -> dict:
            model = ref_model
            if seed > 0:
                model = make_tc()
                model.load_state_dict(init_sd)
            rng = _shuffle_rng(seed)

            def batches(ep, m):
                # drop_last=False like the reference DataLoader default
                perm = rng.permutation(len(x))
                for s in range(0, len(x), args.batch_size):
                    i = perm[s : s + args.batch_size]
                    out = m(torch.from_numpy(x[i]), torch.from_numpy(y[i]))
                    yield out.loss

            _torch_contract_loop(
                model, list(model.parameters()), batches, args.epochs,
                args.lr, model.normalize_decoder_weights,
                total_steps=args.epochs * -(-len(x) // args.batch_size),
                warmup_steps=args.warmup_steps,
            )
            model.eval()
            with torch.no_grad():
                mses, l0s = [], []
                for s in range(0, len(x), EVAL_CHUNK):
                    n = min(s + EVAL_CHUNK, len(x)) - s
                    out = model(
                        torch.from_numpy(x[s : s + EVAL_CHUNK]),
                        torch.from_numpy(y[s : s + EVAL_CHUNK]),
                    )
                    mses.append(float(out.reconstruction_loss) * n)
                    l0s.append(float(out.l0) * n)
            return {"mse": sum(mses) / len(x), "l0": sum(l0s) / len(x)}

        return init_sd, _oracle_or_cached(one_run, args)

    # crosscoder families
    from whisper_sae.sae.crosscoder import (
        CrossLayerCrosscoder as RefReLUCrosscoder,
        TopKCrossLayerCrosscoder as RefCrosscoder,
    )

    n, n_layers, d = data.shape

    def make_cc():
        if family == "crosscoder":
            return RefCrosscoder(
                d_model=d, n_layers=n_layers, d_sae=d * args.expansion,
                k=args.k,
            )
        return RefReLUCrosscoder(
            d_model=d, n_layers=n_layers, d_sae=d * args.expansion
        )

    ref_model = make_cc()
    init_sd = {k: v.detach().clone() for k, v in ref_model.state_dict().items()}

    def one_run(seed: int) -> dict:
        model = ref_model
        if seed > 0:
            model = make_cc()
            model.load_state_dict(init_sd)
        rng = _shuffle_rng(seed)

        def cc_batches(ep, m):
            # drop_last=False like the reference DataLoader default
            perm = rng.permutation(n)
            for s in range(0, n, args.batch_size):
                i = perm[s : s + args.batch_size]
                acts = {
                    li: torch.from_numpy(data[i, li]) for li in range(n_layers)
                }
                out = m(acts)
                yield out.loss

        _torch_contract_loop(
            model, list(model.parameters()), cc_batches, args.epochs,
            args.lr, model.normalize_decoder_weights,
            total_steps=args.epochs * -(-n // args.batch_size),
            warmup_steps=args.warmup_steps,
        )
        model.eval()
        with torch.no_grad():
            mses, l0s = [], []
            for s in range(0, n, EVAL_CHUNK):
                rows = min(s + EVAL_CHUNK, n) - s
                acts = {
                    li: torch.from_numpy(data[s : s + EVAL_CHUNK, li])
                    for li in range(n_layers)
                }
                out = model(acts)
                mses.append(float(out.reconstruction_loss) * rows)
                l0s.append(float(out.l0) * rows)
        return {"mse": sum(mses) / n, "l0": sum(l0s) / n}

    return init_sd, _oracle_or_cached(one_run, args)


# ---------------------------------------------------------------------------
# our side, one run per mode (same init, same config)
# ---------------------------------------------------------------------------

def _train_same_order(trainer, data, n, args):
    """Train with the exact batch-order stream the oracle consumed
    (``np.random.default_rng(0)``, one permutation per epoch) so the
    residual mse_ratio measures numerics (f32 associativity, bf16 AMP,
    kernel vs composed XLA) rather than batch-order noise."""
    import numpy as np

    steps_per_epoch = -(-n // args.batch_size)
    trainer.setup_scheduler(steps_per_epoch * args.epochs)
    rng = np.random.default_rng(0)
    for ep in range(args.epochs):
        trainer.train_epoch_fused(data, perm=rng.permutation(n))
        log(f"ours epoch {ep + 1}/{args.epochs} done")


def run_ours(family: str, data, init_sd, args, mode: str):
    import numpy as np

    import jax.numpy as jnp

    from whisper_sae_tpu.config import TrainingConfig
    from whisper_sae_tpu.utils.checkpoint import import_torch_state_dict

    if mode == "amp-nofused":
        os.environ["WST_DISABLE_FUSED_CODER"] = "1"
    else:
        os.environ.pop("WST_DISABLE_FUSED_CODER", None)
    use_amp = mode.startswith("amp")
    cfg = TrainingConfig(
        batch_size=args.batch_size, learning_rate=args.lr, epochs=args.epochs,
        warmup_steps=args.warmup_steps, use_amp=use_amp,
    )

    if family in ("sae", "relu-sae"):
        from whisper_sae_tpu.models.sae import ReLUSAE, TopKSAE
        from whisper_sae_tpu.training.trainer import SAETrainer

        d = data.shape[1]
        jparams = import_torch_state_dict(init_sd)
        if family == "sae":
            jparams["b_pre"] = jnp.zeros((d,), jnp.float32)
            model = TopKSAE(input_dim=d, hidden_dim=d * args.expansion,
                            k=args.k, params=jparams)
        else:  # reference ReLUSAE has no pre-encoder bias
            model = ReLUSAE(input_dim=d, hidden_dim=d * args.expansion,
                            params=jparams)
        with tempfile.TemporaryDirectory() as td:
            trainer = SAETrainer(model, cfg, run_dir=Path(td))
            _train_same_order(trainer, data, len(data), args)
        model.eval()
        mses, l0s = [], []
        for s in range(0, len(data), EVAL_CHUNK):
            rows = min(s + EVAL_CHUNK, len(data)) - s
            out = model(jnp.asarray(data[s : s + EVAL_CHUNK]))
            mses.append(float(out.reconstruction_loss) * rows)
            l0s.append(float(out.l0) * rows)
        return {"mse": sum(mses) / len(data), "l0": sum(l0s) / len(data)}

    if family == "transcoder":
        from whisper_sae_tpu.models.transcoder import TopKTranscoder
        from whisper_sae_tpu.training.coder_trainers import TranscoderTrainer

        x, y = data
        d = x.shape[1]
        init = {
            "w_enc": jnp.array(np.asarray(init_sd["encoder.weight"]).T),
            "b_enc": jnp.array(np.asarray(init_sd["encoder.bias"])),
            # reference decoder: nn.Linear(H, D) -> weight [D, H]; ours [H, D]
            "w_dec": jnp.array(np.asarray(init_sd["decoder.weight"]).T),
            "b_dec": jnp.array(np.asarray(init_sd["decoder.bias"])),
        }
        model = TopKTranscoder(d, y.shape[1], d * args.expansion, k=args.k, params=init)
        with tempfile.TemporaryDirectory() as td:
            trainer = TranscoderTrainer(model, cfg, run_dir=Path(td))
            _train_same_order(trainer, (x, y), len(x), args)
        model.eval()
        mses, l0s = [], []
        for s in range(0, len(x), EVAL_CHUNK):
            rows = min(s + EVAL_CHUNK, len(x)) - s
            out = model(jnp.asarray(x[s : s + EVAL_CHUNK]),
                        jnp.asarray(y[s : s + EVAL_CHUNK]))
            mses.append(float(out.reconstruction_loss) * rows)
            l0s.append(float(out.l0) * rows)
        return {"mse": sum(mses) / len(x), "l0": sum(l0s) / len(x)}

    # crosscoder families (reference parameter names: W_enc/b_enc/W_dec/b_dec)
    from whisper_sae_tpu.models.crosscoder import (
        CrossLayerCrosscoder,
        TopKCrossLayerCrosscoder,
    )
    from whisper_sae_tpu.training.coder_trainers import CrosscoderTrainer

    n, n_layers, d = data.shape
    init = {
        "w_enc": jnp.array(np.asarray(init_sd["W_enc"])),
        "b_enc": jnp.array(np.asarray(init_sd["b_enc"])),
        "w_dec": jnp.array(np.asarray(init_sd["W_dec"])),
        "b_dec": jnp.array(np.asarray(init_sd["b_dec"])),
    }
    if family == "crosscoder":
        model = TopKCrossLayerCrosscoder(
            d_model=d, n_layers=n_layers, d_sae=d * args.expansion, k=args.k,
            params=init,
        )
    else:
        model = CrossLayerCrosscoder(
            d_model=d, n_layers=n_layers, d_sae=d * args.expansion, params=init
        )
    with tempfile.TemporaryDirectory() as td:
        trainer = CrosscoderTrainer(model, cfg, run_dir=Path(td))
        _train_same_order(trainer, data, n, args)
    model.eval()
    mses, l0s = [], []
    for s in range(0, n, EVAL_CHUNK):
        rows = min(s + EVAL_CHUNK, n) - s
        out = model(jnp.asarray(data[s : s + EVAL_CHUNK]))
        mses.append(float(out.reconstruction_loss) * rows)
        l0s.append(float(out.l0) * rows)
    return {"mse": sum(mses) / n, "l0": sum(l0s) / n}


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--family",
        choices=["sae", "relu-sae", "transcoder", "crosscoder",
                 "relu-crosscoder"],
        default="sae",
    )
    parser.add_argument("--modes", default="f32,amp",
                        help="comma list of f32|amp|amp-nofused")
    # defaults = reference configs/tiny_test.yaml (500 clips x 1500 tokens)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--tokens", type=int, default=750_000)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--warmup-steps", type=int, default=100)
    parser.add_argument("--k", type=int, default=32)
    parser.add_argument("--expansion", type=int, default=8)
    parser.add_argument("--n-layers", type=int, default=4,
                        help="encoder layers stacked for the crosscoder family")
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--ref-seeds", type=int, default=1,
                        help="train the torch oracle this many times with "
                             "different shuffle seeds (any family) to "
                             "measure the oracle's own batch-order noise "
                             "floor; seed 0 is the shared-order path, and "
                             "the measured spread widens the pass band")
    parser.add_argument("--out", type=Path, default=None,
                        help="also write the JSON result here")
    parser.add_argument("--amp", action="store_true",
                        help="legacy flag: equivalent to --modes amp")
    parser.add_argument("--oracle-from", type=Path, default=None,
                        help="reuse the reference record from a previous "
                             "result JSON (same config required) instead "
                             "of retraining the deterministic torch "
                             "oracle — for A/B runs varying only OUR side")
    parser.add_argument("--backend", choices=["default", "cpu"],
                        default="default",
                        help="cpu: run OUR side (and extraction) on the host "
                             "CPU — true-f32 XLA, no MXU. Separates 'TPU "
                             "matmul numerics' from 'training-dynamics "
                             "chaos': on TPU even f32 mode feeds the MXU "
                             "bf16 inputs under Precision.DEFAULT")
    parser.add_argument("--matmul-precision",
                        choices=["default", "highest"], default="default",
                        help="highest: f32 dots run multi-pass on the MXU "
                             "(jax_default_matmul_precision) — the on-chip "
                             "true-f32 A/B lever")
    parser.add_argument("--oracle-amp", action="store_true",
                        help="train the torch oracle under autocast-bf16 "
                             "(the reference's own production precision is "
                             "CUDA AMP) so ours-amp/oracle-amp compares "
                             "EQUAL precisions — relu-sae only")
    args = parser.parse_args()
    if args.oracle_amp and args.family != "relu-sae":
        parser.error("--oracle-amp is implemented for --family relu-sae only")
    if args.amp:
        args.modes = "amp"
    if args.backend == "cpu" or args.matmul_precision != "default":
        import jax

        if args.backend == "cpu":
            jax.config.update("jax_platforms", "cpu")
        if args.matmul_precision != "default":
            jax.config.update(
                "jax_default_matmul_precision", args.matmul_precision
            )
    modes = [m.strip() for m in args.modes.split(",") if m.strip()]

    data = extract_tokens(args.family, args.tokens, args.n_layers)
    n_tok = len(data[0]) if args.family == "transcoder" else len(data)
    log(f"activations ready: {n_tok} tokens, family={args.family}")

    init_sd, ref = run_reference(args.family, data, args)
    log(f"reference oracle: mse={ref['mse']:.6f} l0={ref['l0']:.2f}")

    result = {
        "family": args.family,
        "config": {
            "tokens": n_tok, "epochs": args.epochs, "batch_size": args.batch_size,
            "k": args.k, "expansion": args.expansion, "lr": args.lr,
            "warmup_steps": args.warmup_steps,
            **({"n_layers": args.n_layers}
               if args.family.endswith("crosscoder") else {}),
            "backend": args.backend,
            "matmul_precision": args.matmul_precision,
            **({"oracle_amp": True} if args.oracle_amp else {}),
            "note": "reference configs/tiny_test.yaml scale; oracle = f32 torch "
                    "reference implementation imported from /root/reference; "
                    "identical init AND batch order (np rng 0) on both sides",
        },
        "reference": {
            "mse": round(ref["mse"], 6), "l0": round(ref["l0"], 3),
            # full precision for --oracle-from reuse (the rounded mse is
            # only ~2 significant figures for the tiny ReLU-family MSEs)
            "mse_exact": ref["mse"], "l0_exact": ref["l0"],
            **({"cached_from": ref["cached_from"]}
               if "cached_from" in ref else {}),
            # --ref-seeds > 1: the oracle's own batch-order noise floor
            **({"seed_mses": [round(m, 6) for m in ref["seed_mses"]],
                "seed_spread": round(ref["seed_spread"], 4)}
               if "seed_spread" in ref else {}),
        },
        "modes": {},
    }
    ok = True
    for mode in modes:
        ours = run_ours(args.family, data, init_sd, args, mode)
        ratio = ours["mse"] / ref["mse"] if ref["mse"] > 0 else float("inf")
        # Same init + same batch order removes the shuffle-noise TERM, but
        # at multi-epoch horizons ANY numeric difference (f32 reduction
        # order, bf16 rounding) compounds chaotically until trajectories
        # decorrelate — the final-MSE deviation saturates toward the
        # oracle's own batch-order noise floor (TopK SAE: 4.1% spread at
        # 750k tokens / 3 epochs; at 190 steps the same-order f32 ratio
        # is 1.0000, at 35k steps it lands ~1.03).  The floor is FAMILY-
        # SPECIFIC (ReLU families sit much closer to the data's intrinsic
        # noise, so their relative MSE spread is larger): when this run
        # measured the family's own floor (--ref-seeds > 1), the band is
        # that spread with a 25% sampling margin (3 seeds undersample the
        # spread); otherwise the historical TopK-SAE floor band applies.
        # The SHARP short-horizon instruments are tests/test_torch_parity
        # .py and tests/test_relu_torch_parity.py (20-30-step trajectories,
        # rtol 2e-4) and the interpret/on-chip kernel bit-identity pins.
        band = 0.045 if mode == "f32" else 0.05
        if "seed_spread" in ref:
            band = max(band, (ref["seed_spread"] - 1.0) * 1.25)
        l0_tol = max(0.5, 0.02 * abs(ref["l0"])) if "relu" in args.family else 0.5
        passed = bool(
            1 - band <= ratio <= 1 + band
            and abs(ours["l0"] - ref["l0"]) < l0_tol
        )
        ok = ok and passed
        result["modes"][mode] = {
            "mse": round(ours["mse"], 6), "l0": round(ours["l0"], 3),
            "mse_ratio": round(ratio, 4), "band": round(band, 4),
            "pass": passed,
        }
        log(f"mode {mode}: mse={ours['mse']:.6f} ratio={ratio:.4f} pass={passed}")
    result["pass"] = ok

    line = json.dumps(result)
    print(line)
    if args.out:
        args.out.write_text(line + "\n")


if __name__ == "__main__":
    main()
