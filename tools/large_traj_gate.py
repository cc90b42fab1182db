#!/usr/bin/env python3
"""Trajectory parity at whisper-large geometry, on-chip (VERDICT r4 #6).

Every full-scale quality gate runs whisper-tiny geometry (D=384,
H=3072), where the fused single-block training kernel applies.  At
whisper-large geometry (D=1280, H=40960) the training forward takes a
DIFFERENT code path — the blocked fused encode kernel
(ops/pallas_sae.py:_encode_forward_blocked, w_enc streamed through VMEM
per row block) + XLA decode — which until round 5 had only bit-level
evidence (scripts/check_tpu_kernels.py check 2b) and no trajectory-level
numerics evidence.

This gate mirrors tests/test_torch_parity.py's contract at large dims
(same init imported from a torch oracle, same batch order, AdamW wd=0,
global-norm clip 1.0, post-step decoder renorm, constant LR — reference
training.py:161-217 semantics minus the scheduler) for 20 steps on the
real chip, in BOTH trainer precision modes:

  f32 mode: blocked encode kernel (bf16 weights on the MXU) + f32 decode
  amp mode: blocked encode kernel + bf16 decode

and evaluates the FINAL learned parameters of all three models with one
shared pure-numpy f32 evaluator (exact partition top-k), so the verdict
reflects learned-parameter quality, not eval-path numerics.

    python tools/large_traj_gate.py --out large_traj_gate.json

Pass bands: final eval-MSE ratio vs the torch oracle within +/-2% (f32)
and +/-5% (amp) — the tiny-geometry gates' bands (docs/PARITY.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "src"))


def numpy_eval_mse(params: dict, x, k: int) -> float:
    """Pure-numpy f32 TopK-SAE reconstruction MSE (exact top-k via
    partition; reference model.py:131-166 semantics)."""
    import numpy as np

    w_enc = np.asarray(params["w_enc"], np.float32)  # [D, H]
    b_enc = np.asarray(params["b_enc"], np.float32)
    b_pre = np.asarray(params["b_pre"], np.float32)
    w_dec = np.asarray(params["w_dec"], np.float32)  # [H, D]
    b_dec = np.asarray(params["b_dec"], np.float32)
    mse_sum, n = 0.0, 0
    for s in range(0, x.shape[0], 4096):
        xb = x[s : s + 4096]
        pre = (xb - b_pre) @ w_enc + b_enc
        # exact k-th threshold per row, then mask (ties: >= threshold,
        # matching the bisection kernel's mask semantics)
        thresh = np.partition(pre, -k, axis=-1)[:, -k][:, None]
        hidden = np.where(pre >= thresh, np.maximum(pre, 0.0), 0.0)
        recon = hidden @ w_dec + b_dec + b_pre
        mse_sum += float(np.sum((recon - xb) ** 2))
        n += xb.size
    return mse_sum / n


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--d", type=int, default=1280)
    parser.add_argument("--expansion", type=int, default=32)
    parser.add_argument("--k", type=int, default=32)
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--out", type=str, default="large_traj_gate.json")
    args = parser.parse_args()

    import numpy as np
    import torch

    from whisper_sae_tpu.config import TrainingConfig
    from whisper_sae_tpu.models.sae import TopKSAE
    from whisper_sae_tpu.training.trainer import SAETrainer
    from whisper_sae_tpu.utils.checkpoint import import_torch_state_dict

    d, h, k = args.d, args.d * args.expansion, args.k
    t0 = time.time()

    def log(msg):
        print(f"[large_traj +{time.time() - t0:7.1f}s] {msg}", flush=True)

    data_rng = np.random.default_rng(7)
    data = data_rng.standard_normal(
        (args.steps * args.batch, d), dtype=np.float32
    )
    log(f"geometry d={d} h={h} k={k}, {args.steps} steps x {args.batch}")

    # ---- torch oracle (reference model.py:26-166 + training.py:161-217
    # contract, constant LR) on the host CPU
    torch.manual_seed(0)
    enc = torch.nn.Linear(d, h)
    dec = torch.nn.Linear(h, d)
    b_pre = torch.nn.Parameter(torch.zeros(d))
    with torch.no_grad():
        torch.nn.init.xavier_uniform_(dec.weight)
        dec.weight.data = torch.nn.functional.normalize(dec.weight.data, dim=0) * 0.1
    params_t = list(enc.parameters()) + list(dec.parameters()) + [b_pre]
    init_sd = {
        "encoder.weight": enc.weight.detach().clone(),
        "encoder.bias": enc.bias.detach().clone(),
        "decoder.weight": dec.weight.detach().clone(),
        "decoder.bias": dec.bias.detach().clone(),
        "b_pre": b_pre.detach().clone(),
    }

    def torch_forward(xb):
        pre = enc(xb - b_pre)
        vals, idx = torch.topk(pre, k, dim=-1)
        hidden = torch.zeros_like(pre).scatter_(-1, idx, torch.relu(vals))
        recon = dec(hidden) + b_pre
        return torch.nn.functional.mse_loss(recon, xb)

    opt = torch.optim.AdamW(params_t, lr=args.lr, weight_decay=0.0)
    torch_losses = []
    for s in range(args.steps):
        xb = torch.from_numpy(data[s * args.batch : (s + 1) * args.batch])
        loss = torch_forward(xb)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(params_t, 1.0)
        opt.step()
        with torch.no_grad():
            dec.weight.data = torch.nn.functional.normalize(dec.weight.data, dim=0)
        torch_losses.append(float(loss.detach()))
        if (s + 1) % 5 == 0:
            log(f"oracle step {s + 1}/{args.steps} loss={torch_losses[-1]:.6f}")
    oracle_params = {
        "w_enc": enc.weight.detach().numpy().T,
        "b_enc": enc.bias.detach().numpy(),
        "w_dec": dec.weight.detach().numpy().T,
        "b_dec": dec.bias.detach().numpy(),
        "b_pre": b_pre.detach().numpy(),
    }
    oracle_mse = numpy_eval_mse(oracle_params, data, k)
    log(f"oracle final eval mse={oracle_mse:.6f}")

    # ---- ours, on the chip, both precision modes
    import jax

    report = {
        "geometry": {"d": d, "h": h, "k": k, "batch": args.batch,
                     "steps": args.steps, "lr": args.lr},
        "backend": jax.default_backend(),
        "torch": {"losses": torch_losses, "final_eval_mse": oracle_mse},
    }
    tl = np.asarray(torch_losses)
    all_pass = True
    for mode, band in (("f32", 0.02), ("amp", 0.05)):
        jp = import_torch_state_dict(
            {kk: vv.clone() for kk, vv in init_sd.items()}
        )
        model = TopKSAE(input_dim=d, hidden_dim=h, k=k, params=jp)
        cfg = TrainingConfig(
            batch_size=args.batch, learning_rate=args.lr, epochs=1,
            warmup_steps=0, use_amp=(mode == "amp"),
        )
        with tempfile.TemporaryDirectory() as td:
            tr = SAETrainer(model, cfg, run_dir=Path(td))
            losses = [
                tr.train_step(data[s * args.batch : (s + 1) * args.batch]).loss
                for s in range(args.steps)
            ]
        log(f"{mode} trajectory done, final step loss={losses[-1]:.6f}")
        host = {kk: np.asarray(vv) for kk, vv in model.params.items()}
        mse = numpy_eval_mse(host, data, k)
        ratio = mse / oracle_mse
        rel = np.abs(np.asarray(losses) - tl) / np.maximum(np.abs(tl), 1e-12)
        ok = bool(abs(ratio - 1.0) <= band)
        all_pass &= ok
        report[mode] = {
            "losses": [float(x) for x in losses],
            "loss_rel_max": float(rel.max()),
            "loss_rel_final": float(rel[-1]),
            "final_eval_mse": mse,
            "mse_ratio": ratio,
            "band": band,
            "pass": ok,
            "w_dec_max_abs_diff": float(
                np.abs(host["w_dec"] - oracle_params["w_dec"]).max()
            ),
            "w_enc_max_abs_diff": float(
                np.abs(host["w_enc"] - oracle_params["w_enc"]).max()
            ),
        }
        log(f"{mode}: mse_ratio={ratio:.4f} (band +/-{band}) "
            f"loss_rel_max={rel.max():.2e} pass={ok}")

    report["pass"] = bool(all_pass)
    report["elapsed_s"] = round(time.time() - t0, 1)
    Path(args.out).write_text(json.dumps(report, indent=2))
    log(f"wrote {args.out} pass={all_pass}")
    sys.exit(0 if all_pass else 1)


if __name__ == "__main__":
    main()
