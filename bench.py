#!/usr/bin/env python3
"""Benchmark: TopK-SAE training throughput in activations/sec/chip.

The metric defined by BASELINE.json: whisper-tiny geometry (D=384,
H=3072, k=32 — configs/tiny_default.yaml), full training semantics per
step (fwd, bwd, global-norm clip, AdamW, decoder renorm, dead-feature
tracking).  The TPU path runs the trainer's fused lax.scan epoch on
device-resident data in bf16 compute.

``vs_baseline`` compares against the reference's own A10G plan roofline
(~520k act/s — BASELINE.md derives it from the "4 h/layer for 7.5B
activations" plan), the honest denominator.  ``vs_torch_same_host``
compares against a torch implementation of the reference's train step
(model.py:131-166 + training.py:161-217 semantics, re-implemented here,
not copied) measured on THIS host — kept for transparency, but the host
is a single CPU core, so it is a strawman.

Output: one JSON line
  {"metric": ..., "value": N, "unit": "activations/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent / "src"))
# persistent XLA compile cache: the fused-epoch program takes minutes to
# compile on the single-core host; cache it across bench runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

D, H, K = 384, 3072, 32  # whisper-tiny SAE geometry


def bench_tpu(batch: int, steps: int, warmup_steps: int = 8,
              data_dtype: str = "f32") -> tuple[float, str]:
    """``data_dtype="bf16"`` stages the epoch stack in bfloat16 — the
    shape of a production ``--cache-dtype bfloat16`` run (extraction's
    bf16 fast mode stores the cache at half width); the headline metric
    stays on the f32 stack for round-over-round comparability."""
    import jax
    import jax.numpy as jnp

    from whisper_sae_tpu.config import TrainingConfig
    from whisper_sae_tpu.models.sae import TopKSAE
    from whisper_sae_tpu.training.trainer import SAETrainer

    model = TopKSAE(input_dim=D, hidden_dim=H, k=K, seed=0)
    cfg = TrainingConfig(
        batch_size=batch, learning_rate=1e-4, epochs=1, warmup_steps=1000,
        use_amp=True,
    )
    trainer = SAETrainer(model, cfg, run_dir=Path("/tmp/wst_bench"))
    trainer.setup_scheduler(total_steps=steps * 10)

    key = jax.random.PRNGKey(0)
    data = jax.random.normal(key, (steps * batch, D), jnp.float32)
    if data_dtype == "bf16":
        data = data.astype(jnp.bfloat16)

    # compile + warm up on the SAME scan shape (a different step count
    # would recompile inside the timed region)
    trainer.train_epoch_fused(data, shuffle=False)
    jax.block_until_ready(trainer.model.params["w_enc"])

    # sustained throughput: pipelined-dispatch epochs (successive epoch
    # programs chain on-device; metrics fetched once at the end)
    epochs = 6
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        trainer.train_epochs_fused(data, epochs=epochs, shuffle=False)
        jax.block_until_ready(trainer.model.params["w_enc"])
        dt = time.perf_counter() - t0
        best = max(best, epochs * steps * batch / dt)
    return best, ("indexed" if trainer._use_indexed_epoch(data) else "flat")


def bench_tpu_large(batch: int = 8192, steps: int = 6) -> float:
    """Whisper-large 32x geometry (D=1280, H=40960, 52M SAE params):
    full training semantics through the blocked fused encode kernel
    (w_enc streamed through VMEM per row block; SURVEY §2.9 TP row is the
    multi-chip continuation)."""
    import jax
    import jax.numpy as jnp

    from whisper_sae_tpu.config import TrainingConfig
    from whisper_sae_tpu.models.sae import TopKSAE
    from whisper_sae_tpu.training.trainer import SAETrainer

    model = TopKSAE(input_dim=1280, hidden_dim=40960, k=K, seed=0)
    cfg = TrainingConfig(
        batch_size=batch, learning_rate=1e-4, epochs=1, warmup_steps=1000,
        use_amp=True,
    )
    trainer = SAETrainer(model, cfg, run_dir=Path("/tmp/wst_bench_large"))
    trainer.setup_scheduler(total_steps=steps * 10)
    data = jax.random.normal(jax.random.PRNGKey(0), (steps * batch, 1280), jnp.float32)
    trainer.train_epoch_fused(data, shuffle=False)
    jax.block_until_ready(trainer.model.params["w_enc"])
    epochs = 4
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        trainer.train_epochs_fused(data, epochs=epochs, shuffle=False)
        jax.block_until_ready(trainer.model.params["w_enc"])
        best = max(best, epochs * steps * batch / (time.perf_counter() - t0))
    return best


def bench_coders(batch: int = 32768, steps: int = 64) -> dict:
    """Fused-epoch training throughput for the other coder families
    (ReLU+L1 SAE and TopK transcoder) at whisper-tiny geometry — the
    numbers quoted in README/DESIGN.

    Longer epochs than the headline bench would need: these kernels run
    3-10x faster per step, so short epochs are dispatch-bound — any
    host-side jitter between chained epoch programs reads as a large
    throughput loss (the r4 preview measured ReLU at half speed purely
    from a loaded host core)."""
    import jax
    import jax.numpy as jnp

    from whisper_sae_tpu.config import TrainingConfig
    from whisper_sae_tpu.models.sae import ReLUSAE
    from whisper_sae_tpu.models.transcoder import TopKTranscoder
    from whisper_sae_tpu.training.coder_trainers import TranscoderTrainer
    from whisper_sae_tpu.training.trainer import SAETrainer

    cfg = TrainingConfig(
        batch_size=batch, learning_rate=1e-4, epochs=1, warmup_steps=1000,
        use_amp=True,
    )
    out = {}

    def measure(trainer, data):
        trainer.setup_scheduler(total_steps=steps * 10)
        trainer.train_epoch_fused(data, shuffle=False)
        jax.block_until_ready(trainer.model.params["w_enc"])
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            trainer.train_epochs_fused(data, epochs=4, shuffle=False)
            jax.block_until_ready(trainer.model.params["w_enc"])
            best = max(best, 4 * steps * batch / (time.perf_counter() - t0))
        return best

    x = jax.random.normal(jax.random.PRNGKey(0), (steps * batch, D), jnp.float32)
    out["relu_sae_act_per_sec"] = measure(
        SAETrainer(ReLUSAE(input_dim=D, hidden_dim=H, seed=0), cfg,
                   run_dir=Path("/tmp/wst_bench_relu")),
        x,
    )
    y = jax.random.normal(jax.random.PRNGKey(1), (steps * batch, D), jnp.float32)
    out["transcoder_act_per_sec"] = measure(
        TranscoderTrainer(TopKTranscoder(D, D, H, k=K, seed=0), cfg,
                          run_dir=Path("/tmp/wst_bench_tc")),
        (x, y),
    )
    # ReLU crosscoder (decoder-norm-weighted L1) on 4 layers of d=384 —
    # the fused kernel's flattened view is [B, 4*384] -> 3072 features
    from whisper_sae_tpu.models.crosscoder import CrossLayerCrosscoder
    from whisper_sae_tpu.training.coder_trainers import CrosscoderTrainer

    cc_steps = max(steps // 2, 1)  # 4 layers -> 4x the bytes per token
    # (6.4 GB device-resident at steps=64: 32 x 32768 x 4 x 384 f32 —
    # fine with shuffle=False, no in-jit gather copy)
    xc = jax.random.normal(
        jax.random.PRNGKey(2), (cc_steps * batch, 4, D), jnp.float32
    )
    cc_cfg = cfg.model_copy()
    cc = CrossLayerCrosscoder(d_model=D, n_layers=4, d_sae=H, seed=0)
    t = CrosscoderTrainer(cc, cc_cfg, run_dir=Path("/tmp/wst_bench_cc"))
    t.setup_scheduler(total_steps=cc_steps * 10)
    t.train_epoch_fused(xc, shuffle=False)
    jax.block_until_ready(t.model.params["w_enc"])
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        t.train_epochs_fused(xc, epochs=4, shuffle=False)
        jax.block_until_ready(t.model.params["w_enc"])
        best = max(best, 4 * cc_steps * batch / (time.perf_counter() - t0))
    out["crosscoder_relu_act_per_sec"] = best
    return out


def bench_extraction(batch: int = 64, steps: int = 8, dtype_name: str = "bf16",
                     arch_name: str | None = None) -> dict:
    """Extraction throughput: whisper forward with all-layer capture
    (clips/sec and activation-tokens/sec/layer), random weights + random
    mel — the compute path is identical to a pretrained run.

    Batch 64 matches the pipeline default (scripts/train.py): measured
    797/1024/1100 clips/s at batch 16/32/64 on one v5e (B=128 only adds
    compile time).  ``arch_name`` selects a bigger geometry (e.g.
    "openai/whisper-large-v3": d=1280, 32+32 layers, 128 mel bins)."""
    import jax
    import jax.numpy as jnp

    from whisper_sae_tpu.models.whisper import (
        WhisperArch,
        arch_for,
        extract_activations,
        init_whisper,
    )

    arch = arch_for(arch_name) if arch_name else WhisperArch()
    compute_dtype = jnp.bfloat16 if dtype_name == "bf16" else None
    params = init_whisper(jax.random.PRNGKey(0), arch)
    mels = jax.random.normal(
        jax.random.PRNGKey(1), (steps, batch, arch.n_mels, 3000), jnp.float32
    )

    # params enter as an ARGUMENT: closing over them would capture the
    # full weight set as compile-time constants (6+ GB at whisper-large,
    # which breaks the remote-compile transport)
    def run(params, mels):
        def body(c, mel):
            acts = extract_activations(
                params, mel, arch, with_decoder=True,
                compute_dtype=compute_dtype,
                # the pipeline transfers bf16 captures in fast mode
                capture_dtype=compute_dtype,
            )
            return c, (jnp.sum(acts["encoder"][:, :, 0, 0]), jnp.sum(acts["decoder"]))
        _, out = jax.lax.scan(body, 0, mels)
        return jax.tree_util.tree_map(jnp.sum, out)

    f = jax.jit(run)
    jax.tree_util.tree_map(float, f(params, mels))  # compile + warm
    t0 = time.perf_counter()
    jax.tree_util.tree_map(float, f(params, mels))
    dt = time.perf_counter() - t0
    clips = steps * batch
    return {
        "clips_per_sec": clips / dt,
        "activation_tokens_per_sec_per_layer": clips * 1500 / dt,
    }


def bench_torch_reference(batch: int = 128, steps: int = 10) -> float:
    """Reference-semantics torch train step on this host (the measurable
    baseline; see module docstring)."""
    import torch

    torch.manual_seed(0)
    dev = "cuda" if torch.cuda.is_available() else "cpu"

    enc = torch.nn.Linear(D, H).to(dev)
    dec = torch.nn.Linear(H, D).to(dev)
    with torch.no_grad():
        torch.nn.init.xavier_uniform_(dec.weight)
        dec.weight.data = torch.nn.functional.normalize(dec.weight.data, dim=0) * 0.1
    b_pre = torch.nn.Parameter(torch.zeros(D, device=dev))
    params = list(enc.parameters()) + list(dec.parameters()) + [b_pre]
    opt = torch.optim.AdamW(params, lr=1e-4)

    feature_last = torch.zeros(H, dtype=torch.long, device=dev)
    step_count = torch.tensor(0, dtype=torch.long, device=dev)

    def train_step(x):
        nonlocal step_count
        pre = enc(x - b_pre)
        vals, idx = torch.topk(pre, K, dim=-1)
        hidden = torch.zeros_like(pre).scatter_(-1, idx, torch.relu(vals))
        recon = dec(hidden) + b_pre
        loss = torch.nn.functional.mse_loss(recon, x)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(params, 1.0)
        opt.step()
        with torch.no_grad():
            dec.weight.data = torch.nn.functional.normalize(dec.weight.data, dim=0)
            step_count += 1
            feature_last[(hidden > 0).any(dim=0)] = step_count
        return float(loss.detach())

    x = torch.randn(batch, D, device=dev)
    train_step(x)  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        train_step(x)
    dt = time.perf_counter() - t0
    return steps * batch / dt


def main() -> None:
    parser = argparse.ArgumentParser()
    # 32k-token batches measured fastest in the trainer's fused-epoch path
    # (5.30M vs 4.94M act/s at 128k in an A/B/A; a standalone scan that
    # re-feeds ONE batch shows the opposite ordering — do not tune batch
    # size from synthetic single-batch loops).  128 steps/epoch (6.4 GB
    # device-resident) amortizes the per-epoch dispatch further than 64.
    parser.add_argument("--batch", type=int, default=32768)
    parser.add_argument("--steps", type=int, default=128)
    parser.add_argument("--baseline-steps", type=int, default=8)
    parser.add_argument("--skip-baseline", action="store_true")
    parser.add_argument("--skip-extraction", action="store_true")
    parser.add_argument("--skip-large", action="store_true")
    parser.add_argument("--extraction", action="store_true",
                        help="Benchmark activation extraction only")
    parser.add_argument("--skip-bf16", action="store_true",
                        help="Skip the bf16-staged-stack bench (saves a "
                             "second warmup/compile cycle)")
    parser.add_argument("--skip-coders", action="store_true",
                        help="Skip the ReLU-SAE / transcoder / crosscoder "
                             "fused-epoch benches (saves compile time)")
    parser.add_argument("--coders", action="store_true",
                        help="(legacy; coder benches are on by default)")
    args = parser.parse_args()

    if args.extraction:
        ext = bench_extraction()
        print(json.dumps({
            "metric": "whisper_tiny_extraction_throughput",
            "value": round(ext["activation_tokens_per_sec_per_layer"], 1),
            "unit": "activation-tokens/sec/layer/chip",
            "clips_per_sec": round(ext["clips_per_sec"], 2),
            "vs_baseline": None,
        }))
        return

    value, epoch_path = bench_tpu(args.batch, args.steps)

    if args.skip_baseline:
        baseline = None
    else:
        try:
            baseline = bench_torch_reference(steps=args.baseline_steps)
        except Exception as e:  # torch missing or OOM: report absolute only
            print(f"baseline measurement failed: {e}", file=sys.stderr)
            baseline = None

    result = {
        "metric": "sae_training_throughput_whisper_tiny",
        "value": round(value, 1),
        "unit": "activations/sec/chip",
        # PRIMARY comparison: the reference's own A10G plan implies
        # ~520k act/s (4 h/layer for 7.5B activations — BASELINE.md
        # "A10G roofline context").  The same-host torch number below is
        # kept for transparency but is a single-CPU-core strawman.
        "vs_baseline": round(value / 520_000, 2),
        "vs_baseline_note": "reference A10G plan roofline (~520k act/s, BASELINE.md)",
        "vs_torch_same_host": round(value / baseline, 2) if baseline else None,
        # which single-device epoch program produced the headline number
        # (scalar-prefetch indexed vs slicing scan — docs/DESIGN.md)
        "epoch_path": epoch_path,
    }
    if baseline:
        result["baseline_torch_same_host"] = round(baseline, 1)
    if not args.skip_bf16:
        try:
            # the production-cache configuration: bf16-staged epoch stack
            # (--cache-dtype bfloat16 / bf16 fast extraction)
            bf16_value, _ = bench_tpu(args.batch, args.steps, data_dtype="bf16")
            result["bf16_stack_act_per_sec"] = round(bf16_value, 1)
        except Exception as e:  # pragma: no cover
            print(f"bf16-stack bench failed: {e}", file=sys.stderr)
    if not args.skip_large:
        try:
            result["large_geometry_act_per_sec"] = round(bench_tpu_large(), 1)
        except Exception as e:  # pragma: no cover
            print(f"large-geometry bench failed: {e}", file=sys.stderr)
    if not args.skip_coders:
        try:
            result.update(
                {k: round(v, 1) for k, v in bench_coders().items()}
            )
        except Exception as e:  # pragma: no cover
            print(f"coder bench failed: {e}", file=sys.stderr)
    if not args.skip_extraction:
        # SURVEY §6 demands the harness record extraction throughput too;
        # carried as extra fields so the driver still sees ONE JSON line
        for mode in ("bf16", "f32"):
            try:
                ext = bench_extraction(dtype_name=mode)
                result[f"extraction_clips_per_sec_{mode}"] = round(
                    ext["clips_per_sec"], 2
                )
                result[f"extraction_tokens_per_sec_per_layer_{mode}"] = round(
                    ext["activation_tokens_per_sec_per_layer"], 1
                )
            except Exception as e:  # pragma: no cover
                print(f"extraction bench ({mode}) failed: {e}", file=sys.stderr)
        try:
            # whisper-large-v3 all-layer capture (VERDICT r3 item 4):
            # d=1280, 32 encoder + 32 decoder layers, 128 mel bins
            ext = bench_extraction(
                batch=8, steps=4, dtype_name="bf16",
                arch_name="openai/whisper-large-v3",
            )
            result["extraction_clips_per_sec_large"] = round(
                ext["clips_per_sec"], 2
            )
        except Exception as e:  # pragma: no cover
            print(f"large extraction bench failed: {e}", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
