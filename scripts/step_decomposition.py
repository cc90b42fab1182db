#!/usr/bin/env python3
"""Tiny-geometry training-step decomposition (VERDICT r3 next #3).

Measures, on the real chip with dispatch-free scan-slope timing (time a
jitted lax.scan at N and 2N iterations; the slope is the per-iteration
cost, free of dispatch/tunnel overhead), the pieces of the B=32768
whisper-tiny TopK-SAE training step behind the headline bench number:

  1. fused forward alone        (fused_sae_loss fwd: encode matmul +
                                 bisection + decode + loss/l0/active)
  2. forward + backward         (value_and_grad through the custom VJP)
  3. + optimizer + renorm       (AdamW + global-norm clip + decoder renorm)
  4. full trainer step          (the above + dead-state + metrics stack —
                                 exactly `_plain_step`)

and prints the measured table against arithmetic floor estimates
(matmul flops at the v5e MXU bf16 peak; bisection at the measured
~56 us/count-pass VPU rate from DESIGN.md round 2).

    python scripts/step_decomposition.py [--batch 32768] [--iters 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

D, H, K = 384, 3072, 32
V5E_BF16_FLOPS = 197e12  # MXU peak, one v5e chip


def scan_slope(fn, carry, iters: int) -> float:
    """Per-iteration seconds via two-point scan-slope timing."""
    import jax

    def run(n):
        f = jax.jit(lambda c: jax.lax.scan(lambda c, _: (fn(c), None),
                                           c, None, length=n)[0])
        out = f(carry)
        jax.block_until_ready(out)  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(carry)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = run(iters), run(2 * iters)
    return (t2 - t1) / iters


def epoch_overhead(batch: int) -> None:
    """Locate the gap between the isolated step and the epoch-level bench
    number: time the trainer's real pipelined fused epochs at increasing
    steps/epoch — per-epoch overhead shows up as throughput that rises
    with epoch length."""
    import jax
    import jax.numpy as jnp

    from whisper_sae_tpu.config import TrainingConfig
    from whisper_sae_tpu.models.sae import TopKSAE
    from whisper_sae_tpu.training.trainer import SAETrainer

    def run_point(steps: int, dtype, xc: bool, indexed: bool = False) -> float:
        os.environ["WST_SAE_XC"] = "1" if xc else "0"
        os.environ["WST_INDEXED_EPOCH"] = "1" if indexed else "0"
        model = TopKSAE(input_dim=D, hidden_dim=H, k=K, seed=0)
        cfg = TrainingConfig(batch_size=batch, learning_rate=1e-4, epochs=1,
                             warmup_steps=1000, use_amp=True)
        trainer = SAETrainer(model, cfg, run_dir=Path("/tmp/wst_decomp_eo"))
        trainer.setup_scheduler(total_steps=steps * 10)
        data = jax.random.normal(
            jax.random.PRNGKey(0), (steps * batch, D), jnp.float32
        ).astype(dtype)
        trainer.train_epoch_fused(data, shuffle=False)
        jax.block_until_ready(trainer.model.params["w_enc"])
        epochs = max(768 // steps, 2)  # same total step budget per point
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            trainer.train_epochs_fused(data, epochs=epochs, shuffle=False)
            jax.block_until_ready(trainer.model.params["w_enc"])
            best = max(best, epochs * steps * batch / (time.perf_counter() - t0))
        return best

    out = {}
    for steps in (64, 128, 256):
        best = run_point(steps, jnp.float32, xc=False)
        out[f"steps_{steps}"] = {
            "act_per_sec": round(best, 1),
            "ms_per_step": round(1e3 * batch / best, 3),
        }
        print(f"steps/epoch {steps:4d}: {best:,.0f} act/s "
              f"({1e3 * batch / best:.3f} ms/step)", file=sys.stderr)

    # data-path A/B at the bench geometry (128 steps/epoch): f32 vs bf16
    # batch stacks x default vs xc-residual backward
    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        for xc in (False, True):
            best = run_point(128, dtype, xc)
            name = f"data_{tag}_xc{int(xc)}"
            out[name] = {
                "act_per_sec": round(best, 1),
                "ms_per_step": round(1e3 * batch / best, 3),
            }
            print(f"{name:18s}: {best:,.0f} act/s "
                  f"({1e3 * batch / best:.3f} ms/step)", file=sys.stderr)

    # scalar-prefetch indexed epochs (the kernel reads its batch window
    # from the epoch buffer; ops/pallas_sae.py:fused_sae_loss_indexed) —
    # no slice materialization, xc residual built in
    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        best = run_point(128, dtype, xc=False, indexed=True)
        name = f"data_{tag}_indexed"
        out[name] = {
            "act_per_sec": round(best, 1),
            "ms_per_step": round(1e3 * batch / best, 3),
        }
        print(f"{name:18s}: {best:,.0f} act/s "
              f"({1e3 * batch / best:.3f} ms/step)", file=sys.stderr)
    os.environ.pop("WST_SAE_XC", None)
    os.environ.pop("WST_INDEXED_EPOCH", None)
    print(json.dumps(out))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32768)
    parser.add_argument("--iters", type=int, default=64)
    parser.add_argument("--epoch-overhead", action="store_true",
                        help="time real pipelined fused epochs at several "
                             "steps/epoch instead of the step pieces")
    args = parser.parse_args()
    if args.epoch_overhead:
        epoch_overhead(args.batch)
        return
    b = args.batch

    import jax
    import jax.numpy as jnp
    import optax

    from whisper_sae_tpu.config import TrainingConfig
    from whisper_sae_tpu.models.sae import TopKSAE, topk_sae_loss, update_dead_state
    from whisper_sae_tpu.training.trainer import SAETrainer

    model = TopKSAE(input_dim=D, hidden_dim=H, k=K, seed=0)
    cfg = TrainingConfig(batch_size=b, learning_rate=1e-4, epochs=1,
                         warmup_steps=1000, use_amp=True)
    trainer = SAETrainer(model, cfg, run_dir=Path("/tmp/wst_decomp"))
    trainer.setup_scheduler(total_steps=1000)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, D), jnp.float32)
    params = model.params
    dt = jnp.bfloat16

    rows = {}

    # 1. forward only (the carry is a scalar accumulator so the scan body
    # cannot be folded away; params are closed-over constants)
    def fwd(c):
        loss, aux = topk_sae_loss(params, x + c * 0, K, dt)
        return c + loss

    rows["fwd"] = scan_slope(fwd, jnp.zeros(()), args.iters)

    # 2. forward + backward (carry = params so grads must be materialized)
    def fwd_bwd(p):
        g = jax.grad(lambda p_: topk_sae_loss(p_, x, K, dt)[0])(p)
        return jax.tree_util.tree_map(lambda a, b_: a + 0.0 * b_, p, g)

    rows["fwd_bwd"] = scan_slope(fwd_bwd, params, args.iters)

    # 3. + optimizer + renorm (the trainer's real optax chain)
    opt = trainer._optimizer
    opt_state = opt.init(params)

    def full_opt(carry):
        p, s = carry
        (loss, aux), grads = jax.value_and_grad(
            lambda p_: topk_sae_loss(p_, x, K, dt), has_aux=True
        )(p)
        updates, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        from whisper_sae_tpu.models.sae import normalize_decoder

        p = normalize_decoder(p)
        return (p, s)

    rows["fwd_bwd_opt_renorm"] = scan_slope(full_opt, (params, opt_state),
                                            args.iters)

    # 4. full trainer step (exactly _plain_step: adds dead-state update +
    # dead-ratio metric + metric stacking)
    step = trainer._plain_step()
    dstate = model.state

    def full_step(carry):
        p, s, d = carry
        p, s, d, metrics = step(p, s, d, x)
        return (p, s, d)

    rows["full_step"] = scan_slope(full_step, (params, opt_state, dstate),
                                   args.iters)

    # floors
    mm_fwd = 4 * b * D * H / V5E_BF16_FLOPS  # encode + decode matmuls
    bisect = 32 * 56e-6  # measured VPU count-pass rate (DESIGN.md r2)
    mm_bwd = 6 * b * D * H / V5E_BF16_FLOPS  # dx, dw_enc, dw_dec
    floors = {
        "fwd": mm_fwd + bisect,
        "fwd_bwd": mm_fwd + bisect + mm_bwd,
        "fwd_bwd_opt_renorm": mm_fwd + bisect + mm_bwd,  # opt is noise-level
        "full_step": mm_fwd + bisect + mm_bwd,
    }

    print(f"\nstep decomposition @ B={b}, D={D}, H={H}, k={K} (bf16 AMP)")
    print(f"{'piece':24s} {'measured':>10s} {'floor est':>10s} {'ratio':>7s} "
          f"{'act/s':>10s}")
    out = {}
    for name, sec in rows.items():
        fl = floors[name]
        print(f"{name:24s} {sec * 1e3:9.2f}ms {fl * 1e3:9.2f}ms "
              f"{sec / fl:6.2f}x {b / sec:10.3e}")
        out[name] = {"ms": round(sec * 1e3, 3), "floor_ms": round(fl * 1e3, 3),
                     "act_per_sec": round(b / sec, 1)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
