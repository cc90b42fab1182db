#!/usr/bin/env python3
"""Root-cause probe for the indexed-epoch ReLU cliff (VERDICT r4 #4).

Round 4 measured: scalar-prefetch indexed epochs are a wash-to-win for
the TopK SAE but HALVE the ReLU SAE (10.3 -> 5.2 M act/s) and drop the
ReLU crosscoder to 0.9 M.  The shipped explanation was a working
hypothesis (DMA double-buffering the TopK bisection hides).  This probe
measures the mechanism:

  A. trainer-level A/B (the round-4 numbers, reproduced clean):
     relu sliced vs indexed, topk sliced vs indexed, bf16 buffers.
  B. standalone scan-slope timings that split forward from backward:
     - fwd-only:   scan over the kernel forward, loss accumulated
     - fwd+bwd:    value_and_grad through the custom VJP
     each for the sliced kernel (xs-stack scan, XLA materializes the
     per-step slice) and the indexed kernel (scalar-prefetch window),
     sweeping block_rows to test the DMA-amortization hypothesis.

    python scripts/indexed_cliff_probe.py [--steps 64] [--batch 32768]
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


def timed(fn, args, steps: int, batch: int, label: str, out: dict,
          repeats: int = 3) -> float:
    import jax

    import numpy as np

    def sync(res):
        # the axon client's block_until_ready does not wait for on-device
        # completion; a D2H fetch does.  Callers return SCALARS so the
        # transfer is bytes, and the one extra fetch dispatch (~15-20 ms)
        # is identical for every variant being compared.
        leaf = jax.tree_util.tree_leaves(res)[0]
        assert leaf.ndim == 0, "timed() expects scalar-returning programs"
        return np.asarray(leaf)

    sync(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per_step = best / steps
    acts = batch / per_step
    out[label] = {"ms_per_step": round(per_step * 1e3, 3),
                  "act_per_sec": round(acts, 1)}
    print(f"{label:42s} {per_step * 1e3:8.3f} ms/step  {acts:,.0f} act/s",
          file=sys.stderr, flush=True)
    return per_step


def trainer_ab(batch: int, steps: int, out: dict,
               data_dtype: str = "bf16") -> None:
    import jax
    import jax.numpy as jnp

    from whisper_sae_tpu.config import TrainingConfig
    from whisper_sae_tpu.models.sae import ReLUSAE, TopKSAE
    from whisper_sae_tpu.training.trainer import SAETrainer

    data = jax.random.normal(
        jax.random.PRNGKey(0), (steps * batch, D), jnp.float32
    )
    if data_dtype == "bf16":
        data = data.astype(jnp.bfloat16)

    for fam, make in (("relu", lambda: ReLUSAE(D, H, seed=0)),
                      ("topk", lambda: TopKSAE(D, H, k=K, seed=0))):
        for indexed in (False, True):
            os.environ["WST_INDEXED_EPOCH"] = "1" if indexed else "0"
            model = make()
            cfg = TrainingConfig(batch_size=batch, learning_rate=1e-4,
                                 epochs=1, warmup_steps=1000, use_amp=True)
            tr = SAETrainer(model, cfg, run_dir=Path("/tmp/wst_cliff"))
            tr.setup_scheduler(total_steps=steps * 10)
            tr.train_epoch_fused(data, shuffle=False)
            jax.block_until_ready(tr.model.params["w_enc"])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                tr.train_epochs_fused(data, epochs=2, shuffle=False)
                jax.block_until_ready(tr.model.params["w_enc"])
                best = min(best, (time.perf_counter() - t0) / (2 * steps))
            label = (
                f"trainer/{data_dtype}/{fam}/"
                f"{'indexed' if indexed else 'sliced'}"
            )
            out[label] = {"ms_per_step": round(best * 1e3, 3),
                          "act_per_sec": round(batch / best, 1)}
            print(f"{label:42s} {best * 1e3:8.3f} ms/step  "
                  f"{batch / best:,.0f} act/s", file=sys.stderr, flush=True)
    os.environ.pop("WST_INDEXED_EPOCH", None)


def standalone(batch: int, steps: int, out: dict, dtype_tag: str) -> None:
    import jax
    import jax.numpy as jnp

    from whisper_sae_tpu.ops import pallas_sae

    dtype = jnp.bfloat16 if dtype_tag == "bf16" else jnp.float32
    buf = jax.random.normal(
        jax.random.PRNGKey(0), (steps * batch, D), jnp.float32
    ).astype(dtype)
    stack = buf.reshape(steps, batch, D)
    params = {
        "w_enc": 0.01 * jax.random.normal(jax.random.PRNGKey(1), (D, H)),
        "b_enc": jnp.zeros((H,)),
        "w_dec": 0.01 * jax.random.normal(jax.random.PRNGKey(2), (H, D)),
        "b_dec": jnp.zeros((D,)),
    }
    sw = 0.01

    def relu_sliced_loss(p, x):
        return pallas_sae.fused_relu_sae_loss(
            x, p["w_enc"], p["b_enc"], p["w_dec"], p["b_dec"], sw,
            pallas_sae.pick_block_rows(batch, H, D),
        )[0]

    def make_relu_indexed_loss(block_rows):
        def loss(p, b, step):
            return pallas_sae.fused_relu_sae_loss_indexed(
                b, step, p["w_enc"], p["b_enc"], p["w_dec"], p["b_dec"],
                sw, block_rows, batch,
            )[0]
        return loss

    # ---- forward-only
    @jax.jit
    def fwd_sliced(p, st):
        def body(c, x):
            return c + relu_sliced_loss(p, x), None
        return jax.lax.scan(body, jnp.zeros(()), st)[0]

    timed(fwd_sliced, (params, stack), steps, batch,
          f"fwd/{dtype_tag}/relu/sliced", out)

    for br in (512, 1024, 2048):
        loss_fn = make_relu_indexed_loss(br)

        @jax.jit
        def fwd_indexed(p, b):
            def body(c, s):
                return c + loss_fn(p, b, s), None
            return jax.lax.scan(
                body, jnp.zeros(()), jnp.arange(steps, dtype=jnp.int32)
            )[0]

        timed(fwd_indexed, (params, buf), steps, batch,
              f"fwd/{dtype_tag}/relu/indexed_br{br}", out)

    # ---- forward + backward (+ sgd-style update so grads are consumed)
    @jax.jit
    def fb_sliced(p, st):
        def body(c, x):
            g = jax.grad(relu_sliced_loss)(c, x)
            return jax.tree_util.tree_map(lambda a, b: a - 1e-6 * b, c, g), None
        out_p = jax.lax.scan(body, p, st)[0]
        return out_p["w_enc"].sum()

    timed(fb_sliced, (params, stack), steps, batch,
          f"fwdbwd/{dtype_tag}/relu/sliced", out)

    for br in (512, 1024, 2048):
        loss_fn = make_relu_indexed_loss(br)

        @jax.jit
        def fb_indexed(p, b):
            def body(c, s):
                g = jax.grad(loss_fn)(c, b, s)
                return jax.tree_util.tree_map(
                    lambda a, bb: a - 1e-6 * bb, c, g
                ), None
            out_p = jax.lax.scan(
                body, p, jnp.arange(steps, dtype=jnp.int32)
            )[0]
            return out_p["w_enc"].sum()

        timed(fb_indexed, (params, buf), steps, batch,
              f"fwdbwd/{dtype_tag}/relu/indexed_br{br}", out)

    # ---- TopK SAE: the headline kernel (VERDICT r4 #5 — does indexed
    # win on f32 epoch buffers the way it does on bf16 stacks?)
    tparams = {**params, "b_pre": jnp.zeros((D,))}

    def topk_sliced_loss(p, x):
        return pallas_sae.fused_sae_loss(
            x, p["w_enc"], p["b_enc"], p["b_pre"], p["w_dec"], p["b_dec"],
            K, pallas_sae.pick_block_rows(batch, H, D),
        )[0]

    def make_topk_indexed_loss(block_rows):
        def loss(p, b, step):
            return pallas_sae.fused_sae_loss_indexed(
                b, step, p["w_enc"], p["b_enc"], p["b_pre"], p["w_dec"],
                p["b_dec"], K, block_rows, batch,
            )[0]
        return loss

    @jax.jit
    def topk_fb_sliced(p, st):
        def body(c, x):
            g = jax.grad(topk_sliced_loss)(c, x)
            return jax.tree_util.tree_map(lambda a, b: a - 1e-6 * b, c, g), None
        out_p = jax.lax.scan(body, p, st)[0]
        return out_p["w_enc"].sum()

    timed(topk_fb_sliced, (tparams, stack), steps, batch,
          f"fwdbwd/{dtype_tag}/topk/sliced", out)

    for br in (512, 1024, 2048):
        loss_fn = make_topk_indexed_loss(br)

        @jax.jit
        def topk_fb_indexed(p, b):
            def body(c, s):
                g = jax.grad(loss_fn)(c, b, s)
                return jax.tree_util.tree_map(
                    lambda a, bb: a - 1e-6 * bb, c, g
                ), None
            out_p = jax.lax.scan(
                body, p, jnp.arange(steps, dtype=jnp.int32)
            )[0]
            return out_p["w_enc"].sum()

        timed(topk_fb_indexed, (tparams, buf), steps, batch,
              f"fwdbwd/{dtype_tag}/topk/indexed_br{br}", out)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32768)
    parser.add_argument("--steps", type=int, default=64)
    parser.add_argument("--skip-trainer", action="store_true")
    parser.add_argument("--dtypes", default="bf16")
    parser.add_argument("--trainer-dtypes", default="bf16")
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    out: dict = {}
    if not args.skip_trainer:
        for tag in args.trainer_dtypes.split(","):
            trainer_ab(args.batch, args.steps, out, tag)
    for tag in args.dtypes.split(","):
        standalone(args.batch, args.steps, out, tag)
    blob = json.dumps(out, indent=2)
    print(blob)
    if args.out:
        Path(args.out).write_text(blob)


if __name__ == "__main__":
    main()
