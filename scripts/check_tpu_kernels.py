#!/usr/bin/env python3
"""On-chip kernel verification (run on the TPU; the unit suite runs CPU).

Checks, against the pure-XLA reference paths:
  1. Pallas bisection mask kernel      — bit-identical
  2. fused Pallas encode kernel        — fwd 1e-6, grads 1e-6 relative
  3. flash-attention encoder (bf16)    — 5e-2 absolute (bf16 noise)

    python scripts/check_tpu_kernels.py
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import whisper_sae_tpu.models.whisper as W
    from whisper_sae_tpu.models.sae import init_topk_sae
    from whisper_sae_tpu.ops.pallas_sae import fused_topk_encode
    from whisper_sae_tpu.ops.pallas_topk import topk_mask_pallas
    from whisper_sae_tpu.ops.topk import topk_threshold

    assert jax.default_backend() != "cpu", "run this on the TPU backend"
    B, D, H, K = 4096, 384, 3072, 32
    params = init_topk_sae(jax.random.PRNGKey(0), D, H)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.float32)
    pre = jax.random.normal(jax.random.PRNGKey(2), (B, H), jnp.float32)

    # 1. mask kernel
    def xla_mask(p):
        xi, th = topk_threshold(p, K)
        return jnp.where(xi >= th, jax.nn.relu(p), 0.0)

    a = np.asarray(jax.jit(lambda p: topk_mask_pallas(p, K, 128))(pre))
    b = np.asarray(jax.jit(xla_mask)(pre))
    assert np.array_equal(a, b), "mask kernel mismatch"
    print("1. pallas bisection mask: bit-identical to XLA")

    # 2. fused encode fwd + grads
    bf = jnp.bfloat16

    def xla_encode(p, x):
        prev = (
            jnp.dot(
                (x - p["b_pre"]).astype(bf), p["w_enc"].astype(bf),
                preferred_element_type=jnp.float32,
            )
            + p["b_enc"]
        )
        return xla_mask(prev)

    got = np.asarray(
        jax.jit(
            lambda p, x: fused_topk_encode(
                x, p["w_enc"], p["b_enc"], p["b_pre"], K, 512, jnp.float32
            )
        )(params, x)
    )
    want = np.asarray(jax.jit(xla_encode)(params, x))
    fwd_diff = np.abs(got - want).max()
    assert fwd_diff < 1e-5, f"fused encode fwd diff {fwd_diff}"

    def loss_fused(p, x):
        h = fused_topk_encode(x, p["w_enc"], p["b_enc"], p["b_pre"], K, 512, jnp.float32)
        return jnp.mean(jnp.square(h @ p["w_dec"] - x))

    def loss_xla(p, x):
        return jnp.mean(jnp.square(xla_encode(p, x) @ p["w_dec"] - x))

    g1 = jax.jit(jax.grad(loss_fused))(params, x)
    g2 = jax.jit(jax.grad(loss_xla))(params, x)
    # b_pre's cotangent is a batch-sum of near-symmetric terms
    # (cancellation-dominated), so its relative tolerance under bf16
    # matmul ordering is inherently looser.
    for key, tol in (("w_enc", 1e-3), ("b_enc", 1e-3), ("b_pre", 1e-2)):
        d = np.abs(np.asarray(g1[key]) - np.asarray(g2[key])).max()
        scale = np.abs(np.asarray(g2[key])).max() + 1e-12
        assert d / scale < tol, f"grad {key} rel diff {d/scale}"
    print(f"2. fused encode kernel: fwd diff {fwd_diff:.1e}, grads match")

    # 2c. fused loss kernel (encode + decode + loss/l0/active in one pass)
    from whisper_sae_tpu.models.sae import topk_sae_apply
    from whisper_sae_tpu.ops.pallas_sae import fused_loss_supported, fused_sae_loss

    assert fused_loss_supported(x.shape, H)

    def fused_loss(p, x):
        return fused_sae_loss(
            x, p["w_enc"], p["b_enc"], p["b_pre"], p["w_dec"], p["b_dec"], K, 512
        )

    def xla_loss(p, x):
        out, active = topk_sae_apply(p, x, K, bf)
        return out.loss, out.l0, active

    lf, l0f, actf = jax.jit(fused_loss)(params, x)
    lx, l0x, actx = jax.jit(xla_loss)(params, x)
    assert abs(float(lf) - float(lx)) / abs(float(lx)) < 1e-5, (lf, lx)
    assert float(l0f) == float(l0x), (l0f, l0x)
    assert bool(jnp.all(actf == actx)), "active mask mismatch"
    gf = jax.jit(jax.grad(lambda p, x: fused_loss(p, x)[0]))(params, x)
    gx = jax.jit(jax.grad(lambda p, x: xla_loss(p, x)[0]))(params, x)
    for key, tol in (
        ("w_enc", 1e-3), ("b_enc", 1e-3), ("w_dec", 1e-3),
        ("b_dec", 1e-3), ("b_pre", 1e-2),
    ):
        dd = np.abs(np.asarray(gf[key]) - np.asarray(gx[key])).max()
        scale = np.abs(np.asarray(gx[key])).max() + 1e-12
        assert dd / scale < tol, f"fused-loss grad {key} rel diff {dd/scale}"
    print(
        f"2c. fused loss kernel: loss rel "
        f"{abs(float(lf)-float(lx))/abs(float(lx)):.1e}, l0/active exact, grads match"
    )

    # 2c-guard: the fused-loss gate must budget BOTH weight matrices —
    # D=1536/H=15616 fits w_enc alone (45.75 MB) but not w_enc+w_dec,
    # and used to pass the gate then fail to compile
    from whisper_sae_tpu.ops.pallas_sae import supported as _enc_supported

    assert _enc_supported((4096, 1536), 15616)
    assert not fused_loss_supported((4096, 1536), 15616)
    print("2c-guard: two-matrix VMEM budget rejects D=1536/H=15616")

    # 2c-idx. scalar-prefetch indexed fused loss: the epoch-scan variant
    # that reads its batch window straight from the [N, D] epoch buffer
    # must be bit-identical (loss, metrics, grads) to fused_sae_loss on
    # the explicit slice — per window, and under a lax.scan over the step
    # index (the trainer's indexed-epoch shape)
    from whisper_sae_tpu.ops.pallas_sae import fused_sae_loss_indexed

    x2 = jax.random.normal(jax.random.PRNGKey(21), (B, D), jnp.float32)
    buf = jnp.concatenate([x, x2])

    def idx_loss(p, step):
        return fused_sae_loss_indexed(
            buf, step, p["w_enc"], p["b_enc"], p["b_pre"], p["w_dec"],
            p["b_dec"], K, 512, B,
        )

    for step, rows in ((0, x), (1, x2)):
        li, l0i, acti = jax.jit(idx_loss)(params, jnp.int32(step))
        ls, l0s, acts = jax.jit(fused_loss)(params, rows)
        assert float(li) == float(ls), (step, li, ls)
        assert float(l0i) == float(l0s) and bool(jnp.all(acti == acts))
        gi = jax.jit(jax.grad(lambda p, s: idx_loss(p, s)[0]))(
            params, jnp.int32(step)
        )
        gs = jax.jit(jax.grad(lambda p, r: fused_loss(p, r)[0]))(params, rows)
        for key in gs:
            assert np.array_equal(np.asarray(gi[key]), np.asarray(gs[key])), (
                f"indexed grad {key} differs at step {step}"
            )

    def scan_losses(p):
        def body(c, s):
            return c, idx_loss(p, s)[0]

        return jax.lax.scan(body, 0, jnp.arange(2, dtype=jnp.int32))[1]

    sl = jax.jit(scan_losses)(params)
    assert float(sl[0]) == float(jax.jit(fused_loss)(params, x)[0])
    assert float(sl[1]) == float(jax.jit(fused_loss)(params, x2)[0])
    print("2c-idx. indexed fused loss: bit-identical to sliced, scan-safe")

    # 2d. fused transcoder loss kernel (TopK and Skip variants) vs the
    # composed XLA path at the same bf16 compute dtype
    from whisper_sae_tpu.models.transcoder import (
        init_skip_transcoder,
        init_topk_transcoder,
        transcoder_loss,
    )
    from whisper_sae_tpu.ops.pallas_sae import fused_coder_supported

    y = jax.random.normal(jax.random.PRNGKey(7), (B, D), jnp.float32)
    for use_skip, init in ((False, init_topk_transcoder), (True, init_skip_transcoder)):
        tp = init(jax.random.PRNGKey(8), D, D, H)
        if use_skip:
            # zero-init decoder/skip makes the loss constant; randomize so
            # gradients exercise every path
            tp = {
                key: jax.random.normal(jax.random.PRNGKey(9 + i), v.shape) * 0.05
                for i, (key, v) in enumerate(tp.items())
            }
        assert fused_coder_supported(x.shape, D, H, with_skip=use_skip)

        def tl(p, x, y):
            return transcoder_loss(p, x, y, K, bf, use_skip=use_skip)

        def tl_xla(p, x, y):
            # force the composed path by pretending the kernel is absent
            prev = (
                jnp.dot(x.astype(bf), p["w_enc"].astype(bf),
                        preferred_element_type=jnp.float32) + p["b_enc"]
            )
            hidden = xla_mask(prev)
            pred = (
                jnp.dot(hidden.astype(bf), p["w_dec"].astype(bf),
                        preferred_element_type=jnp.float32) + p["b_dec"]
            )
            if use_skip:
                pred = pred + (
                    jnp.dot(x.astype(bf), p["w_skip"].astype(bf),
                            preferred_element_type=jnp.float32) + p["b_skip"]
                )
            loss = jnp.mean(jnp.square(pred - y))
            l0 = jnp.mean(jnp.sum(hidden > 0, axis=-1).astype(jnp.float32))
            return loss, {"l0": l0, "active": jnp.any(hidden > 0, axis=0)}

        (lf, auxf) = jax.jit(tl)(tp, x, y)
        (lx, auxx) = jax.jit(tl_xla)(tp, x, y)
        assert abs(float(lf) - float(lx)) / (abs(float(lx)) + 1e-12) < 1e-4, (lf, lx)
        assert float(auxf["l0"]) == float(auxx["l0"])
        assert bool(jnp.all(auxf["active"] == auxx["active"]))
        gf = jax.jit(jax.grad(lambda p, x, y: tl(p, x, y)[0]))(tp, x, y)
        gx = jax.jit(jax.grad(lambda p, x, y: tl_xla(p, x, y)[0]))(tp, x, y)
        for key in gx:
            dd = np.abs(np.asarray(gf[key]) - np.asarray(gx[key])).max()
            scale = np.abs(np.asarray(gx[key])).max() + 1e-12
            assert dd / scale < 3e-3, f"transcoder grad {key} rel {dd/scale} (skip={use_skip})"
        print(
            f"2d. fused transcoder loss (skip={use_skip}): loss rel "
            f"{abs(float(lf)-float(lx))/abs(float(lx)):.1e}, l0/active exact, grads match"
        )

    # 2f. fused ReLU+L1 SAE loss kernel vs composed XLA bf16 path
    from whisper_sae_tpu.models.sae import init_relu_sae, relu_sae_apply, relu_sae_loss

    rp = init_relu_sae(jax.random.PRNGKey(12), D, H)
    SW = 0.01

    def rl(p, x):
        return relu_sae_loss(p, x, SW, bf)

    def rl_xla(p, x):
        out, active = relu_sae_apply(p, x, SW, bf)
        return out.loss, {
            "reconstruction_loss": out.reconstruction_loss,
            "sparsity_loss": out.sparsity_loss,
            "l0": out.l0, "active": active,
        }

    lf, auxf = jax.jit(rl)(rp, x)
    lx, auxx = jax.jit(rl_xla)(rp, x)
    assert abs(float(lf) - float(lx)) / abs(float(lx)) < 1e-4, (lf, lx)
    for key in ("reconstruction_loss", "sparsity_loss"):
        assert abs(float(auxf[key]) - float(auxx[key])) / (
            abs(float(auxx[key])) + 1e-12
        ) < 1e-4, key
    assert float(auxf["l0"]) == float(auxx["l0"])
    assert bool(jnp.all(auxf["active"] == auxx["active"]))
    gf = jax.jit(jax.grad(lambda p, x: rl(p, x)[0]))(rp, x)
    gx = jax.jit(jax.grad(lambda p, x: rl_xla(p, x)[0]))(rp, x)
    for key in gx:
        dd = np.abs(np.asarray(gf[key]) - np.asarray(gx[key])).max()
        scale = np.abs(np.asarray(gx[key])).max() + 1e-12
        assert dd / scale < 3e-3, f"relu-sae grad {key} rel {dd/scale}"
    print(
        f"2f. fused ReLU+L1 SAE loss: loss rel "
        f"{abs(float(lf)-float(lx))/abs(float(lx)):.1e}, l0/active exact, grads match"
    )

    # 2e. crosscoder AMP fully-fused loss (the flattened [B, L*D] view is
    # exactly a transcoder with y = x; loss = L x flat MSE) vs the
    # composed XLA bf16 path
    from whisper_sae_tpu.models.crosscoder import (
        crosscoder_decode,
        crosscoder_encode_pre,
        crosscoder_loss,
        init_crosscoder,
    )

    L, S = 4, H
    cp = init_crosscoder(jax.random.PRNGKey(10), D, L, S)
    cacts = jax.random.normal(jax.random.PRNGKey(11), (L, 1024, D), jnp.float32)

    def cc(p, a):
        return crosscoder_loss(p, a, k=K, compute_dtype=bf)

    def cc_xla(p, a):
        prev = crosscoder_encode_pre(p, a, bf)
        hidden = xla_mask(prev)
        recon = crosscoder_decode(p, hidden.astype(bf), bf)
        per_layer = jnp.mean(jnp.square(recon - a), axis=(1, 2))
        loss = jnp.sum(per_layer)
        return loss, {
            "l0": jnp.mean(jnp.sum(hidden > 0, axis=-1).astype(jnp.float32)),
            "active": jnp.any(hidden > 0, axis=0),
        }

    lf, auxf = jax.jit(cc)(cp, cacts)
    lx, auxx = jax.jit(cc_xla)(cp, cacts)
    assert abs(float(lf) - float(lx)) / (abs(float(lx)) + 1e-12) < 1e-4, (lf, lx)
    assert float(auxf["l0"]) == float(auxx["l0"])
    assert bool(jnp.all(auxf["active"] == auxx["active"]))
    gf = jax.jit(jax.grad(lambda p, a: cc(p, a)[0]))(cp, cacts)
    gx = jax.jit(jax.grad(lambda p, a: cc_xla(p, a)[0]))(cp, cacts)
    for key in ("w_enc", "b_enc", "w_dec", "b_dec"):
        dd = np.abs(np.asarray(gf[key]) - np.asarray(gx[key])).max()
        scale = np.abs(np.asarray(gx[key])).max() + 1e-12
        assert dd / scale < 3e-3, f"crosscoder grad {key} rel {dd/scale}"
    print(
        f"2e. crosscoder AMP fully-fused loss: loss rel "
        f"{abs(float(lf)-float(lx))/abs(float(lx)):.1e}, l0/active exact, grads match"
    )

    # 2g. ReLU-crosscoder fused loss (decoder-norm-weighted L1 via the
    # per-feature hidden-sum accumulator + differentiable norms input) vs
    # the composed XLA bf16 path — the last coder family to be fused
    from whisper_sae_tpu.models.crosscoder import decoder_norms

    def ccr(p, a):
        return crosscoder_loss(p, a, k=None, sparsity_weight=0.02, compute_dtype=bf)

    def ccr_xla(p, a):
        prev = crosscoder_encode_pre(p, a, bf)
        hidden = jax.nn.relu(prev)
        recon = crosscoder_decode(p, hidden.astype(bf), bf)
        recon_loss = jnp.sum(jnp.mean(jnp.square(recon - a), axis=(1, 2)))
        sparsity = jnp.mean(jnp.abs(hidden) @ decoder_norms(p))
        return recon_loss + 0.02 * sparsity, {
            "reconstruction_loss": recon_loss, "sparsity_loss": sparsity,
            "l0": jnp.mean(jnp.sum(hidden > 0, axis=-1).astype(jnp.float32)),
            "active": jnp.any(hidden > 0, axis=0),
        }

    lf, auxf = jax.jit(ccr)(cp, cacts)
    lx, auxx = jax.jit(ccr_xla)(cp, cacts)
    assert abs(float(lf) - float(lx)) / (abs(float(lx)) + 1e-12) < 1e-4, (lf, lx)
    for key in ("reconstruction_loss", "sparsity_loss"):
        assert abs(float(auxf[key]) - float(auxx[key])) / (
            abs(float(auxx[key])) + 1e-12
        ) < 2e-4, key
    assert float(auxf["l0"]) == float(auxx["l0"])
    assert bool(jnp.all(auxf["active"] == auxx["active"]))
    gf = jax.jit(jax.grad(lambda p, a: ccr(p, a)[0]))(cp, cacts)
    gx = jax.jit(jax.grad(lambda p, a: ccr_xla(p, a)[0]))(cp, cacts)
    for key in ("w_enc", "b_enc", "w_dec", "b_dec"):
        dd = np.abs(np.asarray(gf[key]) - np.asarray(gx[key])).max()
        scale = np.abs(np.asarray(gx[key])).max() + 1e-12
        assert dd / scale < 3e-3, f"relu-crosscoder grad {key} rel {dd/scale}"
    print(
        f"2g. ReLU-crosscoder fused loss: loss rel "
        f"{abs(float(lf)-float(lx))/abs(float(lx)):.1e}, l0/active exact, grads match"
    )

    # 2b. blocked large-H encode (w_enc streamed through VMEM in tiles;
    # whisper-large 32x geometry) — selection must stay bit-identical
    from whisper_sae_tpu.ops.pallas_sae import pick_block_rows, uses_blocked

    Bl, Dl, Hl = 512, 1280, 40960
    assert uses_blocked((Bl, Dl), Hl)
    pl_ = init_topk_sae(jax.random.PRNGKey(5), Dl, Hl)
    xl = jax.random.normal(jax.random.PRNGKey(6), (Bl, Dl), jnp.float32)
    got = np.asarray(
        jax.jit(
            lambda p, x: fused_topk_encode(
                x, p["w_enc"], p["b_enc"], p["b_pre"], K,
                pick_block_rows(Bl, Hl, Dl), jnp.float32,
            )
        )(pl_, xl)
    )
    want = np.asarray(jax.jit(xla_encode)(pl_, xl))
    # different MXU tilings associate the f32 accumulation differently, so
    # values may differ by ~1 ulp; the SELECTION must agree exactly
    assert np.array_equal(got > 0, want > 0), "blocked encode selection mismatch"
    d = np.abs(got - want).max()
    assert d < 1e-5, f"blocked encode value diff {d}"
    print(f"2b. blocked large-H encode (H=40960): selection exact, values {d:.1e}")

    # 3. flash attention vs XLA attention (bf16)
    arch = W.WhisperArch(
        d_model=384, encoder_layers=2, decoder_layers=1, num_heads=6,
        ffn_dim=1536, max_source_positions=1500, max_target_positions=8,
        vocab_size=100, decoder_start_token_id=1,
    )
    wp = W.init_whisper(jax.random.PRNGKey(3), arch)
    wp16 = jax.tree_util.tree_map(
        lambda a: a.astype(bf) if a.dtype == jnp.float32 else a, wp
    )
    mel = jax.random.normal(jax.random.PRNGKey(4), (2, 80, 3000), bf)

    orig = W._use_flash_attention
    orig_fused = W._use_fused_encoder
    W._use_flash_attention = lambda *a: False
    W._use_fused_encoder = lambda *a: False
    ref = np.asarray(
        jax.jit(lambda p, m: W.encoder_forward(p, m, arch)[0] + 0.0)(wp16, mel)
    )
    W._use_flash_attention = orig
    got = np.asarray(
        jax.jit(lambda p, m: W.encoder_forward(p, m, arch)[0] * 1.0)(wp16, mel)
    )
    d = float(np.abs(got.astype(np.float32) - ref.astype(np.float32)).max())
    # ~1% of activation scale: bf16 rounding noise (the XLA-bf16 reference
    # itself deviates from f32 truth by a similar amount)
    assert d < 5e-2, f"flash attention diff {d}"
    print(f"3. flash attention (bf16): max diff {d:.1e} vs XLA attention")

    # 4. fused encoder layer blocks (LN+attn+residual / LN+MLP+residual
    # pallas kernels, ops/pallas_encoder.py) vs the composed bf16 stack,
    # including the captured (mlp_in, mlp_out) transcoder pair
    W._use_fused_encoder = lambda *a: False
    ref3 = jax.jit(
        lambda p, m: W.encoder_forward(p, m, arch, with_mlp=True)
    )(wp16, mel)
    W._use_fused_encoder = orig_fused
    assert orig_fused(1500, arch), "fused encoder gate should be on-TPU true"
    got3 = jax.jit(
        lambda p, m: W.encoder_forward(p, m, arch, with_mlp=True)
    )(wp16, mel)
    names = ["last", "layers", "mlp_in", "mlp_out"]
    flat_ref = [ref3[0], ref3[1], ref3[2][0], ref3[2][1]]
    flat_got = [got3[0], got3[1], got3[2][0], got3[2][1]]
    worst = 0.0
    for name, r, g in zip(names, flat_ref, flat_got):
        dd = float(
            np.abs(
                np.asarray(g).astype(np.float32) - np.asarray(r).astype(np.float32)
            ).max()
        )
        assert dd < 6e-2, f"fused encoder {name} diff {dd}"
        worst = max(worst, dd)
    print(f"4. fused encoder blocks (bf16): max diff {worst:.1e} vs composed stack")

    # 4b. in-kernel capture final-LN fold: extract_activations' LN'd bf16
    # captures must be BYTE-identical to LN-ing the same fused forward's
    # raw captures externally (the pre-fold pipeline) — same kernels, so
    # equality is exact, not a tolerance
    acts = jax.jit(
        lambda p, m: W.extract_activations(
            p, m, arch, compute_dtype=bf, capture_dtype=bf
        )
    )(wp, mel.astype(jnp.float32))
    raw_last, raw_layers = jax.jit(
        lambda p, m: W.encoder_forward(p, m, arch)
    )(wp16, mel)
    g32 = wp16["encoder"]["ln_f_g"].astype(jnp.float32)
    b32 = wp16["encoder"]["ln_f_b"].astype(jnp.float32)
    want_enc = np.asarray(W._layer_norm(raw_layers.astype(bf), g32, b32), np.float32)
    got_enc = np.asarray(acts["encoder"], np.float32)
    assert np.array_equal(got_enc, want_enc), "capture final-LN fold not byte-identical"
    assert np.array_equal(
        np.asarray(acts["encoder_last"], np.float32),
        np.asarray(raw_last, np.float32).astype(np.float32),
    ), "encoder_last (last LN'd capture) mismatch"
    print("4b. capture final-LN fold: byte-identical to external LN")

    # 5. large-v3 geometry through the fused encoder blocks: d_model=1280,
    # 20 heads, ffn 5120, n_mels=128 (the 128-bin conv stem).  The VMEM
    # budgets in _pick_attention_gb / the MLP row picker were derived at
    # tiny geometry; this pins that the kernels actually fit and match the
    # composed bf16 stack at whisper-large scale (layer count reduced to 2
    # to bound compile time — per-layer shapes are what matter).
    arch_l = W.WhisperArch(
        d_model=1280, encoder_layers=2, decoder_layers=1, num_heads=20,
        ffn_dim=5120, n_mels=128, max_source_positions=1500,
        max_target_positions=8, vocab_size=100, decoder_start_token_id=1,
    )
    wl = W.init_whisper(jax.random.PRNGKey(5), arch_l)
    wl16 = jax.tree_util.tree_map(
        lambda a: a.astype(bf) if a.dtype == jnp.float32 else a, wl
    )
    mel_l = jax.random.normal(jax.random.PRNGKey(6), (2, 128, 3000), bf)
    # guard against the check passing vacuously: the fused gates must
    # actually accept large-v3 geometry, or both sides below would take
    # the composed path and diff 0 proves nothing (ADVICE r3)
    assert orig_fused(1500, arch_l), \
        "fused encoder gate should accept large-v3 geometry"
    from whisper_sae_tpu.ops import pallas_encoder as _pe
    assert _pe.stem_supported(128, 3000, 1280), \
        "fused conv stem gate should accept large-v3 geometry"
    # the attention sublayer must take the query-row-TILED kernel here:
    # the full kernel's live set spills past VMEM at d=1280 (measured
    # 171 MB), and if neither variant engaged the stack would silently
    # run composed flash attention — still correct, but this check is
    # also the compile proof for the tiled kernel at large-v3 scale
    assert not _pe.attention_supported(1536, 1280, 20), \
        "full attention kernel should NOT claim large-v3 (VMEM spill)"
    assert _pe._pick_attention_tq(1536, 1280) is not None, \
        "query-row-tiled attention should fit large-v3 geometry"
    W._use_fused_encoder = lambda *a: False  # also gates the fused stem
    ref_l = jax.jit(
        lambda p, m: W.encoder_forward(p, m, arch_l, with_mlp=True)
    )(wl16, mel_l)
    W._use_fused_encoder = orig_fused
    got_l = jax.jit(
        lambda p, m: W.encoder_forward(p, m, arch_l, with_mlp=True)
    )(wl16, mel_l)
    flat_ref = [ref_l[0], ref_l[1], ref_l[2][0], ref_l[2][1]]
    flat_got = [got_l[0], got_l[1], got_l[2][0], got_l[2][1]]
    worst_l = 0.0
    for name, r, g in zip(names, flat_ref, flat_got):
        dd = float(
            np.abs(
                np.asarray(g).astype(np.float32) - np.asarray(r).astype(np.float32)
            ).max()
        )
        # wider than check 4's 6e-2: reductions are 3.3x longer (d=1280)
        # and the composed bf16 reference carries its own rounding
        assert dd < 1.5e-1, f"fused encoder large-v3 {name} diff {dd}"
        worst_l = max(worst_l, dd)
    print(f"5. fused encoder at large-v3 geometry: max diff {worst_l:.1e}")
    print("all TPU kernel checks passed")


if __name__ == "__main__":
    main()
