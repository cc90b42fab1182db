"""Fused Whisper-encoder layer blocks: LN + attention + residual and
LN + MLP + residual as single Pallas kernels.

Why: extraction on TPU is HBM-traffic-bound, not FLOP-bound.  The
unfused bf16 encoder layer streams ~1.6 GB/layer per 64-clip batch
through HBM (LN round-trips, separate q/k/v projections, head-split
transposes into a [B, h, T, 64] layout whose 64-wide minor dim wastes
half of every lane tile, [T, T] score materialization or flash-kernel
staging, the [B, T, F] MLP hidden round-trips).  Measured on one v5e,
the attention sublayer alone costs ~8.5-12 ms/layer-batch while a
pure-copy kernel over the same blocks costs 5.4 ms — it is almost all
data movement.  These kernels keep every intermediate in VMEM:

- ``fused_attention_block``: per batch item (grid (B,)), one kernel
  computes LN1 -> q/k/v projections -> per-head full-row softmax
  attention (heads sliced from the folded [T, D] layout, never
  transposed) -> output projection -> residual add.  HBM traffic is
  one [T, D] bf16 read + one write.
- ``fused_mlp_block``: per row block (grid (N/rows,)), LN2 -> fc1 ->
  exact (erf) GELU -> fc2 -> residual in one pass; the [rows, F]
  hidden never leaves VMEM.  Optionally emits (mlp_in, mlp_out) for
  transcoder capture.

Numerics match the composed bf16 XLA path (LN/softmax/GELU internals
in f32, matmuls bf16 with f32 accumulation) to bf16 rounding; the f32
parity mode never routes here.  Forward-only (extraction/analysis);
training never differentiates through Whisper (reference freezes it,
train.py:267-299).

Replaces the per-op composition of the reference's hook-based capture
path (reference src/whisper_sae/sae/hooks.py:146-210) on the hot
extraction path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Kernel dots are bf16-input MXU matmuls BY DESIGN (AMP); pin DEFAULT so a
# global jax_default_matmul_precision override (e.g. "highest" for true-f32
# XLA dots — TrainingConfig.matmul_precision) cannot attach an fp32
# contract precision to bf16 operands, which Mosaic rejects ("Bad lhs
# type") and which would silently change kernel numerics if it didn't.
_MXU = jax.lax.Precision.DEFAULT
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sae import pick_block_rows

LN_EPS = 1e-5


def _ln_f32(x32, g_ref, b_ref):
    """Row layer norm on an f32 value; params broadcast from [1, D]."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + LN_EPS) * g_ref[:] + b_ref[:]


# erf(x) ~ x * P(x^2) on |x| <= 3.2 (input clamped there; the tail
# error is erf(3.2)-1 = 6e-6): degree-9 Chebyshev-basis least-squares
# fit converted to a monomial Horner in um = 2(x/c)^2 - 1.  Max abs
# error 3.4e-5 in f32, i.e. GELU relative error ~1.7e-5 — two decades
# below the bf16 rounding the fused path's outputs carry anyway.
_ERF_C = 3.2
_ERF_COEF = tuple(
    np.float32(v)
    for v in (
        4.413373198e-01, -2.172908431e-01, 1.541706128e-01,
        -1.139210725e-01, 8.231898958e-02, -5.355258433e-02,
        2.784444594e-02, -1.701632985e-02, 1.473827865e-02,
        -6.139343742e-03,
    )
)


def _erf_f32(x):
    """erf for Mosaic (no native lowering) as a transcendental-free odd
    polynomial — mul/add/min only, no exp and no divide.  The previous
    Abramowitz-Stegun 7.1.26 form (exp + divide + poly) measured ~1.3 ms
    per 151M-element GELU sweep on one v5e; this evaluates in ~half the
    VPU ops.  Accuracy 3.4e-5 abs (see _ERF_COEF), three decades under
    bf16 rounding."""
    ax = jnp.minimum(jnp.abs(x), np.float32(_ERF_C))
    um = ax * ax * np.float32(2.0 / (_ERF_C * _ERF_C)) + np.float32(-1.0)
    r = _ERF_COEF[-1]
    for m in _ERF_COEF[-2::-1]:
        r = r * um + m
    y = ax * r
    return jnp.where(x < 0, -y, y)


# ---------------------------------------------------------------------------
# attention block
# ---------------------------------------------------------------------------


# Mosaic materializes the kernel's live vregs in VMEM; measured on a
# v5e at d=1280/t_pad=1536 the full attention kernel's actual scoped
# requirement is ~2.73x the naive live-set model (171 MB vs 62.7 MB
# modeled — register-allocator spill slots dominate with the unrolled
# per-head loop).  Both gates below budget on 2.75x their model.
_VMEM_SPILL_FACTOR = 2.75
_VMEM_BUDGET = 128 * 1024 * 1024


def attention_supported(t_pad: int, d: int, n_heads: int) -> bool:
    """Does the FULL (whole-sequence-live) attention kernel fit VMEM?
    True for whisper tiny/base/small; medium/large route to the
    query-row-tiled variant (``_pick_attention_tq``)."""
    del n_heads  # the [T, T] score scratch is per-head already
    modeled = 9 * t_pad * d * 2 + t_pad * t_pad * 6 + 4 * d * d * 2
    return _VMEM_SPILL_FACTOR * modeled <= _VMEM_BUDGET


def _pick_attention_tq(t_pad: int, d: int) -> int | None:
    """Query-row tile for the tiled attention kernel: the largest tile
    whose modeled live set (xln/k/v whole + weights + one tile's
    q/scores/probs/out + double-buffered in/out windows) fits the
    spill-adjusted budget.  None if even 128 rows don't fit.
    ``WST_ATTENTION_TQ`` forces a value for A/B and tests."""
    import os

    forced = os.environ.get("WST_ATTENTION_TQ")
    if forced:
        tq = int(forced)
        return tq if tq >= 1 and t_pad % tq == 0 else None
    for tq in (512, 256, 128):
        if t_pad % tq:
            continue
        modeled = (
            3 * t_pad * d * 2        # xln, k, v live across all tiles
            + 4 * d * d * 2          # weights
            + 2 * tq * t_pad * 4     # scores + probs (f32, per head, reused)
            + 3 * tq * d * 2         # q/attn/y tiles
            + 4 * t_pad * d * 2      # in+out windows, double-buffered
        )
        if _VMEM_SPILL_FACTOR * modeled <= _VMEM_BUDGET:
            return tq
    return None


def attention_block_available(t_pad: int, d: int, n_heads: int) -> bool:
    """Some fused attention variant (full or row-tiled) fits at this
    geometry; otherwise the encoder stack runs the attention sublayer
    as composed XLA (flash) between the fused MLP kernels."""
    return attention_supported(t_pad, d, n_heads) or (
        _pick_attention_tq(t_pad, d) is not None
    )


def _pick_attention_gb(b: int, t_pad: int, d: int) -> int:
    """Clips per grid iteration for the fused attention block.

    2 when the doubled working set stays within the VMEM budget (the
    block in/out buffers and the live per-clip intermediates scale with
    gb; the [T, T] score scratch and the weights do not) and the batch
    divides evenly; 1 otherwise.  ``WST_ATTENTION_GB`` forces a value
    for A/B measurement."""
    import os

    forced = os.environ.get("WST_ATTENTION_GB")
    if forced:
        g = int(forced)
        return g if g >= 1 and b % g == 0 else 1
    if b % 2:
        return 1
    # per-clip live bf16 intermediates (x, xln, q, k, v, attn, y) plus
    # double-buffered in/out blocks; scores f32 + probs bf16 shared
    per_clip = 9 * t_pad * d * 2
    fixed = t_pad * t_pad * 6 + 4 * d * d * 2
    return 2 if 2 * per_clip + fixed <= 90 * 1024 * 1024 else 1


def _attention_block_kernel(
    x_ref, g_ref, b_ref, wq_ref, bq_ref, wk_ref, wv_ref, bv_ref,
    wo_ref, bo_ref, o_ref, *, n_heads: int, head_dim: int, t_real: int,
    scale: float, gb: int,
):
    for i in range(gb):
        xb = x_ref[i]  # [T_pad, D] bf16
        xln = _ln_f32(xb.astype(jnp.float32), g_ref, b_ref).astype(jnp.bfloat16)

        q = (
            jnp.dot(xln, wq_ref[:], preferred_element_type=jnp.float32, precision=_MXU)
            + bq_ref[:]
        ) * scale
        q = q.astype(jnp.bfloat16)
        k = jnp.dot(xln, wk_ref[:], preferred_element_type=jnp.float32, precision=_MXU).astype(
            jnp.bfloat16
        )
        v = (
            jnp.dot(xln, wv_ref[:], preferred_element_type=jnp.float32, precision=_MXU)
            + bv_ref[:]
        ).astype(jnp.bfloat16)

        outs = []
        col = None
        for h in range(n_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            s = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_MXU,
            )  # [T_pad, T_pad]
            if col is None:
                col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            # mask pad KEY columns; -1e30 (not -inf) keeps pad QUERY rows
            # finite (they are sliced off by the caller)
            s = jnp.where(col < t_real, s, -1e30)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_MXU,
            )
            outs.append((o / denom).astype(jnp.bfloat16))
        attn = jnp.concatenate(outs, axis=1)  # [T_pad, D]

        y = (
            jnp.dot(attn, wo_ref[:], preferred_element_type=jnp.float32, precision=_MXU)
            + bo_ref[:]
        ).astype(jnp.bfloat16)
        o_ref[i] = xb + y


def _attention_block_kernel_tiled(
    x_ref, g_ref, b_ref, wq_ref, bq_ref, wk_ref, wv_ref, bv_ref,
    wo_ref, bo_ref, o_ref, *, n_heads: int, head_dim: int, t_real: int,
    scale: float, tq: int,
):
    """Query-row-tiled attention body (one clip per grid step): K/V are
    computed whole, queries/scores/outputs stream through [tq, ...]
    tiles so the live set no longer scales with 9 x T x D — the variant
    that fits whisper medium/large (the full kernel spills past VMEM
    there).  Identical math per row: softmax rows are independent."""
    xb = x_ref[0]  # [T_pad, D] bf16
    t_pad = xb.shape[0]
    d = xb.shape[1]
    xln = _ln_f32(xb.astype(jnp.float32), g_ref, b_ref).astype(jnp.bfloat16)
    k = jnp.dot(xln, wk_ref[:], preferred_element_type=jnp.float32, precision=_MXU).astype(
        jnp.bfloat16
    )
    v = (
        jnp.dot(xln, wv_ref[:], preferred_element_type=jnp.float32, precision=_MXU) + bv_ref[:]
    ).astype(jnp.bfloat16)
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, t_pad), 1)
    for r0 in range(0, t_pad, tq):
        xln_t = jax.lax.slice(xln, (r0, 0), (r0 + tq, d))
        q_t = (
            (
                jnp.dot(xln_t, wq_ref[:], preferred_element_type=jnp.float32, precision=_MXU)
                + bq_ref[:]
            )
            * scale
        ).astype(jnp.bfloat16)
        outs = []
        for h in range(n_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            s = jax.lax.dot_general(
                q_t[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_MXU,
            )  # [tq, T_pad]
            s = jnp.where(col < t_real, s, -1e30)
            m = jnp.max(s, axis=1, keepdims=True)
            p_ = jnp.exp(s - m)
            denom = jnp.sum(p_, axis=1, keepdims=True)
            o = jax.lax.dot_general(
                p_.astype(jnp.bfloat16), v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_MXU,
            )
            outs.append((o / denom).astype(jnp.bfloat16))
        attn_t = jnp.concatenate(outs, axis=1)  # [tq, D]
        y_t = (
            jnp.dot(attn_t, wo_ref[:], preferred_element_type=jnp.float32, precision=_MXU)
            + bo_ref[:]
        ).astype(jnp.bfloat16)
        o_ref[0, r0:r0 + tq] = jax.lax.slice(xb, (r0, 0), (r0 + tq, d)) + y_t


def fused_attention_block(
    x: jax.Array,
    ln_g: jax.Array,
    ln_b: jax.Array,
    p: dict[str, jax.Array],
    *,
    n_heads: int,
    t_real: int,
) -> jax.Array:
    """x + out_proj(attention(LN(x))) in one kernel.

    x: [B, T_pad, D] bf16 with T_pad a multiple of 128; rows at
    t >= t_real are padding (masked out of the softmax as keys; their
    own outputs are garbage the caller slices off).  Exactly the
    pre-LN encoder self-attention sublayer (HF Whisper semantics:
    q/v/out biased, k unbiased, q scaled by head_dim**-0.5;
    reference hooks capture its post-residual output, hooks.py:87-110).

    Grid iterations process ``gb`` clips each (leading-dim blocking):
    the per-iteration fixed cost (weight re-staging, grid sequencing)
    amortizes over two clips' compute while the working set stays
    within VMEM — measured ~1.2x on the attention sublayer in
    isolation on one v5e.
    """
    b, t_pad, d = x.shape
    head_dim = d // n_heads
    if attention_supported(t_pad, d, n_heads):
        gb = _pick_attention_gb(b, t_pad, d)
        kern = functools.partial(
            _attention_block_kernel,
            n_heads=n_heads,
            head_dim=head_dim,
            t_real=t_real,
            scale=float(head_dim) ** -0.5,
            gb=gb,
        )
    else:
        # whisper medium/large: the row-tiled body (K/V whole, queries
        # streamed) is the variant whose live set fits VMEM
        tq = _pick_attention_tq(t_pad, d)
        if tq is None:
            raise ValueError(
                f"no fused attention variant fits t_pad={t_pad}, d={d}; "
                "gate on attention_block_available() first"
            )
        gb = 1
        kern = functools.partial(
            _attention_block_kernel_tiled,
            n_heads=n_heads,
            head_dim=head_dim,
            t_real=t_real,
            scale=float(head_dim) ** -0.5,
            tq=tq,
        )
    full = lambda i: (0, 0)  # noqa: E731 — whole-array weight blocks
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, t_pad, d), jnp.bfloat16),
        grid=(b // gb,),
        in_specs=[
            pl.BlockSpec((gb, t_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (gb, t_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=b * (8 * t_pad * d * d + 4 * t_pad * t_pad * d),
            bytes_accessed=2 * b * t_pad * d * 2 + 4 * d * d * 2,
            transcendentals=b * n_heads * t_pad * t_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
    )(
        x,
        ln_g.reshape(1, d).astype(jnp.float32),
        ln_b.reshape(1, d).astype(jnp.float32),
        p["wq"].astype(jnp.bfloat16),
        p["bq"].reshape(1, d).astype(jnp.float32),
        p["wk"].astype(jnp.bfloat16),
        p["wv"].astype(jnp.bfloat16),
        p["bv"].reshape(1, d).astype(jnp.float32),
        p["wo"].astype(jnp.bfloat16),
        p["bo"].reshape(1, d).astype(jnp.float32),
    )


# ---------------------------------------------------------------------------
# MLP block
# ---------------------------------------------------------------------------


def _mlp_block_kernel(
    x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref, *refs,
    capture: bool, final_ln: bool,
):
    if final_ln:
        fg_ref, fb_ref, *out_refs = refs
    else:
        out_refs = refs
    i = 0
    o_ref = out_refs[i]; i += 1
    if final_ln:
        cap_ref = out_refs[i]; i += 1
    if capture:
        min_ref, mout_ref = out_refs[i:]
    xb = x_ref[:]  # [rows, D] bf16
    xln = _ln_f32(xb.astype(jnp.float32), g_ref, b_ref).astype(jnp.bfloat16)
    h = (
        jnp.dot(xln, w1_ref[:], preferred_element_type=jnp.float32, precision=_MXU)
        + b1_ref[:]
    )
    # exact (erf) GELU in f32, matching jax.nn.gelu(approximate=False)
    # to 3.4e-5 (Mosaic has no erf primitive — see _erf_f32)
    h = h * 0.5 * (1.0 + _erf_f32(h * np.float32(2.0**-0.5)))
    h = h.astype(jnp.bfloat16)
    y = (
        jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32, precision=_MXU)
        + b2_ref[:]
    ).astype(jnp.bfloat16)
    out = xb + y
    o_ref[:] = out
    if final_ln:
        # the capture LN consumes the bf16-ROUNDED layer output (matching
        # _layer_norm applied to the stacked bf16 captures byte-for-byte)
        cap_ref[:] = _ln_f32(
            out.astype(jnp.float32), fg_ref, fb_ref
        ).astype(cap_ref.dtype)
    if capture:
        min_ref[:] = xln
        mout_ref[:] = y


def fused_mlp_block(
    x: jax.Array,
    ln_g: jax.Array,
    ln_b: jax.Array,
    p: dict[str, jax.Array],
    *,
    capture: bool = False,
    final_ln: tuple[jax.Array, jax.Array] | None = None,
    capture_dtype=jnp.bfloat16,
):
    """x + fc2(gelu_erf(fc1(LN(x)))) in one kernel.

    x: [N, D] bf16 rows (token-flattened).  With ``capture``, also
    returns (mlp_in, mlp_out) — the post-LN fc1 input and the
    pre-residual fc2 output, the transcoder's training pair
    (models/whisper.py:_encoder_layer).  The [N, F] GELU hidden never
    touches HBM.

    ``final_ln=(g, b)`` additionally emits ``ln_f(out)`` at
    ``capture_dtype`` while the layer output rows are still in VMEM —
    the final-LN'd capture the extraction pipeline wants (the aiOla
    trick, reference hooks.py:87-92), computed on the bf16-rounded
    output so it is byte-identical to running ``_layer_norm`` over the
    stacked bf16 captures afterwards.  Saves the extraction pipeline's
    whole-[L, B, T, D] LN round-trip through HBM.

    Returns: out [, ln_f(out)] [, mlp_in, mlp_out].
    """
    n, d = x.shape
    f = p["w1"].shape[1]
    rows = pick_block_rows(n, f, d)
    full = lambda i: (0, 0)  # noqa: E731
    out_shape = [jax.ShapeDtypeStruct((n, d), jnp.bfloat16)]
    row_spec = pl.BlockSpec((rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_specs = [row_spec]
    if final_ln is not None:
        out_shape.append(jax.ShapeDtypeStruct((n, d), capture_dtype))
        out_specs.append(row_spec)
    if capture:
        out_shape += [
            jax.ShapeDtypeStruct((n, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((n, d), jnp.bfloat16),
        ]
        out_specs += [row_spec, row_spec]
    in_specs = [
        row_spec,
        pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((d, f), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, f), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((f, d), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
    ]
    inputs = [
        x,
        ln_g.reshape(1, d).astype(jnp.float32),
        ln_b.reshape(1, d).astype(jnp.float32),
        p["w1"].astype(jnp.bfloat16),
        p["b1"].reshape(1, f).astype(jnp.float32),
        p["w2"].astype(jnp.bfloat16),
        p["b2"].reshape(1, d).astype(jnp.float32),
    ]
    if final_ln is not None:
        fg, fb = final_ln
        in_specs += [
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
        ]
        inputs += [
            fg.reshape(1, d).astype(jnp.float32),
            fb.reshape(1, d).astype(jnp.float32),
        ]
    outs = pl.pallas_call(
        functools.partial(
            _mlp_block_kernel, capture=capture, final_ln=final_ln is not None
        ),
        out_shape=tuple(out_shape),
        grid=(n // rows,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * d * f,
            bytes_accessed=2 * n * d * 2 + 2 * d * f * 2,
            transcendentals=n * f,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
    )(*inputs)
    if capture or final_ln is not None:
        return outs
    return outs[0]


# ---------------------------------------------------------------------------
# conv stem
# ---------------------------------------------------------------------------


def _shift_down(a):
    """rows move +1 (row t holds a[t-1]); zero row enters at t=0."""
    return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)


def _shift_up(a):
    """rows move -1 (row t holds a[t+1]); zero row enters at the end."""
    return jnp.concatenate([a[1:], jnp.zeros_like(a[:1])], axis=0)


def _conv_stem_kernel(
    even_ref, odd_ref, w1a_ref, w1b_ref, w1c_ref, b1_ref,
    w2a_ref, w2b_ref, w2c_ref, b2_ref, pos_ref, o_ref,
):
    even = even_ref[0]  # [T_out_pad, n_mels] bf16 (mel columns 0,2,4,...)
    odd = odd_ref[0]    # columns 1,3,5,...

    def dot(a, w_ref):
        return jax.lax.dot_general(
            a, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_MXU,
        )

    def gelu(h):
        return h * 0.5 * (1.0 + _erf_f32(h * np.float32(2.0**-0.5)))

    # conv1 (k=3, pad 1, stride 1) split into even/odd output rows:
    # h[2t]   = x[2t-1] W0 + x[2t] W1 + x[2t+1] W2
    # h[2t+1] = x[2t]   W0 + x[2t+1] W1 + x[2t+2] W2
    h_even = dot(_shift_down(odd), w1a_ref) + dot(even, w1b_ref) \
        + dot(odd, w1c_ref) + b1_ref[:]
    h_odd = dot(even, w1a_ref) + dot(odd, w1b_ref) \
        + dot(_shift_up(even), w1c_ref) + b1_ref[:]
    h_even = gelu(h_even).astype(jnp.bfloat16)
    h_odd = gelu(h_odd).astype(jnp.bfloat16)

    # conv2 (k=3, pad 1, stride 2): out[t] = h[2t-1] W0 + h[2t] W1 + h[2t+1] W2
    out = dot(_shift_down(h_odd), w2a_ref) + dot(h_even, w2b_ref) \
        + dot(h_odd, w2c_ref) + b2_ref[:]
    out = gelu(out).astype(jnp.bfloat16)
    o_ref[0] = out + pos_ref[:]


def fused_conv_stem(
    mel: jax.Array, enc: dict, t_pad: int
) -> jax.Array:
    """Whisper conv frontend in one kernel per clip: Conv1d(k3,p1) + GELU
    + Conv1d(k3,s2,p1) + GELU + positional embedding.

    mel: [B, n_mels, T_mel] bf16 (T_mel even).  Returns [B, t_pad, D]
    bf16 with rows >= T_mel//2 as finite padding (zero-extended input).
    The convs run as six shifted matmuls on even/odd column splits (the
    stride-2 second conv consumes the interleaved halves directly), so
    the [T_mel, D] GELU hidden never touches HBM.  Semantics match the
    XLA stem (models/whisper.py:encoder_forward; HF conv1/conv2,
    reference hooks capture downstream of it) to bf16 rounding.
    """
    b, n_mels, t_mel = mel.shape
    t_out = t_mel // 2
    d = enc["conv1_b"].shape[0]
    # even/odd time-column splits, transposed to [B, T_out, n_mels] and
    # zero-padded to t_pad rows (XLA prep, ~2 x 38 MB at whisper scale)
    mel_t = mel.transpose(0, 2, 1)
    even = mel_t[:, 0::2]
    odd = mel_t[:, 1::2]
    if t_pad != t_out:
        pad = ((0, 0), (0, t_pad - t_out), (0, 0))
        even = jnp.pad(even, pad)
        odd = jnp.pad(odd, pad)
    w1 = enc["conv1_w"].astype(jnp.bfloat16)  # [D, n_mels, 3]
    w2 = enc["conv2_w"].astype(jnp.bfloat16)  # [D, D, 3]
    pos = enc["pos"][:t_out].astype(jnp.bfloat16)
    if t_pad != t_out:
        pos = jnp.pad(pos, ((0, t_pad - t_out), (0, 0)))
    full = lambda i: (0, 0)  # noqa: E731
    item = lambda i: (i, 0, 0)  # noqa: E731
    return pl.pallas_call(
        _conv_stem_kernel,
        out_shape=jax.ShapeDtypeStruct((b, t_pad, d), jnp.bfloat16),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t_pad, n_mels), item, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, n_mels), item, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_mels, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_mels, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((n_mels, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((t_pad, d), full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_pad, d), item, memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=b * t_pad * d * (6 * n_mels + 6 * d),
            bytes_accessed=2 * b * t_pad * n_mels * 2 + b * t_pad * d * 2,
            transcendentals=3 * b * t_pad * d,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
    )(
        even, odd,
        w1[:, :, 0].T, w1[:, :, 1].T, w1[:, :, 2].T,
        enc["conv1_b"].reshape(1, d).astype(jnp.float32),
        w2[:, :, 0].T, w2[:, :, 1].T, w2[:, :, 2].T,
        enc["conv2_b"].reshape(1, d).astype(jnp.float32),
        pos,
    )


def stem_supported(n_mels: int, t_mel: int, d: int) -> bool:
    """The fused conv stem needs the TPU backend, an even mel length,
    and a lane-aligned model dim (n_mels may be ragged — 80/128 both
    pad into one lane tile).  ``WST_DISABLE_FUSED_STEM=1`` falls back to
    the XLA stem (A/B benchmarking / emergency escape hatch)."""
    import os

    if os.environ.get("WST_DISABLE_FUSED_STEM"):
        return False
    try:
        platform = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    return platform not in ("cpu",) and t_mel % 2 == 0 and d % 128 == 0


# ---------------------------------------------------------------------------
# support predicate
# ---------------------------------------------------------------------------

# whole-item attention scratch: x/q/k/v/attn [T,D] bf16 + one [T,T] f32
# score + bf16 probs per head, plus weights — bound T and D so the
# working set stays under the 128 MB VMEM budget
_MAX_T_PAD = 2048
_MAX_D = 1536


def supported(t_pad: int, d: int, n_heads: int) -> bool:
    """Fused encoder blocks need the TPU backend, lane-aligned dims, and
    the whole-batch-item working set within VMEM.
    ``WST_DISABLE_FUSED_ENCODER=1`` falls back to the composed XLA stack
    (A/B benchmarking / emergency escape hatch)."""
    import os

    if os.environ.get("WST_DISABLE_FUSED_ENCODER"):
        return False
    try:
        platform = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    if platform in ("cpu",):
        return False
    if d % n_heads != 0:
        return False
    head_dim = d // n_heads
    return (
        head_dim % 8 == 0
        and d % 128 == 0
        and t_pad % 128 == 0
        and t_pad <= _MAX_T_PAD
        and d <= _MAX_D
    )
