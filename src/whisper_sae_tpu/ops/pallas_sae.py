"""Fused Pallas SAE encode: matmul + exact top-k mask in one kernel.

The XLA hot path materializes the [B, H] pre-activation to HBM between
the encoder matmul and the bisection mask (~800 MB of f32 round-trip per
32k-token step).  This kernel computes, per row-block tile held in VMEM:

    pre    = (x - b_pre) @ w_enc + b_enc      (MXU, bf16 in / f32 acc)
    th     = exact k-th largest per row        (32-step bit bisection, VPU)
    hidden = relu(pre) * (pre >= th)           (written once, bf16)

so the pre-activation never leaves VMEM and the latent is stored at half
width.  A custom VJP routes gradients to the selected positive entries
(identical to torch's topk->relu backward) with plain XLA matmuls for the
parameter cotangents.

Numerics: selection is bit-identical to ops.topk.topk_mask_dense; the
only difference is the bf16 rounding of the stored latent (the decode
matmul consumes bf16 under AMP anyway).
"""

from __future__ import annotations

import functools
import os

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

_INT_MIN = np.int32(-2147483648)


def _encode_kernel(x_ref, w_ref, benc_ref, bpre_ref, out_ref, *, k: int):
    # explicit f32 entry cast: rows may arrive bf16 (out-of-core staging);
    # Mosaic mixed-dtype arithmetic is not trusted (CLAUDE.md quirks)
    xc = (x_ref[:].astype(jnp.float32) - bpre_ref[:]).astype(jnp.bfloat16)
    pre = (
        jnp.dot(xc, w_ref[:], preferred_element_type=jnp.float32, precision=_MXU)
        + benc_ref[:]
    )

    xi = pltpu.bitcast(pre, jnp.int32)
    xi = jnp.where(xi < 0, _INT_MIN - xi - 1, xi)
    rows = pre.shape[0]
    lo = jnp.full((rows, 1), jnp.int32(-2147483647))
    hi = jnp.full((rows, 1), jnp.int32(2147483647))

    def body(_, lohi):
        lo, hi = lohi
        mid = jnp.right_shift(lo, 1) + jnp.right_shift(hi, 1) + (lo & hi & 1)
        cnt = jnp.sum((xi >= mid).astype(jnp.int32), axis=1, keepdims=True)
        take = cnt >= k
        return jnp.where(take, mid, lo), jnp.where(take, hi, mid)

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    hidden = jnp.where(xi >= lo, jnp.maximum(pre, 0.0), 0.0)
    out_ref[:] = hidden.astype(out_ref.dtype)


def _encode_forward(x, w_enc_bf, b_enc, b_pre, k, block_rows, out_dtype):
    b, d = x.shape
    h = w_enc_bf.shape[1]
    if uses_blocked(x.shape, h):
        return _encode_forward_blocked(
            x, w_enc_bf, b_enc, b_pre, k, block_rows, out_dtype
        )
    grid = pl.cdiv(b, block_rows)
    return pl.pallas_call(
        functools.partial(_encode_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((b, h), out_dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, h), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * h + 33 * b * h,
            bytes_accessed=b * d * 4 + d * h * 2 + b * h * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, w_enc_bf, b_enc.reshape(1, h), b_pre.reshape(1, d))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_topk_encode(
    x: jax.Array,
    w_enc: jax.Array,
    b_enc: jax.Array,
    b_pre: jax.Array,
    k: int,
    block_rows: int = 256,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """hidden = topk_mask(relu((x - b_pre) @ w_enc + b_enc), k) — fused."""
    return _encode_forward(
        x, w_enc.astype(jnp.bfloat16), b_enc, b_pre, k, block_rows, out_dtype
    )


def _fwd(x, w_enc, b_enc, b_pre, k, block_rows, out_dtype):
    w_bf = w_enc.astype(jnp.bfloat16)
    hidden = _encode_forward(x, w_bf, b_enc, b_pre, k, block_rows, out_dtype)
    return hidden, (x, w_bf, b_pre, hidden)


def _bwd(k, block_rows, out_dtype, res, g):
    x, w_bf, b_pre, hidden = res
    # gradient flows exactly to the selected entries with positive
    # activation (torch topk->relu backward)
    dpre = jnp.where(hidden > 0, g.astype(jnp.float32), 0.0)
    dpre_bf = dpre.astype(jnp.bfloat16)
    xc_bf = (x - b_pre).astype(jnp.bfloat16)
    dw = jnp.einsum(
        "bd,bh->dh", xc_bf, dpre_bf, preferred_element_type=jnp.float32, precision=_MXU
    )
    db_enc = jnp.sum(dpre, axis=0)
    # d b_pre = -(sum_b dpre) @ w^T  (collapses to a [H] @ [H, D] product;
    # the sum must accumulate in f32 — a bf16 reduction over the batch
    # loses ~1e-3 relative)
    db_pre = -jnp.dot(
        db_enc, w_bf.T.astype(jnp.float32), preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    dx = jnp.dot(dpre_bf, w_bf.T, preferred_element_type=jnp.float32, precision=_MXU).astype(
        x.dtype
    )
    return dx, dw, db_enc, db_pre


fused_topk_encode.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# fully-fused training forward: encode + bisection + mask + decode + loss
# stats in ONE kernel.  Relative to fused_topk_encode + XLA decode/loss,
# this removes the decode's re-read of the [B, H] latent from HBM and the
# separate recon/l0/active passes: per 512-row block the bf16 latent decodes
# straight out of VMEM, the residual (recon - x) is written once for the
# backward, and sq-error / l0 / active-feature partials accumulate in
# revisited [1, ...] output blocks (grid steps are sequential on one core,
# so read-modify-write accumulation is race-free).  Loss semantics match
# the reference TopK SAE forward + MSE (reference model.py:131-166):
# loss = mean((hidden @ w_dec + b_dec + b_pre - x)^2) with the decode
# consuming the bf16-rounded latent exactly as the unfused AMP path does.
# Measured: full train step 5.21 -> 4.99 ms at B=32k whisper-tiny
# (6.28 -> 6.57 M act/s/chip on one v5e).
# ---------------------------------------------------------------------------


def _fused_loss_kernel(
    x_ref, we_ref, benc_ref, bpre_ref, wd_ref, bout_ref,
    hid_ref, resid_ref, sq_ref, l0_ref, act_ref, xc_ref=None, *, k: int
):
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)  # rows may arrive bf16 (chunk staging)
    xc = (x - bpre_ref[:]).astype(jnp.bfloat16)
    if xc_ref is not None:
        # persist the centered bf16 rows for the backward's dw_enc so the
        # VJP never re-reads the f32 batch (one 2-byte write here replaces
        # a 4-byte read + 2-byte write per row in the backward)
        xc_ref[:] = xc
    pre = (
        jnp.dot(xc, we_ref[:], preferred_element_type=jnp.float32, precision=_MXU)
        + benc_ref[:]
    )

    xi = pltpu.bitcast(pre, jnp.int32)
    xi = jnp.where(xi < 0, _INT_MIN - xi - 1, xi)
    rows = pre.shape[0]
    lo = jnp.full((rows, 1), jnp.int32(-2147483647))
    hi = jnp.full((rows, 1), jnp.int32(2147483647))

    def body(_, lohi):
        lo, hi = lohi
        mid = jnp.right_shift(lo, 1) + jnp.right_shift(hi, 1) + (lo & hi & 1)
        cnt = jnp.sum((xi >= mid).astype(jnp.int32), axis=1, keepdims=True)
        take = cnt >= k
        return jnp.where(take, mid, lo), jnp.where(take, hi, mid)

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    hidden = jnp.where(xi >= lo, jnp.maximum(pre, 0.0), 0.0)
    hid_bf = hidden.astype(jnp.bfloat16)
    hid_ref[:] = hid_bf

    recon = (
        jnp.dot(hid_bf, wd_ref[:], preferred_element_type=jnp.float32, precision=_MXU)
        + bout_ref[:]
    )
    resid = recon - x
    resid_ref[:] = resid

    pos = (hidden > 0.0).astype(jnp.float32)
    sq_part = jnp.sum(resid * resid).reshape(1, 1)
    l0_part = jnp.sum(pos).reshape(1, 1)
    act_part = jnp.max(pos, axis=0, keepdims=True).astype(jnp.int32)

    @pl.when(i == 0)
    def _init():
        sq_ref[:] = sq_part
        l0_ref[:] = l0_part
        act_ref[:] = act_part

    @pl.when(i > 0)
    def _acc():
        sq_ref[:] = sq_ref[:] + sq_part
        l0_ref[:] = l0_ref[:] + l0_part
        act_ref[:] = jnp.maximum(act_ref[:], act_part)


def _fused_loss_forward(x, we_bf, b_enc, b_pre, wd_bf, b_out, k, block_rows,
                        emit_xc: bool = False):
    b, d = x.shape
    h = we_bf.shape[1]
    out_shape = [
        jax.ShapeDtypeStruct((b, h), jnp.bfloat16),   # latent (for bwd)
        jax.ShapeDtypeStruct((b, d), jnp.float32),    # recon - x
        jax.ShapeDtypeStruct((1, 1), jnp.float32),    # sum of sq error
        jax.ShapeDtypeStruct((1, 1), jnp.float32),    # total active count
        jax.ShapeDtypeStruct((1, h), jnp.int32),      # any-active per feat
    ]
    out_specs = [
        pl.BlockSpec((block_rows, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if emit_xc:
        out_shape.append(jax.ShapeDtypeStruct((b, d), jnp.bfloat16))  # x - b_pre
        out_specs.append(
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
    return pl.pallas_call(
        functools.partial(_fused_loss_kernel, k=k),
        out_shape=tuple(out_shape),
        grid=(b // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * d * h + 33 * b * h,
            bytes_accessed=b * d * 8 + 2 * d * h * 2 + b * h * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, we_bf, b_enc.reshape(1, h), b_pre.reshape(1, d), wd_bf, b_out.reshape(1, d))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_sae_loss(x, w_enc, b_enc, b_pre, w_dec, b_dec, k, block_rows):
    """(loss, l0, active) of a TopK SAE in one fused kernel (AMP/bf16).

    loss = mean((topk_mask(relu((x-b_pre)@w_enc+b_enc), k) @ w_dec
                 + b_dec + b_pre - x)^2), l0 = mean per-row active count,
    active = any-over-batch per-feature bool — the exact quantities the
    trainer logs (reference training.py:179-217).  Gradients match the
    unfused AMP path (bf16 matmuls, f32 accumulation; torch topk->relu
    backward: cotangents flow only to selected positive entries).
    """
    loss, l0, active, _, _ = _fused_loss_impl(
        x, w_enc, b_enc, b_pre, w_dec, b_dec, k, block_rows
    )
    return loss, l0, active


def _use_xc_residual() -> bool:
    """Store the kernel's centered bf16 rows as a VJP residual instead of
    re-deriving them from the f32 batch in the backward.  Read at trace
    time so the step-decomposition probe can A/B the two data paths."""
    return os.environ.get("WST_SAE_XC", "0") == "1"


def _fused_loss_impl(x, w_enc, b_enc, b_pre, w_dec, b_dec, k, block_rows):
    we_bf = w_enc.astype(jnp.bfloat16)
    wd_bf = w_dec.astype(jnp.bfloat16)
    b_out = b_dec + b_pre
    outs = _fused_loss_forward(
        x, we_bf, b_enc, b_pre, wd_bf, b_out, k, block_rows,
        emit_xc=_use_xc_residual(),
    )
    hid, resid, sq, l0s, act = outs[:5]
    xc = outs[5] if len(outs) > 5 else None
    b, d = x.shape
    loss = sq[0, 0] / (b * d)
    l0 = l0s[0, 0] / b
    active = act[0] > 0
    return loss, l0, active, (hid, resid, xc), (we_bf, wd_bf)


def _fused_loss_vjp_fwd(x, w_enc, b_enc, b_pre, w_dec, b_dec, k, block_rows):
    loss, l0, active, (hid, resid, xc), (we_bf, wd_bf) = _fused_loss_impl(
        x, w_enc, b_enc, b_pre, w_dec, b_dec, k, block_rows
    )
    return (loss, l0, active), (x, b_pre, we_bf, wd_bf, hid, resid, xc)


def _fused_loss_vjp_bwd(k, block_rows, res, g):
    gl = g[0]  # l0/active are metrics: their cotangents are symbolic zeros
    x, b_pre, we_bf, wd_bf, hid, resid, xc = res
    b, d = x.shape
    d_recon = resid * (2.0 * gl / (b * d))
    drec_bf = d_recon.astype(jnp.bfloat16)
    dhidden = jnp.dot(drec_bf, wd_bf.T, preferred_element_type=jnp.float32, precision=_MXU)
    # bf16 rounding preserves sign, so hid > 0 selects exactly the entries
    # the f32 mask selected
    dpre = jnp.where(hid > 0, dhidden, 0.0)
    dpre_bf = dpre.astype(jnp.bfloat16)
    # identical bits either way: the kernel computes (f32(x) - b_pre).bf16
    xc_bf = (x - b_pre).astype(jnp.bfloat16) if xc is None else xc
    dw_enc = jnp.einsum(
        "bd,bh->dh", xc_bf, dpre_bf, preferred_element_type=jnp.float32, precision=_MXU
    )
    db_enc = jnp.sum(dpre, axis=0)  # f32 accumulation (bf16 loses ~1e-3)
    dw_dec = jnp.einsum(
        "bh,bd->hd", hid, drec_bf, preferred_element_type=jnp.float32, precision=_MXU
    )
    db_dec = jnp.sum(d_recon, axis=0)
    # b_pre enters twice: +recon (sum d_recon) and -encode input path
    db_pre = db_dec - jnp.dot(
        db_enc, we_bf.T.astype(jnp.float32),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    # dx is dead in training (the batch is not differentiated); XLA DCEs it
    # (cast to the primal dtype — rows may be bf16 under chunk staging and
    # custom_vjp cotangants must match the input aval)
    dx = (
        jnp.dot(dpre_bf, we_bf.T, preferred_element_type=jnp.float32, precision=_MXU) - d_recon
    ).astype(x.dtype)
    return dx, dw_enc, db_enc, db_pre, dw_dec, db_dec


fused_sae_loss.defvjp(_fused_loss_vjp_fwd, _fused_loss_vjp_bwd)


def fused_loss_supported(x_shape, hidden_dim: int) -> bool:
    """The fused-loss kernel needs the single-block geometry (w_enc AND
    w_dec both VMEM-resident — the SAE is the out_dim == in_dim case of
    the coder-kernel budget) and a row count the block size divides.
    Budgeting only w_enc admits geometries that fail to compile (e.g.
    D=1536, H=15616: w_enc 45.75 MB fits, w_enc+w_dec 91.5 MB does not)."""
    return fused_coder_supported(x_shape, x_shape[1], hidden_dim)


# ---------------------------------------------------------------------------
# scalar-prefetch indexed fused loss.  The fused scan epoch used to slice a
# fresh f32 [B, D] batch from the epoch stack every step — a dynamic-slice
# the compiler must MATERIALIZE because its consumer is an opaque
# pallas_call (~96 MB of HBM copy traffic per 32k-row whisper-tiny step;
# the measured 6.75 M act/s isolated-step vs 6.40 M epoch gap, see
# docs/DESIGN.md "Tiny-geometry step decomposition").  Here the batch
# window is selected INSIDE the kernel: the scan passes its step index as
# a scalar-prefetch argument and the x BlockSpec's index_map offsets the
# row-block reads into the full [steps*B, D] epoch buffer, so each row is
# read from HBM exactly once per epoch, straight into VMEM.  The centered
# bf16 rows are always persisted (the WST_SAE_XC residual) so the backward
# never touches the epoch buffer either.
# ---------------------------------------------------------------------------


def _fused_loss_kernel_indexed(step_ref, *refs, k: int):
    del step_ref  # consumed by the BlockSpec index maps only
    _fused_loss_kernel(*refs, k=k)


def _fused_loss_forward_indexed(data, step, we_bf, b_enc, b_pre, wd_bf, b_out,
                                k, block_rows, batch):
    d = data.shape[1]
    h = we_bf.shape[1]
    blocks = batch // block_rows

    def xmap(i, s):
        return (s[0] * blocks + i, 0)

    def fixed(i, s):
        return (0, 0)

    def omap(i, s):
        return (i, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((block_rows, d), xmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, h), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, d), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_rows, h), omap, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), omap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), omap, memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        functools.partial(_fused_loss_kernel_indexed, k=k),
        out_shape=(
            jax.ShapeDtypeStruct((batch, h), jnp.bfloat16),   # latent
            jax.ShapeDtypeStruct((batch, d), jnp.float32),    # recon - x
            jax.ShapeDtypeStruct((1, 1), jnp.float32),        # sum sq error
            jax.ShapeDtypeStruct((1, 1), jnp.float32),        # active count
            jax.ShapeDtypeStruct((1, h), jnp.int32),          # any-active
            jax.ShapeDtypeStruct((batch, d), jnp.bfloat16),   # x - b_pre
        ),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * d * h + 33 * batch * h,
            bytes_accessed=batch * d * 8 + 2 * d * h * 2 + batch * h * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        jnp.asarray(step, jnp.int32).reshape(1), data, we_bf,
        b_enc.reshape(1, h), b_pre.reshape(1, d), wd_bf, b_out.reshape(1, d),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_sae_loss_indexed(data, step, w_enc, b_enc, b_pre, w_dec, b_dec,
                           k, block_rows, batch):
    """fused_sae_loss over the window ``data[step*batch:(step+1)*batch]``,
    selected inside the kernel via scalar prefetch (no slice materialized).

    ``data``: [N, D] epoch buffer with N a multiple of ``batch`` (not
    differentiated — its cotangent is symbolic zeros, DCE'd by the scan
    transpose).  ``step``: traced int32 scalar.  Loss/l0/active semantics
    and gradients identical to fused_sae_loss on the sliced window."""
    loss, l0, active, _, _ = _fused_loss_indexed_impl(
        data, step, w_enc, b_enc, b_pre, w_dec, b_dec, k, block_rows, batch
    )
    return loss, l0, active


def _fused_loss_indexed_impl(data, step, w_enc, b_enc, b_pre, w_dec, b_dec,
                             k, block_rows, batch):
    we_bf = w_enc.astype(jnp.bfloat16)
    wd_bf = w_dec.astype(jnp.bfloat16)
    b_out = b_dec + b_pre
    hid, resid, sq, l0s, act, xc = _fused_loss_forward_indexed(
        data, step, we_bf, b_enc, b_pre, wd_bf, b_out, k, block_rows, batch
    )
    d = data.shape[1]
    loss = sq[0, 0] / (batch * d)
    l0 = l0s[0, 0] / batch
    active = act[0] > 0
    return loss, l0, active, (hid, resid, xc), (we_bf, wd_bf)


def _fused_loss_indexed_vjp_fwd(data, step, w_enc, b_enc, b_pre, w_dec, b_dec,
                                k, block_rows, batch):
    loss, l0, active, (hid, resid, xc), (we_bf, wd_bf) = (
        _fused_loss_indexed_impl(
            data, step, w_enc, b_enc, b_pre, w_dec, b_dec, k, block_rows, batch
        )
    )
    return (loss, l0, active), (data, we_bf, wd_bf, hid, resid, xc)


def _fused_loss_indexed_vjp_bwd(k, block_rows, batch, res, g):
    gl = g[0]  # l0/active are metrics: their cotangents are symbolic zeros
    data, we_bf, wd_bf, hid, resid, xc = res
    d = xc.shape[1]
    d_recon = resid * (2.0 * gl / (batch * d))
    drec_bf = d_recon.astype(jnp.bfloat16)
    dhidden = jnp.dot(drec_bf, wd_bf.T, preferred_element_type=jnp.float32, precision=_MXU)
    dpre = jnp.where(hid > 0, dhidden, 0.0)
    dpre_bf = dpre.astype(jnp.bfloat16)
    # the persisted centered rows: the backward never reads ``data``
    dw_enc = jnp.einsum(
        "bd,bh->dh", xc, dpre_bf, preferred_element_type=jnp.float32, precision=_MXU
    )
    db_enc = jnp.sum(dpre, axis=0)
    dw_dec = jnp.einsum(
        "bh,bd->hd", hid, drec_bf, preferred_element_type=jnp.float32, precision=_MXU
    )
    db_dec = jnp.sum(d_recon, axis=0)
    db_pre = db_dec - jnp.dot(
        db_enc, we_bf.T.astype(jnp.float32),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )
    # the epoch buffer and step index are never differentiated: zero
    # cotangents (float0 for the integer step), dead code the scan
    # transpose DCEs
    ddata = jnp.zeros_like(data)
    dstep = np.zeros((), dtype=jax.dtypes.float0)  # step is an int scalar
    return ddata, dstep, dw_enc, db_enc, db_pre, dw_dec, db_dec


fused_sae_loss_indexed.defvjp(
    _fused_loss_indexed_vjp_fwd, _fused_loss_indexed_vjp_bwd
)


# ---------------------------------------------------------------------------
# fused transcoder training forward.  Same structure as fused_sae_loss but
# with the transcoder semantics (reference transcoder.py:139-175 / :355-390):
# no pre-encoder bias, the reconstruction target is a SEPARATE array y
# (the MLP output), and the Skip variant adds an affine path
# x @ w_skip + b_skip whose bias folds into b_out = b_dec + b_skip.  One
# kernel computes encode + bisection + mask + decode (+ skip) + residual +
# loss/l0/active; the [B, H] pre-activation and latent never round-trip HBM.
# ---------------------------------------------------------------------------


def _fused_coder_kernel(*refs, k: int | None, use_skip: bool,
                        emit_xc: bool = False, y_is_x: bool = False):
    refs = list(refs)
    # ReLU mode appends an L1 ([1,1]) and a per-feature hidden-sum ([1,H])
    # accumulator — the latter is what lets decoder-norm-weighted L1 (the
    # ReLU crosscoder sparsity, reference crosscoder.py:204-219) and its
    # VJP be assembled outside the kernel from one extra [1,H] output.
    # emit_xc appends the bf16 rows last (see _use_xc_residual).
    # y_is_x: autoencoding families (ReLU SAE, crosscoders' flattened
    # view) pass no y operand — the x block is reused as the target, so
    # each row is DMA'd once instead of twice.
    xc_ref = refs.pop() if emit_xc else None
    hsum_ref = refs.pop() if k is None else None
    l1_ref = refs.pop() if k is None else None
    x_ref = refs.pop(0)
    y_ref = x_ref if y_is_x else refs.pop(0)
    if use_skip:
        (we_ref, benc_ref, wd_ref, bout_ref, ws_ref,
         hid_ref, resid_ref, sq_ref, l0_ref, act_ref) = refs
    else:
        (we_ref, benc_ref, wd_ref, bout_ref,
         hid_ref, resid_ref, sq_ref, l0_ref, act_ref) = refs
    i = pl.program_id(0)
    xv = x_ref[:]
    xc = xv.astype(jnp.bfloat16)
    if xc_ref is not None:
        xc_ref[:] = xc  # backward's dw_enc/dw_skip operand, persisted bf16
    pre = (
        jnp.dot(xc, we_ref[:], preferred_element_type=jnp.float32, precision=_MXU)
        + benc_ref[:]
    )

    if k is None:
        hidden = jnp.maximum(pre, 0.0)
    else:
        xi = pltpu.bitcast(pre, jnp.int32)
        xi = jnp.where(xi < 0, _INT_MIN - xi - 1, xi)
        rows = pre.shape[0]
        lo = jnp.full((rows, 1), jnp.int32(-2147483647))
        hi = jnp.full((rows, 1), jnp.int32(2147483647))

        def body(_, lohi):
            lo, hi = lohi
            mid = jnp.right_shift(lo, 1) + jnp.right_shift(hi, 1) + (lo & hi & 1)
            cnt = jnp.sum((xi >= mid).astype(jnp.int32), axis=1, keepdims=True)
            take = cnt >= k
            return jnp.where(take, mid, lo), jnp.where(take, hi, mid)

        lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
        hidden = jnp.where(xi >= lo, jnp.maximum(pre, 0.0), 0.0)
    hid_bf = hidden.astype(jnp.bfloat16)
    hid_ref[:] = hid_bf

    pred = (
        jnp.dot(hid_bf, wd_ref[:], preferred_element_type=jnp.float32, precision=_MXU)
        + bout_ref[:]
    )
    if use_skip:
        pred = pred + jnp.dot(xc, ws_ref[:], preferred_element_type=jnp.float32, precision=_MXU)
    yv = xv if y_is_x else y_ref[:]
    resid = pred - yv.astype(jnp.float32)  # y may arrive bf16
    resid_ref[:] = resid

    pos = (hidden > 0.0).astype(jnp.float32)
    sq_part = jnp.sum(resid * resid).reshape(1, 1)
    l0_part = jnp.sum(pos).reshape(1, 1)
    act_part = jnp.max(pos, axis=0, keepdims=True).astype(jnp.int32)
    l1_part = jnp.sum(hidden).reshape(1, 1) if k is None else None
    hsum_part = jnp.sum(hidden, axis=0, keepdims=True) if k is None else None

    @pl.when(i == 0)
    def _init():
        sq_ref[:] = sq_part
        l0_ref[:] = l0_part
        act_ref[:] = act_part
        if k is None:
            l1_ref[:] = l1_part
            hsum_ref[:] = hsum_part

    @pl.when(i > 0)
    def _acc():
        sq_ref[:] = sq_ref[:] + sq_part
        l0_ref[:] = l0_ref[:] + l0_part
        act_ref[:] = jnp.maximum(act_ref[:], act_part)
        if k is None:
            l1_ref[:] = l1_ref[:] + l1_part
            hsum_ref[:] = hsum_ref[:] + hsum_part


def _fused_coder_forward(x, y, we_bf, b_enc, wd_bf, b_out, ws_bf,
                         k, block_rows, use_skip, emit_xc: bool = False,
                         y_is_x: bool | None = None):
    b, d = x.shape
    dout = y.shape[1]
    h = we_bf.shape[1]
    if y_is_x is None:  # autoencoding families: DMA each row once, not twice
        y_is_x = y is x
    in_specs = [
        pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        *([] if y_is_x else [
            pl.BlockSpec((block_rows, dout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]),
        pl.BlockSpec((d, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((h, dout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dout), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x, *([] if y_is_x else [y]), we_bf, b_enc.reshape(1, h), wd_bf,
            b_out.reshape(1, dout)]
    if use_skip:
        in_specs.append(
            pl.BlockSpec((d, dout), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        args.append(ws_bf)
    out_shape = [
        jax.ShapeDtypeStruct((b, h), jnp.bfloat16),     # latent (for bwd)
        jax.ShapeDtypeStruct((b, dout), jnp.float32),   # pred - y
        jax.ShapeDtypeStruct((1, 1), jnp.float32),      # sum of sq error
        jax.ShapeDtypeStruct((1, 1), jnp.float32),      # total active count
        jax.ShapeDtypeStruct((1, h), jnp.int32),        # any-active per feat
    ]
    out_specs = [
        pl.BlockSpec((block_rows, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, dout), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if k is None:  # ReLU mode: L1 sum + per-feature hidden-sum accumulators
        out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((1, h), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
    if emit_xc:
        out_shape.append(jax.ShapeDtypeStruct((b, d), jnp.bfloat16))
        out_specs.append(
            pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
    return pl.pallas_call(
        functools.partial(_fused_coder_kernel, k=k, use_skip=use_skip,
                          emit_xc=emit_xc, y_is_x=y_is_x),
        out_shape=tuple(out_shape),
        grid=(b // block_rows,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * h            # encode matmul
            + 2 * b * h * dout             # decode matmul
            + (2 * b * d * dout if use_skip else 0)
            + (33 if k is not None else 1) * b * h,
            bytes_accessed=b * (d if y_is_x else d + dout) * 4  # x (+ y)
            + (d * h + h * dout + (d * dout if use_skip else 0)) * 2
            + b * h * 2 + b * dout * 4,                # latent + resid out
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_transcoder_loss(x, y, w_enc, b_enc, w_dec, b_dec, w_skip, b_skip,
                          k, block_rows, use_skip, y_is_x=False):
    """(loss, l0, active, resid, hidden_bf16) of a TopK/Skip transcoder in
    one fused kernel (AMP/bf16).

    loss = mean((topk_mask(relu(x @ w_enc + b_enc), k) @ w_dec + b_dec
                 [+ x @ w_skip + b_skip] - y)^2) — the transcoder forward
    (reference transcoder.py:139-175, :355-390).  ``resid = pred - y`` and
    the bf16 latent are returned so callers can expose predicted/hidden
    without recomputation (dead-code-eliminated when unused).  When
    ``use_skip`` is False, w_skip/b_skip are untouched placeholders.
    Gradients match the unfused AMP path (bf16 matmuls, f32 accumulation).
    """
    loss, l0, active, resid, hid, _, _, _, _ = _fused_coder_impl(
        x, y, w_enc, b_enc, w_dec, b_dec, w_skip, b_skip, k, block_rows,
        use_skip, y_is_x
    )
    return loss, l0, active, resid, hid


def _fused_coder_impl(x, y, w_enc, b_enc, w_dec, b_dec, w_skip, b_skip,
                      k, block_rows, use_skip, y_is_x: bool | None = None):
    we_bf = w_enc.astype(jnp.bfloat16)
    wd_bf = w_dec.astype(jnp.bfloat16)
    ws_bf = w_skip.astype(jnp.bfloat16) if use_skip else None
    b_out = b_dec + b_skip if use_skip else b_dec
    emit_xc = _use_xc_residual()
    hid, resid, sq, l0s, act, *extra = _fused_coder_forward(
        x, y, we_bf, b_enc, wd_bf, b_out, ws_bf, k, block_rows, use_skip,
        emit_xc=emit_xc, y_is_x=y_is_x,
    )
    xc = extra.pop() if emit_xc else None
    b, dout = y.shape
    loss = sq[0, 0] / (b * dout)
    l0 = l0s[0, 0] / b
    active = act[0] > 0
    l1 = extra[0][0, 0] if extra else None
    hsum = extra[1][0] if extra else None  # [H] per-feature hidden sums
    return loss, l0, active, resid, hid, l1, hsum, xc, (we_bf, wd_bf, ws_bf)


def _fused_coder_vjp_fwd(x, y, w_enc, b_enc, w_dec, b_dec, w_skip, b_skip,
                         k, block_rows, use_skip, y_is_x=False):
    loss, l0, active, resid, hid, _, _, xc, (we_bf, wd_bf, ws_bf) = (
        _fused_coder_impl(
            x, y, w_enc, b_enc, w_dec, b_dec, w_skip, b_skip, k, block_rows,
            use_skip, y_is_x,
        )
    )
    y_proto = jnp.zeros((), y.dtype)  # carries y's dtype for the dy cotangent
    return (loss, l0, active, resid, hid), (
        x, y_proto, w_skip, b_skip, we_bf, wd_bf, ws_bf, hid, resid, xc
    )


def _fused_coder_vjp_bwd(k, block_rows, use_skip, y_is_x, res, g):
    # cotangents: loss (g[0]) is the training path; resid (g[3]) and the
    # exported latent (g[4]) are honored too so analysis code
    # differentiating through aux['predicted']/aux['hidden'] matches the
    # composed path.  l0/active are counts: gradient is zero a.e.
    gl, _, _, g_resid, g_hid = g
    x, y_proto, w_skip, b_skip, we_bf, wd_bf, ws_bf, hid, resid, xc = res
    b, dout = resid.shape
    # unused-output cotangents arrive as zero arrays; XLA folds the adds
    d_pred = resid * (2.0 * gl / (b * dout)) + g_resid
    dp_bf = d_pred.astype(jnp.bfloat16)
    dhidden = (
        jnp.dot(dp_bf, wd_bf.T, preferred_element_type=jnp.float32, precision=_MXU)
        + g_hid.astype(jnp.float32)
    )
    dpre = jnp.where(hid > 0, dhidden, 0.0)
    dpre_bf = dpre.astype(jnp.bfloat16)
    x_bf = x.astype(jnp.bfloat16) if xc is None else xc  # identical bits
    dw_enc = jnp.einsum(
        "bd,bh->dh", x_bf, dpre_bf, preferred_element_type=jnp.float32, precision=_MXU
    )
    db_enc = jnp.sum(dpre, axis=0)  # f32 accumulation (bf16 loses ~1e-3)
    dw_dec = jnp.einsum(
        "bh,bd->hd", hid, dp_bf, preferred_element_type=jnp.float32, precision=_MXU
    )
    db_dec = jnp.sum(d_pred, axis=0)
    # dx/dy are dead in training (the batch is not differentiated); XLA DCEs
    dx = jnp.dot(dpre_bf, we_bf.T, preferred_element_type=jnp.float32, precision=_MXU)
    if use_skip:
        dw_skip = jnp.einsum(
            "bd,bo->do", x_bf, dp_bf, preferred_element_type=jnp.float32, precision=_MXU
        )
        db_skip = db_dec  # b_dec and b_skip enter the prediction identically
        dx = dx + jnp.dot(dp_bf, ws_bf.T, preferred_element_type=jnp.float32, precision=_MXU)
    else:
        dw_skip = jnp.zeros_like(w_skip)
        db_skip = jnp.zeros_like(b_skip)
    # cotangent dtypes must match the primal avals (rows may arrive bf16
    # under out-of-core chunk staging); dx/dy are dead in training anyway
    dy = (-d_pred).astype(y_proto.dtype)
    return (dx.astype(x.dtype), dy, dw_enc, db_enc,
            dw_dec, db_dec, dw_skip, db_skip)


fused_transcoder_loss.defvjp(_fused_coder_vjp_fwd, _fused_coder_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_relu_sae_loss(x, w_enc, b_enc, w_dec, b_dec, sparsity_weight,
                        block_rows):
    """(loss, recon_loss, sparsity_loss, l0, active) of a ReLU+L1 SAE in
    one fused kernel (AMP/bf16).

    ReLU-SAE semantics (reference model.py:260-322: no pre-encoder bias):
    recon = relu(x @ w_enc + b_enc) @ w_dec + b_dec;
    loss = mean((recon - x)^2) + sparsity_weight * mean(|hidden|).
    The encode/decode matmuls, the L1/L0/active reductions, and the
    residual all happen in one VMEM pass (ReLU mode of the coder kernel).
    """
    out = _fused_coder_impl(
        x, x, w_enc, b_enc, w_dec, b_dec,
        jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
        None, block_rows, False, y_is_x=True,
    )
    recon_loss, l0, active, _, hid, l1, _, _, _ = out
    b, h = hid.shape
    sparsity = l1 / (b * h)
    return recon_loss + sparsity_weight * sparsity, recon_loss, sparsity, l0, active


def _fused_relu_vjp_fwd(x, w_enc, b_enc, w_dec, b_dec, sparsity_weight,
                        block_rows):
    recon_loss, l0, active, resid, hid, l1, _, xc, (we_bf, wd_bf, _) = (
        _fused_coder_impl(
            x, x, w_enc, b_enc, w_dec, b_dec,
            jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
            None, block_rows, False, y_is_x=True,
        )
    )
    b, h = hid.shape
    sparsity = l1 / (b * h)
    loss = recon_loss + sparsity_weight * sparsity
    return (loss, recon_loss, sparsity, l0, active), (
        x, we_bf, wd_bf, hid, resid, xc
    )


def _fused_relu_vjp_bwd(sparsity_weight, block_rows, res, g):
    # loss = recon_loss + sw * sparsity; honor the component-loss
    # cotangents too (unused ones arrive as zeros and fold away) so
    # differentiating aux['reconstruction_loss']/['sparsity_loss'] alone
    # matches the composed path.  l0/active are counts: zero a.e.
    gl, g_rec, g_sp, _, _ = g
    x, we_bf, wd_bf, hid, resid, xc = res
    b, d = x.shape
    h = hid.shape[1]
    d_recon = resid * (2.0 * (gl + g_rec) / (b * d))
    drec_bf = d_recon.astype(jnp.bfloat16)
    dhidden = jnp.dot(drec_bf, wd_bf.T, preferred_element_type=jnp.float32, precision=_MXU)
    # d/dh of mean(h) adds a constant on active entries (hidden >= 0,
    # so |h| == h); relu backward zeroes inactive entries either way
    dpre = jnp.where(
        hid > 0, dhidden + (gl * sparsity_weight + g_sp) / (b * h), 0.0
    )
    dpre_bf = dpre.astype(jnp.bfloat16)
    x_bf = x.astype(jnp.bfloat16) if xc is None else xc  # identical bits
    dw_enc = jnp.einsum(
        "bd,bh->dh", x_bf, dpre_bf, preferred_element_type=jnp.float32, precision=_MXU
    )
    db_enc = jnp.sum(dpre, axis=0)
    dw_dec = jnp.einsum(
        "bh,bd->hd", hid, drec_bf, preferred_element_type=jnp.float32, precision=_MXU
    )
    db_dec = jnp.sum(d_recon, axis=0)
    dx = (
        jnp.dot(dpre_bf, we_bf.T, preferred_element_type=jnp.float32, precision=_MXU) - d_recon
    ).astype(x.dtype)  # dead in training; XLA DCEs (dtype must match aval)
    return dx, dw_enc, db_enc, dw_dec, db_dec


fused_relu_sae_loss.defvjp(_fused_relu_vjp_fwd, _fused_relu_vjp_bwd)


# ---------------------------------------------------------------------------
# fused ReLU-crosscoder training forward.  On the flattened [B, L*D] view
# the ReLU crosscoder is the ReLU mode of the coder kernel with y = x; the
# one extra semantic is the decoder-norm-WEIGHTED L1
# (reference crosscoder.py:204-219): sparsity = mean_b(|h| @ norms) where
# norms[s] = ||w_dec[s,:,:]||_F.  The kernel's [1, S] hidden-sum
# accumulator turns that into a single [S]·[S] dot outside the kernel, and
# ``norms`` enters as an explicit differentiable input — its cotangent is
# c_sp * hsum, and XLA differentiates norms(w_dec) itself, so the
# d(norm)/d(w_dec) VJP term needs no kernel code at all.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_relu_crosscoder_loss(x, w_enc, b_enc, w_dec, b_dec, norms,
                               sparsity_weight, n_layers, block_rows):
    """(loss, recon_loss, sparsity_loss, l0, active) of a ReLU crosscoder
    on the flattened view, in one fused kernel (AMP/bf16).

    x: [B, L*D]; w_enc: [L*D, S]; w_dec: [S, L*D]; b_dec: [L*D];
    norms: [S] per-feature flat decoder norms (pass
    ``decoder_norms(params)`` — computed in XLA so its w_dec gradient
    composes automatically).  recon_loss = sum of per-layer MSEs
    = n_layers * flat MSE; sparsity = mean_b(hidden @ norms);
    loss = recon_loss + sparsity_weight * sparsity.
    """
    out = _fused_coder_impl(
        x, x, w_enc, b_enc, w_dec, b_dec,
        jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
        None, block_rows, False, y_is_x=True,
    )
    flat_loss, l0, active, _, hid, _, hsum, _, _ = out
    b = x.shape[0]
    recon_loss = n_layers * flat_loss
    sparsity = jnp.dot(hsum, norms, precision=_MXU) / b
    return (
        recon_loss + sparsity_weight * sparsity, recon_loss, sparsity, l0, active
    )


def _fused_relu_cc_vjp_fwd(x, w_enc, b_enc, w_dec, b_dec, norms,
                           sparsity_weight, n_layers, block_rows):
    out = _fused_coder_impl(
        x, x, w_enc, b_enc, w_dec, b_dec,
        jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
        None, block_rows, False, y_is_x=True,
    )
    flat_loss, l0, active, resid, hid, _, hsum, xc, (we_bf, wd_bf, _) = out
    b = x.shape[0]
    recon_loss = n_layers * flat_loss
    sparsity = jnp.dot(hsum, norms, precision=_MXU) / b
    loss = recon_loss + sparsity_weight * sparsity
    return (loss, recon_loss, sparsity, l0, active), (
        x, norms, we_bf, wd_bf, hid, resid, hsum, xc
    )


def _fused_relu_cc_vjp_bwd(sparsity_weight, n_layers, block_rows, res, g):
    # honor component-loss cotangents (unused ones arrive as zeros and
    # fold away); l0/active are counts: zero a.e.
    gl, g_rec, g_sp, _, _ = g
    x, norms, we_bf, wd_bf, hid, resid, hsum, xc = res
    b, ld = x.shape
    c_rec = 2.0 * n_layers * (gl + g_rec) / (b * ld)
    c_sp = (gl * sparsity_weight + g_sp) / b
    d_pred = resid * c_rec
    dp_bf = d_pred.astype(jnp.bfloat16)
    dhidden = (
        jnp.dot(dp_bf, wd_bf.T, preferred_element_type=jnp.float32, precision=_MXU)
        + c_sp * norms[None, :]
    )
    # hidden >= 0 under ReLU, so |h| == h and the relu backward gate is
    # exactly hid > 0
    dpre = jnp.where(hid > 0, dhidden, 0.0)
    dpre_bf = dpre.astype(jnp.bfloat16)
    x_bf = x.astype(jnp.bfloat16) if xc is None else xc  # identical bits
    dw_enc = jnp.einsum(
        "bd,bh->dh", x_bf, dpre_bf, preferred_element_type=jnp.float32, precision=_MXU
    )
    db_enc = jnp.sum(dpre, axis=0)  # f32 accumulation (bf16 loses ~1e-3)
    dw_dec = jnp.einsum(
        "bh,bd->hd", hid, dp_bf, preferred_element_type=jnp.float32, precision=_MXU
    )
    db_dec = jnp.sum(d_pred, axis=0)
    dnorms = c_sp * hsum
    # x is both encode input and target; dead in training (XLA DCEs)
    dx = (
        jnp.dot(dpre_bf, we_bf.T, preferred_element_type=jnp.float32, precision=_MXU) - d_pred
    ).astype(x.dtype)
    return dx, dw_enc, db_enc, dw_dec, db_dec, dnorms


fused_relu_crosscoder_loss.defvjp(_fused_relu_cc_vjp_fwd, _fused_relu_cc_vjp_bwd)


# ---------------------------------------------------------------------------
# scalar-prefetch indexed coder forwards: the coder-family analogue of
# fused_sae_loss_indexed.  The epoch scan passes its step index as a
# scalar-prefetch argument and the x/y BlockSpec index_maps offset the
# row-block reads into the full [steps*B, ...] epoch buffers — no per-step
# dynamic-slice materialization feeding the opaque pallas_call.  Centered
# bf16 rows always persist as the VJP residual, so the backward never
# touches the buffers.  Training-only: these return just the loss/metric
# outputs (the full wrappers above keep the resid/hidden export surface).
# ---------------------------------------------------------------------------


def _fused_coder_kernel_indexed(step_ref, *refs, k, use_skip, emit_xc,
                                y_is_x=False):
    del step_ref  # consumed by the BlockSpec index maps only
    _fused_coder_kernel(*refs, k=k, use_skip=use_skip, emit_xc=emit_xc,
                        y_is_x=y_is_x)


def _fused_coder_forward_indexed(xbuf, ybuf, step, we_bf, b_enc, wd_bf,
                                 b_out, ws_bf, k, block_rows, batch,
                                 use_skip, y_is_x: bool | None = None):
    d = xbuf.shape[1]
    dout = ybuf.shape[1]
    h = we_bf.shape[1]
    blocks = batch // block_rows
    if y_is_x is None:  # autoencoding: DMA each row once, not twice
        y_is_x = ybuf is xbuf

    def xmap(i, s):
        return (s[0] * blocks + i, 0)

    def fixed(i, s):
        return (0, 0)

    def omap(i, s):
        return (i, 0)

    in_specs = [
        pl.BlockSpec((block_rows, d), xmap, memory_space=pltpu.VMEM),
        *([] if y_is_x else [
            pl.BlockSpec((block_rows, dout), xmap, memory_space=pltpu.VMEM),
        ]),
        pl.BlockSpec((d, h), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((h, dout), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dout), fixed, memory_space=pltpu.VMEM),
    ]
    args = [
        jnp.asarray(step, jnp.int32).reshape(1), xbuf,
        *([] if y_is_x else [ybuf]), we_bf,
        b_enc.reshape(1, h), wd_bf, b_out.reshape(1, dout),
    ]
    if use_skip:
        in_specs.append(
            pl.BlockSpec((d, dout), fixed, memory_space=pltpu.VMEM)
        )
        args.append(ws_bf)
    out_shape = [
        jax.ShapeDtypeStruct((batch, h), jnp.bfloat16),     # latent
        jax.ShapeDtypeStruct((batch, dout), jnp.float32),   # pred - y
        jax.ShapeDtypeStruct((1, 1), jnp.float32),          # sum sq error
        jax.ShapeDtypeStruct((1, 1), jnp.float32),          # active count
        jax.ShapeDtypeStruct((1, h), jnp.int32),            # any-active
    ]
    out_specs = [
        pl.BlockSpec((block_rows, h), omap, memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, dout), omap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), fixed, memory_space=pltpu.VMEM),
    ]
    if k is None:  # ReLU mode: L1 sum + per-feature hidden-sum accumulators
        out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1), fixed, memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, h), jnp.float32))
        out_specs.append(pl.BlockSpec((1, h), fixed, memory_space=pltpu.VMEM))
    out_shape.append(jax.ShapeDtypeStruct((batch, d), jnp.bfloat16))  # xc
    out_specs.append(
        pl.BlockSpec((block_rows, d), omap, memory_space=pltpu.VMEM)
    )
    return pl.pallas_call(
        functools.partial(_fused_coder_kernel_indexed, k=k, use_skip=use_skip,
                          emit_xc=True, y_is_x=y_is_x),
        out_shape=tuple(out_shape),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(blocks,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * d * h + 2 * batch * h * dout
            + (2 * batch * d * dout if use_skip else 0)
            + (33 if k is not None else 1) * batch * h,
            bytes_accessed=batch * (d if y_is_x else d + dout) * 4
            + (d * h + h * dout + (d * dout if use_skip else 0)) * 2
            + batch * h * 2 + batch * dout * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*args)


def _fused_coder_indexed_impl(xbuf, ybuf, step, w_enc, b_enc, w_dec, b_dec,
                              w_skip, b_skip, k, block_rows, batch, use_skip,
                              y_is_x: bool | None = None):
    we_bf = w_enc.astype(jnp.bfloat16)
    wd_bf = w_dec.astype(jnp.bfloat16)
    ws_bf = w_skip.astype(jnp.bfloat16) if use_skip else None
    b_out = b_dec + b_skip if use_skip else b_dec
    hid, resid, sq, l0s, act, *extra = _fused_coder_forward_indexed(
        xbuf, ybuf, step, we_bf, b_enc, wd_bf, b_out, ws_bf, k, block_rows,
        batch, use_skip, y_is_x=y_is_x,
    )
    xc = extra.pop()
    dout = ybuf.shape[1]
    loss = sq[0, 0] / (batch * dout)
    l0 = l0s[0, 0] / batch
    active = act[0] > 0
    l1 = extra[0][0, 0] if extra else None
    hsum = extra[1][0] if extra else None
    return loss, l0, active, hid, resid, l1, hsum, xc, (we_bf, wd_bf, ws_bf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def fused_transcoder_loss_indexed(xbuf, ybuf, step, w_enc, b_enc, w_dec,
                                  b_dec, w_skip, b_skip, k, block_rows,
                                  batch, use_skip, y_is_x=False):
    """fused_transcoder_loss over the windows ``xbuf/ybuf[step*batch:
    (step+1)*batch]``, selected inside the kernel via scalar prefetch.
    The TopK crosscoder's flattened view passes xbuf is ybuf (y = x).
    Returns (loss, l0, active); buffers are not differentiated."""
    loss, l0, active, *_ = _fused_coder_indexed_impl(
        xbuf, ybuf, step, w_enc, b_enc, w_dec, b_dec, w_skip, b_skip,
        k, block_rows, batch, use_skip, y_is_x,
    )
    return loss, l0, active


def _fused_tc_idx_vjp_fwd(xbuf, ybuf, step, w_enc, b_enc, w_dec, b_dec,
                          w_skip, b_skip, k, block_rows, batch, use_skip,
                          y_is_x=False):
    loss, l0, active, hid, resid, _, _, xc, (we_bf, wd_bf, ws_bf) = (
        _fused_coder_indexed_impl(
            xbuf, ybuf, step, w_enc, b_enc, w_dec, b_dec, w_skip, b_skip,
            k, block_rows, batch, use_skip, y_is_x,
        )
    )
    return (loss, l0, active), (
        xbuf, ybuf, w_skip, b_skip, we_bf, wd_bf, hid, resid, xc
    )


def _fused_tc_idx_vjp_bwd(k, block_rows, batch, use_skip, y_is_x, res, g):
    gl = g[0]  # l0/active are metrics: zero a.e.
    xbuf, ybuf, w_skip, b_skip, we_bf, wd_bf, hid, resid, xc = res
    dout = resid.shape[1]
    d_pred = resid * (2.0 * gl / (batch * dout))
    dp_bf = d_pred.astype(jnp.bfloat16)
    dhidden = jnp.dot(dp_bf, wd_bf.T, preferred_element_type=jnp.float32, precision=_MXU)
    dpre = jnp.where(hid > 0, dhidden, 0.0)
    dpre_bf = dpre.astype(jnp.bfloat16)
    dw_enc = jnp.einsum(
        "bd,bh->dh", xc, dpre_bf, preferred_element_type=jnp.float32, precision=_MXU
    )
    db_enc = jnp.sum(dpre, axis=0)
    dw_dec = jnp.einsum(
        "bh,bd->hd", hid, dp_bf, preferred_element_type=jnp.float32, precision=_MXU
    )
    db_dec = jnp.sum(d_pred, axis=0)
    if use_skip:
        dw_skip = jnp.einsum(
            "bd,bo->do", xc, dp_bf, preferred_element_type=jnp.float32, precision=_MXU
        )
        db_skip = db_dec  # b_dec and b_skip enter the prediction identically
    else:
        dw_skip = jnp.zeros_like(w_skip)
        db_skip = jnp.zeros_like(b_skip)
    dstep = np.zeros((), dtype=jax.dtypes.float0)
    # buffer cotangents are dead (zeros, DCE'd by the transpose)
    return (jnp.zeros_like(xbuf), jnp.zeros_like(ybuf), dstep,
            dw_enc, db_enc, dw_dec, db_dec, dw_skip, db_skip)


fused_transcoder_loss_indexed.defvjp(_fused_tc_idx_vjp_fwd, _fused_tc_idx_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_relu_sae_loss_indexed(buf, step, w_enc, b_enc, w_dec, b_dec,
                                sparsity_weight, block_rows, batch):
    """fused_relu_sae_loss over ``buf[step*batch:(step+1)*batch]``,
    window-selected inside the kernel (scalar prefetch, y = x)."""
    out = _fused_coder_indexed_impl(
        buf, buf, step, w_enc, b_enc, w_dec, b_dec,
        jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
        None, block_rows, batch, False, y_is_x=True,
    )
    recon_loss, l0, active, hid, _, l1, _, _, _ = out
    h = hid.shape[1]
    sparsity = l1 / (batch * h)
    return (recon_loss + sparsity_weight * sparsity, recon_loss, sparsity,
            l0, active)


def _fused_relu_idx_vjp_fwd(buf, step, w_enc, b_enc, w_dec, b_dec,
                            sparsity_weight, block_rows, batch):
    out = _fused_coder_indexed_impl(
        buf, buf, step, w_enc, b_enc, w_dec, b_dec,
        jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
        None, block_rows, batch, False, y_is_x=True,
    )
    recon_loss, l0, active, hid, resid, l1, _, xc, (we_bf, wd_bf, _) = out
    h = hid.shape[1]
    sparsity = l1 / (batch * h)
    loss = recon_loss + sparsity_weight * sparsity
    return (loss, recon_loss, sparsity, l0, active), (
        buf, we_bf, wd_bf, hid, resid, xc
    )


def _fused_relu_idx_vjp_bwd(sparsity_weight, block_rows, batch, res, g):
    gl, g_rec, g_sp, _, _ = g
    buf, we_bf, wd_bf, hid, resid, xc = res
    d = resid.shape[1]
    h = hid.shape[1]
    d_recon = resid * (2.0 * (gl + g_rec) / (batch * d))
    drec_bf = d_recon.astype(jnp.bfloat16)
    dhidden = jnp.dot(drec_bf, wd_bf.T, preferred_element_type=jnp.float32, precision=_MXU)
    dpre = jnp.where(
        hid > 0, dhidden + (gl * sparsity_weight + g_sp) / (batch * h), 0.0
    )
    dpre_bf = dpre.astype(jnp.bfloat16)
    dw_enc = jnp.einsum(
        "bd,bh->dh", xc, dpre_bf, preferred_element_type=jnp.float32, precision=_MXU
    )
    db_enc = jnp.sum(dpre, axis=0)
    dw_dec = jnp.einsum(
        "bh,bd->hd", hid, drec_bf, preferred_element_type=jnp.float32, precision=_MXU
    )
    db_dec = jnp.sum(d_recon, axis=0)
    dstep = np.zeros((), dtype=jax.dtypes.float0)
    return jnp.zeros_like(buf), dstep, dw_enc, db_enc, dw_dec, db_dec


fused_relu_sae_loss_indexed.defvjp(_fused_relu_idx_vjp_fwd, _fused_relu_idx_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_relu_crosscoder_loss_indexed(buf, step, w_enc, b_enc, w_dec, b_dec,
                                       norms, sparsity_weight, n_layers,
                                       block_rows, batch):
    """fused_relu_crosscoder_loss over ``buf[step*batch:(step+1)*batch]``
    (the flattened [N, L*D] view), window-selected inside the kernel."""
    out = _fused_coder_indexed_impl(
        buf, buf, step, w_enc, b_enc, w_dec, b_dec,
        jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
        None, block_rows, batch, False, y_is_x=True,
    )
    flat_loss, l0, active, _, _, _, hsum, _, _ = out
    recon_loss = n_layers * flat_loss
    sparsity = jnp.dot(hsum, norms, precision=_MXU) / batch
    return (recon_loss + sparsity_weight * sparsity, recon_loss, sparsity,
            l0, active)


def _fused_relu_cc_idx_vjp_fwd(buf, step, w_enc, b_enc, w_dec, b_dec, norms,
                               sparsity_weight, n_layers, block_rows, batch):
    out = _fused_coder_indexed_impl(
        buf, buf, step, w_enc, b_enc, w_dec, b_dec,
        jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
        None, block_rows, batch, False, y_is_x=True,
    )
    flat_loss, l0, active, hid, resid, _, hsum, xc, (we_bf, wd_bf, _) = out
    recon_loss = n_layers * flat_loss
    sparsity = jnp.dot(hsum, norms, precision=_MXU) / batch
    loss = recon_loss + sparsity_weight * sparsity
    return (loss, recon_loss, sparsity, l0, active), (
        buf, norms, we_bf, wd_bf, hid, resid, hsum, xc
    )


def _fused_relu_cc_idx_vjp_bwd(sparsity_weight, n_layers, block_rows, batch,
                               res, g):
    gl, g_rec, g_sp, _, _ = g
    buf, norms, we_bf, wd_bf, hid, resid, hsum, xc = res
    ld = resid.shape[1]
    c_rec = 2.0 * n_layers * (gl + g_rec) / (batch * ld)
    c_sp = (gl * sparsity_weight + g_sp) / batch
    d_pred = resid * c_rec
    dp_bf = d_pred.astype(jnp.bfloat16)
    dhidden = (
        jnp.dot(dp_bf, wd_bf.T, preferred_element_type=jnp.float32, precision=_MXU)
        + c_sp * norms[None, :]
    )
    dpre = jnp.where(hid > 0, dhidden, 0.0)
    dpre_bf = dpre.astype(jnp.bfloat16)
    dw_enc = jnp.einsum(
        "bd,bh->dh", xc, dpre_bf, preferred_element_type=jnp.float32, precision=_MXU
    )
    db_enc = jnp.sum(dpre, axis=0)
    dw_dec = jnp.einsum(
        "bh,bd->hd", hid, dp_bf, preferred_element_type=jnp.float32, precision=_MXU
    )
    db_dec = jnp.sum(d_pred, axis=0)
    dnorms = c_sp * hsum
    dstep = np.zeros((), dtype=jax.dtypes.float0)
    return (jnp.zeros_like(buf), dstep, dw_enc, db_enc, dw_dec, db_dec,
            dnorms)


fused_relu_crosscoder_loss_indexed.defvjp(
    _fused_relu_cc_idx_vjp_fwd, _fused_relu_cc_idx_vjp_bwd
)


def fused_coder_supported(x_shape, out_dim: int, hidden_dim: int,
                          with_skip: bool = False) -> bool:
    """Transcoder fused-loss geometry: all weights VMEM-resident, lane-
    aligned dims, and a row count the block size divides.

    ``WST_DISABLE_FUSED_CODER=1`` forces the composed XLA path for every
    fused training forward (SAE / transcoder / ReLU / crosscoder) — the
    A/B lever that separates "bf16 numerics" from "fused-kernel
    specifics" in the quality gates (tools/quality_gate.py)."""
    if os.environ.get("WST_DISABLE_FUSED_CODER"):
        return False
    if not supported(x_shape, hidden_dim) or out_dim % 128 != 0:
        return False
    d = x_shape[1]
    w_bytes = (d * hidden_dim + hidden_dim * out_dim) * 2
    if with_skip:
        w_bytes += d * out_dim * 2
    if w_bytes > _MAX_W_VMEM_BYTES:
        return False
    return x_shape[0] % pick_block_rows(x_shape[0], hidden_dim, d) == 0


# ---------------------------------------------------------------------------
# blocked variant for large H (whisper-large 32x: w_enc bf16 = 105 MB,
# far beyond VMEM).  The XLA fallback it replaces re-reads the [B, H] f32
# pre-activation from HBM on every one of the 32 bisection passes
# (~43 GB per 8k-row step at H=40960 -> ~120k act/s).  Here the grid is
# (row_blocks, h_blocks): per row block, w_enc streams through VMEM once
# in [D, h_blk] tiles, pre tiles accumulate in a [n_h, rows, h_blk] f32
# scratch, and at the last h step the bisection runs entirely in VMEM
# (counts summed over the statically-unrolled chunks) and the masked
# latent is written once.  w_enc is re-streamed B/rows times per step —
# the remaining HBM term, removed by sharding H over ``model`` (TP).
# ---------------------------------------------------------------------------


def _encode_kernel_blocked(
    x_ref, w_ref, benc_ref, bpre_ref, out_ref, xi_ref, *, k: int, n_h: int
):
    j = pl.program_id(1)
    xc = (x_ref[:] - bpre_ref[:]).astype(jnp.bfloat16)
    pre = (
        jnp.dot(xc, w_ref[:], preferred_element_type=jnp.float32, precision=_MXU)
        + benc_ref[:]
    )
    # scratch holds the monotone-int transform (computed once; the f32
    # value is recovered exactly by the inverse at write time — paying
    # the transform inside the 32-pass loop costs ~2 extra ops/elem/pass)
    bits = pltpu.bitcast(pre, jnp.int32)
    xi_ref[j] = jnp.where(bits < 0, _INT_MIN - bits - 1, bits)

    @pl.when(j == n_h - 1)
    def _bisect_and_write():
        rows = out_ref.shape[0]
        h_blk = out_ref.shape[1] // n_h
        lo = jnp.full((rows, 1), jnp.int32(-2147483647))
        hi = jnp.full((rows, 1), jnp.int32(2147483647))

        def body(_, lohi):
            lo, hi = lohi
            mid = (
                jnp.right_shift(lo, 1) + jnp.right_shift(hi, 1) + (lo & hi & 1)
            )
            cnt = jnp.zeros((rows, 1), jnp.int32)
            for c in range(n_h):  # static unroll over VMEM chunks
                cnt = cnt + jnp.sum(
                    (xi_ref[c] >= mid).astype(jnp.int32), axis=1, keepdims=True
                )
            take = cnt >= k
            return jnp.where(take, mid, lo), jnp.where(take, hi, mid)

        lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
        for c in range(n_h):
            xi = xi_ref[c]
            pre = pltpu.bitcast(
                jnp.where(xi < 0, _INT_MIN - xi - 1, xi), jnp.float32
            )
            hidden = jnp.where(xi >= lo, jnp.maximum(pre, 0.0), 0.0)
            out_ref[:, c * h_blk:(c + 1) * h_blk] = hidden.astype(out_ref.dtype)


def _encode_forward_blocked(x, w_enc_bf, b_enc, b_pre, k, block_rows, out_dtype):
    b, d = x.shape
    h = w_enc_bf.shape[1]
    h_blk = _pick_h_block(h)
    n_h = h // h_blk
    # rows are chosen here (the caller's block_rows is sized for the
    # single-block kernel): per-row VMEM = int32 scratch + the out tile
    # (which Pallas double-buffers), and every halving of rows doubles how
    # often w_enc re-streams from HBM
    per_row = h * (4 + 2 * jnp.dtype(out_dtype).itemsize)
    budget = 88 * 1024 * 1024
    block_rows = min(b, 8)
    for candidate in (512, 256, 128, 64, 32, 16, 8):
        if b % candidate == 0 and candidate * per_row <= budget:
            block_rows = candidate
            break
    grid = (pl.cdiv(b, block_rows), n_h)
    return pl.pallas_call(
        functools.partial(_encode_kernel_blocked, k=k, n_h=n_h),
        out_shape=jax.ShapeDtypeStruct((b, h), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, h_blk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_blk), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, h), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((n_h, block_rows, h_blk), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * h + 33 * b * h,
            bytes_accessed=b * d * 4
            + d * h * 2 * pl.cdiv(b, block_rows)
            + b * h * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x, w_enc_bf, b_enc.reshape(1, h), b_pre.reshape(1, d))


def _pick_h_block(h: int) -> int:
    for candidate in (2048, 1024, 512, 256, 128):
        if h % candidate == 0:
            return candidate
    return h


# single-block kernel limit: all of w_enc (bf16) resident in VMEM
_MAX_W_VMEM_BYTES = 48 * 1024 * 1024
# blocked kernel limit: one 8-row pre scratch must fit
_MAX_H = 1 << 20


def uses_blocked(x_shape, hidden_dim: int) -> bool:
    return x_shape[1] * hidden_dim * 2 > _MAX_W_VMEM_BYTES


def supported(x_shape, hidden_dim: int) -> bool:
    try:
        platform = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    return (
        platform not in ("cpu",)
        and len(x_shape) == 2
        and hidden_dim % 128 == 0
        and x_shape[1] % 128 == 0
        and hidden_dim <= _MAX_H
    )


def pick_block_rows(b: int, h: int | None = None, d: int | None = None) -> int:
    # 512-row blocks measured fastest at whisper-tiny geometry (the
    # bisection loop amortizes better over bigger tiles); shrink so the
    # f32 pre + int32 tile stays within ~24 MB of VMEM at larger H.
    # (The blocked large-H kernel sizes its own row blocks — see
    # _encode_forward_blocked; this value is ignored there.)
    del d
    budget = 24 * 1024 * 1024
    for candidate in (512, 256, 128, 64, 32, 16, 8):
        if b % candidate == 0 and (h is None or candidate * h * 8 <= budget):
            return candidate
    return min(b, 8)
