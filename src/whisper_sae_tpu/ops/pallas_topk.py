"""Pallas TPU kernel for the dense top-k mask activation.

The XLA bisection path (ops/topk.py) is exact and sort-free but re-reads
the [B, H] pre-activation from HBM on every one of its 32 count passes —
~12.8 GB of traffic per 32k-token step.  This kernel tiles rows into
VMEM, runs the full 32-iteration bit-bisection on-chip, and writes the
masked activation out: pre is read from HBM exactly once.

Semantics are identical to ``ops.topk.topk_mask_dense`` (exact k-th-value
threshold; relu after selection) and a custom VJP routes gradients to the
selected positive entries only, matching torch's topk+relu backward
(reference model.py:114-116).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INT_MIN = np.int32(-2147483648)


def _mask_kernel(pre_ref, out_ref, *, k: int):
    pre = pre_ref[:]  # [bB, H] f32 in VMEM
    x = pltpu.bitcast(pre, jnp.int32)
    x = jnp.where(x < 0, _INT_MIN - x - 1, x)

    rows = pre.shape[0]
    lo = jnp.full((rows, 1), jnp.int32(-2147483647))
    hi = jnp.full((rows, 1), jnp.int32(2147483647))

    def body(_, lohi):
        lo, hi = lohi
        mid = jnp.right_shift(lo, 1) + jnp.right_shift(hi, 1) + (lo & hi & 1)
        cnt = jnp.sum((x >= mid).astype(jnp.int32), axis=1, keepdims=True)
        take = cnt >= k
        return jnp.where(take, mid, lo), jnp.where(take, hi, mid)

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    out_ref[:] = jnp.where(x >= lo, jnp.maximum(pre, 0.0), 0.0)


def _mask_forward(pre: jax.Array, k: int, block_rows: int) -> jax.Array:
    b, h = pre.shape
    grid = pl.cdiv(b, block_rows)
    return pl.pallas_call(
        functools.partial(_mask_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((b, h), pre.dtype),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block_rows, h), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (block_rows, h), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=33 * b * h, bytes_accessed=2 * b * h * 4, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(pre)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def topk_mask_pallas(pre: jax.Array, k: int, block_rows: int = 128) -> jax.Array:
    """Exact dense top-k mask activation, single HBM read of ``pre``."""
    return _mask_forward(pre, k, block_rows)


def _fwd(pre, k, block_rows):
    hidden = _mask_forward(pre, k, block_rows)
    return hidden, hidden


def _bwd(k, block_rows, hidden, g):
    # gradient flows exactly to selected entries with positive activation
    return (jnp.where(hidden > 0, g, 0.0),)


topk_mask_pallas.defvjp(_fwd, _bwd)


def supported(pre_shape: tuple[int, ...]) -> bool:
    """Pallas path is TPU-only, wants lane-aligned feature dims, and must
    fit a (block_rows, H) f32 tile + int32 copy in VMEM."""
    if len(pre_shape) != 2:
        return False
    try:
        platform = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    min_tile_bytes = 8 * pre_shape[1] * 8  # pre f32 + xi int32, 8 rows
    return (
        platform not in ("cpu",)
        and pre_shape[1] % 128 == 0
        and min_tile_bytes <= 16 * 1024 * 1024
    )


def pick_block_rows(b: int, h: int) -> int:
    """Largest row block that divides the batch and keeps the f32+int32
    tile within ~16 MB of VMEM (H=3072 -> 256 rows; H=40960 -> 32)."""
    budget = 16 * 1024 * 1024
    for candidate in (256, 128, 64, 32, 16, 8):
        if b % candidate == 0 and candidate * h * 8 <= budget:
            return candidate
    return min(b, 8)
