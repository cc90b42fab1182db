"""Top-k sparse-coding ops (XLA path).

These implement the exact op order of the reference encode
(/root/reference/src/whisper_sae/sae/model.py:98-118):

    pre = (x - b_pre) @ W_enc + b_enc
    vals, idx = top_k(pre, k)          # k largest pre-activations
    hidden = scatter(zeros, idx, relu(vals))

Note the relu is applied *after* selection, so a token can have fewer than
k nonzeros if some of its top-k pre-activations are negative — tests and
downstream metrics depend on this exact order, not an idealized top-k.

TPU-first design: the decode never materializes a dense [B, H] @ [H, D]
matmul.  Because only k << H latents are nonzero, reconstruction is a
gather of the k selected decoder rows followed by a tiny [B, k] x
[B, k, D] contraction — ~k/H of the dense-decode FLOPs (k=32, H=3072
means ~1%).  The dense ``hidden`` is only built when the caller asks for
it (the public ``encode`` contract returns it).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def topk_select(pre: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """k largest pre-activations per row, relu'd.

    Returns:
        vals: [..., k] relu(top-k values), descending order.
        idx:  [..., k] int32 indices into the feature dim.
    """
    vals, idx = jax.lax.top_k(pre, k)
    return jax.nn.relu(vals), idx


def scatter_topk(vals: jax.Array, idx: jax.Array, hidden_dim: int) -> jax.Array:
    """Scatter [..., k] (vals, idx) into a dense [..., hidden_dim] array."""
    lead = vals.shape[:-1]
    v2 = vals.reshape(-1, vals.shape[-1])
    i2 = idx.reshape(-1, idx.shape[-1])
    dense = _scatter_batched(jnp.zeros((v2.shape[0], hidden_dim), vals.dtype), i2, v2)
    return dense.reshape(*lead, hidden_dim)


def _scatter_batched(dense: jax.Array, idx: jax.Array, vals: jax.Array) -> jax.Array:
    # top_k indices within a row are unique, so the scatter can skip the
    # duplicate-handling path.
    b_idx = jnp.arange(dense.shape[0])[:, None]
    return dense.at[b_idx, idx].set(vals, unique_indices=True)


def sparse_decode(
    vals: jax.Array, idx: jax.Array, w_dec: jax.Array, b_dec: jax.Array
) -> jax.Array:
    """Reconstruct from the k active latents only.

    Args:
        vals: [B, k] active latent values (already relu'd).
        idx:  [B, k] latent indices.
        w_dec: [H, D] decoder (feature rows).
        b_dec: [D] decoder bias.

    Returns:
        [B, D] reconstruction = sum_k vals[:, k] * w_dec[idx[:, k]] + b_dec.
    """
    rows = w_dec[idx]  # [B, k, D] gather
    recon = jnp.einsum(
        "bk,bkd->bd", vals.astype(rows.dtype), rows,
        preferred_element_type=jnp.float32,
    )
    return recon + b_dec


def topk_encode(
    x: jax.Array,
    w_enc: jax.Array,
    b_enc: jax.Array,
    b_pre: jax.Array | None,
    k: int,
    compute_dtype: jnp.dtype = jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Fused centering + encoder matmul + top-k selection.

    Returns (vals [B,k] relu'd, idx [B,k]).  The matmul runs in
    ``compute_dtype`` (bf16 for the AMP path) with f32 accumulation on the
    MXU; selection happens in f32.
    """
    xc = x - b_pre if b_pre is not None else x
    pre = (
        jnp.dot(
            xc.astype(compute_dtype),
            w_enc.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        + b_enc
    )
    return topk_select(pre, k)


@partial(jax.jit, static_argnames=("k", "hidden_dim"))
def topk_activation(pre: jax.Array, k: int, hidden_dim: int) -> jax.Array:
    """Dense top-k activation: relu(top-k(pre)) scattered into [..., H]."""
    vals, idx = topk_select(pre, k)
    return scatter_topk(vals, idx, hidden_dim)
