"""Sharding rules for SAE training over a ``(data, model)`` mesh.

Replaces the reference's absent distributed layer (SURVEY §2.9): the token
batch is sharded over ``data`` (XLA inserts the gradient all-reduce over
ICI), and the SAE feature dimension H is optionally sharded over ``model``
for tensor parallelism at whisper-large scale (H = 1280 * 32x).

Shape-based rules (the SAE param dict has distinct shapes per role):
    [D, H]  w_enc (and AdamW moments)   -> P(None, "model")
    [H, D]  w_dec                       -> P("model", None)
    [H]     b_enc, feature_last_activated -> P("model")
    [D]     b_dec, b_pre                -> replicated
    scalars                             -> replicated
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def axis_sizes(params: dict) -> tuple[int, int]:
    """(d, h) for the shape rules — the 2-D ``w_enc`` when present,
    else (-1, -1) (no rule matches: everything replicates)."""
    w_enc = params.get("w_enc") if isinstance(params, dict) else None
    if w_enc is not None and getattr(w_enc, "ndim", 0) == 2:
        d, h = w_enc.shape
        return d, h
    return -1, -1


def leaf_pspec(shape: tuple[int, ...], d: int, h: int) -> P:
    if shape == (d, h):
        return P(None, MODEL_AXIS)
    if shape == (h, d):
        return P(MODEL_AXIS, None)
    if shape == (h,):
        return P(MODEL_AXIS)
    return P()


def place_tree(mesh: Mesh, tree: Any, d: int, h: int) -> Any:
    """device_put every leaf according to the shape rules."""
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(
            leaf, NamedSharding(mesh, leaf_pspec(np.shape(leaf), d, h))
        ),
        tree,
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS, None))


def shard_train_step(step: Callable, mesh: Mesh) -> Callable:
    """Wrap a (params, opt_state, dstate, batch) -> (...) step for the mesh.

    State placement is the trainer's responsibility (SAETrainer.
    _place_on_mesh — a trainer-level latch so host-side resampling can
    invalidate and re-place); this wrapper only shards the incoming batch.
    XLA's SPMD partitioner inserts the gradient psum over ``data``.
    """
    jitted = jax.jit(step, donate_argnums=(0, 1, 2))
    bsharding = batch_sharding(mesh)

    def wrapped(params, opt_state, dstate, batch):
        batch = jax.device_put(batch, bsharding)
        return jitted(params, opt_state, dstate, batch)

    return wrapped
