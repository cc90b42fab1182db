"""Explicit shard_map train step for dp x tp TopK-SAE training.

The generic trainer path jits the step with sharded inputs and lets
GSPMD place collectives.  That is fine for pure data parallelism, but
with the SAE feature dim sharded over ``model`` the partitioner treats
the Pallas encode kernel as opaque and falls back to gathering.  This
module writes the communication explicitly:

    pre_local    = (x_local - b_pre) @ w_enc_local            (no comms)
    hidden_local = top-k mask with GLOBAL threshold            (32 x [B,1]
                   int32 psum over ``model`` — parallel/tp_topk.py)
    recon        = psum_model(hidden_local @ w_dec_local)      (one [B, D]
                   all-reduce over ICI)
    loss         = psum_data(local squared error) / N
    grads        = jax.grad through the collectives, then
                   psum over ``data`` (the gradient all-reduce)

Per-feature state (b_enc, dead-feature counters) and w_enc/w_dec stay
fully sharded; decoder renorm is local because w_dec rows (feature
directions) are complete on their shard.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.sae import DeadFeatureState, dead_feature_mask, update_dead_state
from .mesh import DATA_AXIS, MODEL_AXIS
from .sharding import leaf_pspec
from .tp_topk import topk_mask_sharded

PARAM_SPECS = {
    "w_enc": P(None, MODEL_AXIS),
    "b_enc": P(MODEL_AXIS),
    "w_dec": P(MODEL_AXIS, None),
    "b_dec": P(),
    "b_pre": P(),
}
DSTATE_SPECS = DeadFeatureState(feature_last_activated=P(MODEL_AXIS), step_count=P())


def psum_identity_vjp(x: jax.Array, axis_name: str) -> jax.Array:
    """psum whose VJP passes the cotangent through unchanged.

    Inside ``shard_map(check_vma=False)`` the default transpose of
    ``psum`` is another psum, which scales every upstream gradient by the
    axis size (measured: w_enc grads 8x on a 2x4 mesh).  When the output
    cotangent is replicated over ``axis_name`` — true for the recon/loss
    reductions here, where every shard computes the same downstream math —
    the exact VJP of ``sum_over_shards`` is the identity, which is what
    this wrapper pins down.  The primal value is the genuine psum, so it
    is bitwise identical on every participating shard.
    """

    @jax.custom_vjp
    def f(v):
        return jax.lax.psum(v, axis_name)

    f.defvjp(lambda v: (jax.lax.psum(v, axis_name), None), lambda _, g: (g,))
    return f(x)


def _distributed_clip(grads: dict, clip: float):
    """Global-norm clip where model-sharded leaves contribute their psum'd
    squares (optax's clip inside shard_map would see only local norms)."""
    sq = jnp.zeros((), jnp.float32)
    sq_sharded = jnp.zeros((), jnp.float32)
    for name, g in grads.items():
        s = jnp.sum(jnp.square(g).astype(jnp.float32))
        if PARAM_SPECS[name] == P():
            sq = sq + s
        else:
            sq_sharded = sq_sharded + s
    total = sq + jax.lax.psum(sq_sharded, MODEL_AXIS)
    norm = jnp.sqrt(total)
    scale = clip / jnp.maximum(norm, clip)
    return jax.tree_util.tree_map(lambda g: g * scale, grads)


def _make_local_step(
    optimizer: optax.GradientTransformation,
    k: int,
    compute_dtype,
    n_data: int,
    n_model: int,
    dead_feature_threshold: int,
    renorm: bool,
    gradient_clip: float | None,
) -> Callable:
    """The per-shard step body shared by the per-step and fused-epoch
    shard_map programs: (params, opt_state, dstate, batch_local) ->
    (params, opt_state, dstate, metrics of replicated scalars)."""

    def local_step(params, opt_state, dstate, batch):
        def loss_fn(p):
            xc = batch - p["b_pre"]
            pre = (
                jnp.dot(
                    xc.astype(compute_dtype),
                    p["w_enc"].astype(compute_dtype),
                    preferred_element_type=jnp.float32,
                )
                + p["b_enc"]
            )
            hidden = topk_mask_sharded(pre, k, MODEL_AXIS)
            recon_part = jnp.dot(
                hidden.astype(compute_dtype),
                p["w_dec"].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            # The replicated biases ride inside the model psum at 1/n_model
            # weight so that psumming their gradients over MODEL afterwards
            # recovers the exact total (decoder-path ct once, encoder-path
            # contributions summed across feature shards).
            recon = psum_identity_vjp(
                recon_part + (p["b_dec"] + p["b_pre"]) / n_model, MODEL_AXIS
            )
            sq = jnp.sum(jnp.square(recon - batch))
            n_global = batch.shape[0] * n_data * batch.shape[1]
            # differentiate the LOCAL contribution (grads are psummed over
            # DATA below); report the global loss as a metric
            loss = sq / n_global
            loss_metric = jax.lax.psum(jax.lax.stop_gradient(sq), DATA_AXIS) / n_global
            l0 = jax.lax.psum(
                jnp.sum(hidden > 0).astype(jnp.float32), (DATA_AXIS, MODEL_AXIS)
            ) / (batch.shape[0] * n_data)
            # a feature is active if ANY data shard activated it
            active = (
                jax.lax.psum(
                    jnp.any(hidden > 0, axis=0).astype(jnp.int32), DATA_AXIS
                )
                > 0
            )
            return loss, {"l0": l0, "active": active, "loss_metric": loss_metric}

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        loss = aux["loss_metric"]
        grads = jax.lax.psum(grads, DATA_AXIS)  # gradient all-reduce
        # replicated leaves carry per-shard partial gradients (their
        # encoder-path term flows through the local feature shard only);
        # the MODEL psum completes them — and, being a collective, leaves
        # bitwise-identical values on every model shard, so replicated
        # params never drift apart.
        grads = {
            name: (
                jax.lax.psum(g, MODEL_AXIS) if PARAM_SPECS[name] == P() else g
            )
            for name, g in grads.items()
        }
        if gradient_clip is not None:
            grads = _distributed_clip(grads, gradient_clip)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if renorm:
            w = params["w_dec"]  # feature rows are complete per model shard
            norm = jnp.maximum(jnp.linalg.norm(w, axis=1, keepdims=True), 1e-12)
            params = {**params, "w_dec": w / norm}
        dstate = update_dead_state(dstate, aux["active"])
        dead_ratio = jax.lax.psum(
            jnp.sum(
                dead_feature_mask(dstate, dead_feature_threshold).astype(jnp.float32)
            ),
            MODEL_AXIS,
        ) / (params["b_enc"].shape[0] * n_model)
        metrics = {
            "loss": loss,
            "reconstruction_loss": loss,
            "sparsity_loss": jnp.zeros((), jnp.float32),
            "l0": aux["l0"],
            "dead_feature_ratio": dead_ratio,
        }
        return params, opt_state, dstate, metrics

    return local_step


def _opt_specs(example_params: dict, example_opt_state):
    d, h = example_params["w_enc"].shape
    return jax.tree_util.tree_map(
        lambda leaf: leaf_pspec(jnp.shape(leaf), d, h), example_opt_state
    )


_METRIC_SPECS = {
    key: P()
    for key in (
        "loss", "reconstruction_loss", "sparsity_loss", "l0",
        "dead_feature_ratio",
    )
}


def build_tp_train_step(
    optimizer: optax.GradientTransformation,
    k: int,
    compute_dtype,
    mesh: Mesh,
    dead_feature_threshold: int,
    example_params: dict,
    example_opt_state,
    renorm: bool = True,
    gradient_clip: float | None = None,
) -> Callable:
    """Jitted shard_map step: (params, opt_state, dstate, batch [B, D]) ->
    (params, opt_state, dstate, metrics dict of replicated scalars).

    ``optimizer`` may include an optax clip_by_global_norm: after the
    distributed clip here the local norms are <= the threshold, so the
    inner clip becomes a no-op and the optimizer state layout matches the
    single-device trainer's (checkpoints interchange)."""
    local_step = _make_local_step(
        optimizer, k, compute_dtype,
        mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS],
        dead_feature_threshold, renorm, gradient_clip,
    )
    opt_specs = _opt_specs(example_params, example_opt_state)
    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(PARAM_SPECS, opt_specs, DSTATE_SPECS, P(DATA_AXIS, None)),
        out_specs=(PARAM_SPECS, opt_specs, DSTATE_SPECS, _METRIC_SPECS),
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(0, 1, 2))


def build_tp_epoch_fn(
    optimizer: optax.GradientTransformation,
    k: int,
    compute_dtype,
    mesh: Mesh,
    dead_feature_threshold: int,
    example_params: dict,
    example_opt_state,
    metric_keys: tuple[str, ...],
    renorm: bool = True,
    gradient_clip: float | None = None,
) -> Callable:
    """Fused-epoch shard_map program: lax.scan of the dp x tp local step
    over [S, B, D] pre-staged batches — ONE dispatch per epoch instead of
    one per step (the per-dispatch tunnel latency otherwise caps a dp run
    below single-chip fused throughput).

    Returns a jitted (params, opt_state, dstate, batches) ->
    (params, opt_state, dstate, stacked [S, len(metric_keys)] metrics)
    with donated state; batches enter sharded P(None, data, None).
    """
    local_step = _make_local_step(
        optimizer, k, compute_dtype,
        mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS],
        dead_feature_threshold, renorm, gradient_clip,
    )

    def local_epoch(params, opt_state, dstate, batches):
        def body(carry, batch):
            params, opt_state, dstate = carry
            params, opt_state, dstate, metrics = local_step(
                params, opt_state, dstate, batch
            )
            return (params, opt_state, dstate), metrics

        (params, opt_state, dstate), metrics = jax.lax.scan(
            body, (params, opt_state, dstate), batches
        )
        stacked = jnp.stack([metrics[key] for key in metric_keys], axis=1)
        return params, opt_state, dstate, stacked

    opt_specs = _opt_specs(example_params, example_opt_state)
    epoch = jax.shard_map(
        local_epoch,
        mesh=mesh,
        in_specs=(PARAM_SPECS, opt_specs, DSTATE_SPECS, P(None, DATA_AXIS, None)),
        out_specs=(PARAM_SPECS, opt_specs, DSTATE_SPECS, P(None, None)),
        check_vma=False,
    )
    return jax.jit(epoch, donate_argnums=(0, 1, 2))


def place_for_tp(mesh: Mesh, params: dict, opt_state, dstate: DeadFeatureState):
    """device_put params/opt/dead-state per the TP layout rules."""
    d, h = params["w_enc"].shape
    params = {
        key: jax.device_put(v, NamedSharding(mesh, PARAM_SPECS[key]))
        for key, v in params.items()
    }
    opt_state = jax.tree_util.tree_map(
        lambda leaf: jax.device_put(
            leaf, NamedSharding(mesh, leaf_pspec(jnp.shape(leaf), d, h))
        ),
        opt_state,
    )
    dstate = DeadFeatureState(
        feature_last_activated=jax.device_put(
            dstate.feature_last_activated, NamedSharding(mesh, P(MODEL_AXIS))
        ),
        step_count=jax.device_put(dstate.step_count, NamedSharding(mesh, P())),
    )
    return params, opt_state, dstate
