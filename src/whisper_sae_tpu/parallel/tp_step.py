"""Explicit shard_map train steps for dp x tp coder training.

The generic trainer path jits the step with sharded inputs and lets
GSPMD place collectives.  That is fine for pure data parallelism, but
with the coder feature dim sharded over ``model`` the partitioner treats
the Pallas encode kernel as opaque and falls back to gathering.  This
module writes the communication explicitly, once, for every coder
family (VERDICT round-2 next #1 — previously SAE-only):

    pre_local    = x_local @ w_enc_local [- b_pre for the SAE]  (no comms)
    hidden_local = top-k mask with GLOBAL threshold             (32 x [B,1]
                   int32 psum over ``model`` — parallel/tp_topk.py)
    recon        = psum_model(hidden_local @ w_dec_local         (one [B, D]
                   + replicated_terms / n_model)                 all-reduce
                                                                 over ICI)
    loss         = psum_data(local squared error) / N
    grads        = jax.grad through the collectives, then
                   psum over ``data`` (the gradient all-reduce)

Per-feature state (b_enc, dead-feature counters) and w_enc/w_dec stay
fully sharded; decoder renorm is local because w_dec rows (feature
directions) are complete on their shard.

Families (each a :class:`TPFamily` built by a ``*_family`` constructor):

- TopK SAE           — reference sae/model.py:16-142 at scale
- TopK/Skip transcoder — reference sae/transcoder.py:355-390 at scale
- TopK crosscoder    — the flattened [B, L*D] transcoder-with-y=x view
                       (models/crosscoder.py:163-201); S sharded over
                       ``model``
- ReLU crosscoder    — same layout, elementwise activation (no threshold
                       collective) + sharded decoder-norm-weighted L1
                       (reference crosscoder.py:204-236)

The replicated-leaf trick: decoder-path terms that involve replicated
params (b_dec, b_pre, w_skip, b_skip) ride INSIDE the model psum at
1/n_model weight, so every shard computes a 1/n_model-scaled partial
gradient for them and a single MODEL-axis psum afterwards recovers the
exact total — and, being a collective, leaves bitwise-identical values
on every model shard, so replicated params never drift apart.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.sae import DeadFeatureState, dead_feature_mask, update_dead_state
from .mesh import DATA_AXIS, MODEL_AXIS
from .tp_topk import topk_mask_sharded


class TPFamily(NamedTuple):
    """Everything the shared dp x tp step body needs about a coder family:
    how params shard, how a batch shards, the local forward with explicit
    collectives, and the local decoder renorm (feature rows are complete
    per model shard for every family, so renorm never communicates)."""

    name: str
    param_specs: Any  # pytree of P, same structure as the param dict
    batch_spec: Any  # pytree of P, same structure as one batch
    forward: Callable  # (params, batch, compute_dtype, n_data, n_model)
    #                     -> (local differentiable loss, metrics aux)
    renorm_fn: Callable  # params -> params (per-shard)


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


def _metric_collectives(hidden: jax.Array, sq: jax.Array, n_global: int,
                        rows_local: int, n_data: int) -> dict:
    """The family-independent metric reductions: global loss, global L0,
    and the union over data shards of per-feature activity."""
    loss_metric = jax.lax.psum(jax.lax.stop_gradient(sq), DATA_AXIS) / n_global
    l0 = jax.lax.psum(
        jnp.sum(hidden > 0).astype(jnp.float32), (DATA_AXIS, MODEL_AXIS)
    ) / (rows_local * n_data)
    # a feature is active if ANY data shard activated it
    active = (
        jax.lax.psum(jnp.any(hidden > 0, axis=0).astype(jnp.int32), DATA_AXIS) > 0
    )
    return {"l0": l0, "active": active, "loss_metric": loss_metric,
            "sparsity_loss": jnp.zeros((), jnp.float32)}


# ---------------------------------------------------------------------------
# families
# ---------------------------------------------------------------------------


def _unit_rows(w: jax.Array) -> jax.Array:
    norm = jnp.maximum(jnp.linalg.norm(w, axis=1, keepdims=True), 1e-12)
    return w / norm


def sae_family(k: int) -> TPFamily:
    """TopK SAE: batch [B, D]; params w_enc [D,H] b_enc [H] w_dec [H,D]
    b_dec [D] b_pre [D]."""

    def forward(p, batch, compute_dtype, n_data, n_model):
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
        recon = psum_identity_vjp(
            recon_part + (p["b_dec"] + p["b_pre"]) / n_model, MODEL_AXIS
        )
        sq = jnp.sum(jnp.square(recon - batch))
        n_global = batch.shape[0] * n_data * batch.shape[1]
        # differentiate the LOCAL contribution (grads are psummed over
        # DATA in the step body); report the global loss as a metric
        loss = sq / n_global
        return loss, _metric_collectives(
            hidden, sq, n_global, batch.shape[0], n_data
        )

    def renorm(params):
        # feature rows are complete per model shard
        return {**params, "w_dec": _unit_rows(params["w_dec"])}

    return TPFamily(
        name="sae",
        param_specs={
            "w_enc": P(None, MODEL_AXIS),
            "b_enc": P(MODEL_AXIS),
            "w_dec": P(MODEL_AXIS, None),
            "b_dec": P(),
            "b_pre": P(),
        },
        batch_spec=P(DATA_AXIS, None),
        forward=forward,
        renorm_fn=renorm,
    )


def transcoder_family(k: int, use_skip: bool) -> TPFamily:
    """TopK / Skip transcoder: batch (x [B, Din], y [B, Dout]); the hidden
    dim H shards over ``model``; the skip path (input -> output dense,
    no feature dim) replicates and its term rides inside the model psum
    at 1/n_model weight (see module docstring)."""

    def forward(p, batch, compute_dtype, n_data, n_model):
        x, y = batch
        pre = (
            jnp.dot(
                x.astype(compute_dtype),
                p["w_enc"].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            + p["b_enc"]
        )
        hidden = topk_mask_sharded(pre, k, MODEL_AXIS)
        pred_part = jnp.dot(
            hidden.astype(compute_dtype),
            p["w_dec"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        repl = p["b_dec"]
        if use_skip:
            repl = repl + (
                jnp.dot(
                    x.astype(compute_dtype),
                    p["w_skip"].astype(compute_dtype),
                    preferred_element_type=jnp.float32,
                )
                + p["b_skip"]
            )
        pred = psum_identity_vjp(pred_part + repl / n_model, MODEL_AXIS)
        sq = jnp.sum(jnp.square(pred - y))
        n_global = y.shape[0] * n_data * y.shape[1]
        loss = sq / n_global
        return loss, _metric_collectives(hidden, sq, n_global, y.shape[0], n_data)

    def renorm(params):
        return {**params, "w_dec": _unit_rows(params["w_dec"])}

    specs = {
        "w_enc": P(None, MODEL_AXIS),
        "b_enc": P(MODEL_AXIS),
        "w_dec": P(MODEL_AXIS, None),
        "b_dec": P(),
    }
    if use_skip:
        specs["w_skip"] = P()
        specs["b_skip"] = P()
    return TPFamily(
        name="transcoder",
        param_specs=specs,
        batch_spec=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        forward=forward,
        renorm_fn=renorm,
    )


def crosscoder_family(k: int) -> TPFamily:
    """TopK cross-layer crosscoder on token-major [B, L, D] batches.

    On the flattened [B, L*D] view the crosscoder is exactly a transcoder
    with y = x (models/crosscoder.py:163-201): w_enc [L,D,S] -> [L*D, S],
    w_dec [S,L,D] -> [S, L*D]; the feature dim S shards over ``model``.
    The reference loss — a sum of per-layer MSEs (reference
    crosscoder.py:204-219) — equals sq / (B_global * D)."""

    def forward(p, batch, compute_dtype, n_data, n_model):
        b, l, d = batch.shape
        x2d = batch.reshape(b, l * d)
        w_enc = p["w_enc"].reshape(l * d, -1)  # [L*D, S_local]
        pre = (
            jnp.dot(
                x2d.astype(compute_dtype),
                w_enc.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            + p["b_enc"]
        )
        hidden = topk_mask_sharded(pre, k, MODEL_AXIS)
        w_dec = p["w_dec"].reshape(p["w_dec"].shape[0], l * d)  # [S_local, L*D]
        recon_part = jnp.dot(
            hidden.astype(compute_dtype),
            w_dec.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        recon = psum_identity_vjp(
            recon_part + p["b_dec"].reshape(l * d) / n_model, MODEL_AXIS
        )
        sq = jnp.sum(jnp.square(recon - x2d))
        # sum of per-layer means over (B, D) == sq_global / (B_global * D)
        n_global = b * n_data * d
        loss = sq / n_global
        return loss, _metric_collectives(hidden, sq, n_global, b, n_data)

    def renorm(params):
        # flat unit-norm over (L, D) per feature; S rows complete per shard
        from ..models.crosscoder import normalize_crosscoder_decoder

        return normalize_crosscoder_decoder(params)

    return TPFamily(
        name="crosscoder",
        param_specs={
            "w_enc": P(None, None, MODEL_AXIS),
            "b_enc": P(MODEL_AXIS),
            "w_dec": P(MODEL_AXIS, None, None),
            "b_dec": P(),
        },
        batch_spec=P(DATA_AXIS, None, None),
        forward=forward,
        renorm_fn=renorm,
    )


def relu_crosscoder_family(sparsity_weight: float) -> TPFamily:
    """ReLU cross-layer crosscoder (decoder-norm-weighted L1, reference
    crosscoder.py:204-236) on token-major [B, L, D] batches.

    Unlike the TopK families, ReLU needs NO distributed threshold — the
    activation is elementwise, so the encode/activation stage is entirely
    local on the S-sharded feature dim.  The communication is exactly the
    TopK crosscoder's: one [B, L*D] psum for the reconstruction.  The
    sparsity term mean_B(|hidden| @ decoder_norms) splits per feature
    shard: each shard differentiates its own partial (its hidden columns
    and decoder rows are complete locally), and the DATA-axis gradient
    psum in the step body completes the batch mean; only the *metric*
    value needs the (DATA, MODEL) psum."""

    def forward(p, batch, compute_dtype, n_data, n_model):
        b, l, d = batch.shape
        x2d = batch.reshape(b, l * d)
        w_enc = p["w_enc"].reshape(l * d, -1)  # [L*D, S_local]
        pre = (
            jnp.dot(
                x2d.astype(compute_dtype),
                w_enc.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            + p["b_enc"]
        )
        hidden = jax.nn.relu(pre)  # elementwise: no cross-shard threshold
        w_dec = p["w_dec"].reshape(p["w_dec"].shape[0], l * d)  # [S_local, L*D]
        recon_part = jnp.dot(
            hidden.astype(compute_dtype),
            w_dec.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        recon = psum_identity_vjp(
            recon_part + p["b_dec"].reshape(l * d) / n_model, MODEL_AXIS
        )
        sq = jnp.sum(jnp.square(recon - x2d))
        n_global = b * n_data * d  # sum of per-layer means == sq/(B_global*D)
        # local sparsity partial: this shard's features only; dividing by
        # the GLOBAL row count makes the DATA-axis grad psum exact
        norms_local = jnp.linalg.norm(
            p["w_dec"].reshape(p["w_dec"].shape[0], -1), axis=1
        )
        sp_local = jnp.sum(jnp.abs(hidden) @ norms_local) / (b * n_data)
        loss = sq / n_global + sparsity_weight * sp_local
        metrics = _metric_collectives(hidden, sq, n_global, b, n_data)
        sp_global = jax.lax.psum(
            jax.lax.stop_gradient(sp_local), (DATA_AXIS, MODEL_AXIS)
        )
        metrics["recon_metric"] = metrics["loss_metric"]
        metrics["sparsity_loss"] = sp_global
        metrics["loss_metric"] = (
            metrics["loss_metric"] + sparsity_weight * sp_global
        )
        return loss, metrics

    def renorm(params):
        from ..models.crosscoder import normalize_crosscoder_decoder

        return normalize_crosscoder_decoder(params)

    return TPFamily(
        name="relu_crosscoder",
        param_specs={
            "w_enc": P(None, None, MODEL_AXIS),
            "b_enc": P(MODEL_AXIS),
            "w_dec": P(MODEL_AXIS, None, None),
            "b_dec": P(),
        },
        batch_spec=P(DATA_AXIS, None, None),
        forward=forward,
        renorm_fn=renorm,
    )


DSTATE_SPECS = DeadFeatureState(feature_last_activated=P(MODEL_AXIS), step_count=P())

_IS_SPEC = lambda x: isinstance(x, P)  # noqa: E731


def _flat_spec_leaves(tree: Any) -> list:
    return jax.tree_util.tree_leaves(tree, is_leaf=_IS_SPEC)


def _distributed_clip(grads: dict, param_specs: Any, clip: float):
    """Global-norm clip where model-sharded leaves contribute their psum'd
    squares (optax's clip inside shard_map would see only local norms)."""
    sq = jnp.zeros((), jnp.float32)
    sq_sharded = jnp.zeros((), jnp.float32)
    for g, spec in zip(
        jax.tree_util.tree_leaves(grads), _flat_spec_leaves(param_specs)
    ):
        s = jnp.sum(jnp.square(g).astype(jnp.float32))
        if spec == P():
            sq = sq + s
        else:
            sq_sharded = sq_sharded + s
    total = sq + jax.lax.psum(sq_sharded, MODEL_AXIS)
    norm = jnp.sqrt(total)
    scale = clip / jnp.maximum(norm, clip)
    return jax.tree_util.tree_map(lambda g: g * scale, grads)


def _make_local_step(
    optimizer: optax.GradientTransformation,
    family: TPFamily,
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
    replicated = {
        name for name, spec in family.param_specs.items() if spec == P()
    }

    def local_step(params, opt_state, dstate, batch):
        def loss_fn(p):
            return family.forward(p, batch, compute_dtype, n_data, n_model)

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        loss = aux["loss_metric"]
        grads = jax.lax.psum(grads, DATA_AXIS)  # gradient all-reduce
        # replicated leaves carry per-shard partial gradients (their terms
        # entered the decoder psum at 1/n_model weight, and encoder-path
        # contributions flow through the local feature shard only); the
        # MODEL psum completes them — and, being a collective, leaves
        # bitwise-identical values on every model shard, so replicated
        # params never drift apart.
        grads = {
            name: (jax.lax.psum(g, MODEL_AXIS) if name in replicated else g)
            for name, g in grads.items()
        }
        if gradient_clip is not None:
            grads = _distributed_clip(grads, family.param_specs, gradient_clip)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if renorm:
            params = family.renorm_fn(params)
        dstate = update_dead_state(dstate, aux["active"])
        dead_ratio = jax.lax.psum(
            jnp.sum(
                dead_feature_mask(dstate, dead_feature_threshold).astype(jnp.float32)
            ),
            MODEL_AXIS,
        ) / (params["b_enc"].shape[0] * n_model)
        metrics = {
            "loss": loss,
            # families whose total loss has a sparsity term (ReLU
            # crosscoder) report the recon component separately
            "reconstruction_loss": aux.get("recon_metric", loss),
            "sparsity_loss": aux["sparsity_loss"],
            "l0": aux["l0"],
            "dead_feature_ratio": dead_ratio,
        }
        return params, opt_state, dstate, metrics

    return local_step


def _shape_spec_map(example_params: dict, param_specs: Any) -> dict:
    """shape -> PartitionSpec, for placing optimizer-state leaves (AdamW
    moments mirror the param shapes; scalars/counts replicate).  Raises if
    two params share a shape but need different specs — pick geometry that
    keeps shapes distinct (H is 8-32x D in practice)."""
    m: dict = {}
    for leaf, spec in zip(
        jax.tree_util.tree_leaves(example_params), _flat_spec_leaves(param_specs)
    ):
        shape = jnp.shape(leaf)
        if shape in m and m[shape] != spec:
            raise ValueError(
                f"ambiguous TP placement: shape {shape} maps to both "
                f"{m[shape]} and {spec}"
            )
        m[shape] = spec
    return m


def _opt_specs(example_params: dict, example_opt_state, param_specs: Any):
    shape_map = _shape_spec_map(example_params, param_specs)
    return jax.tree_util.tree_map(
        lambda leaf: shape_map.get(jnp.shape(leaf), P()), example_opt_state
    )


_METRIC_SPECS = {
    key: P()
    for key in (
        "loss", "reconstruction_loss", "sparsity_loss", "l0",
        "dead_feature_ratio",
    )
}


def _stacked_batch_spec(batch_spec: Any) -> Any:
    """Prepend the scan (steps) dim to every batch leaf spec."""
    return jax.tree_util.tree_map(
        lambda spec: P(None, *tuple(spec)), batch_spec, is_leaf=_IS_SPEC
    )


def build_tp_train_step(
    optimizer: optax.GradientTransformation,
    family: TPFamily,
    compute_dtype,
    mesh: Mesh,
    dead_feature_threshold: int,
    example_params: dict,
    example_opt_state,
    renorm: bool = True,
    gradient_clip: float | None = None,
) -> Callable:
    """Jitted shard_map step: (params, opt_state, dstate, batch) ->
    (params, opt_state, dstate, metrics dict of replicated scalars).

    ``optimizer`` may include an optax clip_by_global_norm: after the
    distributed clip here the local norms are <= the threshold, so the
    inner clip becomes a no-op and the optimizer state layout matches the
    single-device trainer's (checkpoints interchange)."""
    local_step = _make_local_step(
        optimizer, family, compute_dtype,
        mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS],
        dead_feature_threshold, renorm, gradient_clip,
    )
    opt_specs = _opt_specs(example_params, example_opt_state, family.param_specs)
    step = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(family.param_specs, opt_specs, DSTATE_SPECS, family.batch_spec),
        out_specs=(family.param_specs, opt_specs, DSTATE_SPECS, _METRIC_SPECS),
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(0, 1, 2))


def build_tp_epoch_fn(
    optimizer: optax.GradientTransformation,
    family: TPFamily,
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
    over [S, B, ...] pre-staged batches — ONE dispatch per epoch instead of
    one per step (the per-dispatch tunnel latency otherwise caps a dp run
    below single-chip fused throughput).

    Returns a jitted (params, opt_state, dstate, batches) ->
    (params, opt_state, dstate, stacked [S, len(metric_keys)] metrics)
    with donated state; batches enter sharded P(None, data, ...).
    """
    local_step = _make_local_step(
        optimizer, family, compute_dtype,
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

    opt_specs = _opt_specs(example_params, example_opt_state, family.param_specs)
    epoch = jax.shard_map(
        local_epoch,
        mesh=mesh,
        in_specs=(
            family.param_specs, opt_specs, DSTATE_SPECS,
            _stacked_batch_spec(family.batch_spec),
        ),
        out_specs=(family.param_specs, opt_specs, DSTATE_SPECS, P(None, None)),
        check_vma=False,
    )
    return jax.jit(epoch, donate_argnums=(0, 1, 2))


def batch_shardings(mesh: Mesh, family: TPFamily):
    """NamedShardings for one (unstacked) batch pytree."""
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), family.batch_spec, is_leaf=_IS_SPEC
    )


def place_for_tp(
    mesh: Mesh, family: TPFamily, params: dict, opt_state,
    dstate: DeadFeatureState,
):
    """device_put params/opt/dead-state per the family's TP layout rules."""
    shape_map = _shape_spec_map(params, family.param_specs)
    params = {
        key: jax.device_put(v, NamedSharding(mesh, family.param_specs[key]))
        for key, v in params.items()
    }
    opt_state = jax.tree_util.tree_map(
        lambda leaf: jax.device_put(
            leaf, NamedSharding(mesh, shape_map.get(jnp.shape(leaf), P()))
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
