"""Transcoders: sparse prediction of MLP output from MLP input.

Behavioral parity with the reference
(/root/reference/src/whisper_sae/sae/transcoder.py:32-461): TopK encode
(no pre-encoder bias), decoder xavier -> unit-norm -> x0.1 init, dead
feature tracking, resampling where the decoder direction is set to the
normalized *residual* (not the input direction — transcoder.py:236-238),
and the SkipTranscoder variant with zero-initialized decoder & skip and
``set_output_bias`` (Paulo et al. 2025 init: the model starts as a
constant function).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.topk import topk_mask_dense
from .sae import (
    DeadFeatureState,
    _linear_default,
    _xavier_uniform,
    dead_feature_mask,
    init_dead_state,
    update_dead_state,
)


class TranscoderOutput(NamedTuple):
    """Forward output (reference transcoder.py:21-29)."""

    predicted: jax.Array
    hidden: jax.Array
    loss: jax.Array
    reconstruction_loss: jax.Array
    sparsity_loss: jax.Array
    l0: jax.Array


def init_topk_transcoder(
    key: jax.Array, input_dim: int, output_dim: int, hidden_dim: int
) -> dict[str, jax.Array]:
    k_enc, k_encb, k_dec = jax.random.split(key, 3)
    w_dec = _xavier_uniform(k_dec, (hidden_dim, output_dim))
    w_dec = w_dec / jnp.linalg.norm(w_dec, axis=1, keepdims=True) * 0.1
    return {
        "w_enc": _linear_default(k_enc, input_dim, (input_dim, hidden_dim)),
        "b_enc": _linear_default(k_encb, input_dim, (hidden_dim,)),
        "w_dec": w_dec,
        "b_dec": jnp.zeros((output_dim,), jnp.float32),
    }


def init_skip_transcoder(
    key: jax.Array, input_dim: int, output_dim: int, hidden_dim: int
) -> dict[str, jax.Array]:
    """Zero decoder/skip init (reference transcoder.py:304-319)."""
    k_enc, k_encb = jax.random.split(key, 2)
    return {
        "w_enc": _linear_default(k_enc, input_dim, (input_dim, hidden_dim)),
        "b_enc": _linear_default(k_encb, input_dim, (hidden_dim,)),
        "w_dec": jnp.zeros((hidden_dim, output_dim), jnp.float32),
        "b_dec": jnp.zeros((output_dim,), jnp.float32),
        "w_skip": jnp.zeros((input_dim, output_dim), jnp.float32),
        "b_skip": jnp.zeros((output_dim,), jnp.float32),
    }


def transcoder_loss(
    params: dict[str, jax.Array],
    x: jax.Array,
    y: jax.Array,
    k: int,
    compute_dtype: jnp.dtype = jnp.float32,
    use_skip: bool | None = None,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Hot-path loss (sparse decode; dense latent never materialized).

    On TPU under AMP the whole forward (encode matmul + bisection + mask +
    decode + optional skip + loss/l0/active stats) runs as ONE fused
    Pallas kernel (ops/pallas_sae.py:fused_transcoder_loss), mirroring
    the SAE fused path; elsewhere the composed path below is used.  Both
    compute the reference loss semantics (transcoder.py:139-175).
    """
    from ..ops import pallas_sae

    if use_skip is None:
        use_skip = "w_skip" in params
    if compute_dtype == jnp.bfloat16 and pallas_sae.fused_coder_supported(
        x.shape, y.shape[1], params["w_enc"].shape[1], with_skip=use_skip
    ):
        h_dim = params["w_enc"].shape[1]
        loss, l0, active, resid, hid = pallas_sae.fused_transcoder_loss(
            x, y, params["w_enc"], params["b_enc"],
            params["w_dec"], params["b_dec"],
            params.get("w_skip", jnp.zeros((), jnp.float32)),
            params.get("b_skip", jnp.zeros((), jnp.float32)),
            k,
            pallas_sae.pick_block_rows(x.shape[0], h_dim, x.shape[1]),
            use_skip,
        )
        # predicted/hidden are derived without recomputation and are
        # dead-code-eliminated when the caller (the trainer) drops them
        return loss, {
            "l0": l0,
            "active": active,
            "predicted": resid + y,
            "hidden": hid.astype(jnp.float32),
        }
    if compute_dtype == jnp.bfloat16 and pallas_sae.supported(
        x.shape, params["w_enc"].shape[1]
    ):
        # large-H geometry (weights exceed the single-block VMEM budget):
        # the encode still fuses via the blocked kernel — w_enc streams
        # through VMEM and the pre-activation never round-trips HBM —
        # with decode/loss composed in XLA
        hidden = pallas_sae.fused_topk_encode(
            x, params["w_enc"], params["b_enc"],
            jnp.zeros((x.shape[1],), jnp.float32), k,
            pallas_sae.pick_block_rows(
                x.shape[0], params["w_enc"].shape[1], x.shape[1]
            ),
            jnp.bfloat16,
        )
    else:
        pre = (
            jnp.dot(
                x.astype(compute_dtype),
                params["w_enc"].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            + params["b_enc"]
        )
        hidden = topk_mask_dense(pre, k)
    pred = (
        jnp.dot(
            hidden.astype(compute_dtype),
            params["w_dec"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        + params["b_dec"]
    )
    if use_skip:
        pred = pred + (
            jnp.dot(
                x.astype(compute_dtype),
                params["w_skip"].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            + params["b_skip"]
        )
    loss = jnp.mean(jnp.square(pred - y))
    l0 = jnp.mean(jnp.sum(hidden > 0, axis=-1).astype(jnp.float32))
    active = jnp.any(hidden > 0, axis=0)
    # the blocked-encode path stores the latent bf16; the exported aux is
    # always f32 (DCE'd when the caller drops it), keeping
    # TranscoderOutput.hidden's dtype path-independent
    return loss, {
        "l0": l0,
        "active": active,
        "predicted": pred,
        "hidden": hidden.astype(jnp.float32),
    }


def transcoder_apply(
    params: dict[str, jax.Array],
    x: jax.Array,
    y: jax.Array,
    k: int,
    compute_dtype: jnp.dtype = jnp.float32,
) -> tuple[TranscoderOutput, jax.Array]:
    """Full forward with dense latent (reference transcoder.py:139-175)."""
    loss, aux = transcoder_loss(params, x, y, k, compute_dtype)
    out = TranscoderOutput(
        predicted=aux["predicted"],
        hidden=aux["hidden"],
        loss=loss,
        reconstruction_loss=loss,
        sparsity_loss=jnp.zeros((), jnp.float32),
        l0=aux["l0"],
    )
    return out, aux["active"]


class _TranscoderBase:
    """Shared facade machinery for TopK / Skip transcoders."""

    def __init__(
        self,
        input_dim: int,
        output_dim: int,
        hidden_dim: int,
        k: int = 32,
        normalize_decoder: bool = True,
        dead_feature_threshold: int = 10_000,
        *,
        seed: int = 0,
        params: dict | None = None,
    ):
        self.input_dim = input_dim
        self.output_dim = output_dim
        self.hidden_dim = hidden_dim
        self.k = k
        self.normalize_decoder = normalize_decoder
        self.dead_feature_threshold = dead_feature_threshold
        self.params = params if params is not None else self._init(seed)
        self.state = init_dead_state(hidden_dim)
        self.training = True

    def train(self):
        self.training = True
        return self

    def eval(self):
        self.training = False
        return self

    def encode(self, x: jax.Array) -> jax.Array:
        pre = (
            jnp.dot(
                jnp.asarray(x), self.params["w_enc"],
                preferred_element_type=jnp.float32,
            )
            + self.params["b_enc"]
        )
        return topk_mask_dense(pre, self.k)

    def decode(self, hidden: jax.Array) -> jax.Array:
        return (
            jnp.dot(hidden, self.params["w_dec"], preferred_element_type=jnp.float32)
            + self.params["b_dec"]
        )

    def normalize_decoder_weights(self) -> None:
        w = self.params["w_dec"]
        norm = jnp.maximum(jnp.linalg.norm(w, axis=1, keepdims=True), 1e-12)
        self.params = {**self.params, "w_dec": w / norm}

    def __call__(self, mlp_input, mlp_output) -> TranscoderOutput:
        out, active = transcoder_apply(
            self.params, jnp.asarray(mlp_input), jnp.asarray(mlp_output), self.k
        )
        if self.training:
            self.state = update_dead_state(self.state, active)
        return out

    forward = __call__

    @property
    def step_count(self) -> int:
        return int(self.state.step_count)

    @property
    def feature_last_activated(self) -> jax.Array:
        return self.state.feature_last_activated

    def get_dead_features(self) -> jax.Array:
        return dead_feature_mask(self.state, self.dead_feature_threshold)

    def get_dead_feature_ratio(self) -> float:
        return float(jnp.mean(self.get_dead_features().astype(jnp.float32)))

    def resample_dead_features(
        self, mlp_inputs, mlp_outputs, num_resample: int | None = None
    ) -> int:
        """Reference transcoder.py:194-241: encoder row <- normalized
        high-error input; decoder row <- normalized residual."""
        dead = np.asarray(self.get_dead_features())
        dead_indices = np.where(dead)[0]
        num_dead = len(dead_indices)
        if num_dead == 0:
            return 0
        if num_resample is not None:
            num_dead = min(num_dead, num_resample)
            dead_indices = dead_indices[:num_dead]

        x = jnp.asarray(mlp_inputs)
        y = jnp.asarray(mlp_outputs)
        was_training = self.training
        self.training = False
        out = self(x, y)
        self.training = was_training
        residuals = y - out.predicted
        errors = jnp.sum(jnp.square(residuals), axis=-1)
        n_take = min(num_dead, errors.shape[0])
        _, top_idx = jax.lax.top_k(errors, n_take)

        def unit(a):
            return a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True), 1e-12)

        inputs_dir = unit(np.asarray(x[top_idx]))
        resid_dir = unit(np.asarray(residuals[top_idx]))

        w_enc = np.asarray(self.params["w_enc"]).copy()
        b_enc = np.asarray(self.params["b_enc"]).copy()
        w_dec = np.asarray(self.params["w_dec"]).copy()
        last = np.asarray(self.state.feature_last_activated).copy()
        for i, di in enumerate(dead_indices[: inputs_dir.shape[0]]):
            w_enc[:, di] = inputs_dir[i]
            b_enc[di] = 0.0
            w_dec[di, :] = resid_dir[i]
            last[di] = int(self.state.step_count)
        self.params = {
            **self.params,
            "w_enc": jnp.asarray(w_enc),
            "b_enc": jnp.asarray(b_enc),
            "w_dec": jnp.asarray(w_dec),
        }
        self.state = DeadFeatureState(
            feature_last_activated=jnp.asarray(last), step_count=self.state.step_count
        )
        return num_dead


class TopKTranscoder(_TranscoderBase):
    """Plain TopK transcoder (reference transcoder.py:32-241)."""

    def _init(self, seed: int) -> dict:
        return init_topk_transcoder(
            jax.random.PRNGKey(seed), self.input_dim, self.output_dim, self.hidden_dim
        )


class SkipTranscoder(_TranscoderBase):
    """Transcoder with affine skip path (reference transcoder.py:244-422)."""

    def _init(self, seed: int) -> dict:
        return init_skip_transcoder(
            jax.random.PRNGKey(seed), self.input_dim, self.output_dim, self.hidden_dim
        )

    def set_output_bias(self, mean_output) -> None:
        """Decoder bias <- empirical mean MLP output (transcoder.py:321-332)."""
        self.params = {**self.params, "b_dec": jnp.asarray(mean_output)}

    def skip(self, x) -> jax.Array:
        return jnp.asarray(x) @ self.params["w_skip"] + self.params["b_skip"]

    def get_skip_contribution(self, mlp_input, mlp_output) -> float:
        """R^2 of the skip path alone (transcoder.py:408-422)."""
        y = jnp.asarray(mlp_output)
        skip_pred = self.skip(mlp_input)
        skip_var = jnp.mean(jnp.square(skip_pred - y))
        total_var = jnp.mean(jnp.square(y - jnp.mean(y, axis=0)))
        return float(1.0 - skip_var / (total_var + 1e-8))


def create_transcoder(
    input_dim: int,
    output_dim: int,
    hidden_dim: int,
    k: int = 32,
    use_skip: bool = True,
    **kwargs,
):
    """Factory (reference transcoder.py:425-461)."""
    cls = SkipTranscoder if use_skip else TopKTranscoder
    return cls(
        input_dim=input_dim, output_dim=output_dim, hidden_dim=hidden_dim, k=k, **kwargs
    )


def load_trained_transcoder(run_dir, filename_stem: str = "transcoder_final"):
    """Rebuild a trained transcoder from a ``launcher train-transcoder``
    run directory (mirrors :func:`whisper_sae_tpu.models.sae.load_trained_sae`):
    the embedded config comes from ``training_config.json``, params from
    ``{filename_stem}.npz``."""
    import json
    from pathlib import Path

    import numpy as np

    from ..utils.checkpoint import load_pytree

    run_dir = Path(run_dir)
    cfg = json.loads((run_dir / "training_config.json").read_text())["transcoder"]
    model = create_transcoder(
        input_dim=cfg["input_dim"],
        output_dim=cfg["output_dim"],
        hidden_dim=cfg["hidden_dim"],
        k=cfg["k"],
        use_skip=cfg["use_skip"],
    )
    model.params, _ = load_pytree(run_dir / f"{filename_stem}.npz", model.params)
    return model.eval()
