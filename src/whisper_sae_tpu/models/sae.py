"""Sparse autoencoders (TopK and ReLU variants), TPU-native.

Behavioral parity with the reference models
(/root/reference/src/whisper_sae/sae/model.py:26-354): same architecture,
init scheme, loss composition, dead-feature semantics and resampling rule —
but built as a functional JAX core (pure pytrees in, pytrees out, explicit
dead-feature state threaded through the step) with a thin stateful facade
for the reference-style object API.

Parameter layout is TPU-first (row-major for the MXU):
    w_enc [D, H]   encode is x @ w_enc
    w_dec [H, D]   decoder *rows* are feature directions (the reference's
                   torch layout is [D, H] columns; unit-norm-per-feature
                   here means unit-norm rows of w_dec)
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SAEConfig
from ..ops.topk import topk_encode, topk_mask_dense


class SAEOutput(NamedTuple):
    """Forward-pass output (mirrors reference model.py:15-23)."""

    reconstructed: jax.Array
    hidden: jax.Array
    loss: jax.Array
    reconstruction_loss: jax.Array
    sparsity_loss: jax.Array
    l0: jax.Array


class DeadFeatureState(NamedTuple):
    """Explicit dead-feature tracking state (the reference keeps these as
    mutable torch buffers, model.py:73-77; under jit they must be threaded
    through the step)."""

    feature_last_activated: jax.Array  # [H] int32
    step_count: jax.Array  # scalar int32


def init_dead_state(hidden_dim: int) -> DeadFeatureState:
    return DeadFeatureState(
        feature_last_activated=jnp.zeros((hidden_dim,), jnp.int32),
        step_count=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _xavier_uniform(key: jax.Array, shape: tuple[int, int]) -> jax.Array:
    fan_in, fan_out = shape[1], shape[0]
    bound = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _linear_default(key: jax.Array, fan_in: int, shape: tuple[int, ...]) -> jax.Array:
    # torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    bound = float(1.0 / np.sqrt(fan_in))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_topk_sae(key: jax.Array, input_dim: int, hidden_dim: int) -> dict[str, jax.Array]:
    """Initialize TopK-SAE params (reference model.py:62-89 semantics:
    decoder xavier -> unit-norm per feature -> x0.1; encoder torch-default)."""
    k_enc, k_encb, k_dec = jax.random.split(key, 3)
    w_dec = _xavier_uniform(k_dec, (hidden_dim, input_dim))
    w_dec = w_dec / jnp.linalg.norm(w_dec, axis=1, keepdims=True)
    w_dec = w_dec * 0.1
    return {
        "w_enc": _linear_default(k_enc, input_dim, (input_dim, hidden_dim)),
        "b_enc": _linear_default(k_encb, input_dim, (hidden_dim,)),
        "w_dec": w_dec,
        "b_dec": jnp.zeros((input_dim,), jnp.float32),
        "b_pre": jnp.zeros((input_dim,), jnp.float32),
    }


def init_relu_sae(
    key: jax.Array, input_dim: int, hidden_dim: int, normalize_decoder: bool = True
) -> dict[str, jax.Array]:
    """Initialize ReLU-SAE params (reference model.py:281-294)."""
    k_enc, k_encb, k_dec, k_decb = jax.random.split(key, 4)
    w_dec = _linear_default(k_dec, hidden_dim, (hidden_dim, input_dim))
    if normalize_decoder:
        w_dec = w_dec / jnp.linalg.norm(w_dec, axis=1, keepdims=True)
    return {
        "w_enc": _linear_default(k_enc, input_dim, (input_dim, hidden_dim)),
        "b_enc": _linear_default(k_encb, input_dim, (hidden_dim,)),
        "w_dec": w_dec,
        "b_dec": _linear_default(k_decb, hidden_dim, (input_dim,)),
    }


# ---------------------------------------------------------------------------
# functional forward
# ---------------------------------------------------------------------------


def normalize_decoder(params: dict[str, jax.Array]) -> dict[str, jax.Array]:
    """Renormalize each feature's decoder direction to unit norm
    (reference model.py:91-96; called after every optimizer step)."""
    w_dec = params["w_dec"]
    norm = jnp.linalg.norm(w_dec, axis=1, keepdims=True)
    return {**params, "w_dec": w_dec / jnp.maximum(norm, 1e-12)}


def topk_encode_sparse(
    params: dict[str, jax.Array],
    x: jax.Array,
    k: int,
    compute_dtype: jnp.dtype = jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Encode to the compact (vals, idx) sparse representation."""
    return topk_encode(
        x, params["w_enc"], params["b_enc"], params["b_pre"], k, compute_dtype
    )


def topk_hidden_dense(
    params: dict[str, jax.Array],
    x: jax.Array,
    k: int,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Dense [B, H] top-k latent via the threshold-mask path.

    TPU-first: on TPU, sort-based ``lax.top_k`` plus scatter/gather is
    ~20x slower than the encoder matmul itself; the mask path (bit-exact
    k-th-value bisection, ops/topk.py) keeps everything on the VPU/MXU.
    On TPU the whole encode (matmul + bisection + mask) runs as one
    fused Pallas kernel with the pre-activation VMEM-resident
    (ops/pallas_sae.py); elsewhere the XLA bisection path is used.
    """
    from ..ops import pallas_sae

    if pallas_sae.supported(x.shape, params["w_enc"].shape[1]):
        return pallas_sae.fused_topk_encode(
            x,
            params["w_enc"],
            params["b_enc"],
            params["b_pre"],
            k,
            pallas_sae.pick_block_rows(
                x.shape[0], params["w_enc"].shape[1], params["w_enc"].shape[0]
            ),
            compute_dtype,
        )
    xc = x - params["b_pre"]
    pre = (
        jnp.dot(
            xc.astype(compute_dtype),
            params["w_enc"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        + params["b_enc"]
    )
    return topk_mask_dense(pre, k)


def topk_sae_apply(
    params: dict[str, jax.Array],
    x: jax.Array,
    k: int,
    compute_dtype: jnp.dtype = jnp.float32,
) -> tuple[SAEOutput, jax.Array]:
    """Pure TopK-SAE forward.

    Returns (output, active_mask) where active_mask is the [H] bool vector
    of features active anywhere in the batch (for dead-feature tracking).
    """
    hidden = topk_hidden_dense(params, x, k, compute_dtype)
    recon = (
        jnp.dot(
            hidden.astype(compute_dtype),
            params["w_dec"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        + params["b_dec"]
        + params["b_pre"]
    )
    reconstruction_loss = jnp.mean(jnp.square(recon - x))
    l0 = jnp.mean(jnp.sum(hidden > 0, axis=-1).astype(jnp.float32))
    sparsity_loss = jnp.zeros((), jnp.float32)
    active = jnp.any(hidden > 0, axis=0)

    out = SAEOutput(
        reconstructed=recon,
        hidden=hidden,
        loss=reconstruction_loss,
        reconstruction_loss=reconstruction_loss,
        sparsity_loss=sparsity_loss,
        l0=l0,
    )
    return out, active


def topk_sae_loss(
    params: dict[str, jax.Array],
    x: jax.Array,
    k: int,
    compute_dtype: jnp.dtype = jnp.float32,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Hot-path loss (dense-mask top-k, all-matmul decode).

    Returns (loss, aux) with aux = {l0, active_mask} for metrics/state.

    On TPU under AMP the whole forward (encode matmul + bisection + mask +
    decode + loss/l0/active stats) runs as ONE fused Pallas kernel
    (ops/pallas_sae.py:fused_sae_loss): the latent decodes out of VMEM
    instead of round-tripping HBM, and the metric reductions accumulate
    in-kernel.  Elsewhere (CPU tests, f32-parity mode, large-H blocked
    geometry) the composed path below is used; both compute the reference
    loss semantics (reference model.py:131-166).
    """
    from ..ops import pallas_sae

    if compute_dtype == jnp.bfloat16 and pallas_sae.fused_loss_supported(
        x.shape, params["w_enc"].shape[1]
    ):
        loss, l0, active = pallas_sae.fused_sae_loss(
            x,
            params["w_enc"],
            params["b_enc"],
            params["b_pre"],
            params["w_dec"],
            params["b_dec"],
            k,
            pallas_sae.pick_block_rows(
                x.shape[0], params["w_enc"].shape[1], params["w_enc"].shape[0]
            ),
        )
        return loss, {"l0": l0, "active": active}
    out, active = topk_sae_apply(params, x, k, compute_dtype)
    return out.loss, {"l0": out.l0, "active": active}


def relu_sae_loss(
    params: dict[str, jax.Array],
    x: jax.Array,
    sparsity_weight: float,
    compute_dtype: jnp.dtype = jnp.float32,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Hot-path ReLU-SAE loss with metric aux (mirrors relu_sae_apply).

    On TPU under AMP the whole forward runs as ONE fused Pallas kernel
    (ops/pallas_sae.py:fused_relu_sae_loss — the ReLU mode of the coder
    kernel, with the L1/L0/active reductions accumulated in-kernel);
    elsewhere the composed path below is used."""
    from ..ops import pallas_sae

    if compute_dtype == jnp.bfloat16 and pallas_sae.fused_coder_supported(
        x.shape, x.shape[1], params["w_enc"].shape[1]
    ):
        loss, recon_loss, sparsity, l0, active = pallas_sae.fused_relu_sae_loss(
            x, params["w_enc"], params["b_enc"], params["w_dec"], params["b_dec"],
            float(sparsity_weight),
            pallas_sae.pick_block_rows(
                x.shape[0], params["w_enc"].shape[1], x.shape[1]
            ),
        )
        return loss, {
            "reconstruction_loss": recon_loss,
            "sparsity_loss": sparsity,
            "l0": l0,
            "active": active,
        }
    out, active = relu_sae_apply(params, x, sparsity_weight, compute_dtype)
    return out.loss, {
        "reconstruction_loss": out.reconstruction_loss,
        "sparsity_loss": out.sparsity_loss,
        "l0": out.l0,
        "active": active,
    }


def relu_sae_apply(
    params: dict[str, jax.Array],
    x: jax.Array,
    sparsity_weight: float,
    compute_dtype: jnp.dtype = jnp.float32,
) -> tuple[SAEOutput, jax.Array]:
    """Pure ReLU-SAE forward (reference model.py:304-322)."""
    pre = (
        jnp.dot(
            x.astype(compute_dtype),
            params["w_enc"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        + params["b_enc"]
    )
    hidden = jax.nn.relu(pre)
    recon = (
        jnp.dot(
            hidden.astype(compute_dtype),
            params["w_dec"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        + params["b_dec"]
    )
    reconstruction_loss = jnp.mean(jnp.square(recon - x))
    sparsity_loss = jnp.mean(jnp.abs(hidden))
    loss = reconstruction_loss + sparsity_weight * sparsity_loss
    l0 = jnp.mean(jnp.sum(hidden > 0, axis=-1).astype(jnp.float32))
    active = jnp.any(hidden > 0, axis=0)
    out = SAEOutput(
        reconstructed=recon,
        hidden=hidden,
        loss=loss,
        reconstruction_loss=reconstruction_loss,
        sparsity_loss=sparsity_loss,
        l0=l0,
    )
    return out, active


def update_dead_state(state: DeadFeatureState, active: jax.Array) -> DeadFeatureState:
    """One training-step update of dead-feature counters
    (reference model.py:168-181: step_count += 1; active features get
    last_activated = step_count)."""
    step = state.step_count + 1
    last = jnp.where(active, step, state.feature_last_activated)
    return DeadFeatureState(feature_last_activated=last, step_count=step)


def dead_feature_mask(state: DeadFeatureState, threshold: int) -> jax.Array:
    """steps-since-active > threshold (reference model.py:183-190)."""
    return (state.step_count - state.feature_last_activated) > threshold


# ---------------------------------------------------------------------------
# facade classes — reference-style object API over the functional core
# ---------------------------------------------------------------------------


class _JitCache:
    """Per-(k, dtype) jitted forward functions, shared across instances."""

    _topk: dict[tuple[int, Any, bool], Any] = {}
    _relu: dict[tuple[float, Any], Any] = {}

    @classmethod
    def topk(cls, k: int, dtype: Any):
        key = (k, jnp.dtype(dtype))
        if key not in cls._topk:
            cls._topk[key] = jax.jit(
                partial(topk_sae_apply, k=k, compute_dtype=dtype)
            )
        return cls._topk[key]

    @classmethod
    def relu(cls, sparsity_weight: float, dtype: Any):
        key = (sparsity_weight, jnp.dtype(dtype))
        if key not in cls._relu:
            cls._relu[key] = jax.jit(
                partial(relu_sae_apply, sparsity_weight=sparsity_weight, compute_dtype=dtype)
            )
        return cls._relu[key]


class TopKSAE:
    """TopK sparse autoencoder facade.

    Mirrors the reference ``TopKSAE`` object API (encode/decode/forward/
    normalize_decoder_weights/get_dead_features/resample_dead_features,
    model.py:26-257) while keeping all compute in jitted functional JAX.
    """

    def __init__(
        self,
        input_dim: int,
        hidden_dim: int,
        k: int = 32,
        normalize_decoder: bool = True,
        dead_feature_threshold: int = 10_000,
        *,
        seed: int = 0,
        params: dict[str, jax.Array] | None = None,
    ):
        self.input_dim = input_dim
        self.hidden_dim = hidden_dim
        self.k = k
        self.normalize_decoder = normalize_decoder
        self.dead_feature_threshold = dead_feature_threshold
        self.params = (
            params
            if params is not None
            else init_topk_sae(jax.random.PRNGKey(seed), input_dim, hidden_dim)
        )
        self.state = init_dead_state(hidden_dim)
        self.training = True

    # -- mode toggles (torch-style) --
    def train(self) -> "TopKSAE":
        self.training = True
        return self

    def eval(self) -> "TopKSAE":
        self.training = False
        return self

    # -- forward API --
    def encode(self, x: jax.Array) -> jax.Array:
        return topk_hidden_dense(self.params, jnp.asarray(x), self.k)

    def encode_sparse(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        return topk_encode_sparse(self.params, jnp.asarray(x), self.k)

    def decode(self, hidden: jax.Array) -> jax.Array:
        recon = (
            jnp.dot(hidden, self.params["w_dec"], preferred_element_type=jnp.float32)
            + self.params["b_dec"]
        )
        return recon + self.params["b_pre"]

    def __call__(self, x: jax.Array) -> SAEOutput:
        out, active = _JitCache.topk(self.k, jnp.float32)(self.params, jnp.asarray(x))
        if self.training:
            self.state = update_dead_state(self.state, active)
        return out

    forward = __call__

    # -- decoder norm invariant --
    def normalize_decoder_weights(self) -> None:
        self.params = normalize_decoder(self.params)

    # -- dead features --
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
        self, inputs: jax.Array, num_resample: int | None = None
    ) -> int:
        """Reinitialize dead features toward high-residual examples
        (reference model.py:197-257 semantics: encoder row and decoder
        direction both set to the normalized high-error *input*; encoder
        bias zeroed; counter reset).  Runs host-side — resampling fires
        once per ~5000 steps, so this is off the hot path by design.
        """
        dead = np.asarray(self.get_dead_features())
        dead_indices = np.where(dead)[0]
        num_dead = len(dead_indices)
        if num_dead == 0:
            return 0
        if num_resample is not None:
            num_dead = min(num_dead, num_resample)
            dead_indices = dead_indices[:num_dead]

        x = jnp.asarray(inputs)
        was_training = self.training
        self.training = False
        out = self(x)
        self.training = was_training
        residuals = x - out.reconstructed
        errors = jnp.sum(jnp.square(residuals), axis=-1)
        n_take = min(num_dead, errors.shape[0])
        _, top_idx = jax.lax.top_k(errors, n_take)
        high_err = x[top_idx]
        high_err = high_err / jnp.maximum(
            jnp.linalg.norm(high_err, axis=-1, keepdims=True), 1e-12
        )

        w_enc = np.asarray(self.params["w_enc"]).copy()
        b_enc = np.asarray(self.params["b_enc"]).copy()
        w_dec = np.asarray(self.params["w_dec"]).copy()
        last = np.asarray(self.state.feature_last_activated).copy()
        directions = np.asarray(high_err)
        for i, dead_idx in enumerate(dead_indices[: directions.shape[0]]):
            w_enc[:, dead_idx] = directions[i]
            b_enc[dead_idx] = 0.0
            w_dec[dead_idx, :] = directions[i]
            last[dead_idx] = int(self.state.step_count)
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


class ReLUSAE:
    """ReLU + L1 sparse autoencoder facade (reference model.py:260-322)."""

    def __init__(
        self,
        input_dim: int,
        hidden_dim: int,
        sparsity_weight: float = 0.01,
        normalize_decoder: bool = True,
        *,
        seed: int = 0,
        params: dict[str, jax.Array] | None = None,
    ):
        self.input_dim = input_dim
        self.hidden_dim = hidden_dim
        self.sparsity_weight = sparsity_weight
        self.normalize_decoder = normalize_decoder
        self.params = (
            params
            if params is not None
            else init_relu_sae(
                jax.random.PRNGKey(seed), input_dim, hidden_dim, normalize_decoder
            )
        )
        self.training = True

    def train(self) -> "ReLUSAE":
        self.training = True
        return self

    def eval(self) -> "ReLUSAE":
        self.training = False
        return self

    def normalize_decoder_weights(self) -> None:
        if self.normalize_decoder:
            self.params = normalize_decoder(self.params)

    def __call__(self, x: jax.Array) -> SAEOutput:
        out, _ = _JitCache.relu(self.sparsity_weight, jnp.float32)(
            self.params, jnp.asarray(x)
        )
        return out

    forward = __call__


def create_sae(config: SAEConfig, input_dim: int, *, seed: int = 0):
    """Factory (reference model.py:325-354): topk -> TopKSAE, else ReLUSAE."""
    hidden_dim = config.get_hidden_dim(input_dim)
    if config.activation == "topk":
        return TopKSAE(
            input_dim=input_dim,
            hidden_dim=hidden_dim,
            k=config.k,
            normalize_decoder=config.normalize_decoder,
            dead_feature_threshold=config.dead_feature_threshold,
            seed=seed,
        )
    return ReLUSAE(
        input_dim=input_dim,
        hidden_dim=hidden_dim,
        normalize_decoder=config.normalize_decoder,
        seed=seed,
    )


def load_trained_sae(run_dir, filename_stem: str = "sae_final"):
    """Rebuild a trained SAE from a training run directory.

    Reads the embedded ``SAEConfig`` from ``training_config.json`` (every
    launcher/scripts training job writes one) and the trained params from
    ``{filename_stem}.npz``; the reference's analogue is torch.load of the
    final checkpoint + ``create_sae`` (modal_app/train.py:352-366).
    """
    import json
    from pathlib import Path

    run_dir = Path(run_dir)
    cfg = json.loads((run_dir / "training_config.json").read_text())
    sae_cfg = SAEConfig(**cfg["sae"])
    path = run_dir / f"{filename_stem}.npz"
    with np.load(path) as z:
        input_dim = z["w_enc"].shape[0]  # w_enc is [D, H]
    sae = create_sae(sae_cfg, input_dim=input_dim)
    from ..utils.checkpoint import load_pytree

    sae.params, _ = load_pytree(path, sae.params)
    return sae
