"""Cross-layer crosscoders: shared sparse features across layers.

Behavioral parity with the reference
(/root/reference/src/whisper_sae/sae/crosscoder.py:38-417): per-layer
encoders W_enc [L, D, S] + shared decoder W_dec [S, L, D]; decoder init
xavier -> flat unit-norm -> x0.1 with encoder initialized as the decoder
transpose (Anthropic method); encode sums per-layer contributions; loss
is the sum of per-layer MSEs plus decoder-norm-weighted L1 (ReLU variant)
or nothing (TopK variant); cross-layer feature detection via per-layer
decoder norms.

TPU-first: the functional core takes activations stacked as [L, B, D]
(one einsum on the MXU instead of a Python loop over layers); the facade
translates the reference's dict[layer_idx -> array] API.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.topk import topk_mask_dense
from .sae import (
    dead_feature_mask,
    init_dead_state,
    update_dead_state,
)


class CrosscoderOutput(NamedTuple):
    """Forward output (reference crosscoder.py:26-35)."""

    reconstructed: dict[int, jax.Array]
    hidden: jax.Array
    loss: jax.Array
    reconstruction_loss: jax.Array
    sparsity_loss: jax.Array
    l0: jax.Array
    per_layer_loss: dict[int, jax.Array]


def init_crosscoder(
    key: jax.Array, d_model: int, n_layers: int, d_sae: int, normalize_decoder: bool = True
) -> dict[str, jax.Array]:
    """Xavier decoder -> flat unit-norm -> x0.1; encoder = decoder^T
    (reference crosscoder.py:105-120)."""
    import numpy as np

    fan_sum = d_sae + n_layers * d_model  # torch xavier on [S, L, D]: fan_in = L*D
    bound = float(np.sqrt(6.0 / fan_sum))
    w_dec = jax.random.uniform(key, (d_sae, n_layers, d_model), jnp.float32, -bound, bound)
    if normalize_decoder:
        flat = w_dec.reshape(d_sae, -1)
        flat = flat / jnp.linalg.norm(flat, axis=1, keepdims=True)
        w_dec = flat.reshape(d_sae, n_layers, d_model) * 0.1
    w_enc = jnp.transpose(w_dec, (1, 2, 0))  # [L, D, S] = W_dec[:, l, :].T per layer
    return {
        "w_enc": w_enc,
        "b_enc": jnp.zeros((d_sae,), jnp.float32),
        "w_dec": w_dec,
        "b_dec": jnp.zeros((n_layers, d_model), jnp.float32),
    }


def crosscoder_encode_pre(
    params: dict, acts: jax.Array, compute_dtype: jnp.dtype = jnp.float32
) -> jax.Array:
    """Summed per-layer encoder contributions (crosscoder.py:138-161).

    acts: [L, B, D] -> pre-activation [B, S].  The einsum contracts over
    (layer, d_model) at once — one [B, L*D] @ [L*D, S] MXU matmul, not a
    Python loop over layers; ``compute_dtype=bfloat16`` is the AMP path
    (f32 accumulation either way).
    """
    return (
        jnp.einsum(
            "lbd,lds->bs",
            acts.astype(compute_dtype),
            params["w_enc"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        + params["b_enc"]
    )


def crosscoder_decode(
    params: dict, hidden: jax.Array, compute_dtype: jnp.dtype = jnp.float32
) -> jax.Array:
    """[B, S] -> per-layer reconstructions [L, B, D] (crosscoder.py:171-188)."""
    recon = jnp.einsum(
        "bs,sld->lbd",
        hidden.astype(compute_dtype),
        params["w_dec"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return recon + params["b_dec"][:, None, :]


def decoder_norms(params: dict) -> jax.Array:
    """Per-feature decoder norm over all layers [S] (crosscoder.py:129-136)."""
    return jnp.linalg.norm(params["w_dec"].reshape(params["w_dec"].shape[0], -1), axis=1)


def crosscoder_apply(
    params: dict,
    acts: jax.Array,
    *,
    k: int | None = None,
    sparsity_weight: float = 0.01,
    compute_dtype: jnp.dtype = jnp.float32,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Pure forward on stacked activations [L, B, D].

    Returns (recon [L,B,D], hidden [B,S], loss, recon_loss, sparsity_loss,
    l0) — per-layer losses derivable from recon.  ``k=None`` selects the
    ReLU+weighted-L1 variant; an integer selects TopK.

    Under AMP (``compute_dtype=bfloat16``) on TPU, the TopK encode runs as
    the fused Pallas matmul+bisection kernel over the flattened [B, L*D]
    view (the summed per-layer einsum IS one matmul), so the [B, S]
    pre-activation never round-trips HBM; everything else is XLA.
    """
    hidden = None
    if k is not None and compute_dtype == jnp.bfloat16:
        from ..ops import pallas_sae

        l, b, d = acts.shape
        s = params["b_enc"].shape[0]
        if pallas_sae.supported((b, l * d), s) and not pallas_sae.uses_blocked(
            (b, l * d), s
        ):
            x2d = acts.transpose(1, 0, 2).reshape(b, l * d)
            hidden = pallas_sae.fused_topk_encode(
                x2d,
                params["w_enc"].reshape(l * d, s),
                params["b_enc"],
                jnp.zeros((l * d,), jnp.float32),
                k,
                pallas_sae.pick_block_rows(b, s, l * d),
                jnp.bfloat16,
            )
    if hidden is None:
        pre = crosscoder_encode_pre(params, acts, compute_dtype)
        if k is None:
            hidden = jax.nn.relu(pre)
        else:
            hidden = topk_mask_dense(pre, k)
    recon = crosscoder_decode(params, hidden, compute_dtype)
    per_layer = jnp.mean(jnp.square(recon - acts), axis=(1, 2))  # [L]
    recon_loss = jnp.sum(per_layer)
    if k is None:
        sparsity = jnp.mean(jnp.abs(hidden) @ decoder_norms(params))
        loss = recon_loss + sparsity_weight * sparsity
    else:
        sparsity = jnp.zeros((), jnp.float32)
        loss = recon_loss
    l0 = jnp.mean(jnp.sum(hidden > 0, axis=-1).astype(jnp.float32))
    return recon, hidden, loss, recon_loss, sparsity, l0


def crosscoder_loss(
    params: dict,
    acts: jax.Array,
    *,
    k: int | None = None,
    sparsity_weight: float = 0.01,
    compute_dtype: jnp.dtype = jnp.float32,
) -> tuple[jax.Array, dict]:
    """Hot-path loss.  Under AMP on TPU BOTH variants run FULLY fused on
    the flattened [B, L*D] view (w_enc [L,D,S] -> [L*D, S], w_dec
    [S,L,D] -> [S, L*D]): the TopK variant is exactly a transcoder with
    y = x, and the reference loss — a sum of per-layer MSEs
    (crosscoder.py:204-219) — equals L x the flat MSE; the ReLU variant
    adds the decoder-norm-weighted L1, assembled from the kernel's
    per-feature hidden-sum accumulator with ``decoder_norms`` passed as a
    differentiable input (pallas_sae.fused_relu_crosscoder_loss), so the
    d(norm)/d(w_dec) term flows through XLA's own VJP of the norm."""
    if compute_dtype == jnp.bfloat16:
        from ..ops import pallas_sae

        l, b, d = acts.shape
        s = params["b_enc"].shape[0]
        if pallas_sae.fused_coder_supported((b, l * d), l * d, s):
            x2d = acts.transpose(1, 0, 2).reshape(b, l * d)
            block_rows = pallas_sae.pick_block_rows(b, s, l * d)
            if k is not None:
                flat_loss, l0, active, _, _ = pallas_sae.fused_transcoder_loss(
                    x2d, x2d,
                    params["w_enc"].reshape(l * d, s),
                    params["b_enc"],
                    params["w_dec"].reshape(s, l * d),
                    params["b_dec"].reshape(l * d),
                    jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
                    k,
                    block_rows,
                    False,
                    True,  # y_is_x: one DMA per row
                )
                recon_loss = l * flat_loss  # sum of per-layer means == L x flat
                return recon_loss, {
                    "reconstruction_loss": recon_loss,
                    "sparsity_loss": jnp.zeros((), jnp.float32),
                    "l0": l0,
                    "active": active,
                }
            loss, recon_loss, sparsity, l0, active = (
                pallas_sae.fused_relu_crosscoder_loss(
                    x2d,
                    params["w_enc"].reshape(l * d, s),
                    params["b_enc"],
                    params["w_dec"].reshape(s, l * d),
                    params["b_dec"].reshape(l * d),
                    decoder_norms(params),
                    sparsity_weight,
                    l,
                    block_rows,
                )
            )
            return loss, {
                "reconstruction_loss": recon_loss,
                "sparsity_loss": sparsity,
                "l0": l0,
                "active": active,
            }
    recon, hidden, loss, recon_loss, sparsity, l0 = crosscoder_apply(
        params, acts, k=k, sparsity_weight=sparsity_weight,
        compute_dtype=compute_dtype,
    )
    return loss, {
        "reconstruction_loss": recon_loss,
        "sparsity_loss": sparsity,
        "l0": l0,
        "active": jnp.any(hidden > 0, axis=0),
    }


def normalize_crosscoder_decoder(params: dict) -> dict:
    """Flat unit-norm over (L, D) per feature (crosscoder.py:122-127)."""
    w = params["w_dec"]
    flat = w.reshape(w.shape[0], -1)
    flat = flat / jnp.maximum(jnp.linalg.norm(flat, axis=1, keepdims=True), 1e-12)
    return {**params, "w_dec": flat.reshape(w.shape)}


class CrossLayerCrosscoder:
    """ReLU + decoder-norm-weighted-L1 crosscoder facade
    (reference crosscoder.py:38-284)."""

    _k: int | None = None

    def __init__(
        self,
        d_model: int,
        n_layers: int,
        d_sae: int,
        layer_indices: list[int] | None = None,
        activation: str = "relu",
        sparsity_weight: float = 0.01,
        normalize_decoder: bool = True,
        dead_feature_threshold: int = 10_000,
        *,
        seed: int = 0,
        params: dict | None = None,
    ):
        if activation != "relu":
            raise ValueError(f"Unknown activation: {activation}")
        self.d_model = d_model
        self.n_layers = n_layers
        self.d_sae = d_sae
        self.layer_indices = layer_indices or list(range(n_layers))
        self.activation = activation
        self.sparsity_weight = sparsity_weight
        self.normalize_decoder = normalize_decoder
        self.dead_feature_threshold = dead_feature_threshold
        self.params = (
            params
            if params is not None
            else init_crosscoder(
                jax.random.PRNGKey(seed), d_model, n_layers, d_sae, normalize_decoder
            )
        )
        self.state = init_dead_state(d_sae)
        self.training = True

    # dict-of-layers <-> stacked translation
    def _stack(self, layer_activations) -> jax.Array:
        """dict[layer -> [B, D]] (reference layout) or a stacked
        [B, n_layers, D] array (the trainer/loader layout) -> [L, B, D]."""
        if isinstance(layer_activations, dict):
            return jnp.stack(
                [jnp.asarray(layer_activations[li]) for li in self.layer_indices]
            )
        acts = jnp.asarray(layer_activations)
        if acts.ndim != 3 or acts.shape[1] != self.n_layers:
            raise ValueError(
                f"expected dict of layers or [B, {self.n_layers}, D] array, "
                f"got shape {acts.shape}"
            )
        return jnp.transpose(acts, (1, 0, 2))

    @property
    def W_enc(self) -> jax.Array:
        return self.params["w_enc"]

    @property
    def W_dec(self) -> jax.Array:
        return self.params["w_dec"]

    def train(self):
        self.training = True
        return self

    def eval(self):
        self.training = False
        return self

    def encode(self, layer_activations: dict[int, jax.Array]) -> jax.Array:
        acts = self._stack(layer_activations)
        pre = crosscoder_encode_pre(self.params, acts)
        if self._k is None:
            return jax.nn.relu(pre)
        return topk_mask_dense(pre, self._k)

    def decode(self, hidden: jax.Array) -> dict[int, jax.Array]:
        recon = crosscoder_decode(self.params, jnp.asarray(hidden))
        return {li: recon[i] for i, li in enumerate(self.layer_indices)}

    def __call__(self, layer_activations: dict[int, jax.Array]) -> CrosscoderOutput:
        acts = self._stack(layer_activations)
        recon, hidden, loss, recon_loss, sparsity, l0 = crosscoder_apply(
            self.params, acts, k=self._k, sparsity_weight=self.sparsity_weight
        )
        per_layer = {
            li: jnp.mean(jnp.square(recon[i] - acts[i]))
            for i, li in enumerate(self.layer_indices)
        }
        if self.training:
            self.state = update_dead_state(self.state, jnp.any(hidden > 0, axis=0))
        return CrosscoderOutput(
            reconstructed={li: recon[i] for i, li in enumerate(self.layer_indices)},
            hidden=hidden,
            loss=loss,
            reconstruction_loss=recon_loss,
            sparsity_loss=sparsity,
            l0=l0,
            per_layer_loss=per_layer,
        )

    forward = __call__

    def normalize_decoder_weights(self) -> None:
        self.params = normalize_crosscoder_decoder(self.params)

    def get_decoder_norms(self) -> jax.Array:
        return decoder_norms(self.params)

    def get_feature_layer_norms(self) -> jax.Array:
        """[S, L] per-layer decoder norms (crosscoder.py:253-262)."""
        return jnp.linalg.norm(self.params["w_dec"], axis=2)

    def get_cross_layer_features(self, threshold: float = 0.1) -> jax.Array:
        """Features with >= 2 layers above the relative-norm threshold
        (crosscoder.py:264-284)."""
        norms = self.get_feature_layer_norms()
        rel = norms / (jnp.max(norms, axis=1, keepdims=True) + 1e-8)
        return jnp.sum(rel > threshold, axis=1) >= 2

    @property
    def step_count(self) -> int:
        return int(self.state.step_count)

    def get_dead_features(self) -> jax.Array:
        return dead_feature_mask(self.state, self.dead_feature_threshold)

    def get_dead_feature_ratio(self) -> float:
        return float(jnp.mean(self.get_dead_features().astype(jnp.float32)))


class TopKCrossLayerCrosscoder(CrossLayerCrosscoder):
    """TopK crosscoder (reference crosscoder.py:287-379)."""

    def __init__(
        self,
        d_model: int,
        n_layers: int,
        d_sae: int,
        k: int = 32,
        layer_indices: list[int] | None = None,
        normalize_decoder: bool = True,
        dead_feature_threshold: int = 10_000,
        *,
        seed: int = 0,
        params: dict | None = None,
    ):
        super().__init__(
            d_model=d_model,
            n_layers=n_layers,
            d_sae=d_sae,
            layer_indices=layer_indices,
            activation="relu",
            sparsity_weight=0.0,
            normalize_decoder=normalize_decoder,
            dead_feature_threshold=dead_feature_threshold,
            seed=seed,
            params=params,
        )
        self.k = k
        self._k = k


def create_crosscoder(
    d_model: int,
    n_layers: int,
    d_sae: int,
    k: int | None = None,
    use_topk: bool = True,
    **kwargs,
):
    """Factory (reference crosscoder.py:382-417)."""
    if use_topk:
        return TopKCrossLayerCrosscoder(
            d_model=d_model, n_layers=n_layers, d_sae=d_sae, k=k or 32, **kwargs
        )
    return CrossLayerCrosscoder(d_model=d_model, n_layers=n_layers, d_sae=d_sae, **kwargs)


def load_trained_crosscoder(run_dir, filename_stem: str = "crosscoder_final"):
    """Rebuild a trained crosscoder from a ``launcher train-crosscoder``
    run directory (mirrors the SAE/transcoder loaders): embedded config
    from ``training_config.json``, params from ``{filename_stem}.npz``."""
    import json
    from pathlib import Path

    from ..utils.checkpoint import load_pytree

    run_dir = Path(run_dir)
    cfg = json.loads((run_dir / "training_config.json").read_text())["crosscoder"]
    model = create_crosscoder(
        d_model=cfg["d_model"],
        n_layers=cfg["n_layers"],
        d_sae=cfg["d_sae"],
        k=cfg.get("k"),
        use_topk=cfg.get("use_topk", True),
        layer_indices=cfg.get("layer_indices"),
    )
    model.params, _ = load_pytree(run_dir / f"{filename_stem}.npz", model.params)
    return model.eval()
