"""Trainers for transcoders and crosscoders.

The reference has no trainer for these — its tests hand-roll torch optim
loops (tests/test_transcoder.py, test_crosscoder.py).  Here they reuse
the full SAETrainer machinery (jitted step, fused-scan epochs,
schedule/checkpoints/metrics, resampling) by overriding the loss, batch
preparation, and renorm hooks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.crosscoder import (
    CrossLayerCrosscoder,
    crosscoder_loss,
    normalize_crosscoder_decoder,
)
from ..models.transcoder import _TranscoderBase, transcoder_loss
from .trainer import SAETrainer


class TranscoderTrainer(SAETrainer):
    """Trains TopK / Skip transcoders on (mlp_input, mlp_output) pairs.

    Batches are ``(x, y)`` tuples (or stacked ``[2, B, D]`` arrays);
    ``set_resample_dataset`` takes the same pair.
    """

    model: _TranscoderBase

    def _supports_tp(self) -> bool:
        # explicit shard_map dp x tp family (parallel/tp_step.py:
        # transcoder_family) — hidden dim sharded over ``model`` with the
        # distributed bisection top-k, skip path replicated
        return True

    def _tp_family(self):
        from ..parallel.tp_step import transcoder_family

        return transcoder_family(
            self.model.k, use_skip="w_skip" in self.model.params
        )

    def _loss_fn(self):
        k = self.model.k
        dtype = self.compute_dtype
        use_skip = "w_skip" in self.model.params

        def loss_fn(params, batch):
            x, y = batch
            loss, aux = transcoder_loss(params, x, y, k, dtype, use_skip=use_skip)
            return loss, {
                "reconstruction_loss": loss,
                "sparsity_loss": jnp.zeros((), jnp.float32),
                "l0": aux["l0"],
                "active": aux["active"],
            }

        return loss_fn

    def _prepare_batch(self, batch):
        if isinstance(batch, (tuple, list)) and len(batch) == 2:
            return (jnp.asarray(batch[0]), jnp.asarray(batch[1]))
        arr = jnp.asarray(batch)
        if arr.ndim == 3 and arr.shape[0] == 2:
            return (arr[0], arr[1])
        raise ValueError("transcoder batches must be (mlp_input, mlp_output)")

    def _use_indexed_epoch(self, data=None) -> bool:
        # force-only: the coder kernels' indexed numbers regressed in the
        # r4 bench preview (see _indexed_mode) — auto stays off until a
        # clean per-family win is measured
        if self._indexed_mode(data) != "force":
            return False
        from ..ops import pallas_sae

        b = self.config.batch_size
        return pallas_sae.fused_coder_supported(
            (b, self.model.input_dim), self.model.output_dim,
            self.model.hidden_dim,
            with_skip="w_skip" in self.model.params,
        )

    def _indexed_loss_fn(self):
        from ..ops import pallas_sae

        k = self.model.k
        b = self.config.batch_size
        use_skip = "w_skip" in self.model.params
        block_rows = pallas_sae.pick_block_rows(
            b, self.model.hidden_dim, self.model.input_dim
        )

        def loss_fn(p, sel, step):
            x, y = sel
            loss, l0, active = pallas_sae.fused_transcoder_loss_indexed(
                x, y, step, p["w_enc"], p["b_enc"], p["w_dec"], p["b_dec"],
                p.get("w_skip", jnp.zeros((), jnp.float32)),
                p.get("b_skip", jnp.zeros((), jnp.float32)),
                k, block_rows, b, use_skip,
            )
            return loss, {
                "reconstruction_loss": loss,
                "sparsity_loss": jnp.zeros((), jnp.float32),
                "l0": l0, "active": active,
            }

        return loss_fn

    def set_resample_dataset(self, dataset) -> None:
        x, y = dataset
        self._resample_dataset = (np.asarray(x), np.asarray(y))

    def _resample_from_dataset(self) -> int:
        """Paired (x, y) draw; bookkeeping (moment reset, mesh-placement
        invalidation, counters, wandb) stays in the base class."""
        x, y = self._resample_dataset
        n = min(self.resample_batch_size, len(x))
        idx = self._resample_rng.permutation(len(x))[:n]
        return self.model.resample_dead_features(
            jnp.asarray(x[idx]), jnp.asarray(y[idx])
        )


class CrosscoderTrainer(SAETrainer):
    """Trains cross-layer crosscoders on token-major ``[N, L, D]`` data
    (the loss transposes to the model's [L, B, D] layout)."""

    model: CrossLayerCrosscoder

    def _supports_tp(self) -> bool:
        # TopK crosscoders ride the flattened-transcoder dp x tp family
        # (S sharded over ``model``); the ReLU variant has its own family
        # (elementwise activation -> no threshold collective at all)
        return True

    def _tp_family(self):
        from ..parallel.tp_step import crosscoder_family, relu_crosscoder_family

        if self.model._k is None:
            return relu_crosscoder_family(self.model.sparsity_weight)
        return crosscoder_family(self.model._k)

    def _loss_fn(self):
        k = self.model._k  # None selects the ReLU + weighted-L1 variant
        sw = self.model.sparsity_weight
        dtype = self.compute_dtype

        def loss_fn(params, batch):
            acts = jnp.transpose(batch, (1, 0, 2))  # [L, B, D]
            return crosscoder_loss(
                params, acts, k=k, sparsity_weight=sw, compute_dtype=dtype
            )

        return loss_fn

    def _prepare_batch(self, batch):
        if isinstance(batch, (tuple, list)):
            batch = batch[0]
        arr = jnp.asarray(batch)
        if arr.ndim != 3:
            raise ValueError("crosscoder batches must be [B, n_layers, d_model]")
        return arr

    def _renorm_params(self, params):
        return normalize_crosscoder_decoder(params)

    def _use_indexed_epoch(self, data=None) -> bool:
        # force-only, same rationale as the transcoder gate above
        if self._indexed_mode(data) != "force":
            return False
        from ..ops import pallas_sae

        b = self.config.batch_size
        ld = self.model.n_layers * self.model.d_model
        return pallas_sae.fused_coder_supported((b, ld), ld, self.model.d_sae)

    def _indexed_prepare(self, sel):
        # [N, L, D] -> the kernels' flattened [N, L*D] view (row-major
        # contiguous: a free reshape, no copy)
        n, l, d = sel.shape
        return sel.reshape(n, l * d)

    def _indexed_loss_fn(self):
        from ..models.crosscoder import decoder_norms
        from ..ops import pallas_sae

        k = self.model._k  # None selects the ReLU + weighted-L1 variant
        sw = float(self.model.sparsity_weight)
        b = self.config.batch_size
        l, d, s = self.model.n_layers, self.model.d_model, self.model.d_sae
        block_rows = pallas_sae.pick_block_rows(b, s, l * d)

        def loss_fn(p, sel, step):
            we = p["w_enc"].reshape(l * d, s)
            wd = p["w_dec"].reshape(s, l * d)
            bd = p["b_dec"].reshape(l * d)
            if k is not None:
                flat_loss, l0, active = pallas_sae.fused_transcoder_loss_indexed(
                    sel, sel, step, we, p["b_enc"], wd, bd,
                    jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32),
                    k, block_rows, b, False, True,  # y_is_x
                )
                recon_loss = l * flat_loss  # sum of per-layer means
                return recon_loss, {
                    "reconstruction_loss": recon_loss,
                    "sparsity_loss": jnp.zeros((), jnp.float32),
                    "l0": l0, "active": active,
                }
            loss, recon, sparsity, l0, active = (
                pallas_sae.fused_relu_crosscoder_loss_indexed(
                    sel, step, we, p["b_enc"], wd, bd, decoder_norms(p),
                    sw, l, block_rows, b,
                )
            )
            return loss, {
                "reconstruction_loss": recon, "sparsity_loss": sparsity,
                "l0": l0, "active": active,
            }

        return loss_fn
