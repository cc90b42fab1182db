"""Reference-style activation-capture facade.

The reference extracts activations by registering torch forward hooks on
Whisper layers (reference sae/hooks.py:16-143) and exposes three public
symbols: ``ActivationCache``, ``WhisperActivationExtractor``, and
``extract_features_batch``.  JAX has no mutable module graph to hook into
— capture here is functional: ``models.whisper.extract_activations`` runs
the whole forward once under jit and returns every layer's output as one
stacked array (a single compiled program instead of L python callbacks).

This module wraps that functional core in the reference's API shape so a
migrating user finds the same names, call patterns, and result layout.
The context-manager protocol is kept (``with extractor: ...``) even
though there is nothing to register or remove.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .whisper import WhisperArch, extract_activations


@dataclass
class ActivationCache:
    """Host-side cache of captured activations (reference hooks.py:16-37).

    Layer-indexed lists of per-batch arrays; ``get_*_activations``
    concatenates along the batch axis, returning ``None`` for layers
    never captured — same contract as the reference, with numpy arrays
    in place of torch tensors.
    """

    encoder: dict[int, list[np.ndarray]] = field(default_factory=dict)
    decoder: dict[int, list[np.ndarray]] = field(default_factory=dict)

    def clear(self) -> None:
        """Drop all cached activations (reference hooks.py:22-25)."""
        self.encoder.clear()
        self.decoder.clear()

    def get_encoder_activations(self, layer: int) -> np.ndarray | None:
        """Concatenated [sum(B), T, D] for one encoder layer
        (reference hooks.py:27-31)."""
        if layer not in self.encoder or not self.encoder[layer]:
            return None
        return np.concatenate(self.encoder[layer], axis=0)

    def get_decoder_activations(self, layer: int) -> np.ndarray | None:
        """Concatenated [sum(B), 1, D] for one decoder layer
        (reference hooks.py:33-37)."""
        if layer not in self.decoder or not self.decoder[layer]:
            return None
        return np.concatenate(self.decoder[layer], axis=0)


class WhisperActivationExtractor:
    """Capture per-layer Whisper activations (reference hooks.py:40-143).

    Where the reference registers forward hooks on ``model.model.encoder
    .layers[i]``, this runs the jitted functional forward and slices the
    stacked [L, B, T, D] capture — one device dispatch per batch, no
    per-layer host callbacks.  ``apply_layer_norm`` applies the model's
    final LayerNorm to every captured layer (the aiOla trick, reference
    hooks.py:87-92).

    Usage matches the reference::

        extractor = WhisperActivationExtractor(params, arch,
                                               encoder_layers=[2, 5])
        with extractor:
            extractor.capture(mel)          # replaces model(input) + hooks
        acts = extractor.cache.get_encoder_activations(2)
    """

    def __init__(
        self,
        params: dict,
        arch: WhisperArch,
        encoder_layers: Sequence[int] | None = None,
        decoder_layers: Sequence[int] | None = None,
        apply_layer_norm: bool = True,
        compute_dtype=None,
    ):
        self.params = params
        self.arch = arch
        self.encoder_layers = list(encoder_layers or [])
        self.decoder_layers = list(decoder_layers or [])
        self.apply_layer_norm = apply_layer_norm
        self.cache = ActivationCache()
        self._capture = jax.jit(
            partial(
                extract_activations,
                arch=arch,
                apply_layer_norm=apply_layer_norm,
                with_decoder=bool(self.decoder_layers),
                compute_dtype=compute_dtype,
            )
        )

    def capture(self, mel) -> None:
        """Run the model on one mel batch [B, n_mels, T] and append the
        requested layers' activations to the cache.  The functional
        equivalent of the reference's hooked ``model(input)`` call."""
        out = self._capture(self.params, jnp.asarray(mel))
        enc = np.asarray(out["encoder"])
        for idx in self.encoder_layers:
            self.cache.encoder.setdefault(idx, []).append(enc[idx])
        if self.decoder_layers:
            dec = np.asarray(out["decoder"])
            for idx in self.decoder_layers:
                self.cache.decoder.setdefault(idx, []).append(dec[idx])

    # -- reference API compatibility (hooks.py:113-143) -----------------
    # There are no hooks to manage in the functional design; these keep
    # the reference's call sites working verbatim.

    def register_hooks(self) -> None:
        """No-op (reference hooks.py:113-124 registers torch hooks)."""

    def remove_hooks(self) -> None:
        """No-op (reference hooks.py:126-130)."""

    def clear_cache(self) -> None:
        """Clear the activation cache (reference hooks.py:132-134)."""
        self.cache.clear()

    def __enter__(self) -> "WhisperActivationExtractor":
        return self

    def __exit__(self, *args) -> None:
        return None


def extract_features_batch(
    params: dict,
    arch: WhisperArch,
    input_features,
    encoder_layers: Sequence[int],
    decoder_layers: Sequence[int] = (),
    apply_layer_norm: bool = True,
    compute_dtype=None,
) -> dict[str, dict[int, np.ndarray]]:
    """One-shot capture for a single batch (reference hooks.py:146-210).

    The reference builds an extractor, runs encoder then BOS-token
    decoder under hooks, and returns ``{"encoder": {layer: tensor},
    "decoder": {layer: tensor}}``; this does the same through the
    functional capture (``extract_activations`` already runs the decoder
    on the start token exactly as reference hooks.py:183-196 does).

    Args mirror the reference with ``(params, arch)`` in place of the
    torch model and no ``device`` (placement is JAX's job).
    """
    extractor = WhisperActivationExtractor(
        params,
        arch,
        encoder_layers=encoder_layers,
        decoder_layers=decoder_layers,
        apply_layer_norm=apply_layer_norm,
        compute_dtype=compute_dtype,
    )
    with extractor:
        extractor.capture(input_features)
    results: dict[str, dict[int, np.ndarray]] = {"encoder": {}, "decoder": {}}
    for idx in encoder_layers:
        acts = extractor.cache.get_encoder_activations(idx)
        if acts is not None:
            results["encoder"][idx] = acts
    for idx in decoder_layers:
        acts = extractor.cache.get_decoder_activations(idx)
        if acts is not None:
            results["decoder"][idx] = acts
    return results
