"""Batch iteration over activation datasets.

Replaces the reference's torch ``DataLoader(TensorDataset(features))``
plumbing (/root/reference/src/whisper_sae/data/feature_cache.py:169-197)
with a NumPy-side shuffling iterator.  On TPU the fast path is not this
iterator at all — the trainer detects a device-resident dataset and runs a
fused ``lax.scan`` epoch (see training/trainer.py) — but the iterator keeps
the reference's semantics: reshuffle every epoch, final partial batch
included by default.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np


class PairedActivationLoader:
    """Shuffling iterator over row-aligned ``(x, y)`` activation pairs —
    the transcoder's (mlp_in, mlp_out) training layout.  Exposes
    ``.data = (x, y)`` so the trainer's fused pytree-epoch path engages."""

    def __init__(
        self,
        x,
        y,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
    ):
        x, y = np.asarray(x), np.asarray(y)
        if x.shape[0] != y.shape[0]:
            raise ValueError(
                f"paired arrays must be row-aligned (got {x.shape[0]} vs {y.shape[0]})"
            )
        self.data = (x, y)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    @property
    def num_tokens(self) -> int:
        return self.data[0].shape[0]

    def __len__(self) -> int:
        n = self.num_tokens / self.batch_size
        return math.floor(n) if self.drop_last else math.ceil(n)

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        n = self.num_tokens
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        end = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, end, self.batch_size):
            idx = order[start : start + self.batch_size]
            yield self.data[0][idx], self.data[1][idx]


class MultiLayerLoader:
    """Shuffling iterator yielding ``[B, n_layers, dim]`` stacks from
    row-aligned per-layer ``[num_tokens, dim]`` arrays (the crosscoder's
    training layout — extraction writes every layer from the same batches
    in the same token order, so row i is the same token in every layer).

    Accepts memmaps: each batch gathers + stacks only ``B`` rows per
    layer, so the full [N, L, D] tensor is never materialized.  (The
    trainer's fused-epoch fast path needs device-resident data — stack
    eagerly into an :class:`ActivationLoader` when it fits instead.)
    """

    def __init__(
        self,
        layers,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
    ):
        if not layers:
            raise ValueError("MultiLayerLoader needs at least one layer")
        n = layers[0].shape[0]
        if any(lay.shape[0] != n for lay in layers):
            raise ValueError(
                "per-layer activation arrays must be row-aligned "
                f"(got token counts {[lay.shape[0] for lay in layers]})"
            )
        self.layers = layers
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    @property
    def num_tokens(self) -> int:
        return int(self.layers[0].shape[0])

    def __len__(self) -> int:
        n = self.num_tokens / self.batch_size
        return math.floor(n) if self.drop_last else math.ceil(n)

    def __iter__(self) -> Iterator[np.ndarray]:
        n = self.num_tokens
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        end = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, end, self.batch_size):
            idx = np.sort(order[start : start + self.batch_size])  # memmap-friendly
            yield np.stack([np.asarray(lay[idx]) for lay in self.layers], axis=1)


class ActivationLoader:
    """Shuffling mini-batch iterator over a ``[num_tokens, dim]`` array."""

    def __init__(
        self,
        data,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
    ):
        self.data = np.asarray(data)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    @property
    def num_tokens(self) -> int:
        return self.data.shape[0]

    def __len__(self) -> int:
        n = self.num_tokens / self.batch_size
        return math.floor(n) if self.drop_last else math.ceil(n)

    def __iter__(self) -> Iterator[np.ndarray]:
        n = self.num_tokens
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        end = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, end, self.batch_size):
            yield self.data[order[start : start + self.batch_size]]
