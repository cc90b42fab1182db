"""Batch iteration over activation datasets.

Replaces the reference's torch ``DataLoader(TensorDataset(features))``
plumbing (/root/reference/src/whisper_sae/data/feature_cache.py:169-197)
with NumPy-side shuffling iterators.  On TPU the fast path is not these
iterators at all — the trainer detects a device-resident dataset and runs a
fused ``lax.scan`` epoch (see training/trainer.py) — but they keep the
reference's semantics: reshuffle every epoch, final partial batch included
by default.

All three loaders share :class:`_BatchIndexer` (shuffle/len/batch-index
scaffolding) and differ only in what a batch looks like:
``ActivationLoader`` -> [B, ...] rows, ``PairedActivationLoader`` ->
``(x[B], y[B])`` tuples, ``MultiLayerLoader`` -> stacked [B, L, D].
The latter two accept lazy row sources (memmaps,
``feature_cache._LazyShardRows``) — batches gather only B rows.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np


class _BatchIndexer:
    """Shared shuffle / length / batch-index machinery."""

    def __init__(self, batch_size: int, shuffle: bool, seed: int, drop_last: bool):
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    @property
    def num_tokens(self) -> int:  # pragma: no cover - overridden
        raise NotImplementedError

    def __len__(self) -> int:
        n = self.num_tokens / self.batch_size
        return math.floor(n) if self.drop_last else math.ceil(n)

    def _batch_indices(self) -> Iterator[np.ndarray]:
        n = self.num_tokens
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        end = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, end, self.batch_size):
            yield order[start : start + self.batch_size]


class ActivationLoader(_BatchIndexer):
    """Shuffling mini-batch iterator over a ``[num_tokens, dim]`` array."""

    def __init__(
        self,
        data,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
    ):
        super().__init__(batch_size, shuffle, seed, drop_last)
        self.data = np.asarray(data)

    @property
    def num_tokens(self) -> int:
        return self.data.shape[0]

    def __iter__(self) -> Iterator[np.ndarray]:
        for idx in self._batch_indices():
            yield self.data[idx]


class PairedActivationLoader(_BatchIndexer):
    """Shuffling iterator over row-aligned ``(x, y)`` activation pairs —
    the transcoder's (mlp_in, mlp_out) training layout.  Exposes
    ``.data = (x, y)`` so the trainer's fused pytree-epoch path engages
    (pass ``fused=False`` to the trainer to keep lazy sources on host)."""

    def __init__(
        self,
        x,
        y,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = False,
    ):
        super().__init__(batch_size, shuffle, seed, drop_last)
        if x.shape[0] != y.shape[0]:
            raise ValueError(
                f"paired arrays must be row-aligned (got {x.shape[0]} vs {y.shape[0]})"
            )
        self.data = (x, y)

    @property
    def num_tokens(self) -> int:
        return self.data[0].shape[0]

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        for idx in self._batch_indices():
            idx = np.sort(idx)  # memmap/shard-gather friendly
            yield np.asarray(self.data[0][idx]), np.asarray(self.data[1][idx])


class MultiLayerLoader(_BatchIndexer):
    """Shuffling iterator yielding ``[B, n_layers, dim]`` stacks from
    row-aligned per-layer ``[num_tokens, dim]`` arrays (the crosscoder's
    training layout — extraction writes every layer from the same batches
    in the same token order, so row i is the same token in every layer).

    Accepts lazy sources: each batch gathers + stacks only ``B`` rows per
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
        super().__init__(batch_size, shuffle, seed, drop_last)
        if not layers:
            raise ValueError("MultiLayerLoader needs at least one layer")
        n = layers[0].shape[0]
        if any(lay.shape[0] != n for lay in layers):
            raise ValueError(
                "per-layer activation arrays must be row-aligned "
                f"(got token counts {[lay.shape[0] for lay in layers]})"
            )
        self.layers = layers

    @property
    def num_tokens(self) -> int:
        return int(self.layers[0].shape[0])

    def __iter__(self) -> Iterator[np.ndarray]:
        for idx in self._batch_indices():
            idx = np.sort(idx)  # memmap/shard-gather friendly
            yield np.stack([np.asarray(lay[idx]) for lay in self.layers], axis=1)
