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
