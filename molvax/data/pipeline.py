"""Batch pipeline: host uint8 codes -> (sharded) device arrays.

Reference parity: the reference wraps tensors in
``DataLoader(TensorDataset, batch_size, shuffle=True)`` and pays a
host->device float copy per batch (SURVEY.md 2.8, 3.1).

TPU-native design:
  * host keeps only uint8 codes; the H2D transfer is (B, T) bytes,
    ~140x smaller than the reference's (B, T, C) float batches;
  * batches are placed with an explicit `jax.sharding.NamedSharding` so the
    same iterator feeds 1-chip and GSPMD data-parallel runs (batch axis
    sharded over the 'data' mesh axis, SURVEY.md 5.8);
  * epoch order is a seeded host-side permutation -> runs are reproducible;
  * drop_last semantics: static batch shapes keep everything jit-cacheable
    (no recompiles on a ragged final batch).
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import jax
import numpy as np

from .zinc import Dataset


class BatchIterator:
    """Infinite shuffled batch stream of (codes, properties?) device arrays."""

    def __init__(
        self,
        dataset: Dataset,
        batch_size: int,
        seed: int = 0,
        sharding: Optional[jax.sharding.Sharding] = None,
        with_properties: bool = False,
    ):
        if len(dataset) == 0:
            raise ValueError(
                "empty corpus: the dataset has 0 rows (a .smi/.csv whose "
                "lines were all headers/blank/longer than max_len loads "
                "empty) — check data.source / data.max_len"
            )
        if len(dataset) < batch_size:
            # tile small datasets up to one batch so smoke configs run
            reps = -(-batch_size // len(dataset))
            dataset = Dataset(
                np.tile(dataset.codes, (reps, 1)),
                dataset.charset,
                None
                if dataset.properties is None
                else np.tile(dataset.properties, (reps, 1)),
            )
        self.dataset = dataset
        self.batch_size = batch_size
        self.sharding = sharding
        self.with_properties = with_properties and dataset.properties is not None
        self._rng = np.random.default_rng(seed)
        self._perm = self._rng.permutation(len(dataset))
        self._pos = 0
        self.epoch = 0
        self.steps_per_epoch = len(dataset) // batch_size

    def fast_forward(self, n_batches: int) -> None:
        """Advance the (deterministic) shuffle position by n_batches without
        touching data - used on checkpoint resume so the replayed run sees
        exactly the batches an uninterrupted run would have seen."""
        for _ in range(n_batches):
            self._next_indices()

    def _next_indices(self) -> np.ndarray:
        if self._pos + self.batch_size > len(self._perm):
            self._perm = self._rng.permutation(len(self.dataset))
            self._pos = 0
            self.epoch += 1
        idx = self._perm[self._pos : self._pos + self.batch_size]
        self._pos += self.batch_size
        return idx

    def __iter__(self) -> Iterator:
        return self

    def __next__(self) -> Tuple[jax.Array, Optional[jax.Array]]:
        idx = self._next_indices()
        codes = self.dataset.codes[idx]
        props = self.dataset.properties[idx] if self.with_properties else None
        if self.sharding is not None:
            codes = jax.device_put(codes, self.sharding)
            if props is not None:
                props = jax.device_put(props, self.sharding)
        else:
            codes = jax.device_put(codes)
            if props is not None:
                props = jax.device_put(props)
        return codes, props

    def next_stack(
        self, k: int, stacked_sharding: Optional[jax.sharding.Sharding] = None
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        """k batches stacked to (k, B, T) for the fused multi-step trainer
        (train.loop.make_train_chunk): ONE host->device transfer per k steps.
        Batch axis is axis 1, so pass a (None, 'data') sharding."""
        idxs = [self._next_indices() for _ in range(k)]
        codes = np.stack([self.dataset.codes[i] for i in idxs])
        props = (
            np.stack([self.dataset.properties[i] for i in idxs])
            if self.with_properties
            else None
        )
        codes = jax.device_put(codes, stacked_sharding)
        if props is not None:
            props = jax.device_put(props, stacked_sharding)
        return codes, props
