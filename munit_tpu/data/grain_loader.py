"""Grain-backed batch loader (opt-in: MUNIT_LOADER=grain).

A drop-in alternative to ``munit_tpu.data.loader.DataLoader`` built on
Google Grain (the standard JAX input pipeline library). Same constructor,
same forever-iterating dict-of-stacked-arrays contract, driven by the same
dataset objects (``__len__`` + ``get(index, rng)``).

What it adds over the in-house threaded loader:
- **process workers**: ``num_workers`` maps to grain multiprocessing
  workers — true parallel decode even where PIL/numpy hold the GIL (the
  in-house loader relies on decode releasing the GIL; the native C++
  post-decode path makes that mostly true, so this matters on hosts
  without the native extension).
- **checkpointable iterators**: ``state_dict()`` / ``load_state_dict()``
  expose grain's iterator state (epoch + position + RNG), so the input
  stream can resume exactly mid-epoch (the reference's torch DataLoader
  — utils.py:50-156 — restarts the epoch on resume, and so does the
  threaded loader).

Shuffling/sharding semantics mirror the threaded loader (per-epoch
reshuffle, disjoint per-host shards via grain.ShardOptions, drop_last);
the index permutation itself differs (grain's shuffle vs our
SeedSequence), so the two backends see the same data with different
orderings — both deterministic given (seed, epoch). With process
workers, grain batches per worker, so batch COMPOSITION also depends on
worker_count (deterministic for a fixed count).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator

import numpy as np

import grain.python as gp   # only imported when MUNIT_LOADER=grain selects us


class _GetItem(gp.RandomMapTransform):
    """Grain RandomMapTransform fetching dataset items with a per-record
    rng (grain derives it from (seed, epoch, index) — the same contract
    the threaded loader implements by hand). Module-level so it pickles
    into grain's multiprocessing workers."""

    def __init__(self, dataset):
        self.dataset = dataset

    def random_map(self, idx, rng: np.random.Generator):
        return self.dataset.get(int(idx), rng)


class _Indices:
    """Random-access source of indices; items are fetched in _GetItem so
    the (possibly large) dataset object is shared, not re-read."""

    def __init__(self, n: int):
        self._n = n

    def __len__(self):
        return self._n

    def __getitem__(self, i):
        return i

    def __repr__(self):
        # grain validates checkpoints against repr(data_source); make it a
        # stable function of the definition, not the object identity
        return f"_Indices(n={self._n})"


class GrainDataLoader:
    """Constructor-compatible with loader.DataLoader."""

    def __init__(self, dataset, batch_size: int, shuffle: bool,
                 num_workers: int = 4, seed: int = 0,
                 shard_index: int = 0, shard_count: int = 1,
                 prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shard_count = shard_count
        self._gp = gp
        sampler = gp.IndexSampler(
            num_records=len(dataset),
            shard_options=gp.ShardOptions(shard_index=shard_index,
                                          shard_count=shard_count,
                                          drop_remainder=True),
            shuffle=shuffle,
            num_epochs=None,              # iterate forever, like the loader
            seed=seed)
        workers = int(os.environ.get("MUNIT_GRAIN_WORKERS", num_workers))
        self._dl = gp.DataLoader(
            data_source=_Indices(len(dataset)),
            sampler=sampler,
            operations=[_GetItem(dataset),
                        gp.Batch(batch_size, drop_remainder=True)],
            worker_count=workers,
            worker_buffer_size=max(1, prefetch),
            read_options=gp.ReadOptions(num_threads=max(1, num_workers),
                                        prefetch_buffer_size=max(
                                            1, prefetch * batch_size)))
        self._it = None

    def __len__(self):
        n = len(self.dataset) // self.shard_count
        return n // self.batch_size

    def _iterator(self):
        if self._it is None:
            self._it = iter(self._dl)
        return self._it

    def batches(self) -> Iterator[Dict[str, np.ndarray]]:
        return iter(self)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        it = self._iterator()
        while True:
            yield next(it)

    # -- exact input-stream resume (grain PyGrainDatasetIterator state) ----
    def state_dict(self) -> dict:
        return {"grain": self._iterator().get_state()}

    def load_state_dict(self, state: dict) -> None:
        self._iterator().set_state(state["grain"])
