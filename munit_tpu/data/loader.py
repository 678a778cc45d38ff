"""Threaded, prefetching batch loader.

Replaces the reference's torch DataLoader subprocess pool (num_workers=8,
configs/config_256.yaml:89) with a thread pool (PIL releases the GIL during
decode) feeding a bounded prefetch queue, plus an optional device-prefetch
stage that overlaps H2D transfer with compute (removing the reference's
per-step sync, train.py:225).

Multi-host sharding: pass ``shard_index``/``shard_count`` to give each host a
disjoint slice of every epoch's permutation (SURVEY.md §5.8).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


class DataLoader:
    """Iterates batches forever (epoch reshuffles internally).

    Yields dicts of stacked numpy arrays. drop_last semantics always on
    (matching the reference's training loaders).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool,
                 num_workers: int = 4, seed: int = 0,
                 shard_index: int = 0, shard_count: int = 1,
                 prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.shard_index = shard_index
        self.shard_count = shard_count
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.dataset) // self.shard_count
        return n // self.batch_size

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            perm = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch])).permutation(n)
        else:
            perm = np.arange(n)
        return perm[self.shard_index::self.shard_count]

    def _load(self, epoch: int, index: int) -> Dict[str, np.ndarray]:
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, int(index)]))
        return self.dataset.get(int(index), rng)

    def _load_or_substitute(self, epoch: int, index: int):
        """MUNIT_LOADER_SKIP_BAD=1: a sample that fails to decode (corrupt
        file mid-run) is logged and deterministically replaced by the next
        loadable index instead of killing training (the reference's torch
        DataLoader — and our default — propagates and the job dies). Opt-in:
        silent substitution can mask real dataset damage, so the cap is
        tight and every substitution is logged."""
        import os
        import sys
        if os.environ.get("MUNIT_LOADER_SKIP_BAD", "0") != "1":
            return self._load(epoch, index)
        n = len(self.dataset)
        last: BaseException
        for k in range(min(8, n)):
            try:
                return self._load(epoch, (index + k) % n)
            except BaseException as e:  # noqa: BLE001 — resilience path
                last = e
                print(f"loader: sample {(index + k) % n} failed "
                      f"({type(e).__name__}: {e}); substituting",
                      file=sys.stderr)
        raise last

    def batches(self) -> Iterator[Dict[str, np.ndarray]]:
        """Single-epoch iterator (ordered submission, bounded prefetch)."""
        yield from self._iterate(single_epoch=True)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        return self._iterate(single_epoch=False)

    def iter_from(self, start_batch: int) -> Iterator[Dict[str, np.ndarray]]:
        """The infinite stream as if ``start_batch`` batches were already
        consumed — exact data-order resume after a checkpoint restore. The
        per-(seed, epoch, index) RNG scheme makes skipping pure arithmetic:
        no decode work happens for skipped batches. (The reference restarts
        its DataLoader order from scratch on --resume, re-showing early
        samples; this deviation is an improvement, documented here.)"""
        return self._iterate(single_epoch=False, start_batch=start_batch)

    def _in_flight_window(self) -> int:
        """Max decode futures submitted but not yet consumed. Bounds worker
        RAM to O(window + prefetch·batch) decoded samples — the reference's
        torch DataLoader bounds the same way via its index queue
        (2·num_workers prefetched batches); the r1 design submitted WHOLE
        epochs up front, accumulating an epoch of decoded crops in RAM."""
        return max(2 * self.batch_size, 2 * self.num_workers)

    def _iterate(self, single_epoch: bool, start_batch: int = 0):
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def index_stream():
            epoch = 0
            skip = start_batch * self.batch_size   # samples, not batches
            while True:
                idx = self._epoch_indices(epoch)
                usable = (len(idx) // self.batch_size) * self.batch_size
                if usable == 0 and not single_epoch:
                    # drop_last with len(dataset) < batch_size (e.g. a
                    # multi-host shard smaller than the per-host batch):
                    # the infinite stream would otherwise spin forever
                    # yielding nothing and training would hang silently
                    raise ValueError(
                        f"dataset yields 0 usable batches: {len(idx)} "
                        f"samples < batch_size={self.batch_size} "
                        "(drop_last). Reduce batch_size or provide more "
                        "samples per host shard.")
                if skip >= usable > 0:
                    skip -= usable          # whole epoch already consumed
                else:
                    for i in idx[skip:usable]:
                        yield epoch, i
                    skip = 0
                epoch += 1
                if single_epoch:
                    return

        def put_blocking(item) -> bool:
            """Backpressure put that still honors stop (no leaked thread
            blocked on a full queue after the consumer goes away)."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor
            window = self._in_flight_window()
            stream = index_stream()
            exhausted = False
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    in_flight: "deque" = deque()
                    while not stop.is_set():
                        while not exhausted and len(in_flight) < window:
                            try:
                                ep, i = next(stream)
                            except StopIteration:
                                exhausted = True
                                break
                            in_flight.append(
                                pool.submit(self._load_or_substitute, ep, i))
                        if len(in_flight) < self.batch_size:
                            put_blocking(None)
                            return
                        samples = [in_flight.popleft().result()
                                   for _ in range(self.batch_size)]
                        batch = {k: np.stack([smp[k] for smp in samples])
                                 for k in samples[0]
                                 if not isinstance(samples[0][k], str)}
                        for k in samples[0]:
                            if isinstance(samples[0][k], str):
                                batch[k] = [smp[k] for smp in samples]
                        if not put_blocking(batch):
                            return
            except BaseException as e:
                # A dead producer must never leave the consumer blocked on
                # out_q.get(): forward the error as an item (the consumer
                # re-raises). Without this, a worker exception hangs the
                # whole training/eval process silently.
                put_blocking(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def device_prefetch(iterator, size: int = 2, sharding=None,
                    image_dtype=None):
    """Move batches to device ahead of compute (jnp arrays, optionally with a
    NamedSharding for multi-chip input feeding).

    uint8 batches (MUNIT_LOADER_UINT8=1 loaders) are normalized ON DEVICE:
    image keys become ``image_dtype`` (default float32) in [-1, 1] with the
    exact host op order ((x/255)*2-1), masks become float {0,1}. This ships
    4x fewer H2D bytes and removes the host-side float conversion — decisive
    on a CPU-starved host (BENCH.md r2 e2e).
    """
    import jax
    import jax.numpy as jnp

    dt = image_dtype or jnp.float32

    @jax.jit
    def _norm_image(x):
        return ((x.astype(jnp.float32) / 255.0) * 2.0 - 1.0).astype(dt)

    @jax.jit
    def _norm_mask(x):
        return x.astype(jnp.float32)

    def postprocess(k, v):
        if v.dtype == np.uint8 and k.startswith("image"):
            return _norm_image(v)
        if v.dtype == np.uint8 and k.startswith("mask"):
            return _norm_mask(v)
        if (image_dtype is not None and k.startswith("image")
                and v.dtype != image_dtype):
            # f32-mode loaders (MUNIT_LOADER_UINT8=0) under an explicit
            # activation dtype (precision: bf16): cast on device so both
            # loader modes feed identical step graphs
            return jnp.asarray(v).astype(image_dtype)
        return v

    # Multi-host (jax.process_count() > 1): per-host loader shards must be
    # assembled into GLOBAL arrays — plain device_put cannot build them
    # (SURVEY §5.8d). MUNIT_FORCE_GLOBAL_BATCH=1 forces the assembly path
    # for single-process tests of the multi-host plumbing.
    import os as _os
    multiproc = sharding is not None and (
        jax.process_count() > 1
        or _os.environ.get("MUNIT_FORCE_GLOBAL_BATCH", "0") == "1")
    if multiproc:
        from munit_tpu.dist.mesh import make_global_array

    def to_device(batch):
        out = {}
        for k, v in batch.items():
            if not isinstance(v, np.ndarray):
                out[k] = v
                continue
            if multiproc:
                d = make_global_array(sharding, v)
            elif sharding is not None:
                d = jax.device_put(v, sharding)
            else:
                d = jax.device_put(v)
            out[k] = postprocess(k, d)
        return out

    # H2D + normalize run on a dedicated thread: device_put / tiny-kernel
    # dispatch release the GIL, so transfers overlap the main thread's step
    # dispatching instead of serializing with it (BENCH.md r2 e2e — on the
    # 1-core host the main-thread puts were ~1/4 of every iteration).
    import queue as _queue
    out_q: "_queue.Queue" = _queue.Queue(maxsize=size)
    stop = threading.Event()
    _END = object()

    def pump():
        try:
            for batch in iterator:
                item = to_device(batch)
                while not stop.is_set():
                    try:
                        out_q.put(item, timeout=0.1)
                        break
                    except _queue.Full:
                        continue
                if stop.is_set():
                    return
            while not stop.is_set():
                try:
                    out_q.put(_END, timeout=0.1)
                    return
                except _queue.Full:
                    continue
        except BaseException as e:  # surface worker errors to the consumer
            while not stop.is_set():
                try:
                    out_q.put(e, timeout=0.1)
                    return
                except _queue.Full:
                    continue

    t = threading.Thread(target=pump, daemon=True)
    t.start()
    try:
        while True:
            item = out_q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
