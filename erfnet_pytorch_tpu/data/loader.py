"""Batched, prefetching data loader — the TPU-native replacement for the
reference's ``torch.utils.data.DataLoader(num_workers=...)`` host pipeline
(SURVEY.md §2b: pinned-memory loader -> double-buffered host->HBM).

Design:
  * a thread pool decodes/resizes samples (PIL releases the GIL during
    decode), assembling fixed-shape numpy batches;
  * a bounded queue keeps `prefetch` batches in flight;
  * `device_put` (optionally with a NamedSharding for data-parallel input)
    overlaps host->HBM transfer with TPU compute — consuming batch N while
    batch N+1 transfers and N+2 decodes.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np
import jax


class DataLoader:
    def __init__(self, dataset, batch_size: int, *, shuffle: bool = False,
                 num_workers: int = 4, drop_last: bool = False,
                 prefetch: int = 2, seed: int = 0,
                 sharding=None, pad_final: bool = False,
                 backend: str = "auto"):
        """backend: "pil" (python thread pool calling dataset.__getitem__),
        "native" (C++ decode+resize pool; requires the dataset to expose
        sample_paths()/native_size), or "auto" (native when both the library
        and the dataset support it)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.seed = seed
        self.sharding = sharding
        self.pad_final = pad_final
        self._epoch = 0
        self._native = None
        if backend in ("auto", "native"):
            supported = (hasattr(dataset, "sample_paths")
                         and getattr(dataset, "native_size", None))
            if supported:
                try:
                    from .. import native
                    if native.available():
                        self._native = native.NativeBatchLoader(
                            self.num_workers)
                except Exception as e:
                    if backend == "native":
                        raise
                    print(f"[loader] native backend unavailable ({e!r}); "
                          "using PIL")
            elif backend == "native":
                raise ValueError(
                    "dataset does not support the native backend "
                    "(needs sample_paths() and native_size)")

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(order)
        for i in range(0, n, self.batch_size):
            idx = order[i:i + self.batch_size]
            if len(idx) < self.batch_size and self.drop_last:
                return
            yield idx

    def __iter__(self) -> Iterator:
        self._epoch += 1
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def assemble(idx):
            if self._native is not None:
                h, w = self.dataset.native_size
                pairs = [self.dataset.sample_paths(i) for i in idx]
                rels = [self.dataset.filenames[int(i)] for i in idx]
                images, labels = self._native.load_batch(
                    [p[0] for p in pairs], [p[1] or "" for p in pairs], h, w)
                n_valid = len(idx)
                if self.pad_final and n_valid < self.batch_size:
                    reps = self.batch_size - n_valid
                    images = np.concatenate(
                        [images, np.repeat(images[-1:], reps, axis=0)])
                    labels = np.concatenate(
                        [labels, np.repeat(labels[-1:], reps, axis=0)])
                return images, labels, rels, n_valid
            samples = list(self._pool.map(self.dataset.__getitem__, idx))
            images = np.stack([s[0] for s in samples])
            labels = np.stack([s[1] for s in samples])
            rels = [s[2] for s in samples]
            n_valid = len(samples)
            if self.pad_final and n_valid < self.batch_size:
                reps = self.batch_size - n_valid
                images = np.concatenate(
                    [images, np.repeat(images[-1:], reps, axis=0)])
                labels = np.concatenate(
                    [labels, np.repeat(labels[-1:], reps, axis=0)])
            return images, labels, rels, n_valid

        error = []

        def producer():
            try:
                for idx in self._batch_indices():
                    if stop.is_set():
                        return
                    batch = assemble(idx)
                    images, labels, rels, n_valid = batch
                    if self.sharding is not None:
                        images = jax.device_put(images, self.sharding)
                        labels = jax.device_put(labels, self.sharding)
                    else:
                        images = jax.device_put(images)
                        labels = jax.device_put(labels)
                    q.put((images, labels, rels, n_valid))
            except BaseException as e:  # surfaced to the consumer
                error.append(e)
            finally:
                q.put(None)

        self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    if error:
                        raise error[0]
                    break
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5)
            self._pool.shutdown(wait=False)
