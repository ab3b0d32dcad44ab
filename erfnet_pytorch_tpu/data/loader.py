"""Batched, prefetching data loader — the TPU-native replacement for the
reference's ``torch.utils.data.DataLoader(num_workers=...)`` host pipeline
(SURVEY.md §2b: pinned-memory loader -> double-buffered host->HBM).

Design:
  * a thread pool decodes/resizes samples (PIL releases the GIL during
    decode), assembling fixed-shape numpy batches;
  * a bounded queue keeps `prefetch` batches in flight;
  * `device_put` (optionally with a NamedSharding for data-parallel input)
    overlaps host->HBM transfer with TPU compute — consuming batch N while
    batch N+1 transfers and N+2 decodes;
  * `pad_to=n` pads every batch up to a multiple of n (the DP mesh size)
    by repeating images with VOID (255) labels, and the trainer passes
    the matching per-batch `valid` mask into the train step
    (training/steps.py / models/erfnet.py `valid=`): the class-weighted
    loss gives void weight 0 and the mask excludes pad rows from every
    BatchNorm batch statistic (and, via autodiff of the masked stat
    sums, from every gradient) — so the padded multi-chip step computes
    EXACTLY the unpadded batch's math while every chip stays busy.
    torch DataParallel instead scatters batch 6 unevenly across 8 GPUs
    and computes BN stats per-replica (train/main.py:main() — SURVEY.md
    §2b).  `make_mesh_for_batch(..., allow_pad=False)` remains for
    callers that cannot pass the mask.

Each ``__iter__`` call builds a self-contained iterator (own thread pool,
queue, and epoch snapshot), so nested or concurrent iteration of one
DataLoader is safe — iterators never share producers or shuffle state.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np
import jax

VOID_LABEL = 255  # raw void: relabels to class 19, whose loss weight is 0


class DataLoader:
    def __init__(self, dataset, batch_size: int, *, shuffle: bool = False,
                 num_workers: int = 4, drop_last: bool = False,
                 prefetch: int = 2, seed: int = 0,
                 sharding=None, pad_final: bool = False,
                 pad_to: Optional[int] = None,
                 backend: str = "auto",
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        """backend: "pil" (python thread pool calling dataset.__getitem__),
        "native" (C++ decode+resize pool; requires the dataset to expose
        sample_paths()/native_size), or "auto" (native when both the library
        and the dataset support it).

        Multi-host DP (``process_count > 1``, default from
        ``jax.process_count()``): ``batch_size`` stays the GLOBAL batch;
        every host runs the same shuffle stream (same ``seed``) and this
        loader decodes only the ``process_index``-th contiguous block of
        each (padded) global batch — the block that lands on this host's
        chips under ``parallel.mesh.batch_sharding`` for meshes built from
        ``jax.devices()`` order (make_mesh / make_mesh_2d).  With a
        ``sharding``, batches are assembled into GLOBAL jax.Arrays via
        ``jax.make_array_from_process_local_data``; ``n_valid`` stays the
        global count, so the trainer's valid-mask/padding math is
        unchanged.  ``rels`` contain only this host's filenames."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.seed = seed
        self.sharding = sharding
        self.pad_final = pad_final
        self.pad_to = pad_to
        self.process_index = (jax.process_index() if process_index is None
                              else int(process_index))
        self.process_count = (jax.process_count() if process_count is None
                              else int(process_count))
        if (sharding is not None
                and jax.process_count() != self.process_count):
            # with a sharding, the producer assembles GLOBAL arrays via
            # make_array_from_process_local_data — meaningful only when
            # the jax runtime really spans process_count processes.  A
            # simulated host (explicit process_index/count in one
            # process) would silently device_put its LOCAL block as the
            # global batch — and an explicit process_count=1 under a
            # REAL multi-process runtime would feed the full global
            # batch into make_array_from_process_local_data as this
            # host's block — so ANY mismatch is rejected; simulations
            # must pass sharding=None and assemble via
            # mesh.global_batch_from_locals.
            raise ValueError(
                f"process_count={self.process_count} with a sharding "
                f"requires a matching multi-process jax runtime "
                f"(jax.process_count()={jax.process_count()}); simulated "
                f"hosts must use sharding=None")
        if self.process_count > 1 and not (self.pad_to or self.pad_final
                                           or self.drop_last):
            # a ragged final batch cannot split evenly across hosts; the
            # padded-global contract needs a fixed row target
            raise ValueError(
                "process_count > 1 requires pad_to, pad_final or drop_last "
                "so every global batch splits evenly across hosts")
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

    def set_epoch(self, epoch: int):
        """Pin the NEXT ``__iter__``'s shuffle stream to ``epoch`` (the
        torch DistributedSampler convention).  The trainer drives this
        from the training epoch so a resumed run replays the exact
        per-epoch data order of the uninterrupted one — bit-equal resume
        (and multi-host loaders stay aligned across processes)."""
        self._epoch = int(epoch) - 1

    def _batch_indices(self, epoch: int):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + epoch)
            rng.shuffle(order)
        for i in range(0, n, self.batch_size):
            idx = order[i:i + self.batch_size]
            if len(idx) < self.batch_size and self.drop_last:
                return
            yield idx

    def _pad_target(self, n_valid: int) -> int:
        """Rows the assembled batch must have: the nominal batch size when
        pad_final asks for fixed shapes, rounded up to a pad_to multiple."""
        target = self.batch_size if self.pad_final else n_valid
        if self.pad_to:
            target += -target % self.pad_to
        return target

    def _pad(self, images, labels, n_valid: int):
        reps = self._pad_target(n_valid) - n_valid
        if reps <= 0:
            return images, labels
        images = np.concatenate(
            [images, np.repeat(images[-1:], reps, axis=0)])
        pad_lab = np.full((reps,) + labels.shape[1:], VOID_LABEL,
                          labels.dtype)
        labels = np.concatenate([labels, pad_lab])
        return images, labels

    def _local_block(self, idx):
        """(load_idx, n_pad): dataset indices this host must decode for the
        current global batch, plus how many of the trailing loaded rows are
        the PAD SOURCE (the global batch's last valid sample — the same row
        the single-host ``_pad`` repeats, so locals concatenate bit-equal
        to the single-host padded batch; pad labels become VOID)."""
        n_valid = len(idx)
        G = self._pad_target(n_valid)
        pc, pi = self.process_count, self.process_index
        if G % pc:
            raise ValueError(
                f"padded global batch of {G} rows does not split across "
                f"{pc} hosts; choose pad_to/batch_size accordingly")
        Gl = G // pc
        lo, hi = pi * Gl, min((pi + 1) * Gl, n_valid)
        local = idx[lo:hi] if lo < n_valid else idx[:0]
        n_pad = Gl - len(local)
        if n_pad:
            local = np.concatenate(
                [local, np.repeat(idx[-1:], n_pad)]).astype(idx.dtype)
        return local, n_pad

    def __iter__(self) -> Iterator:
        # snapshot per-iterator state: concurrent iterators get distinct
        # epochs (shuffle streams) and never share a pool or queue
        epoch = self._epoch = self._epoch + 1
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        pool = ThreadPoolExecutor(max_workers=self.num_workers)

        def assemble(idx):
            n_valid = len(idx)  # GLOBAL valid count (multi-host: summed)
            n_pad_local = None
            if self.process_count > 1:
                idx, n_pad_local = self._local_block(idx)
            if self._native is not None:
                h, w = self.dataset.native_size
                pairs = [self.dataset.sample_paths(i) for i in idx]
                rels = [self.dataset.filenames[int(i)] for i in idx]
                images, labels = self._native.load_batch(
                    [p[0] for p in pairs], [p[1] or "" for p in pairs], h, w,
                    image_dtype=getattr(self.dataset, "image_dtype",
                                        "float32"))
            else:
                samples = list(pool.map(self.dataset.__getitem__, idx))
                images = np.stack([s[0] for s in samples])
                labels = np.stack([s[1] for s in samples])
                rels = [s[2] for s in samples]
            if n_pad_local is None:
                images, labels = self._pad(images, labels, n_valid)
            elif n_pad_local:
                # the trailing n_pad_local loaded rows are pad-source
                # copies: keep their pixels, void their labels (matches
                # the single-host _pad rows bit-for-bit)
                labels[-n_pad_local:] = VOID_LABEL
                rels = rels[:-n_pad_local]
            return images, labels, rels, n_valid

        error = []

        def producer():
            try:
                for idx in self._batch_indices(epoch):
                    if stop.is_set():
                        return
                    images, labels, rels, n_valid = assemble(idx)
                    if self.sharding is not None:
                        # consistent with the block-decode key (the
                        # constructor guarantees self.process_count ==
                        # jax.process_count() whenever sharding is set)
                        if self.process_count > 1:
                            # local rows -> GLOBAL jax.Array: every host
                            # contributes its block; downstream shapes are
                            # the global batch (multi-host DP data path).
                            # (Simulated multi-host tests pass explicit
                            # process_index/count with sharding=None and
                            # assemble via mesh.global_batch_from_locals.)
                            images = jax.make_array_from_process_local_data(
                                self.sharding, images)
                            labels = jax.make_array_from_process_local_data(
                                self.sharding, labels)
                        else:
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
            pool.shutdown(wait=False)
