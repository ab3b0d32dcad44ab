"""Profiling / observability — the TPU-native upgrade of the reference's
wall-clock-only tracing (SURVEY.md §5: ``time.time()`` per step and
``cuda.synchronize`` in eval_forwardTime).

  * ``trace(logdir)``: jax.profiler context -> TensorBoard trace viewer
    (tensorboard-plugin-profile is in the image per SURVEY).
  * ``StepTimer``: per-step wall timing with p50/p95, matching the
    reference's "time per img" printouts but with percentiles.
  * ``enable_debug_checks()``: jax debug-nans/infs — the CI-mode sanitizer
    stand-in for the reference's (absent) race detection (§5).
"""

from __future__ import annotations

import contextlib
import time
from typing import List

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: view in TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_debug_checks(nans: bool = True, infs: bool = True):
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)


def disable_debug_checks():
    jax.config.update("jax_debug_nans", False)
    jax.config.update("jax_debug_infs", False)


class StepTimer:
    def __init__(self):
        self._times: List[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        if self._t0 is not None:
            self._times.append(time.perf_counter() - self._t0)
            self._t0 = None

    @property
    def count(self):
        return len(self._times)

    def summary(self) -> str:
        if not self._times:
            return "no steps recorded"
        a = np.asarray(self._times)
        return (f"steps={len(a)} mean={a.mean()*1000:.2f}ms "
                f"p50={np.percentile(a, 50)*1000:.2f}ms "
                f"p95={np.percentile(a, 95)*1000:.2f}ms")


class TensorBoardWriter:
    """Optional scalar/image logging via tensorboard (gated import); the
    modern counterpart of the reference's visdom Dashboard."""

    def __init__(self, logdir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter  # cpu torch
            self._w = SummaryWriter(logdir)
        except Exception:
            try:
                import tensorflow as tf  # type: ignore
                self._w = None
                self._tf = tf
                self._writer = tf.summary.create_file_writer(logdir)
            except Exception:
                self._w = None
                self._writer = None
                print("[profiling] no tensorboard backend; logging disabled")

    def scalar(self, tag: str, value: float, step: int):
        if getattr(self, "_w", None) is not None:
            self._w.add_scalar(tag, value, step)
        elif getattr(self, "_writer", None) is not None:
            with self._writer.as_default():
                self._tf.summary.scalar(tag, value, step=step)

    def image(self, tag: str, img_hwc, step: int):
        if getattr(self, "_w", None) is not None:
            self._w.add_image(tag, np.asarray(img_hwc), step,
                              dataformats="HWC")
        elif getattr(self, "_writer", None) is not None:
            with self._writer.as_default():
                self._tf.summary.image(tag, np.asarray(img_hwc)[None],
                                       step=step)

    def flush(self):
        if getattr(self, "_w", None) is not None:
            self._w.flush()
        elif getattr(self, "_writer", None) is not None:
            self._writer.flush()
