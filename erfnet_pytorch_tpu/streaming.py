"""Streaming segmentation — BASELINE.json config 5: pipelined batched
inference at 1024x2048 with overlapped host->HBM transfer and on-device
argmax + colorization.

Pipeline stages (all overlapped):
  host decode/resize (native C++ or PIL threads, loader prefetch queue)
    -> async device_put (host->HBM DMA)
      -> jitted forward + argmax + palette gather (device)
        -> uint8 RGB (or trainId) device->host, while the next batch computes

The consumer only ever blocks on batch N-1's small uint8 output while batch
N is in flight — the reference's eval loop (§3.3) synchronizes on every
image.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .data.transforms import colorize, train_id_to_label_id
from .inference import build_fast_infer


class StreamingSegmenter:
    def __init__(self, params, batch_stats, *, dtype=jnp.bfloat16,
                 use_pallas=True, output: str = "color", q8_scales=None):
        """output: 'color' (palette RGB), 'labelId' (server remap) or
        'trainId' (raw argmax).  q8_scales: optional w8a8 int8 calibration
        (quantize.py)."""
        infer = build_fast_infer(params, batch_stats, dtype=dtype,
                                 use_pallas=use_pallas, preds_only=True,
                                 q8_scales=q8_scales)
        @jax.jit
        def step(images):
            pred = infer(images)
            if output == "color":
                return colorize(pred)
            if output == "labelId":
                return train_id_to_label_id(pred).astype(jnp.uint8)
            return pred.astype(jnp.uint8)

        self._step = step

    def run(self, batches) -> Iterator[Tuple[np.ndarray, list]]:
        """batches: iterable of (images (B,H,W,3) device/host, rels, ...).
        Yields (uint8 outputs, rels) one batch behind the device — classic
        double buffering."""
        pending = None  # (device_out, rels)
        for item in batches:
            images, rels = item[0], item[2] if len(item) > 2 else None
            out = self._step(images)
            if pending is not None:
                yield np.asarray(pending[0]), pending[1]
            pending = (out, rels)
        if pending is not None:
            yield np.asarray(pending[0]), pending[1]
