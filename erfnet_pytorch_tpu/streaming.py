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


def _postprocess(pred, output: str):
    """trainId map -> requested on-device uint8 output form."""
    if output == "color":
        return colorize(pred)
    if output == "labelId":
        return train_id_to_label_id(pred).astype(jnp.uint8)
    return pred.astype(jnp.uint8)


class StreamingSegmenter:
    def __init__(self, params, batch_stats, *, dtype=jnp.bfloat16,
                 use_pallas=True, output: str = "color", q8_scales=None,
                 step_fn=None):
        """output: 'color' (palette RGB), 'labelId' (server remap) or
        'trainId' (raw argmax).  q8_scales: optional w8a8 int8 calibration
        (quantize.py).  step_fn: a prebuilt ``images -> uint8`` step
        (``from_servable`` passes one); when given, the weight arguments
        are ignored and no live forward is built."""
        if step_fn is None:
            infer = build_fast_infer(params, batch_stats, dtype=dtype,
                                     use_pallas=use_pallas, preds_only=True,
                                     q8_scales=q8_scales)
            @jax.jit
            def step_fn(images):
                return _postprocess(infer(images), output)

        self._step = step_fn

    @classmethod
    def from_servable(cls, servable, *, output: str = "color"):
        """Serve from an exported ``.erfx`` bundle (export.py) instead of
        live weights: the forward is the bundle's deserialized jax.export
        program (weights embedded — no model code or checkpoint on this
        host); only the tiny colorize/remap post-pass compiles here."""
        from .export import load_servable
        if isinstance(servable, str):
            servable = load_servable(servable)
        hw = servable.input_hw
        post = jax.jit(lambda pred: _postprocess(pred, output))

        def step(images):
            if tuple(images.shape[1:3]) != hw:
                raise ValueError(
                    f"bundle expects {hw[0]}x{hw[1]} inputs, got "
                    f"{images.shape[1]}x{images.shape[2]}")
            out = servable.predict(images)
            pred = out[1] if isinstance(out, tuple) else out
            return post(pred)

        return cls(None, None, output=output, step_fn=step)

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
