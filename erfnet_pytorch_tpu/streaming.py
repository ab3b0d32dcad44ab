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

import os
from typing import Iterator, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .data.transforms import colorize, to_tensor, train_id_to_label_id
from .inference import build_fast_infer


def _postprocess(pred, output: str):
    """trainId map -> requested on-device uint8 output form."""
    if output == "color":
        return colorize(pred)
    if output == "labelId":
        return train_id_to_label_id(pred).astype(jnp.uint8)
    return pred.astype(jnp.uint8)


# uint8 frames -> [0,1] f32 on-device (ToTensor semantics); f32 passes
# through — see data.transforms.to_tensor
_normalize = to_tensor


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
                return _postprocess(infer(_normalize(images)), output)

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
            # Servable._coerce routes any frame form to the bundle's
            # input spec (uint8 gets the ToTensor /255 for f32-spec
            # bundles, passes raw into uint8-spec ones)
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


class PngBatchSink:
    """PNG output stage for the eval CLIs — replaces the reference's
    per-image ``ToPILImage -> .save`` loop (``eval/eval_cityscapes_color.py:≈100``,
    SURVEY.md §3.3) with a thread-pooled native libpng encoder when the
    C++ library builds.

    kind 'color': with the native writer the device ships only the (B, H, W)
    trainId map and the sink writes palette-indexed PNGs (identical pixels
    to the reference's RGB output under any decoder, 3x less device->host
    traffic, ~10x faster encode than PIL RGB at 512x1024); the PIL fallback
    keeps on-device colorize + RGB truecolor.  kind 'labelId': grayscale
    PNGs either way.

    ``device_output`` tells the caller which StreamingSegmenter output mode
    to build.  write() returns the paths written; encodes run GIL-free and
    overlap the next device batch.
    """

    def __init__(self, outdir: str, kind: str, *, backend: str = "auto",
                 num_threads: int = 4, level: int = 1):
        if kind not in ("color", "labelId"):
            raise ValueError(f"unsupported sink kind: {kind!r}")
        if not 0 <= int(level) <= 9:
            # reject at construction (CLI start), not on the first batch
            # after the model run is already under way
            raise ValueError(f"--png-level must be 0-9, got {level}")
        self.outdir = outdir
        self.kind = kind
        self.level = int(level)
        self._writer = None
        if backend in ("auto", "native"):
            from . import native
            if native.available():
                self._writer = native.NativeBatchWriter(num_threads)
            elif backend == "native":
                raise RuntimeError("native writer requested but the C++ "
                                   "library is unavailable")
        if kind == "color":
            from .data.transforms import CITYSCAPES_PALETTE
            self._palette = np.asarray(CITYSCAPES_PALETTE, np.uint8)
            self.device_output = "trainId" if self._writer else "color"
        else:
            self._palette = None
            self.device_output = "labelId"

    @property
    def native(self) -> bool:
        return self._writer is not None

    def write(self, out: np.ndarray, rels) -> list:
        paths = []
        for rel in rels:
            path = os.path.join(self.outdir, rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            paths.append(path)
        out = np.asarray(out, np.uint8)
        if self._writer is not None:
            w = self._writer
            mode = w.MODE_PAL if self.kind == "color" else w.MODE_GRAY
            w.write_batch(paths, out, mode=mode, palette=self._palette,
                          level=self.level)
        else:
            from PIL import Image
            for i, path in enumerate(paths):
                if out[i].ndim == 2:
                    Image.fromarray(out[i], mode="L").save(path)
                else:
                    Image.fromarray(out[i]).save(path)
        return paths
