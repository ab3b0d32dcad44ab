"""AOT serving artifacts: the fast-infer function serialized to StableHLO.

The reference's deployment story is "ship a frozen ``.pth`` and run it
through the eval scripts" (``trained_models/erfnet_pretrained.pth`` +
``eval/eval_cityscapes_color.py`` — SURVEY.md §2a rows 15/19).  The
TPU-native production equivalent built here: ``jax.export`` the jitted
inference function — weights embedded as module constants, Pallas kernels
included as Mosaic custom calls on TPU — into a single self-contained
bundle that a serving host loads and compiles WITHOUT the model code,
the checkpoint, or the Python preparation pass.

Bundle format (``.erfx``): magic + JSON header + one serialized
``jax.export.Exported`` blob per batch-size bucket.  Each blob embeds its
own copy of the (folded) weights — ~8 MB/bucket for ERFNet-20 — so the
loader never reconciles shards; keep the bucket list short.

``Servable.predict`` routes a request to the smallest bucket that fits,
zero-padding the batch dim and slicing the answer back — static shapes
for XLA, dynamic batches for callers.

Portability: an artifact exported with ``use_pallas=True`` contains
Mosaic TPU custom calls and runs only on TPU runtimes compatible with
the exporting jaxlib (jax.export's custom-call compatibility window);
``use_pallas=False`` emits pure StableHLO that any XLA backend compiles
(pass ``platforms=("cpu", "tpu")`` to lower for both).
"""

from __future__ import annotations

import json
import os
import struct
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from .data.transforms import to_tensor
from .inference import build_fast_infer

_MAGIC = b"ERFX0001"


def _dtype_name(dtype) -> str:
    return jnp.dtype(dtype).name


def _coerce_to_spec(images, spec_dtype):
    """Route any reasonable frame form to a bundle's input spec (traced).

    f32-spec bundles: raw uint8 frames get the ToTensor /255
    (``data.transforms.to_tensor`` — the same normalize every live
    inference path applies; a plain cast would silently feed 0-255
    floats to a [0,1] program); float frames cast to f32 unchanged.
    uint8-spec bundles: uint8 passes through (the program normalizes
    internally); [0,1] float frames re-quantize with round(x*255) —
    exact for frames that originated as uint8/255.  Dtype branching is
    static under trace, so the whole adapter fuses into the cached
    jitted program."""
    if jnp.dtype(spec_dtype) == jnp.uint8:
        if images.dtype == jnp.uint8:
            return images
        # clip before the cast: an out-of-contract 0-255-valued float
        # frame saturates (wrong but monotone) instead of wrapping
        # modulo 256 into garbage
        return jnp.clip(jnp.round(images.astype(jnp.float32) * 255.0),
                        0.0, 255.0).astype(jnp.uint8)
    if images.dtype == jnp.uint8:
        return to_tensor(images)
    return images.astype(jnp.float32)


def export_infer(params, batch_stats, *, batch_size: int, height: int = 512,
                 width: int = 1024, dtype=jnp.bfloat16,
                 use_pallas: Optional[bool] = None, preds_only: bool = True,
                 platforms: Optional[Sequence[str]] = None,
                 input_dtype="float32") -> bytes:
    """Serialize one (batch, height, width) inference program to bytes.

    use_pallas=None picks the fused path on TPU and the portable XLA
    path elsewhere (compiled Pallas needs a TPU; interpret-mode Pallas
    is an eager emulation jax.export cannot capture).

    input_dtype="uint8": the exported program takes RAW uint8 frames and
    runs the ToTensor /255 itself (fused into the first conv) — 4x less
    host->device traffic on the serving host; "float32" keeps the
    classic [0,1] spec.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    infer = build_fast_infer(params, batch_stats, dtype=dtype,
                             use_pallas=use_pallas, preds_only=preds_only)
    in_dt = jnp.dtype(input_dtype)
    if in_dt == jnp.uint8:
        base = infer

        def infer(u8):  # noqa: F811 — uint8-spec wrapper
            return base(to_tensor(u8))
    elif in_dt != jnp.float32:
        raise ValueError(f"unsupported input_dtype: {input_dtype!r}")
    x_spec = jax.ShapeDtypeStruct((batch_size, height, width, 3), in_dt)
    exp = jax_export.export(
        jax.jit(infer),
        platforms=list(platforms) if platforms else None)(x_spec)
    return bytes(exp.serialize())


def save_servable(path: str, params, batch_stats, *,
                  batch_sizes: Sequence[int] = (1, 8), height: int = 512,
                  width: int = 1024, dtype=jnp.bfloat16,
                  use_pallas: Optional[bool] = None, preds_only: bool = True,
                  platforms: Optional[Sequence[str]] = None,
                  input_dtype="float32") -> Dict:
    """Export one program per batch bucket and write the ``.erfx`` bundle.

    Returns the header dict (sizes included) for logging."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    blobs = []
    entries = []
    offset = 0
    for b in sorted(set(int(b) for b in batch_sizes)):
        blob = export_infer(params, batch_stats, batch_size=b, height=height,
                            width=width, dtype=dtype, use_pallas=use_pallas,
                            preds_only=preds_only, platforms=platforms,
                            input_dtype=input_dtype)
        entries.append({"batch": b, "offset": offset, "size": len(blob)})
        blobs.append(blob)
        offset += len(blob)
    header = {
        "height": height, "width": width,
        "dtype": _dtype_name(dtype),
        "input_dtype": _dtype_name(input_dtype),
        "use_pallas": bool(use_pallas),
        "preds_only": bool(preds_only),
        "platforms": list(platforms) if platforms else None,
        "jax_version": jax.__version__,
        "entries": entries,
    }
    hdr = json.dumps(header).encode()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(hdr)))
        f.write(hdr)
        for blob in blobs:
            f.write(blob)
    os.replace(tmp, path)
    return header


class Servable:
    """A loaded ``.erfx`` bundle: compiled-on-demand inference buckets.

    ``call(images)`` requires an exact bucket batch; ``predict(images)``
    pads any batch up to the smallest bucket that fits.  Outputs follow
    the export-time contract: ``preds_only`` bundles return ``(B, H, W)``
    int32 class maps, otherwise ``(logits, preds)``.
    """

    def __init__(self, header: Dict, blobs: Dict[int, bytes]):
        self.header = header
        self._blobs = blobs
        self._fns: Dict[int, object] = {}

    @property
    def batch_sizes(self) -> Tuple[int, ...]:
        return tuple(sorted(self._blobs))

    @property
    def input_hw(self) -> Tuple[int, int]:
        return self.header["height"], self.header["width"]

    @property
    def input_dtype(self) -> str:
        # pre-r3 bundles have no input_dtype field; they were f32-specced
        return self.header.get("input_dtype", "float32")

    def _fn(self, batch: int):
        if batch not in self._fns:
            exp = jax_export.deserialize(bytearray(self._blobs[batch]))
            call, spec = exp.call, self.input_dtype
            spec_dt = jnp.dtype(spec)
            # the big exported program compiles EXACTLY ONCE per bucket,
            # at the spec dtype.  Off-spec frames go through a separate
            # small jitted coercion (one fused elementwise program — a
            # single extra dispatch, ~2.5 ms on a remote-relay host)
            # rather than tracing the coercion INTO the bundle, which
            # would re-specialize (multi-minute Mosaic recompile) per
            # caller dtype.  Serving callers should still send the spec
            # dtype for the zero-overhead path.
            main = jax.jit(call)
            coerce = jax.jit(lambda x: _coerce_to_spec(x, spec))

            def fn(images):
                if images.dtype != spec_dt:
                    images = coerce(images)
                return main(images)

            self._fns[batch] = fn
        return self._fns[batch]

    def call(self, images):
        images = jnp.asarray(images)
        b = images.shape[0]
        if b not in self._blobs:
            raise ValueError(f"no bucket for batch {b}; have "
                             f"{self.batch_sizes}")
        return self._fn(b)(images)

    def predict(self, images):
        images = jnp.asarray(images)
        b = images.shape[0]
        fits = [n for n in self.batch_sizes if n >= b]
        if not fits:
            raise ValueError(f"batch {b} exceeds largest bucket "
                             f"{self.batch_sizes[-1]}")
        n = fits[0]
        if n != b:
            pad = jnp.zeros((n - b,) + images.shape[1:], images.dtype)
            images = jnp.concatenate([images, pad], axis=0)
        out = self._fn(n)(images)
        if self.header["preds_only"]:
            return out[:b]
        logits, preds = out
        return logits[:b], preds[:b]


def load_servable(path: str) -> Servable:
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an .erfx bundle "
                             f"(magic {magic!r})")
        (hdr_len,) = struct.unpack("<I", f.read(4))
        header = json.loads(f.read(hdr_len).decode())
        body = f.read()
    blobs = {}
    running = 0
    for e in header["entries"]:
        if e["offset"] != running or e["size"] < 0:
            raise ValueError(
                f"{path}: corrupt header — entry batch {e['batch']} offset "
                f"{e['offset']} != running total {running} (entries must be "
                f"contiguous and non-overlapping)")
        running += e["size"]
        blobs[int(e["batch"])] = body[e["offset"]:e["offset"] + e["size"]]
        if len(blobs[int(e["batch"])]) != e["size"]:
            raise ValueError(f"{path}: truncated bundle (entry batch "
                             f"{e['batch']})")
    if running != len(body):
        raise ValueError(f"{path}: corrupt bundle — header claims "
                         f"{running} body bytes, file has {len(body)}")
    return Servable(header, blobs)


def predict_uint8(servable: Servable, images_u8: np.ndarray):
    """Serving convenience: uint8 HWC frames -> class-id maps.

    Kept for back-compat; ``Servable.predict`` now applies the ToTensor
    contract (SURVEY.md §2a row 6) to uint8 frames itself — including
    routing them RAW into uint8-spec bundles (export_infer
    input_dtype='uint8', 4x less host->device traffic)."""
    return servable.predict(jnp.asarray(images_u8))
