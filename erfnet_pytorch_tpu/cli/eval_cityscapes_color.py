"""Colorized segmentation output — the reference's
``eval/eval_cityscapes_color.py`` surface (SURVEY.md §2a row 15, §3.3):
forward -> per-pixel argmax -> palette colorization -> PNG per input image,
preserving the Cityscapes subdir/filename under ``save_color/``.

TPU-native: argmax + palette lookup run on-device; only uint8 RGB crosses
to host (the streaming-inference contract of BASELINE.json config 5).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from ..inference import add_pallas_flag

from ..data.cityscapes import CityscapesDataset
from ..data.loader import DataLoader
from ..training.checkpoint import load_any_weights

NUM_CLASSES = 20


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--state")
    p.add_argument("--loadDir", default="save/logs/")
    p.add_argument("--loadWeights", default="model_best.pth")
    p.add_argument("--loadModel", default="erfnet")
    p.add_argument("--subset", default="val")
    p.add_argument("--datadir", default=os.getenv("CITYSCAPES_DATADIR",
                                                  "/datasets/cityscapes"))
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=None,
                   help="eval width (default 2*height, the reference's "
                        "Resize((512, 1024)) contract)")
    p.add_argument("--outdir", default="save_color")
    p.add_argument("--writer", default="auto",
                   choices=("auto", "native", "pil"),
                   help="PNG output backend: the native GIL-free libpng "
                        "pool writes palette-indexed PNGs straight from "
                        "the device trainId map (~10x faster than the PIL "
                        "RGB fallback, identical pixels)")
    p.add_argument("--png-level", type=int, default=1,
                   help="zlib level for the native writer (0-9)")
    p.add_argument("--cpu", action="store_true",
                   help="run on host CPU (forces the cpu platform)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--erfx",
                   help="serve from an exported .erfx bundle "
                        "(cli.export_model) instead of weights; "
                        "--loadDir/--pallas/--int8/--bf16 are then ignored "
                        "(the bundle's export-time dtype wins)")
    add_pallas_flag(p)
    from ..inference import add_int8_flags
    add_int8_flags(p)
    p.add_argument("--image-dtype", default="uint8",
                   choices=("uint8", "float32"),
                   help="loader frame form: raw uint8 (default; 4x less "
                        "host->device traffic, /255 runs on-device) or "
                        "float32 ToTensor frames")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if getattr(args, "cpu", False):
        # must run before any backend initialization; the axon TPU
        # plugin otherwise overrides JAX_PLATFORMS=cpu
        jax.config.update("jax_platforms", "cpu")
    from ..utils.jax_cache import enable as _enable_cache
    _enable_cache()
    from ..streaming import PngBatchSink, StreamingSegmenter
    # explicit (h, w): the reference eval resize is Resize((512, 1024)) —
    # exact, not aspect-derived (eval/eval_iou.py:≈30)
    width = args.width if args.width is not None else 2 * args.height
    # raw uint8 frames: 4x less host->device traffic; the segmenter
    # normalizes on-device (the values are the same PIL-rounded resize
    # the reference's ToTensor divides)
    ds = CityscapesDataset(args.datadir, args.subset,
                           size=(args.height, width),
                           image_dtype=args.image_dtype)
    dl = DataLoader(ds, args.batch_size, num_workers=args.num_workers)
    sink = PngBatchSink(args.outdir, "color", backend=args.writer,
                        num_threads=args.num_workers, level=args.png_level)
    if args.erfx:
        if args.bf16:
            print("warning: --bf16 is ignored with --erfx "
                  "(the bundle's export-time dtype wins)")
        print(f"Loading serving bundle: {args.erfx}")
        seg = StreamingSegmenter.from_servable(args.erfx,
                                               output=sink.device_output)
    else:
        weights_path = args.state or os.path.join(args.loadDir,
                                                  args.loadWeights)
        print(f"Loading weights: {weights_path}")
        params, batch_stats = load_any_weights(weights_path)
        print("Model and weights LOADED successfully")

        from ..inference import resolve_use_pallas
        from ..quantize import resolve_q8_scales
        q8 = resolve_q8_scales(args, params, batch_stats,
                               (b[0] for b in dl))
        seg = StreamingSegmenter(
            params, batch_stats,
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
            use_pallas=resolve_use_pallas(args.pallas),
            output=sink.device_output, q8_scales=q8)
    for out, rels in seg.run(dl):
        for out_path in sink.write(out, rels):
            print(out_path)


if __name__ == "__main__":
    main()
