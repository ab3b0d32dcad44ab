"""Host image-IO microbench: native C++ loader/writer vs the PIL path.

CPU-only (no TPU needed).  Prints one JSON object with ms/img for:
  decode+resize 1024x2048 -> 512x1024 (f32 and raw-uint8 forms) vs PIL,
  PNG encode of a 512x1024 segmentation output (palette/gray/RGB) vs PIL.

These are the host stages of the eval CLIs (SURVEY.md §3.3): the
reference's DataLoader-worker decode and its per-image ToPILImage.save.

Usage: python scripts/host_io_bench.py [--reps 15]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from erfnet_pytorch_tpu import native
from erfnet_pytorch_tpu.data.transforms import CITYSCAPES_PALETTE


def timeit(fn, reps):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=15)
    args = ap.parse_args()
    if not native.available():
        raise SystemExit("native library did not build")

    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix="io_bench_")
    res = {}

    # --- input side: a full-res Cityscapes-like frame -> 512x1024
    frame = rng.randint(0, 255, (1024, 2048, 3), dtype=np.uint8)
    src = os.path.join(tmp, "frame.png")
    Image.fromarray(frame).save(src)
    ldr = native.NativeBatchLoader(num_threads=1)  # per-image cost
    res["decode_resize_f32_native_ms"] = timeit(
        lambda: ldr.load_batch([src], [""], 512, 1024), args.reps)
    res["decode_resize_u8_native_ms"] = timeit(
        lambda: ldr.load_batch([src], [""], 512, 1024,
                               image_dtype="uint8"), args.reps)

    def pil_load():
        with Image.open(src) as im:
            im = im.convert("RGB").resize((1024, 512), Image.BILINEAR)
            return np.asarray(im, np.float32) / 255.0

    res["decode_resize_f32_pil_ms"] = timeit(pil_load, args.reps)

    # --- output side: a piecewise-constant seg map with a noisy region
    seg = np.zeros((512, 1024), np.uint8)
    seg[:200] = 10
    seg[200:350] = 2
    seg[:, :300] = (seg[:, :300] + 5) % 20
    seg[350:, 400:] = rng.randint(0, 20, (162, 624)).astype(np.uint8)
    pal = np.asarray(CITYSCAPES_PALETTE, np.uint8)
    rgb = pal[seg]
    w = native.NativeBatchWriter(num_threads=1)
    out = os.path.join(tmp, "out.png")
    res["encode_palette_native_ms"] = timeit(
        lambda: w.write_batch([out], seg[None], mode=w.MODE_PAL,
                              palette=pal), args.reps)
    res["encode_gray_native_ms"] = timeit(
        lambda: w.write_batch([out], seg[None], mode=w.MODE_GRAY),
        args.reps)
    res["encode_rgb_native_ms"] = timeit(
        lambda: w.write_batch([out], rgb[None], mode=w.MODE_RGB), args.reps)
    res["encode_rgb_pil_ms"] = timeit(
        lambda: Image.fromarray(rgb).save(out), args.reps)
    res["encode_gray_pil_ms"] = timeit(
        lambda: Image.fromarray(seg, mode="L").save(out), args.reps)

    res = {k: round(v, 2) for k, v in res.items()}
    res["color_output_speedup_vs_pil"] = round(
        res["encode_rgb_pil_ms"] / res["encode_palette_native_ms"], 1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
