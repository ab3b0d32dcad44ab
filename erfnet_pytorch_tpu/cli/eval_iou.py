"""Cityscapes val/train mIoU evaluation — the reference's
``eval/eval_iou.py`` surface (SURVEY.md §2a row 14, §3.2): loads weights,
runs the 512x1024 eval pipeline, prints 19 ANSI-colored per-class IoUs and
MEAN IoU.

    python -m erfnet_pytorch_tpu.cli.eval_iou --datadir /data/cityscapes \
        --loadDir save/erfnet_training1/ --loadWeights model_best.pth
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp

from ..inference import add_pallas_flag

from ..data.cityscapes import CityscapesDataset
from ..data.loader import DataLoader
from ..data.transforms import CLASS_NAMES
from ..metrics.iou import IouEval, get_color_entry, colors
from ..ops.augment import co_transform
from ..training.checkpoint import load_any_weights

NUM_CLASSES = 20


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--state")
    p.add_argument("--loadDir", default="save/logs/")
    p.add_argument("--loadWeights", default="model_best.pth")
    p.add_argument("--loadModel", default="erfnet",
                   help="accepted for reference compatibility")
    p.add_argument("--subset", default="val")
    p.add_argument("--datadir", default=os.getenv("CITYSCAPES_DATADIR",
                                                  "/datasets/cityscapes"))
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=None,
                   help="eval width (default 2*height, the reference's "
                        "Resize((512, 1024)) contract)")
    p.add_argument("--parity", action="store_true",
                   help="one-command mIoU parity gate: force the exact "
                        "reference protocol (512x1024 val, Resize bilinear "
                        "/ nearest+Relabel, ignore-19), then print a "
                        "PASS/FAIL verdict vs the published 72.20%% +-0.3 "
                        "(reference README.md:~60); exits 1 on FAIL")
    p.add_argument("--parity-target", type=float, default=72.20,
                   help="published mIoU %% to compare against in --parity")
    p.add_argument("--parity-tol", type=float, default=0.3,
                   help="+- tolerance in mIoU points for --parity")
    p.add_argument("--cpu", action="store_true",
                   help="run on host CPU (forces the cpu platform)")
    p.add_argument("--bf16", action="store_true")
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
    weights_path = args.state or os.path.join(args.loadDir, args.loadWeights)
    print(f"Loading weights: {weights_path}")
    params, batch_stats = load_any_weights(weights_path)
    print("Model and weights LOADED successfully")

    from ..inference import build_fast_infer, resolve_use_pallas

    if args.parity:
        # The standing BASELINE gate (SURVEY.md §6): exact reference
        # protocol — 512x1024 bilinear input / nearest+Relabel target,
        # the val subset (500 images on real Cityscapes), ignore-19.
        w_eff = args.width if args.width is not None else 2 * args.height
        if (args.height, w_eff, args.subset) != (512, 1024, "val"):
            print(f"--parity: overriding --height/--width/--subset "
                  f"({args.height}/{w_eff}/{args.subset}) with the "
                  f"reference protocol 512/1024/val")
        args.height, args.width, args.subset = 512, 1024, "val"
    # explicit (h, w): the reference eval resize is Resize((512, 1024)) —
    # exact, not aspect-derived (eval/eval_iou.py:≈30).  Raw uint8 frames:
    # 4x less host->device traffic; /255 runs on-device (to_tensor, <=1 ulp
    # of the f32 loader's values), so the mIoU is unchanged.
    width = args.width if args.width is not None else 2 * args.height
    ds = CityscapesDataset(args.datadir, args.subset,
                           size=(args.height, width),
                           image_dtype=args.image_dtype)
    dl = DataLoader(ds, args.batch_size, num_workers=args.num_workers,
                    pad_final=True)

    from ..data.transforms import to_tensor
    from ..quantize import resolve_q8_scales
    q8 = resolve_q8_scales(args, params, batch_stats,
                           (b[0] for b in dl))
    infer_f32 = build_fast_infer(
        params, batch_stats,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        use_pallas=resolve_use_pallas(args.pallas), preds_only=True,
        q8_scales=q8)
    infer = jax.jit(lambda im: infer_f32(to_tensor(im)))
    ev = IouEval(NUM_CLASSES)

    start = time.time()
    for bidx, (images, labels, rels, n_valid) in enumerate(dl):
        preds = infer(images)
        _, labels = co_transform(None, images, labels, augment=False)
        ev.add_batch(preds[:n_valid], labels[:n_valid])
        if bidx % 25 == 0:
            print(f"batch {bidx}/{len(dl)}")
    mean_iou, per_class = ev.get_iou()
    print(f"took {time.time() - start:.1f}s "
          f"({len(ds) / max(time.time() - start, 1e-9):.2f} img/s)")

    print("---------------------------------------")
    print(f"Took {time.time() - start:.1f} seconds")
    print("=======================================")
    for i, name in enumerate(CLASS_NAMES):
        v = float(per_class[i])
        print(f"{get_color_entry(v)}{v*100:.2f}{colors.ENDC}% {name}")
    print("=======================================")
    print(f"{get_color_entry(mean_iou)}{mean_iou*100:.2f}{colors.ENDC}% "
          f"MEAN IoU")
    if args.parity:
        delta = mean_iou * 100 - args.parity_target
        ok = abs(delta) <= args.parity_tol
        print("=======================================")
        print(f"PARITY {'PASS' if ok else 'FAIL'}: "
              f"{mean_iou*100:.2f}% vs {args.parity_target:.2f}% "
              f"(delta {delta:+.2f}, tolerance +-{args.parity_tol:.2f}) "
              f"over {len(ds)} {args.subset} images")
        if not ok:
            raise SystemExit(1)
    return mean_iou


if __name__ == "__main__":
    main()
