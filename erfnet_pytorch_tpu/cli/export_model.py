"""Export a trained net to a self-contained ``.erfx`` serving bundle.

New surface (no reference counterpart — the reference deploys by shipping
the raw ``.pth`` plus its eval scripts, SURVEY.md §2a rows 15/19): the
TPU-native deployment artifact is the jitted fast-infer program itself,
serialized via ``jax.export`` with weights embedded, one program per batch
bucket.  Load with ``erfnet_pytorch_tpu.export.load_servable`` — no model
code or checkpoint needed on the serving host.

    python -m erfnet_pytorch_tpu.cli.export_model \
        --loadDir save/erfnet_training1/ --loadWeights model_best.pth \
        --output erfnet.erfx --batch-sizes 1,8
"""

from __future__ import annotations

import argparse
import os

import jax


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--state")
    p.add_argument("--loadDir", default="save/logs/")
    p.add_argument("--loadWeights", default="model_best.pth")
    p.add_argument("--output", "-o", default="erfnet.erfx")
    p.add_argument("--batch-sizes", default="1,8",
                   help="comma-separated batch buckets")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--logits", action="store_true",
                   help="bundle returns (logits, preds) instead of preds")
    p.add_argument("--f32", action="store_true",
                   help="compute in float32 (default bfloat16)")
    p.add_argument("--xla", action="store_true",
                   help="portable pure-StableHLO program (no Pallas "
                        "custom calls); lowered for both cpu and tpu")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (implies --xla)")
    p.add_argument("--input-dtype", default="float32",
                   choices=("float32", "uint8"),
                   help="bundle input spec: classic [0,1] float32, or raw "
                        "uint8 frames (the ToTensor /255 runs inside the "
                        "exported program — 4x less host->device traffic "
                        "on the serving host)")
    p.add_argument("--format", default="erfx", choices=("erfx", "torch"),
                   help="erfx: self-contained jitted serving bundle "
                        "(default).  torch: the reference's torch "
                        "state_dict layout — a segmentation Net becomes "
                        "a .pth loadable by the reference's "
                        "eval_iou.py/load_my_state_dict, an ImageNet "
                        "classifier becomes the .pth.tar "
                        "save_checkpoint container (stage-2 "
                        "--pretrainedEncoder handoff)")
    p.add_argument("--module-prefix", action="store_true",
                   help="torch format: prefix every key with 'module.' "
                        "(a DataParallel-style save)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.cpu:
        # must run before any backend initialization; the axon TPU
        # plugin otherwise overrides JAX_PLATFORMS=cpu
        jax.config.update("jax_platforms", "cpu")
    from ..utils.jax_cache import enable as _enable_cache
    _enable_cache()
    import jax.numpy as jnp
    from ..export import save_servable
    from ..training.checkpoint import load_any_weights

    weights_path = args.state or os.path.join(args.loadDir,
                                              args.loadWeights)
    print(f"Loading weights: {weights_path}")
    params, batch_stats = load_any_weights(weights_path)

    if args.format == "torch":
        from ..utils import torch_import
        if "features" in params:  # ImageNet classifier -> .tar container
            torch_import.save_torch_encoder_tar(args.output, params,
                                                batch_stats)
            print(f"Wrote {args.output}: reference imagenet "
                  f"save_checkpoint container (module.features.encoder.*)")
        else:
            torch_import.save_torch_net(args.output, params, batch_stats,
                                        module_prefix=args.module_prefix)
            print(f"Wrote {args.output}: reference Net state_dict "
                  f"({'module.' if args.module_prefix else ''}encoder.*/"
                  f"decoder.*) — loadable by the reference eval scripts")
        return None

    batches = [int(b) for b in args.batch_sizes.split(",") if b]
    xla = args.xla or args.cpu
    header = save_servable(
        args.output, params, batch_stats, batch_sizes=batches,
        height=args.height, width=args.width,
        dtype=jnp.float32 if args.f32 else jnp.bfloat16,
        use_pallas=False if xla else None,
        preds_only=not args.logits,
        platforms=("cpu", "tpu") if xla else None,
        input_dtype=args.input_dtype)
    total = sum(e["size"] for e in header["entries"])
    print(f"Wrote {args.output}: {len(header['entries'])} bucket(s) "
          f"{[e['batch'] for e in header['entries']]}, "
          f"{total / 1e6:.1f} MB, pallas={header['use_pallas']}, "
          f"dtype={header['dtype']}")
    return header


if __name__ == "__main__":
    main()
