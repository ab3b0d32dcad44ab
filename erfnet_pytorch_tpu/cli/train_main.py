"""Two-stage Cityscapes training CLI — flag-for-flag surface of the
reference's ``train/main.py`` (SURVEY.md §2a row 9, §3.1).

    python -m erfnet_pytorch_tpu.cli.train_main --datadir /data/cityscapes \
        --savedir erfnet_training1 --num-epochs 150 --batch-size 6

Reference flags kept: --model --datadir --height --num-epochs --num-workers
--batch-size --steps-loss --steps-plot --epochs-save --savedir --decoder
--pretrainedEncoder --visualize --port --iouTrain --iouVal --resume --state
(--cuda is accepted and ignored: device placement is jax's).
TPU-first additions: --bf16 (MXU compute dtype), --devices (data-parallel
mesh size; default all).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from ..training.trainer import TrainConfig, train_two_stage
from ..training.checkpoint import load_any_weights
from ..parallel.mesh import make_mesh

NUM_CLASSES = 20


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cuda", action="store_true", default=True,
                   help="accepted for reference-CLI compatibility (ignored)")
    p.add_argument("--model", default="erfnet")
    p.add_argument("--state")
    p.add_argument("--port", type=int, default=8097)
    p.add_argument("--datadir", default=os.getenv("CITYSCAPES_DATADIR",
                                                  "/datasets/cityscapes"))
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--num-epochs", type=int, default=150)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=6)
    p.add_argument("--steps-loss", type=int, default=50)
    p.add_argument("--steps-plot", type=int, default=50)
    p.add_argument("--epochs-save", type=int, default=0)
    p.add_argument("--savedir", required=True)
    p.add_argument("--decoder", action="store_true",
                   help="skip stage 1 (encoder training)")
    p.add_argument("--pretrainedEncoder",
                   help="path to ImageNet-pretrained encoder checkpoint "
                        "(.pth.tar torch or native msgpack)")
    p.add_argument("--visualize", action="store_true")
    p.add_argument("--iouTrain", action="store_true", default=False)
    p.add_argument("--iouVal", action="store_true", default=True)
    p.add_argument("--resume", action="store_true")
    # TPU-native extensions
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 MXU compute (f32 params/accum)")
    p.add_argument("--cpu", action="store_true",
                   help="run on host CPU (forces the cpu platform)")
    p.add_argument("--devices", type=int, default=None,
                   help="data-parallel mesh size (default: all chips)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cache-dir", default="",
                   help="decoded-sample cache dir (big speedup on "
                        "few-core hosts from epoch 2 on)")
    p.add_argument("--multi-step", type=int, default=1,
                   help="optimizer steps per compiled dispatch (K>1 "
                        "amortizes fixed dispatch overhead; trailing "
                        "epoch remainder of <K batches is dropped)")
    p.add_argument("--tensorboard", action="store_true",
                   help="write tensorboard scalars under savedir/tb/")
    p.add_argument("--no-fused-kernels", action="store_true",
                   help="disable the custom-VJP fused Pallas train kernels "
                        "(use the plain-XLA matmul path)")
    p.add_argument("--image-dtype", default="uint8",
                   choices=("uint8", "float32"),
                   help="loader frame form: raw uint8 (default; 4x less "
                        "host->device traffic, ToTensor /255 runs "
                        "on-device) or float32 ToTensor frames")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if getattr(args, "cpu", False):
        # must run before any backend initialization; the axon TPU
        # plugin otherwise overrides JAX_PLATFORMS=cpu
        jax.config.update("jax_platforms", "cpu")
    from ..utils.jax_cache import enable as _enable_cache
    _enable_cache()
    if args.no_fused_kernels:
        from ..ops.pallas.nb1d_train import set_fused_train
        set_fused_train(False)
    savedir = args.savedir if os.path.isabs(args.savedir) \
        else os.path.join("save", args.savedir)

    cfg = TrainConfig(
        datadir=args.datadir, savedir=savedir, model=args.model,
        num_classes=NUM_CLASSES, height=args.height,
        num_epochs=args.num_epochs, batch_size=args.batch_size,
        num_workers=args.num_workers, steps_loss=args.steps_loss,
        epochs_save=args.epochs_save, iou_train=args.iouTrain,
        iou_val=args.iouVal, resume=args.resume, seed=args.seed,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
        mesh=make_mesh(args.devices) if args.devices else None,
        cache_dir=args.cache_dir, image_dtype=args.image_dtype,
        init_weights=args.state or "",
        visualize=args.visualize, port=args.port,
        steps_plot=args.steps_plot, tensorboard=args.tensorboard,
        multi_step=args.multi_step,
    )

    pretrained_encoder = None
    if args.pretrainedEncoder:
        print(f"Loading pretrained encoder: {args.pretrainedEncoder}")
        params, stats = load_any_weights(args.pretrainedEncoder)
        if "features" in params:  # ImageNet classifier checkpoint
            pretrained_encoder = (params["features"]["encoder"],
                                  stats["features"]["encoder"])
        else:
            pretrained_encoder = (params["encoder"], stats["encoder"])

    if args.decoder and args.state:
        print(f"Loading encoder state from: {args.state}")
        params, stats = load_any_weights(args.state)
        pretrained_encoder = (params["encoder"], stats["encoder"])

    train_two_stage(cfg, decoder_only=args.decoder,
                    pretrained_encoder=pretrained_encoder)
    print("========== TRAINING FINISHED ==========")


if __name__ == "__main__":
    main()
