"""ImageNet encoder pretraining CLI — the reference's ``imagenet/main.py``
surface (SURVEY.md §2a row 18, §3.5; itself adapted from
pytorch/examples/imagenet): SGD+momentum, lr x0.1 every 30 epochs, top-1/
top-5 accuracy with running AverageMeters, checkpoint with best_prec1,
resume, evaluate-only mode.

The produced ``model_best.pth.tar`` feeds ``train_main --pretrainedEncoder``
(stage-2 encoder handoff via the ``features.encoder`` pytree path).

    python -m erfnet_pytorch_tpu.cli.imagenet_main /data/imagenet \
        --epochs 90 --batch-size 256 --lr 0.1
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..data.imagenet import ImageFolderDataset, IMAGENET_MEAN, IMAGENET_STD
from ..data.loader import DataLoader
from ..data.transforms import to_tensor
from ..models import erfnet_imagenet
from ..ops.loss import cross_entropy
from ..parallel import spmd
from ..parallel.mesh import make_mesh_for_batch, batch_sharding, replicate
from ..training import optim
from ..training.checkpoint import (save_checkpoint_file, load_checkpoint_file,
                                   restore_opt_state, save_weights)
from ..training.steps import TrainState


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("data", help="ImageNet root with train/ and val/")
    p.add_argument("--arch", default="erfnet_imagenet")
    p.add_argument("--workers", "-j", type=int, default=4)
    p.add_argument("--epochs", type=int, default=90)
    p.add_argument("--start-epoch", type=int, default=0)
    p.add_argument("--batch-size", "-b", type=int, default=256)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--print-freq", type=int, default=10)
    p.add_argument("--resume", default="")
    p.add_argument("--evaluate", action="store_true")
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--savedir", default="save_imagenet")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--cpu", action="store_true",
                   help="run on host CPU (forces the cpu platform)")
    return p


class AverageMeter:
    """Running average (reference imagenet/main.py helper)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = self.sum = self.count = 0.0
        self.avg = 0.0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def make_steps(optimizer, compute_dtype):
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    def normalize(x):
        # raw uint8 loader frames: ToTensor /255 first (exact), fused by
        # XLA with the mean/std normalize and the first conv
        x = to_tensor(x)
        return (x - mean) / std

    @jax.jit
    def train_step(ts: TrainState, images, labels, rng, valid=None):
        def loss_fn(params, stats):
            logits, new_stats = erfnet_imagenet.apply(
                params, stats, normalize(images), train=True, rng=rng,
                compute_dtype=compute_dtype, valid=valid)
            return cross_entropy(logits, labels, valid), \
                (new_stats, logits)

        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ts.params, ts.batch_stats)
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        return (TrainState(params, new_stats, opt_state, ts.step + 1),
                loss, _topk_correct(logits, labels, valid=valid))

    @jax.jit
    def eval_step(ts: TrainState, images, labels, valid=None):
        logits, _ = erfnet_imagenet.apply(ts.params, ts.batch_stats,
                                          normalize(images), train=False,
                                          compute_dtype=compute_dtype)
        return cross_entropy(logits, labels, valid), \
            _topk_correct(logits, labels, valid=valid)

    return train_step, eval_step


def _topk_correct(logits, labels, k=5, valid=None):
    """(top1_correct, top5_correct) counts — reference accuracy(topk=(1,5)).

    Sort-free: the target's rank is the number of logits strictly greater
    than logits[target] (+ earlier-index ties, matching argsort order).
    ``valid`` ((B,) 0/1, optional) excludes DP batch-pad rows from the
    counts."""
    logits = logits.astype(jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    is_t = iota == labels[:, None].astype(jnp.int32)
    logit_t = jnp.sum(jnp.where(is_t, logits, 0.0), axis=-1)
    gt = logits > logit_t[:, None]
    tie_before = (logits == logit_t[:, None]) & (iota < labels[:, None])
    rank = jnp.sum(gt | tie_before, axis=-1)
    v = jnp.ones(rank.shape, jnp.float32) if valid is None \
        else valid.astype(jnp.float32)
    return (((rank < 1) * v).sum(), ((rank < k) * v).sum())


def _valid_mask(images, n_valid):
    """(B,) 0/1 f32 pad-row mask.  Always an array (not None) so every
    batch of a loop shares ONE compiled program — a None-vs-array split
    would compile the step twice just for the final partial batch."""
    return (np.arange(images.shape[0]) < n_valid).astype(np.float32)


def run_validate(eval_step, ts, dl, print_freq, log=print):
    """Reference imagenet/main.py validate(): the meters weight each
    batch by its TRUE size — the final batch is shape-padded (pad_final)
    and its pad rows are masked out of the loss and topk counts (torch's
    DataLoader just delivers a smaller final batch)."""
    top1, top5, losses = AverageMeter(), AverageMeter(), AverageMeter()
    for i, (images, labels, _rels, n_valid) in enumerate(dl):
        loss, (c1, c5) = eval_step(ts, images, labels,
                                   _valid_mask(images, n_valid))
        b = n_valid
        losses.update(float(loss), b)
        top1.update(float(c1) / b * 100, b)
        top5.update(float(c5) / b * 100, b)
        if i % print_freq == 0:
            log(f"Test: [{i}/{len(dl)}]\tLoss {losses.val:.4f} "
                f"({losses.avg:.4f})\tPrec@1 {top1.val:.3f} ({top1.avg:.3f})"
                f"\tPrec@5 {top5.val:.3f} ({top5.avg:.3f})")
    log(f" * Prec@1 {top1.avg:.3f} Prec@5 {top5.avg:.3f}")
    return top1.avg


def main(argv=None):
    args = build_parser().parse_args(argv)
    if getattr(args, "cpu", False):
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")
    os.makedirs(args.savedir, exist_ok=True)
    compute_dtype = jnp.bfloat16 if args.bf16 else None

    # full mesh: non-divisible batches pad to a mesh multiple and the
    # per-batch valid mask excludes pad rows from the CE loss, the topk
    # counts AND every BN batch statistic (exact — see data/loader.py)
    mesh = make_mesh_for_batch(args.batch_size)
    # scoped mesh registration: the fused Pallas kernels shard over it
    with spmd.pallas_mesh(mesh):
        return _run(args, mesh, compute_dtype)


def _run(args, mesh, compute_dtype):
    bsh = batch_sharding(mesh)
    optimizer = optim.make_sgd(args.lr, args.momentum, args.weight_decay)
    params, batch_stats = erfnet_imagenet.init(jax.random.PRNGKey(0),
                                               args.num_classes)
    ts = TrainState(params, batch_stats, optimizer.init(params),
                    jnp.zeros((), jnp.int32))
    ts = replicate(mesh, ts)
    train_step, eval_step = make_steps(optimizer, compute_dtype)

    best_prec1 = 0.0
    start_epoch = args.start_epoch
    ckpt_path = os.path.join(args.savedir, "checkpoint.pth.tar")
    if args.resume:
        payload = load_checkpoint_file(args.resume)
        ts = TrainState(payload["params"], payload["batch_stats"],
                        restore_opt_state(ts.opt_state, payload["opt_state"]),
                        ts.step)
        ts = replicate(mesh, ts)
        start_epoch = int(payload["epoch"])
        best_prec1 = float(payload["best_acc"])
        print(f"=> resumed from {args.resume} (epoch {start_epoch})")

    from ..parallel.mesh import pad_to_for_mesh
    pad_to = pad_to_for_mesh(mesh)
    # raw uint8 crops: 4x less host->device traffic; make_steps'
    # normalize() runs the ToTensor /255 on-device
    ds_val = ImageFolderDataset(args.data, "val", train=False,
                                image_dtype="uint8")
    dl_val = DataLoader(ds_val, args.batch_size, num_workers=args.workers,
                        pad_final=True, sharding=bsh, pad_to=pad_to)
    if args.evaluate:
        run_validate(eval_step, ts, dl_val, args.print_freq)
        return

    ds_train = ImageFolderDataset(args.data, "train", train=True,
                                  image_dtype="uint8")
    dl_train = DataLoader(ds_train, args.batch_size, shuffle=True,
                          num_workers=args.workers, drop_last=True,
                          sharding=bsh, pad_to=pad_to)
    print(f"dataset: {len(ds_train)} train / {len(ds_val)} val, "
          f"{len(ds_train and ds_train.classes)} classes, mesh {mesh.shape}")

    rng = jax.random.PRNGKey(1)
    for epoch in range(start_epoch, args.epochs):
        lr = optim.step_lr(args.lr, epoch)
        ts = ts._replace(opt_state=optim.set_learning_rate(ts.opt_state, lr))
        top1, top5, losses = AverageMeter(), AverageMeter(), AverageMeter()
        t0 = time.time()
        for i, (images, labels, _rels, n_valid) in enumerate(dl_train):
            r = jax.random.fold_in(rng, epoch * 1_000_000 + i)
            ts, loss, (c1, c5) = train_step(ts, images, labels, r,
                                            _valid_mask(images, n_valid))
            b = n_valid
            losses.update(float(loss), b)
            top1.update(float(c1) / b * 100, b)
            top5.update(float(c5) / b * 100, b)
            if i % args.print_freq == 0:
                print(f"Epoch: [{epoch}][{i}/{len(dl_train)}]\t"
                      f"Time {time.time()-t0:.1f}\tLoss {losses.val:.4f} "
                      f"({losses.avg:.4f})\tPrec@1 {top1.val:.3f} "
                      f"({top1.avg:.3f})\tPrec@5 {top5.val:.3f} "
                      f"({top5.avg:.3f})\tLR {lr:g}")
        prec1 = run_validate(eval_step, ts, dl_val, args.print_freq)
        is_best = prec1 > best_prec1
        best_prec1 = max(prec1, best_prec1)
        save_checkpoint_file(ckpt_path, epoch=epoch + 1, arch=args.arch,
                             params=ts.params, batch_stats=ts.batch_stats,
                             opt_state=ts.opt_state, best_acc=best_prec1)
        if is_best:
            save_weights(os.path.join(args.savedir, "model_best.pth.tar"),
                         ts.params, ts.batch_stats)


if __name__ == "__main__":
    main()
