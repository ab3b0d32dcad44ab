"""Training driver — the rebuild of ``train/main.py:train()`` / ``main()``
(SURVEY.md §2a rows 9, 12; §3.1 call stack): per-epoch train+val loops,
poly LR, class-weighted NLL, IoU tracking, checkpoint/resume, best-model
bookkeeping, ``automated_log.txt`` / ``model.txt`` artifacts, and the
two-stage encoder->decoder orchestration.

TPU-native: the hot path is one jitted step (training/steps.py); batches are
sharded over the mesh's data axis; only scalar losses and (optionally) IoU
matrices come back to host.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.cityscapes import CityscapesDataset
from ..data.loader import DataLoader
from ..metrics.iou import IouEval, get_color_entry, colors
from ..models import erfnet, get_model
from ..parallel import spmd
from ..parallel.mesh import (make_mesh_for_batch, batch_sharding, replicate,
                             pad_to_for_mesh)
from .class_weights import get_class_weights
from . import optim
from .checkpoint import CheckpointManager, restore_opt_state
from .steps import (TrainState, create_train_state, make_train_step,
                    make_eval_step)


@dataclass
class TrainConfig:
    datadir: str
    savedir: str
    model: str = "erfnet"
    num_classes: int = 20
    height: int = 512
    num_epochs: int = 150
    batch_size: int = 6
    num_workers: int = 4
    lr: float = 5e-4
    weight_decay: float = 1e-4
    steps_loss: int = 50
    epochs_save: int = 0
    iou_train: bool = False
    iou_val: bool = True
    resume: bool = False
    augment: bool = True
    seed: int = 0
    compute_dtype: Any = None          # e.g. jnp.bfloat16
    mesh: Any = None                   # jax Mesh; default: all devices
    log_fn: Callable[[str], None] = print
    cache_dir: str = ""                # decoded-sample cache (data/cache.py)
    image_dtype: str = "uint8"         # loader frame form: raw 'uint8'
    # (4x less host->device traffic; the train/eval steps normalize
    # on-device to within 1 ulp of the f32 values) or 'float32' frames
    init_weights: str = ""             # warm-start weights (--state), partial
    visualize: bool = False            # visdom Dashboard (reference --visualize)
    port: int = 8097
    steps_plot: int = 50
    tensorboard: bool = False          # TensorBoardWriter scalars
    multi_step: int = 1                # optimizer steps per dispatch (K):
    # one compiled program runs K unrolled steps, amortizing the fixed
    # per-dispatch overhead (25.0 vs 28.0 ms/step at K=2 on v5e).  A
    # trailing epoch remainder of <K batches carries into the next
    # epoch's first group (so no image is systematically dropped; the
    # carried batches train under the next epoch's LR); only a stage-end
    # remainder is dropped (logged).  Ignored when iou_train needs
    # per-step predictions.


def train_stage(cfg: TrainConfig, *, enc: bool,
                pretrained_encoder=None) -> TrainState:
    """One training stage (enc=True: encoder-only at 1/8; False: full net).

    Returns the final TrainState; artifacts land in cfg.savedir with the
    reference's file names (``*_enc`` suffixes for the encoder stage).
    """
    mesh = cfg.mesh if cfg.mesh is not None \
        else make_mesh_for_batch(cfg.batch_size)
    # register the DP mesh (scoped) so the fused Pallas kernels shard over
    # it (parallel/spmd.py wraps each batch-grid kernel in shard_map)
    with spmd.pallas_mesh(mesh):
        return _train_stage(cfg, mesh, enc=enc,
                            pretrained_encoder=pretrained_encoder)


def _train_stage(cfg: TrainConfig, mesh, *, enc: bool,
                 pretrained_encoder=None) -> TrainState:
    log = cfg.log_fn
    log(f"========== {'ENCODER' if enc else 'DECODER'} TRAINING ==========")
    bsh = batch_sharding(mesh)

    model = get_model(cfg.model)
    optimizer = optim.make_adam(cfg.lr, cfg.weight_decay)
    rng = jax.random.PRNGKey(cfg.seed)
    ts = create_train_state(model, rng, cfg.num_classes, optimizer,
                            encoder=pretrained_encoder)
    if cfg.init_weights:
        from .checkpoint import load_any_weights, partial_load
        src_p, src_s = load_any_weights(cfg.init_weights)
        params, loaded, skipped = partial_load(ts.params, src_p)
        stats, _, _ = partial_load(ts.batch_stats, src_s)
        ts = ts._replace(params=params, batch_stats=stats)
        log(f"=> warm start from {cfg.init_weights}: {len(loaded)} tensors "
            f"loaded, {len(skipped)} kept")
    ts = replicate(mesh, ts)

    weights = get_class_weights(enc)
    # flat-carry params/optimizer: the per-leaf Adam over 228 tensors is
    # per-op-overhead bound on TPU; the flat step does it in ~4 vector ops
    K = 1 if cfg.iou_train else max(1, cfg.multi_step)
    train_step = make_train_step(model, optimizer, weights, enc=enc,
                                 augment=cfg.augment,
                                 compute_dtype=cfg.compute_dtype,
                                 with_pred=cfg.iou_train, flat=True,
                                 multi_step=K)
    eval_step = make_eval_step(model, weights, enc=enc,
                               compute_dtype=cfg.compute_dtype)

    ds_train = CityscapesDataset(cfg.datadir, "train", height=cfg.height,
                                 image_dtype=cfg.image_dtype)
    ds_val = CityscapesDataset(cfg.datadir, "val", height=cfg.height,
                               image_dtype=cfg.image_dtype)
    if cfg.cache_dir:
        from ..data.cache import CachedDataset
        # dtype-tagged: a cache written for one frame form must not be
        # served for the other (uint8 entries are also 4x smaller)
        dt = "" if cfg.image_dtype == "float32" else "_u8"
        ds_train = CachedDataset(ds_train, cfg.cache_dir,
                                 tag=f"train_h{cfg.height}{dt}")
        ds_val = CachedDataset(ds_val, cfg.cache_dir,
                               tag=f"val_h{cfg.height}{dt}")
    log(f"dataset: {len(ds_train)} train / {len(ds_val)} val images")
    # pad_to: non-divisible batches pad to a mesh multiple with void-label
    # rows (zero loss/grad weight) so every chip stays busy under DP; the
    # per-batch `valid` mask below excludes the pad rows from every BN
    # batch statistic, making the padded step numerically EXACT vs the
    # unpadded batch (models/erfnet.py:apply valid=)
    pad_to = pad_to_for_mesh(mesh)

    def valid_mask(images, n_valid):
        """(B,) 0/1 f32 mask for the train step; None when no padding can
        occur (single-chip), keeping the step's no-mask program."""
        if pad_to is None:
            return None
        return (np.arange(images.shape[0]) < n_valid).astype(np.float32)
    dl_train = DataLoader(ds_train, cfg.batch_size, shuffle=True,
                          num_workers=cfg.num_workers, drop_last=True,
                          seed=cfg.seed, sharding=bsh, pad_to=pad_to)
    dl_val = DataLoader(ds_val, cfg.batch_size, shuffle=False,
                        num_workers=cfg.num_workers, pad_final=True,
                        sharding=bsh, pad_to=pad_to)

    board = None
    if cfg.visualize:
        from .visualize import Dashboard
        board = Dashboard(cfg.port)
    tb = None
    if cfg.tensorboard:
        from ..utils.profiling import TensorBoardWriter
        tb = TensorBoardWriter(os.path.join(cfg.savedir, "tb",
                                            "enc" if enc else "dec"))

    ckpt = CheckpointManager(cfg.savedir, enc)
    log_path = os.path.join(
        cfg.savedir, "automated_log_encoder.txt" if enc
        else "automated_log.txt")
    if not os.path.exists(log_path):
        with open(log_path, "a") as f:
            f.write("Epoch\t\tTrain-loss\t\tTest-loss\t\tTrain-IoU\t\t"
                    "Test-IoU\t\tlearningRate")

    start_epoch = 1
    best_acc = -np.inf
    if cfg.resume:
        payload = ckpt.resume()
        ts = TrainState(
            params=payload["params"],
            batch_stats=payload["batch_stats"],
            opt_state=restore_opt_state(ts.opt_state, payload["opt_state"]),
            # restore the step counter: the train step folds it into the
            # RNG key, so resume replays the same augment/dropout stream
            step=jnp.asarray(payload.get("step", 0), jnp.int32))
        ts = replicate(mesh, ts)
        start_epoch = int(payload["epoch"]) + 1
        best_acc = float(payload["best_acc"])
        log(f"=> resumed checkpoint at epoch {payload['epoch']} "
            f"(best_acc {best_acc:.4f})")

    step_rng = jax.random.PRNGKey(cfg.seed + 1)
    fts = train_step.flatten(ts)  # flat carry for the hot loop
    # multi_step group carried ACROSS epochs: a trailing remainder of <K
    # batches joins the next epoch's first dispatch instead of dropping
    group_im, group_lb, group_va, group_n = [], [], [], 0
    for epoch in range(start_epoch, cfg.num_epochs + 1):
        log(f"----- TRAINING - EPOCH {epoch} -----")
        # pin the shuffle stream to the TRAINING epoch (not the loader's
        # iteration count): a resumed run then replays the uninterrupted
        # run's exact data order — at multi_step=1, resume is BIT-equal
        # (reference --resume restarts the torch RNG instead; verified
        # on-chip by scripts/tpu_train_soak.py).  At multi_step>1 the
        # cross-epoch group carry below is NOT checkpointed: a kill with
        # a pending <K-batch remainder drops it on resume (the same
        # batches a stage end would drop), so resume is
        # same-data-order but not bit-equal in that window.
        dl_train.set_epoch(epoch)
        lr = optim.poly_lr(cfg.lr, epoch - 1, cfg.num_epochs)
        fts = fts._replace(opt_state=optim.set_learning_rate(fts.opt_state,
                                                             lr))
        log(f"LEARNING RATE: {lr}")

        epoch_loss = []
        iou_train = IouEval(cfg.num_classes) if cfg.iou_train else None
        t_start = time.time()
        n_imgs = 0
        for bidx, (images, labels, _rels, n_valid) in enumerate(dl_train):
            # the step folds ts.step into the key on device — one constant
            # base key here avoids a per-step host fold_in dispatch
            if cfg.iou_train:
                fts, loss, preds, tgts = train_step(
                    fts, images, labels, step_rng,
                    valid_mask(images, n_valid))
                iou_train.add_batch(preds, tgts)
                epoch_loss.append(loss)
                n_imgs += n_valid
                completed = (bidx,)
            elif K > 1:
                group_im.append(images)
                group_lb.append(labels)
                group_va.append(valid_mask(images, n_valid))
                group_n += n_valid
                if len(group_im) < K:
                    continue
                fts, losses = train_step(
                    fts, tuple(group_im), tuple(group_lb), step_rng,
                    None if pad_to is None else tuple(group_va))
                group_im, group_lb, group_va = [], [], []
                n_imgs += group_n
                group_n = 0
                epoch_loss.extend(list(losses))
                # this dispatch retired batches bidx-K+1 .. bidx; the
                # periodic logging below fires if ANY of them hits the
                # steps_loss/steps_plot cadence (with K>1 a strict
                # `bidx % steps == 0` check can be unsatisfiable: groups
                # complete only at bidx ≡ K-1 (mod K))
                completed = tuple(range(bidx - K + 1, bidx + 1))
            else:
                fts, loss = train_step(fts, images, labels, step_rng,
                                       valid_mask(images, n_valid))
                epoch_loss.append(loss)
                n_imgs += n_valid
                completed = (bidx,)
            if cfg.steps_loss > 0 \
                    and any(b % cfg.steps_loss == 0 for b in completed):
                avg = float(np.mean([float(l) for l in epoch_loss]))
                t_per_img = (time.time() - t_start) / max(n_imgs, 1)
                log(f"loss: {avg:.4f} (epoch: {epoch}, step: {bidx}) "
                    f"// Avg time/img: {t_per_img:.4f} s")
            if (board is not None or tb is not None) and cfg.steps_plot > 0 \
                    and any(b % cfg.steps_plot == 0 for b in completed):
                # reference --steps-plot contract (train/main.py +
                # train/visualize.py): input AND colorized output AND
                # colorized target.  The fused train step never
                # materializes logits, so run the (jitted) eval step on
                # the current batch for the plot predictions.
                from ..data.transforms import colorize
                _pl, p_preds, p_tgts = eval_step(
                    train_step.unflatten(fts), images, labels)
                in_im = np.asarray(images[0])
                if in_im.dtype == np.uint8:  # raw loader frames
                    in_im = in_im.astype(np.float32) / 255.0
                out_im = np.asarray(colorize(p_preds[0])) / 255.0
                tgt_im = np.asarray(colorize(p_tgts[0])) / 255.0
                if board is not None:
                    board.loss([float(l) for l in epoch_loss],
                               f"train loss (stage "
                               f"{'enc' if enc else 'dec'})")
                    board.image(in_im, "input image")
                    board.image(out_im,
                                f"output (epoch: {epoch}, step: {bidx})")
                    board.image(tgt_im,
                                f"target (epoch: {epoch}, step: {bidx})")
                if tb is not None:
                    step_no = (epoch - 1) * len(dl_train) + bidx
                    tb.image("train/input", in_im, step_no)
                    tb.image("train/output", out_im, step_no)
                    tb.image("train/target", tgt_im, step_no)
        if group_im:
            log(f"multi_step={K}: carrying {len(group_im)} trailing "
                f"batch(es) into the next epoch's first dispatch")
        if epoch_loss:
            avg_loss_train = float(np.mean([float(l) for l in epoch_loss]))
        else:
            avg_loss_train = 0.0
            log(f"WARNING: epoch {epoch} ran ZERO optimizer steps "
                f"({len(dl_train)} batches/epoch < multi_step={K}?)")
        iou_train_val = 0.0
        if cfg.iou_train:
            iou_train_val, _ = iou_train.get_iou()
            log(f"EPOCH IoU on TRAIN set: "
                f"{get_color_entry(iou_train_val)}{iou_train_val*100:.2f}"
                f"{colors.ENDC}%")

        # ---- validation ----
        ts = train_step.unflatten(fts)  # tree view for eval + checkpoint
        log(f"----- VALIDATING - EPOCH {epoch} -----")
        val_losses = []
        iou_val = IouEval(cfg.num_classes) if cfg.iou_val else None
        for images, labels, _rels, n_valid in dl_val:
            loss, preds, tgts = eval_step(ts, images, labels)
            val_losses.append(loss)
            if cfg.iou_val:
                iou_val.add_batch(preds[:n_valid], tgts[:n_valid])
        avg_loss_val = float(np.mean([float(l) for l in val_losses])) \
            if val_losses else 0.0
        iou_val_val = 0.0
        if cfg.iou_val:
            iou_val_val, _ = iou_val.get_iou()
            log(f"EPOCH IoU on VAL set: "
                f"{get_color_entry(iou_val_val)}{iou_val_val*100:.2f}"
                f"{colors.ENDC}%")

        # ---- bookkeeping (reference semantics) ----
        current_acc = iou_val_val if cfg.iou_val else -avg_loss_val
        is_best = current_acc > best_acc
        best_acc = max(best_acc, current_acc)
        ckpt.save_epoch(epoch=epoch, params=ts.params,
                        batch_stats=ts.batch_stats, opt_state=ts.opt_state,
                        best_acc=best_acc, is_best=is_best,
                        epochs_save=cfg.epochs_save, step=int(ts.step))
        if is_best:
            log(f"save: {ckpt.best_path} (epoch: {epoch})")
            if cfg.iou_val:
                ckpt.write_best(epoch, iou_val_val)
        with open(log_path, "a") as f:
            f.write(f"\n{epoch}\t\t{avg_loss_train:.4f}\t\t"
                    f"{avg_loss_val:.4f}\t\t{iou_train_val:.4f}\t\t"
                    f"{iou_val_val:.4f}\t\t{lr:.8f}")
        if tb is not None:
            tb.scalar("loss/train", avg_loss_train, epoch)
            tb.scalar("loss/val", avg_loss_val, epoch)
            tb.scalar("iou/val", iou_val_val, epoch)
            tb.scalar("lr", lr, epoch)
            tb.flush()
    if group_im:
        log(f"multi_step={K}: dropped {len(group_im)} batch(es) left in "
            f"the final partial group at stage end")
    return ts


def train_two_stage(cfg: TrainConfig, *, decoder_only: bool = False,
                    pretrained_encoder=None,
                    state_for_decoder: Optional[TrainState] = None):
    """Full two-stage recipe (train/main.py:main()):
      stage 1 (unless decoder_only): encoder training at 1/8 resolution;
      stage 2: full net with the stage-1 (or ImageNet-imported) encoder.
    """
    os.makedirs(cfg.savedir, exist_ok=True)
    # reproducibility breadcrumb: copy the model source into the savedir
    # (reference main.py:≈340 copies the model .py next to the checkpoints)
    import inspect
    import shutil
    src = inspect.getsourcefile(get_model(cfg.model))
    if src and os.path.isfile(src):
        shutil.copy(src, os.path.join(cfg.savedir, os.path.basename(src)))
    with open(os.path.join(cfg.savedir, "model.txt"), "w") as f:
        f.write(f"model: {cfg.model}, num_classes: {cfg.num_classes}\n"
                f"encoder specs: {erfnet.ENCODER_LAYER_SPECS}\n"
                f"decoder specs: {erfnet.DECODER_LAYER_SPECS}\n")
    with open(os.path.join(cfg.savedir, "opts.txt"), "w") as f:
        f.write(str(cfg))

    enc_state = state_for_decoder
    if not decoder_only and pretrained_encoder is None:
        enc_state = train_stage(cfg, enc=True)
    if pretrained_encoder is not None:
        encoder = pretrained_encoder
    elif enc_state is not None:
        encoder = (enc_state.params["encoder"],
                   enc_state.batch_stats["encoder"])
    else:
        encoder = None
    return train_stage(cfg, enc=False, pretrained_encoder=encoder)
