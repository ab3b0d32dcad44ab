"""EPOCH-scale driver parity vs a torch twin loop (SURVEY.md §2a row 9,
§3.1; VERDICT r3 weak #4).

Step-level recipe parity (tests/test_recipe_parity.py) cannot see
epoch-scale drift: a poly-schedule off-by-one, BN running-stat momentum
applied at the wrong cadence, or best-model/val bookkeeping errors.  These
tests run the ACTUAL ``train_stage`` driver for 3 epochs on the synthetic
Cityscapes fixture and replay the identical recipe in a torch-cpu twin
loop (same imported initial weights, same shuffle stream via the shared
DataLoader, augment/dropout off), then compare the driver's
``automated_log.txt`` — the reference's published per-epoch contract —
column by column: the LR column EXACTLY (string-equal), train/val losses
and val IoU within cross-framework f32 drift, and the final BN running
stats / params within the documented Adam sign-chaos bounds.

A companion test injects a poly-schedule off-by-one and asserts the same
checker REJECTS the log — proving the comparison has teeth.
"""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from erfnet_pytorch_tpu.data.cityscapes import CityscapesDataset
from erfnet_pytorch_tpu.data.loader import DataLoader
from erfnet_pytorch_tpu.metrics.iou import IouEval
from erfnet_pytorch_tpu.models import erfnet
from erfnet_pytorch_tpu.parallel.mesh import make_mesh
from erfnet_pytorch_tpu.training import optim, trainer as trainer_mod
from erfnet_pytorch_tpu.training.class_weights import DECODER_WEIGHTS
from erfnet_pytorch_tpu.training.trainer import TrainConfig, train_stage
from erfnet_pytorch_tpu.utils import torch_import

import torch_oracle as oracle

EPOCHS = 3
BATCH = 3
HEIGHT = 64


def _zero_dropout_specs(specs):
    return [(k, (a[0], 0.0, a[2])) if k == "nb1d" else (k, a)
            for k, a in specs]


def _make_cfg(datadir, savedir, num_epochs=EPOCHS):
    return TrainConfig(
        datadir=datadir, savedir=savedir, height=HEIGHT,
        num_epochs=num_epochs, batch_size=BATCH, num_workers=2,
        steps_loss=0, iou_val=True, augment=False, seed=0,
        image_dtype="float32", mesh=make_mesh(1),
        log_fn=lambda *_: None)


def _parse_log(savedir, name="automated_log.txt"):
    """automated_log rows -> [(epoch, tr_loss, va_loss, tr_iou,
    va_iou, lr_str)] — lr kept as the raw string for exact comparison."""
    with open(os.path.join(savedir, name)) as f:
        lines = f.read().splitlines()
    rows = []
    for ln in lines[1:]:
        cols = [c for c in ln.split("\t") if c]
        rows.append((int(cols[0]), float(cols[1]), float(cols[2]),
                     float(cols[3]), float(cols[4]), cols[5]))
    return rows


def _check_lr_column(rows, base_lr, num_epochs):
    """The reference LambdaLR contract: epoch e (1-based) trains at
    base * (1 - (e-1)/E)**0.9, logged at %.8f."""
    for (epoch, *_rest, lr_str) in rows:
        want = base_lr * (1.0 - (epoch - 1) / num_epochs) ** 0.9
        assert lr_str == f"{want:.8f}", (
            f"epoch {epoch}: LR column {lr_str} != poly(0.9) "
            f"schedule value {want:.8f}")


def _torch_twin(datadir, tmodel, base_lr, num_epochs, *, enc=False,
                class_weights=DECODER_WEIGHTS):
    """Replay the driver's recipe in torch: same loaders (shared shuffle
    stream), per-epoch poly LR, train-mode BN + Adam(coupled wd), eval-mode
    val loop with IoU.  enc=True: the stage-1 recipe — only_encode forward
    at 1/8 resolution, labels nearest-downsampled at 8i+4 (the reference's
    MyCoTransform enc path).  Returns per-epoch
    (train_loss, val_loss, val_iou)."""
    ds_tr = CityscapesDataset(datadir, "train", height=HEIGHT)
    ds_va = CityscapesDataset(datadir, "val", height=HEIGHT)
    dl_tr = DataLoader(ds_tr, BATCH, shuffle=True, num_workers=2,
                       drop_last=True, seed=0)
    dl_va = DataLoader(ds_va, BATCH, num_workers=2, pad_final=True)
    wt = torch.from_numpy(np.asarray(class_weights, np.float32))
    opt = torch.optim.Adam(tmodel.parameters(), lr=base_lr,
                           betas=(0.9, 0.999), eps=1e-8, weight_decay=1e-4)

    def prep(images, labels):
        # np.array copy: views of jax buffers are non-writable and torch
        # warns when wrapping them
        x = torch.from_numpy(
            np.array(np.asarray(images).transpose(0, 3, 1, 2))).float()
        y = np.asarray(labels).astype(np.int64)
        if enc:
            y = y[:, 4::8, 4::8]
        return x, np.where(y == 255, 19, y)

    rows = []
    for epoch in range(1, num_epochs + 1):
        lr = base_lr * (1.0 - (epoch - 1) / num_epochs) ** 0.9
        for g in opt.param_groups:
            g["lr"] = lr
        tmodel.train()
        tr_losses = []
        for images, labels, _rels, _n in dl_tr:
            x, y = prep(images, labels)
            out = tmodel(x, only_encode=True) if enc else tmodel(x)
            loss = F.nll_loss(F.log_softmax(out, dim=1),
                              torch.from_numpy(y), weight=wt)
            opt.zero_grad()
            loss.backward()
            opt.step()
            tr_losses.append(float(loss.detach()))
        tmodel.eval()
        va_losses, iou = [], IouEval(20)
        with torch.no_grad():
            for images, labels, _rels, n_valid in dl_va:
                x, y = prep(images, labels)
                out = tmodel(x, only_encode=True) if enc else tmodel(x)
                va_losses.append(float(F.nll_loss(
                    F.log_softmax(out, dim=1), torch.from_numpy(y),
                    weight=wt)))
                preds = out.argmax(1).numpy()
                iou.add_batch(jnp.asarray(preds[:n_valid]),
                              jnp.asarray(y[:n_valid]))
        rows.append((float(np.mean(tr_losses)), float(np.mean(va_losses)),
                     iou.get_iou()[0]))
    return rows


@pytest.mark.slow
def test_train_stage_epoch_log_matches_torch_twin(fake_cityscapes, tmp_path,
                                                  monkeypatch):
    monkeypatch.setattr(erfnet, "ENCODER_LAYER_SPECS",
                        _zero_dropout_specs(erfnet.ENCODER_LAYER_SPECS))
    monkeypatch.setattr(erfnet, "DECODER_LAYER_SPECS",
                        _zero_dropout_specs(erfnet.DECODER_LAYER_SPECS))

    torch.manual_seed(0)
    tmodel = oracle.Net(20, encoder=oracle.Encoder(20, 0.0, 0.0))
    init_path = str(tmp_path / "init.pth")
    torch.save(tmodel.state_dict(), init_path)

    savedir = str(tmp_path / "save")
    os.makedirs(savedir)
    cfg = _make_cfg(fake_cityscapes, savedir)
    cfg.init_weights = init_path
    ts = train_stage(cfg, enc=False)

    rows = _parse_log(savedir)
    assert [r[0] for r in rows] == list(range(1, EPOCHS + 1))
    # the LR column is the schedule contract — exact to the printed digit
    _check_lr_column(rows, cfg.lr, EPOCHS)

    twin = _torch_twin(fake_cityscapes, tmodel, cfg.lr, EPOCHS)
    for (epoch, tr_j, va_j, _tri, iou_j, _lr), (tr_t, va_t, iou_t) in zip(
            rows, twin):
        # cross-framework f32 drift compounds over steps; a schedule or
        # BN-momentum bug shifts these by whole percents
        assert abs(tr_j - tr_t) < 8e-3, \
            f"epoch {epoch} train loss {tr_j} vs torch {tr_t}"
        assert abs(va_j - va_t) < 8e-3, \
            f"epoch {epoch} val loss {va_j} vs torch {va_t}"
        # IoU from argmax maps: random-init logits are near-tied, so a
        # few boundary pixels flip between frameworks; epoch-scale bugs
        # (wrong stats mode, label remap) move IoU by >0.05
        assert abs(iou_j - iou_t) < 0.03, \
            f"epoch {epoch} val IoU {iou_j} vs torch {iou_t}"

    # final BN running stats track torch's momentum-0.1 accumulation
    sd = torch_import.state_dict_from_module(tmodel)
    p_ref, s_ref = torch_import.net_from_state_dict(sd)
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(s_ref))
    for path, leaf in jax.tree_util.tree_leaves_with_path(ts.batch_stats):
        ref = np.asarray(flat_ref[path])
        got = np.asarray(leaf)
        # stats inherit the params' sign-chaos drift amplified through
        # the deep decoder (measured ~14% max-rel on upsampler means
        # after 6 steps — conditioning, not semantics; step-1 stats are
        # pinned to 1e-4 in tests/test_recipe_parity.py).  The
        # DISCRIMINATIVE check: a momentum/cadence/mode bug leaves stats
        # at (or doubles them past) their init — mean 0 / var 1 — so
        # demand jax's distance to torch be a small fraction of torch's
        # distance from init.
        if "var" in str(path[-1]):
            # vars sit near their init of 1 for near-unit activations, so
            # distance-from-init is ill-conditioned; bound drift relative
            # to the value instead (a mode/momentum bug scales vars by
            # ~2x or pins them at 1 while means move — caught below)
            rel = np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-3)
            assert rel < 0.1, \
                f"BN var drift at {jax.tree_util.keystr(path)}: {rel:.2f}"
        else:
            moved = np.linalg.norm(ref)  # init mean is 0
            rel = np.linalg.norm(got - ref) / max(moved, 1e-3)
            assert rel < 0.3, \
                f"BN mean drift at {jax.tree_util.keystr(path)}: " \
                f"{rel:.2f} of the stat's total movement from init"
    # params within the documented Adam sign-chaos envelope (lr per step,
    # 6 steps) — the MEAN catches any systematic recipe difference
    flat_p = dict(jax.tree_util.tree_leaves_with_path(p_ref))
    n_steps = EPOCHS * 2
    for path, leaf in jax.tree_util.tree_leaves_with_path(ts.params):
        ref = np.asarray(flat_p[path])
        diff = np.abs(np.asarray(leaf) - ref)
        assert diff.max() < 2 * n_steps * cfg.lr, \
            f"param divergence at {jax.tree_util.keystr(path)}"
        assert diff.mean() < 1.5e-3, \
            f"param drift at {jax.tree_util.keystr(path)}: " \
            f"{diff.mean():.2e}"


@pytest.mark.slow
def test_encoder_stage_epoch_log_matches_torch_twin(fake_cityscapes,
                                                    tmp_path, monkeypatch):
    """Stage-1 (encoder-only, 1/8-resolution labels, the ENCODER weight
    table) at driver granularity vs the torch twin — the decoder-stage
    test above cannot see a stage-1-only bug (wrong label downsample
    phase, wrong weight table, enc log filename)."""
    from erfnet_pytorch_tpu.training.class_weights import ENCODER_WEIGHTS

    monkeypatch.setattr(erfnet, "ENCODER_LAYER_SPECS",
                        _zero_dropout_specs(erfnet.ENCODER_LAYER_SPECS))
    monkeypatch.setattr(erfnet, "DECODER_LAYER_SPECS",
                        _zero_dropout_specs(erfnet.DECODER_LAYER_SPECS))

    torch.manual_seed(1)
    tmodel = oracle.Net(20, encoder=oracle.Encoder(20, 0.0, 0.0))
    init_path = str(tmp_path / "init.pth")
    torch.save(tmodel.state_dict(), init_path)

    savedir = str(tmp_path / "save_enc")
    os.makedirs(savedir)
    cfg = _make_cfg(fake_cityscapes, savedir)
    cfg.init_weights = init_path
    ts = train_stage(cfg, enc=True)

    log_path = os.path.join(savedir, "automated_log_encoder.txt")
    assert os.path.exists(log_path)
    rows = _parse_log(savedir, name="automated_log_encoder.txt")
    _check_lr_column(rows, cfg.lr, EPOCHS)

    twin = _torch_twin(fake_cityscapes, tmodel, cfg.lr, EPOCHS, enc=True,
                       class_weights=ENCODER_WEIGHTS)
    for (epoch, tr_j, va_j, _tri, iou_j, _lr), (tr_t, va_t, iou_t) in zip(
            rows, twin):
        # train loss is evaluated mid-flight at per-step param states; at
        # 1/8 resolution each image contributes only ~128 weighted pixels
        # (64x less averaging than the decoder stage), so Adam's
        # sign-chaos on noise-gradient elements shows as ±0.02
        # non-monotone wobble (measured; batch ORDER verified identical).
        # Val loss — the reference's published per-epoch metric — is
        # evaluated at the settled epoch-end state and must stay tight.
        assert abs(tr_j - tr_t) < 5e-2, \
            f"epoch {epoch} enc train loss {tr_j} vs torch {tr_t}"
        assert abs(va_j - va_t) < 8e-3, \
            f"epoch {epoch} enc val loss {va_j} vs torch {va_t}"
        assert abs(iou_j - iou_t) < 0.03, \
            f"epoch {epoch} enc val IoU {iou_j} vs torch {iou_t}"

    # ENCODER params only: stage-1 never uses the decoder, and torch's
    # Adam skips its grad-None params while optax sees zero grads +
    # coupled wd (a deviation train_two_stage discards — stage 2 builds
    # a FRESH decoder around the trained encoder)
    sd = torch_import.state_dict_from_module(tmodel)
    p_ref, _s_ref = torch_import.net_from_state_dict(sd)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(p_ref["encoder"]))
    n_steps = EPOCHS * 2
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            ts.params["encoder"]):
        ref = np.asarray(flat_p[path])
        diff = np.abs(np.asarray(leaf) - ref)
        assert diff.max() < 2 * n_steps * cfg.lr, \
            f"enc param divergence at {jax.tree_util.keystr(path)}"
        assert diff.mean() < 1.5e-3, \
            f"enc param drift at {jax.tree_util.keystr(path)}: " \
            f"{diff.mean():.2e}"


@pytest.mark.slow
def test_lr_checker_catches_poly_off_by_one(fake_cityscapes, tmp_path,
                                            monkeypatch):
    """Inject the classic off-by-one (decay indexed by the CURRENT epoch
    instead of epochs completed) into the driver's schedule and prove the
    log checker rejects it — the epoch-scale test has teeth."""
    real = optim.poly_lr
    monkeypatch.setattr(trainer_mod.optim, "poly_lr",
                        lambda base, e, E, power=0.9: real(base, e + 1, E,
                                                           power))
    savedir = str(tmp_path / "save_ob1")
    os.makedirs(savedir)
    cfg = _make_cfg(fake_cityscapes, savedir, num_epochs=2)
    cfg.iou_val = False  # schedule check only — keep the run minimal
    train_stage(cfg, enc=False)
    rows = _parse_log(savedir)
    with pytest.raises(AssertionError, match="LR column"):
        _check_lr_column(rows, cfg.lr, 2)
