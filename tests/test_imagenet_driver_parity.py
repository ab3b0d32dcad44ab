"""ImageNet-driver epoch-scale parity vs a torch twin (SURVEY.md §2a row
18, §3.5; VERDICT r4 weak #3 / next-round #3).

Covers what the 1-epoch CLI smoke cannot: (a) torch.optim.SGD step
semantics — momentum buffer + COUPLED weight decay (wd enters the buffer,
not the update) — pinned by an exact unit test with an injected
wd-after-momentum bug the checker must reject; (b) the ÷10-every-30 step
LR schedule values; (c) 3 driver epochs of cli/imagenet_main.py vs a
torch twin replaying the identical recipe over the same shuffle stream:
per-epoch train loss / top-1 / top-5, validate()'s Prec@1, best_prec1
selection, and the reference's log line format."""

import os
import re

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp
import optax

from erfnet_pytorch_tpu.data.imagenet import (ImageFolderDataset,
                                              IMAGENET_MEAN, IMAGENET_STD)
from erfnet_pytorch_tpu.data.loader import DataLoader
from erfnet_pytorch_tpu.models import erfnet_imagenet
from erfnet_pytorch_tpu.training import optim
from erfnet_pytorch_tpu.utils import torch_import

import torch_oracle as oracle

from test_imagenet import fake_imagenet  # session fixture reuse  # noqa: F401


# ---------------------------------------------------------------------------
# SGD step parity (unit): optax chain == torch.optim.SGD
# ---------------------------------------------------------------------------

def _torch_sgd_steps(arrs, grads_per_step, lrs, momentum, wd):
    ps = [torch.nn.Parameter(torch.from_numpy(a.copy())) for a in arrs]
    opt = torch.optim.SGD(ps, lr=lrs[0], momentum=momentum, weight_decay=wd)
    for lr, gs in zip(lrs, grads_per_step):
        for g in opt.param_groups:
            g["lr"] = lr
        for p, gr in zip(ps, gs):
            p.grad = torch.from_numpy(gr.copy())
        opt.step()
    return [p.detach().numpy() for p in ps]


def _optax_sgd_steps(tx, arrs, grads_per_step, lrs):
    params = {f"p{i}": jnp.asarray(a) for i, a in enumerate(arrs)}
    state = tx.init(params)
    for lr, gs in zip(lrs, grads_per_step):
        state = optim.set_learning_rate(state, lr)
        grads = {f"p{i}": jnp.asarray(g) for i, g in enumerate(gs)}
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    return [np.asarray(params[f"p{i}"]) for i in range(len(arrs))]


def _sgd_fixture(seed=0, steps=6):
    rng = np.random.RandomState(seed)
    arrs = [rng.randn(4, 3).astype(np.float32),
            rng.randn(7).astype(np.float32)]
    grads = [[rng.randn(*a.shape).astype(np.float32) for a in arrs]
             for _ in range(steps)]
    # LR change mid-run exercises the injected-hyperparam path the driver
    # uses for adjust_learning_rate
    lrs = [0.1, 0.1, 0.1, 0.01, 0.01, 0.01][:steps]
    return arrs, grads, lrs


def test_sgd_step_matches_torch_exactly():
    arrs, grads, lrs = _sgd_fixture()
    ref = _torch_sgd_steps(arrs, grads, lrs, momentum=0.9, wd=1e-4)
    got = _optax_sgd_steps(optim.make_sgd(0.1, 0.9, 1e-4), arrs, grads, lrs)
    for r, g in zip(ref, got):
        # 5e-7: f32 op-order rounding only (measured 2.4e-7); the
        # injected wd-placement bug below measures 7.9e-5 — 300x above
        np.testing.assert_allclose(g, r, rtol=0, atol=5e-7)


def test_sgd_checker_rejects_wd_after_momentum():
    """The classic mistake — decay added AFTER the momentum buffer
    (decoupled placement) — must fail the same comparison: proves the
    parity test pins the COUPLED torch semantics, not just 'some SGD'."""
    def buggy(learning_rate):
        return optax.chain(
            optax.trace(decay=0.9, nesterov=False),
            optax.add_decayed_weights(1e-4),   # wrong side of the buffer
            optax.scale_by_learning_rate(learning_rate),
        )
    tx = optax.inject_hyperparams(buggy)(learning_rate=0.1)
    arrs, grads, lrs = _sgd_fixture()
    ref = _torch_sgd_steps(arrs, grads, lrs, momentum=0.9, wd=1e-4)
    got = _optax_sgd_steps(tx, arrs, grads, lrs)
    assert max(np.abs(g - r).max() for r, g in zip(ref, got)) > 1e-5


def test_step_lr_schedule_values():
    """adjust_learning_rate: lr = base * 0.1 ** (epoch // 30)."""
    for epoch in range(0, 91):
        want = 0.1 * (0.1 ** (epoch // 30))
        assert optim.step_lr(0.1, epoch) == pytest.approx(want, rel=1e-12)
    assert optim.step_lr(0.05, 29) == pytest.approx(0.05)
    assert optim.step_lr(0.05, 30) == pytest.approx(0.005)


# ---------------------------------------------------------------------------
# epoch-scale driver parity
# ---------------------------------------------------------------------------

EPOCHS = 3
# 8 divides the 8-virtual-device test mesh exactly: the CLI pads any
# non-multiple batch up to the mesh size (masked-exact math, but the
# padded shapes reorder reductions and the op-order drift vs the
# unpadded torch twin measured ~1% of the loss within one epoch) — a
# padding-free batch keeps the comparison tight; the padded path has its
# own exactness tests (test_spmd_fused / run_validate mask test)
BATCH = 8
CLASSES = 3


def _zero_dropout(specs):
    return [(k, (a[0], 0.0, a[2])) if k == "nb1d" else (k, a) for k, a in specs]


def _twin_loop(root, tmodel, base_lr, epochs):
    """Replay cli/imagenet_main._run in torch over the SAME loaders
    (augment off, shared shuffle stream): per-epoch
    (train_loss, train_top1, train_top5, val_prec1)."""
    ds_tr = ImageFolderDataset(root, "train", train=False,
                               image_dtype="uint8")
    ds_va = ImageFolderDataset(root, "val", train=False,
                               image_dtype="uint8")
    dl_tr = DataLoader(ds_tr, BATCH, shuffle=True, num_workers=2,
                       drop_last=True, seed=0)
    dl_va = DataLoader(ds_va, BATCH, num_workers=2, pad_final=True)
    opt = torch.optim.SGD(tmodel.parameters(), lr=base_lr, momentum=0.9,
                          weight_decay=1e-4)
    mean = torch.tensor(np.asarray(IMAGENET_MEAN, np.float32)).view(1, 3, 1, 1)
    std = torch.tensor(np.asarray(IMAGENET_STD, np.float32)).view(1, 3, 1, 1)

    def prep(images):
        x = torch.from_numpy(
            np.array(np.asarray(images).transpose(0, 3, 1, 2)))
        return (x.float() / 255.0 - mean) / std

    def topk(out, y, k=5):
        # CLASSES < 5: ranks are always < 5, so top-5 is 100% on both
        # sides — clamping k keeps torch's topk legal and equivalent
        top = out.topk(min(k, out.shape[1]), dim=1).indices
        hit = top == y[:, None]
        return int(hit[:, 0].sum()), int(hit.any(1).sum())

    rows = []
    for epoch in range(epochs):
        lr = optim.step_lr(base_lr, epoch)
        for g in opt.param_groups:
            g["lr"] = lr
        tmodel.train()
        losses, c1s, c5s, n = [], 0, 0, 0
        for images, labels, _rels, n_valid in dl_tr:
            x = prep(images)
            y = torch.from_numpy(np.asarray(labels).astype(np.int64))
            out = tmodel(x)
            loss = F.cross_entropy(out, y)
            opt.zero_grad()
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
            c1, c5 = topk(out.detach(), y)
            c1s, c5s, n = c1s + c1, c5s + c5, n + int(n_valid)
        tmodel.eval()
        vc1, vn = 0, 0
        with torch.no_grad():
            for images, labels, _rels, n_valid in dl_va:
                out = tmodel(prep(images))[:n_valid]
                y = torch.from_numpy(
                    np.asarray(labels[:n_valid]).astype(np.int64))
                vc1 += topk(out, y)[0]
                vn += int(n_valid)
        rows.append((float(np.mean(losses)), 100.0 * c1s / n,
                     100.0 * c5s / n, 100.0 * vc1 / vn))
    return rows


@pytest.mark.slow
def test_imagenet_driver_matches_torch_twin(fake_imagenet, tmp_path,  # noqa: F811
                                            monkeypatch, capsys):
    from erfnet_pytorch_tpu.cli import imagenet_main
    from erfnet_pytorch_tpu.training.checkpoint import (save_checkpoint_file,
                                                        load_checkpoint_file)

    # dropout off on both sides (driver-parity convention: randomness that
    # has no cross-framework pairing is removed, everything else is real)
    monkeypatch.setattr(
        erfnet_imagenet, "IMAGENET_ENCODER_LAYER_SPECS",
        _zero_dropout(erfnet_imagenet.IMAGENET_ENCODER_LAYER_SPECS))
    torch.manual_seed(0)
    tmodel = oracle.ERFNetImageNet(CLASSES)
    for m in tmodel.modules():
        if isinstance(m, torch.nn.Dropout2d):
            m.p = 0.0

    # same initial weights via the importer; injected through --resume
    sd = torch_import.state_dict_from_module(tmodel)
    params, stats = torch_import.imagenet_from_state_dict(sd)
    # lr 0.01 (not the recipe's 0.1): at lr 0.1 the deep-net f32
    # op-order drift compounds to ~0.4% of the loss within one epoch
    # (measured) — SGD SEMANTICS are pinned exactly by the unit test
    # above; this test pins the recipe WIRING, which 0.01 sees equally
    lr0 = 0.01
    tx = optim.make_sgd(lr0, 0.9, 1e-4)
    init_ckpt = str(tmp_path / "init.ckpt")
    save_checkpoint_file(init_ckpt, epoch=0, arch="erfnet_imagenet",
                         params=params, batch_stats=stats,
                         opt_state=tx.init(params), best_acc=0.0)

    # augmentation off: train-split crops become the deterministic
    # val-style resize+center-crop on BOTH sides
    real_ds = imagenet_main.ImageFolderDataset

    def no_aug_ds(root, split, *, train=False, **kw):
        return real_ds(root, split, train=False, **kw)

    monkeypatch.setattr(imagenet_main, "ImageFolderDataset", no_aug_ds)

    savedir = str(tmp_path / "im_parity")
    imagenet_main.main([
        fake_imagenet, "--epochs", str(EPOCHS), "--batch-size", str(BATCH),
        "-j", "2", "--num-classes", str(CLASSES), "--print-freq", "1",
        "--lr", str(lr0), "--resume", init_ckpt, "--savedir", savedir,
    ])
    out = capsys.readouterr().out

    # reference log-format contract (imagenet/main.py print strings);
    # 12 train images at batch 8 drop_last -> 1 step/epoch
    assert re.search(r"Epoch: \[0\]\[0/1\]\tTime [0-9.]+\tLoss [0-9.]+ "
                     r"\([0-9.]+\)\tPrec@1 [0-9.]+ \([0-9.]+\)\t"
                     r"Prec@5 [0-9.]+ \([0-9.]+\)\tLR 0\.01\b", out), out
    assert re.search(r"Test: \[0/1\]\tLoss ", out)
    star = re.findall(r" \* Prec@1 ([0-9.]+) Prec@5 [0-9.]+", out)
    assert len(star) == EPOCHS

    # per-epoch train rows from the last-step running averages
    ep_rows = []
    for e in range(EPOCHS):
        m = re.search(
            rf"Epoch: \[{e}\]\[0/1\]\tTime [0-9.]+\tLoss [0-9.]+ "
            rf"\(([0-9.]+)\)\tPrec@1 [0-9.]+ \(([0-9.]+)\)\t"
            rf"Prec@5 [0-9.]+ \(([0-9.]+)\)", out)
        assert m, f"missing epoch-{e} final step line"
        ep_rows.append(tuple(float(v) for v in m.groups()))

    twin = _twin_loop(fake_imagenet, tmodel, lr0, EPOCHS)

    one_train = 100.0 / BATCH + 1e-6  # one image flip per train epoch
    one_val = 100.0 / 6 + 1e-6        # one image flip, 6 val images
    # epoch 0 is the PRE-update forward on identical weights and data —
    # it must match to log precision (measured 1e-5); any data-order /
    # normalize / BN-mode difference shows here first
    assert abs(ep_rows[0][0] - twin[0][0]) < 1e-3, \
        f"epoch-0 loss {ep_rows[0][0]} vs torch {twin[0][0]}"
    for e, ((l_j, p1_j, p5_j), (l_t, p1_t, p5_t, v1_t), v1_j) in enumerate(
            zip(ep_rows, twin, (float(s) for s in star))):
        # later epochs run on post-update params: train-mode BN on a
        # random-init net amplifies f32 op-order noise chaotically
        # (measured 7e-3 at epoch 1); a recipe bug moves this by tenths
        assert abs(l_j - l_t) < max(2e-2, 2e-3 * l_t), \
            f"epoch {e} train loss {l_j} vs torch {l_t}"
        assert abs(p1_j - p1_t) <= one_train, f"epoch {e} top1 {p1_j} vs {p1_t}"
        assert abs(p5_j - p5_t) <= one_train, f"epoch {e} top5 {p5_j} vs {p5_t}"
        assert abs(v1_j - v1_t) <= one_val, \
            f"epoch {e} val Prec@1 {v1_j} vs torch {v1_t}"

    # best_prec1 bookkeeping: checkpoint carries the running max
    payload = load_checkpoint_file(os.path.join(savedir,
                                                "checkpoint.pth.tar"))
    assert payload["epoch"] == EPOCHS
    best_twin = max(r[3] for r in twin)
    assert abs(float(payload["best_acc"]) - best_twin) <= one_val
    assert os.path.exists(os.path.join(savedir, "model_best.pth.tar"))

    # end-state params: DIRECTIONS decorrelate chaotically (train-mode BN
    # on a random-init net amplifies f32 rounding exponentially — epoch-0
    # losses match to 1e-5, epoch-1 already differs 7e-3, and after 3
    # steps per-leaf drift is ~0.8x the movement, measured), so the
    # discriminative end-state check is MOVEMENT MAGNITUDE per leaf: an
    # LR-scale or schedule bug changes it multiplicatively; chaos
    # scrambles direction but preserves scale.
    sd_end = torch_import.state_dict_from_module(tmodel)
    p_ref, _ = torch_import.imagenet_from_state_dict(sd_end)
    ts_params = payload["params"]
    flat_ref = {jax.tree_util.keystr(p): v for p, v in
                jax.tree_util.tree_leaves_with_path(p_ref)}
    flat_init = {jax.tree_util.keystr(p): v for p, v in
                 jax.tree_util.tree_leaves_with_path(params)}

    def pre_bn_bias(key):
        # pre-BN conv biases have mathematically ZERO gradient (BN
        # subtracts the mean) — their movement is pure noise+wd on both
        # sides (CLAUDE.md; excluded in test_spmd_fused too)
        return key.endswith("['b']") and any(
            t in key for t in ("['conv']", "['conv1x3_1']",
                               "['conv1x3_2']"))

    offenders = []
    for p, leaf in jax.tree_util.tree_leaves_with_path(ts_params):
        key = jax.tree_util.keystr(p)
        if pre_bn_bias(key):
            continue
        init = np.asarray(flat_init[key])
        moved_t = np.linalg.norm(np.asarray(flat_ref[key]) - init)
        moved_j = np.linalg.norm(np.asarray(leaf) - init)
        if moved_t < 1e-6:
            continue
        ratio = float(moved_j / moved_t)
        if not (0.5 < ratio < 2.0):
            offenders.append((key, ratio, float(moved_t)))
    assert not offenders, offenders
