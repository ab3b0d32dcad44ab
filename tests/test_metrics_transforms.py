"""IoU metric vs a numpy reference implementing the torch iouEval math;
transforms vs PIL; on-device augmentation invariants."""

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from erfnet_pytorch_tpu.metrics import IouEval, iou_from_confusion
from erfnet_pytorch_tpu.metrics.iou import get_color_entry, colors
from erfnet_pytorch_tpu.data.transforms import (
    CITYSCAPES_PALETTE, TRAINID_TO_LABELID, relabel, colorize,
    train_id_to_label_id)
from erfnet_pytorch_tpu.ops.augment import co_transform, downsample_label_x8


def _numpy_iou(preds, labels, n=20, ignore=19):
    """Direct restatement of reference iouEval math: one-hot tp/fp/fn with
    ignore-gt pixels excluded everywhere."""
    x = np.eye(n)[preds.reshape(-1)]          # pred one-hot
    y = np.eye(n)[labels.reshape(-1)]         # gt one-hot
    ignores = y[:, ignore:ignore + 1]
    tp = (x * y).sum(0)
    fp = (x * (1 - y - ignores)).sum(0)
    fn = ((1 - x) * y).sum(0)
    iou = tp / (tp + fp + fn + 1e-15)
    keep = np.arange(n) != ignore
    return iou[keep].mean(), iou[keep]


def test_iou_matches_reference_math():
    rng = np.random.RandomState(0)
    ev = IouEval(20, 19)
    all_p, all_l = [], []
    for i in range(3):
        p = rng.randint(0, 19, size=(2, 16, 16))
        l = rng.randint(0, 20, size=(2, 16, 16))  # includes some void
        ev.add_batch(jnp.asarray(p), jnp.asarray(l))
        all_p.append(p)
        all_l.append(l)
    mean, per_class = ev.get_iou()
    ref_mean, ref_pc = _numpy_iou(np.concatenate(all_p),
                                  np.concatenate(all_l))
    np.testing.assert_allclose(per_class, ref_pc, rtol=1e-6, atol=1e-9)
    assert abs(mean - ref_mean) < 1e-9


def test_iou_perfect_and_reset():
    ev = IouEval(20, 19)
    l = jnp.asarray(np.random.RandomState(1).randint(0, 19, (1, 8, 8)))
    ev.add_batch(l, l)
    mean, pc = ev.get_iou()
    present = np.unique(np.asarray(l))
    # perfect prediction: every present class IoU == 1
    assert all(pc[c] > 1.0 - 1e-9 for c in present)
    ev.reset()
    assert float(jnp.sum(ev.cm)) == 0.0


def test_ignore_pixels_are_not_false_positives():
    # gt void everywhere, prediction arbitrary -> all zeros, not fp
    ev = IouEval(20, 19)
    gt = jnp.full((1, 4, 4), 19)
    pred = jnp.zeros((1, 4, 4), jnp.int32)
    ev.add_batch(pred, gt)
    mean, pc = ev.get_iou()
    assert mean == 0.0 and pc.sum() == 0.0


def test_color_entry_thresholds():
    assert get_color_entry(0.1) == colors.RED
    assert get_color_entry(0.3) == colors.YELLOW
    assert get_color_entry(0.5) == colors.BLUE
    assert get_color_entry(0.7) == colors.CYAN
    assert get_color_entry(0.9) == colors.GREEN
    assert get_color_entry("n/a") == colors.ENDC


def test_relabel_and_colorize():
    lab = jnp.asarray([[255, 3], [19, 0]])
    out = relabel(lab, 255, 19)
    np.testing.assert_array_equal(np.asarray(out), [[19, 3], [19, 0]])
    rgb = np.asarray(colorize(out))
    np.testing.assert_array_equal(rgb[0, 0], CITYSCAPES_PALETTE[19])
    np.testing.assert_array_equal(rgb[0, 1], CITYSCAPES_PALETTE[3])
    np.testing.assert_array_equal(rgb[1, 1], CITYSCAPES_PALETTE[0])


def test_trainid_to_labelid_chain():
    # the server remap: 0->7, 18->33, void 19->0
    pred = jnp.arange(20)
    out = np.asarray(train_id_to_label_id(pred))
    np.testing.assert_array_equal(out, TRAINID_TO_LABELID)
    assert out[0] == 7 and out[18] == 33 and out[19] == 0


def test_label_downsample_matches_pil_nearest():
    rng = np.random.RandomState(0)
    lab = rng.randint(0, 20, size=(64, 128)).astype(np.uint8)
    pil = np.array(Image.fromarray(lab).resize((128 // 8, 64 // 8),
                                               Image.NEAREST))
    ours = np.asarray(downsample_label_x8(jnp.asarray(lab.astype(np.int32))))
    np.testing.assert_array_equal(ours, pil.astype(np.int32))


def test_co_transform_flip_and_fill():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(4, 16, 24, 3).astype(np.float32))
    lab = jnp.asarray(rng.randint(0, 20, (4, 16, 24)).astype(np.int32))
    key = jax.random.PRNGKey(3)
    img2, lab2 = co_transform(key, img, lab, enc=False, augment=True)
    assert img2.shape == img.shape and lab2.shape == lab.shape
    # labels stay in range, 255 mapped away
    l2 = np.asarray(lab2)
    assert l2.min() >= 0 and l2.max() <= 19
    # no augment: identity (labels just relabeled)
    img3, lab3 = co_transform(key, img, lab, enc=False, augment=False)
    np.testing.assert_array_equal(np.asarray(img3), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(lab3), np.asarray(lab))


def test_co_transform_translate_fills_void():
    # constant image/labels; any nonzero shift leaves a void border on the
    # label and zero border on the image
    img = jnp.ones((8, 16, 24, 3), jnp.float32)
    lab = jnp.full((8, 16, 24), 5, jnp.int32)
    img2, lab2 = co_transform(jax.random.PRNGKey(0), img, lab, augment=True)
    l2, i2 = np.asarray(lab2), np.asarray(img2)
    border_vals = set(np.unique(l2)) - {5}
    assert border_vals.issubset({19})
    assert set(np.unique(i2.round(6))).issubset({0.0, 1.0})


def test_co_transform_enc_downsamples():
    img = jnp.zeros((2, 64, 128, 3))
    lab = jnp.zeros((2, 64, 128), jnp.int32)
    _, lab2 = co_transform(jax.random.PRNGKey(0), img, lab, enc=True,
                           augment=True)
    assert lab2.shape == (2, 8, 16)
