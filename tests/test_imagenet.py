"""ImageNet path: ImageFolder walker, transforms, the pretraining CLI smoke,
and the pretrained-encoder handoff into segmentation training."""

import os

import numpy as np
import pytest
from PIL import Image

from erfnet_pytorch_tpu.data.imagenet import (ImageFolderDataset,
                                              resize_center_crop,
                                              random_resized_crop)


@pytest.fixture(scope="session")
def fake_imagenet(tmp_path_factory):
    root = tmp_path_factory.mktemp("imagenet")
    rng = np.random.RandomState(0)
    for split, n in (("train", 4), ("val", 2)):
        for cls in ("n01", "n02", "n03"):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                h, w = rng.randint(64, 200), rng.randint(64, 200)
                Image.fromarray(rng.randint(0, 255, (h, w, 3),
                                            dtype=np.uint8)).save(
                    d / f"img_{i}.jpg")
    return str(root)


def test_imagefolder_walk(fake_imagenet):
    ds = ImageFolderDataset(fake_imagenet, "train", train=True, size=64)
    assert len(ds) == 12
    assert ds.classes == ["n01", "n02", "n03"]
    img, cls, rel = ds[0]
    assert img.shape == (64, 64, 3) and img.dtype == np.float32
    assert int(cls) == 0

    ds_val = ImageFolderDataset(fake_imagenet, "val", train=False, size=64)
    assert len(ds_val) == 6
    img, cls, rel = ds_val[5]
    assert img.shape == (64, 64, 3) and int(cls) == 2


def test_imagefolder_uint8(fake_imagenet):
    """image_dtype='uint8' (the ImageNet CLI's form): raw PIL crop whose
    /255 equals the f32 dataset's values; val crops are deterministic so
    the two forms compare exactly."""
    ds8 = ImageFolderDataset(fake_imagenet, "val", train=False, size=64,
                             image_dtype="uint8")
    ds = ImageFolderDataset(fake_imagenet, "val", train=False, size=64)
    img8, cls8, rel8 = ds8[3]
    img, cls, rel = ds[3]
    assert img8.dtype == np.uint8 and (cls8, rel8) == (cls, rel)
    np.testing.assert_array_equal(img8.astype(np.float32) / 255.0, img)
    with pytest.raises(ValueError, match="image_dtype"):
        ImageFolderDataset(fake_imagenet, "val", image_dtype="bf16")


def test_center_crop_matches_torchvision():
    tv = pytest.importorskip("torchvision", reason="torchvision not baked in")
    # only runs if torchvision exists; otherwise PIL math is covered below
    from torchvision import transforms
    import torch
    img = Image.fromarray(np.random.RandomState(0).randint(
        0, 255, (100, 150, 3), dtype=np.uint8))
    ref = transforms.CenterCrop(64)(transforms.Resize(80)(img))
    got = resize_center_crop(img, resize=80, crop=64)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_center_crop_shapes():
    img = Image.fromarray(np.zeros((100, 150, 3), dtype=np.uint8))
    out = resize_center_crop(img, 256, 224)
    assert out.size == (224, 224)
    out = random_resized_crop(img, 224)
    assert out.size == (224, 224)


def test_imagenet_cli_smoke(fake_imagenet, tmp_path, capsys):
    from erfnet_pytorch_tpu.cli import imagenet_main
    imagenet_main.main([
        fake_imagenet, "--epochs", "1", "--batch-size", "4", "-j", "2",
        "--num-classes", "3", "--print-freq", "1",
        "--savedir", str(tmp_path / "im"),
    ])
    out = capsys.readouterr().out
    assert "Prec@1" in out and "Prec@5" in out
    assert os.path.exists(tmp_path / "im" / "checkpoint.pth.tar")
    assert os.path.exists(tmp_path / "im" / "model_best.pth.tar")


def test_pretrained_encoder_handoff(fake_imagenet, tmp_path):
    """ImageNet checkpoint -> train_main --pretrainedEncoder handoff path."""
    from erfnet_pytorch_tpu.cli import imagenet_main
    imagenet_main.main([
        fake_imagenet, "--epochs", "1", "--batch-size", "4", "-j", "2",
        "--num-classes", "3", "--print-freq", "100",
        "--savedir", str(tmp_path / "im2"),
    ])
    from erfnet_pytorch_tpu.training.checkpoint import load_any_weights
    params, stats = load_any_weights(
        str(tmp_path / "im2" / "model_best.pth.tar"))
    assert "features" in params
    enc = (params["features"]["encoder"], stats["features"]["encoder"])

    # build a segmentation Net around the pretrained encoder
    import jax
    from erfnet_pytorch_tpu.models import erfnet
    p, s = erfnet.init(jax.random.PRNGKey(0), 20, encoder=enc)
    np.testing.assert_array_equal(
        np.asarray(p["encoder"]["initial_block"]["conv"]["w"]),
        np.asarray(enc[0]["initial_block"]["conv"]["w"]))
    # and it runs
    import jax.numpy as jnp
    y, _ = erfnet.apply(p, s, jnp.zeros((1, 64, 128, 3)))
    assert y.shape == (1, 64, 128, 20)


def test_topk_correct_matches_argsort():
    import jax, jax.numpy as jnp
    from erfnet_pytorch_tpu.cli.imagenet_main import _topk_correct
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(32, 50).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 50, (32,)))
    c1, c5 = _topk_correct(logits, labels)
    top = np.argsort(-np.asarray(logits), axis=-1)[:, :5]
    hit = top == np.asarray(labels)[:, None]
    assert float(c1) == hit[:, 0].sum()
    assert float(c5) == hit.any(1).sum()


def test_cross_entropy_and_topk_masked():
    """valid-masked CE / topk == computing on the unpadded subset (the
    exact-DP-padding contract; ImageNet has no void class to zero-weight,
    so the mask is the only pad-exclusion mechanism)."""
    import jax.numpy as jnp
    from erfnet_pytorch_tpu.ops.loss import cross_entropy
    from erfnet_pytorch_tpu.cli.imagenet_main import _topk_correct
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(8, 20).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 20, (8,)))
    valid = jnp.asarray([1.0] * 6 + [0.0] * 2, jnp.float32)
    np.testing.assert_allclose(
        float(cross_entropy(logits, labels, valid)),
        float(cross_entropy(logits[:6], labels[:6])), rtol=1e-6)
    c1m, c5m = _topk_correct(logits, labels, valid=valid)
    c1, c5 = _topk_correct(logits[:6], labels[:6])
    assert float(c1m) == float(c1) and float(c5m) == float(c5)


def test_run_validate_masks_final_padded_batch(fake_imagenet):
    """6 val images at batch 4 pad the final batch by 2 rows; the
    accuracy/loss must equal the batch-2 (never-padded) run — before the
    mask, pad rows were counted as errors and the meter divided by the
    padded size."""
    import jax
    from erfnet_pytorch_tpu.cli.imagenet_main import make_steps, run_validate
    from erfnet_pytorch_tpu.data.imagenet import ImageFolderDataset
    from erfnet_pytorch_tpu.data.loader import DataLoader
    from erfnet_pytorch_tpu.models import erfnet_imagenet
    from erfnet_pytorch_tpu.training import optim
    from erfnet_pytorch_tpu.training.steps import TrainState

    import jax.numpy as jnp
    tx = optim.make_sgd(0.1)
    params, stats = erfnet_imagenet.init(jax.random.PRNGKey(0), 3)
    ts = TrainState(params, stats, tx.init(params),
                    jnp.zeros((), jnp.int32))
    _, eval_step = make_steps(tx, None)
    ds = ImageFolderDataset(fake_imagenet, "val", train=False)
    res = {}
    for bs in (4, 2):
        dl = DataLoader(ds, bs, num_workers=1, pad_final=True)
        res[bs] = run_validate(eval_step, ts, dl, print_freq=100,
                               log=lambda s: None)
    assert abs(res[4] - res[2]) < 1e-6
