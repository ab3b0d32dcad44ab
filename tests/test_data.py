"""Data layer: directory-walk conventions, PIL resize parity, loader
batching/prefetch."""

import os

import numpy as np
import pytest
from PIL import Image

from erfnet_pytorch_tpu.data.cityscapes import CityscapesDataset
from erfnet_pytorch_tpu.data.loader import DataLoader


def test_dataset_walk_and_shapes(fake_cityscapes):
    ds = CityscapesDataset(fake_cityscapes, "train", height=64)
    assert len(ds) == 6
    img, lab, rel = ds[0]
    assert img.shape == (64, 128, 3) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert lab.shape == (64, 128) and lab.dtype == np.int32
    assert rel.endswith("_leftImg8bit.png")
    assert 255 in lab  # void preserved raw (relabel is on-device)


def test_dataset_resize_matches_pil(fake_cityscapes):
    ds = CityscapesDataset(fake_cityscapes, "val", height=64)
    img, lab, rel = ds[1]
    p = os.path.join(ds.images_root, rel)
    ref = np.asarray(Image.open(p).convert("RGB").resize(
        (128, 64), Image.BILINEAR), dtype=np.float32) / 255.0
    np.testing.assert_array_equal(img, ref)
    lp = ds.label_path(rel)
    ref_lab = np.asarray(Image.open(lp).convert("L").resize(
        (128, 64), Image.NEAREST), dtype=np.int32)
    np.testing.assert_array_equal(lab, ref_lab)


def test_dataset_missing_root_raises(fake_cityscapes):
    with pytest.raises(FileNotFoundError):
        CityscapesDataset("/nonexistent/path", "train")


def test_loader_batching(fake_cityscapes):
    ds = CityscapesDataset(fake_cityscapes, "train", height=64)
    dl = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2)
    batches = list(dl)
    assert len(batches) == 2 == len(dl)
    imgs, labs, rels, n_valid = batches[0]
    assert imgs.shape == (4, 64, 128, 3) and n_valid == 4
    imgs, labs, rels, n_valid = batches[1]
    assert imgs.shape == (2, 64, 128, 3) and n_valid == 2
    # shuffling differs between epochs
    order1 = [r for b in batches for r in b[2]]
    order2 = [r for b in dl for r in b[2]]
    assert sorted(order1) == sorted(order2)
    assert order1 != order2


def test_loader_drop_last_and_pad(fake_cityscapes):
    ds = CityscapesDataset(fake_cityscapes, "train", height=64)
    dl = DataLoader(ds, batch_size=4, drop_last=True)
    assert len(list(dl)) == 1
    dl = DataLoader(ds, batch_size=4, pad_final=True)
    batches = list(dl)
    imgs, labs, rels, n_valid = batches[-1]
    assert imgs.shape[0] == 4 and n_valid == 2


def test_cached_dataset(fake_cityscapes, tmp_path):
    from erfnet_pytorch_tpu.data.cache import CachedDataset
    import time

    ds = CityscapesDataset(fake_cityscapes, "train", height=64)
    cds = CachedDataset(ds, str(tmp_path / "cache"), tag="train64")
    img0, lab0, rel0 = cds[0]
    img1, lab1, rel1 = cds[0]  # cached read
    np.testing.assert_array_equal(img0, img1)
    np.testing.assert_array_equal(lab0, lab1)
    assert rel0 == rel1

    cds.warm()
    # a fresh wrapper over the same dir reuses the cache (present mask)
    cds2 = CachedDataset(ds, str(tmp_path / "cache"), tag="train64")
    assert cds2._present.all()
    img2, lab2, _ = cds2[3]
    ref_img, ref_lab, _ = ds[3]
    np.testing.assert_array_equal(img2, ref_img)
    np.testing.assert_array_equal(lab2, ref_lab)

    # loader interop
    batches = list(DataLoader(cds, 4, shuffle=True))
    assert batches[0][0].shape == (4, 64, 128, 3)


def test_cached_dataset_uint8_roundtrip(fake_cityscapes, tmp_path):
    """The cache must store raw uint8 frames AS uint8 (the trainer's
    default form): an f32 memmap would silently return 0-255 floats that
    to_tensor passes through unscaled (255x-bright training inputs)."""
    from erfnet_pytorch_tpu.data.cache import CachedDataset

    ds = CityscapesDataset(fake_cityscapes, "train", height=64,
                           image_dtype="uint8")
    cds = CachedDataset(ds, str(tmp_path / "cache"), tag="train64_u8")
    img0, _, _ = cds[0]          # write-through
    img1, _, _ = cds[0]          # cached read
    assert img0.dtype == np.uint8 and img1.dtype == np.uint8
    np.testing.assert_array_equal(img0, img1)
    np.testing.assert_array_equal(img0, ds[0][0])
    # a same-tag wrapper over a dtype-changed dataset must refuse
    ds_f32 = CityscapesDataset(fake_cityscapes, "train", height=64)
    with pytest.raises(AssertionError, match="dtype"):
        CachedDataset(ds_f32, str(tmp_path / "cache"), tag="train64_u8")


def test_loader_nested_iteration_safe(fake_cityscapes):
    """Concurrent iterators of ONE DataLoader must not cross-wire: each
    gets its own producer/pool/epoch (round-1 weakness: __iter__ mutated
    shared state)."""
    ds = CityscapesDataset(fake_cityscapes, "train", height=64)
    dl = DataLoader(ds, 2, shuffle=True, num_workers=2, seed=7)
    it1 = iter(dl)
    first_outer = next(it1)
    inner = [b for b in dl]          # full nested pass while it1 is live
    rest_outer = [first_outer] + [b for b in it1]
    assert len(inner) == len(dl) and len(rest_outer) == len(dl)
    # every batch is well-formed after interleaving
    for images, labels, rels, n_valid in inner + rest_outer:
        assert images.shape[0] == labels.shape[0]
        assert len(rels) == n_valid
    # distinct epochs -> distinct shuffle orders (seeded, 6 samples)
    outer_rels = [r for b in rest_outer for r in b[2]]
    inner_rels = [r for b in inner for r in b[2]]
    assert sorted(outer_rels) == sorted(inner_rels)


def test_loader_pad_to_mesh_multiple(fake_cityscapes):
    """pad_to=n pads every batch to a multiple of n with repeated images
    and VOID (255) labels — the class-weighted loss then gives the padded
    rows zero weight, so DP keeps all chips busy at exact batch math."""
    import jax.numpy as jnp
    from erfnet_pytorch_tpu.ops.loss import weighted_log_softmax_nll
    from erfnet_pytorch_tpu.training.class_weights import DECODER_WEIGHTS

    ds = CityscapesDataset(fake_cityscapes, "train", height=64)
    dl = DataLoader(ds, 6, num_workers=2, pad_to=4)
    batches = list(dl)
    images, labels, rels, n_valid = batches[0]
    assert images.shape[0] == 8 and labels.shape[0] == 8  # 6 -> ceil to 8
    assert n_valid == 6
    lab_np = np.asarray(labels)
    assert (lab_np[6:] == 255).all()
    # exact-loss property: void-padded rows contribute nothing
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(8, 64, 128, 20).astype(np.float32))
    rel6 = jnp.where(jnp.asarray(lab_np[:6]) == 255, 19, lab_np[:6])
    rel8 = jnp.where(jnp.asarray(lab_np) == 255, 19, lab_np)
    cw = jnp.asarray(np.asarray(DECODER_WEIGHTS, np.float32))
    l6 = weighted_log_softmax_nll(logits[:6], rel6, cw)
    l8 = weighted_log_softmax_nll(logits, rel8, cw)
    np.testing.assert_allclose(float(l8), float(l6), rtol=1e-6)


def test_dataset_uint8_dtype(fake_cityscapes):
    ds8 = CityscapesDataset(fake_cityscapes, "val", height=64,
                            image_dtype="uint8")
    ds = CityscapesDataset(fake_cityscapes, "val", height=64)
    img8, lab8, rel = ds8[2]
    img, lab, _ = ds[2]
    assert img8.dtype == np.uint8
    # raw frames are exactly the pre-ToTensor PIL resize: /255 == f32 path
    np.testing.assert_array_equal(img8.astype(np.float32) / 255.0, img)
    np.testing.assert_array_equal(lab8, lab)
    with pytest.raises(ValueError, match="image_dtype"):
        CityscapesDataset(fake_cityscapes, "val", image_dtype="float16")


@pytest.mark.parametrize("backend", ["native", "pil"])
def test_loader_uint8_backends_agree(fake_cityscapes, backend):
    from erfnet_pytorch_tpu import native
    if backend == "native" and not native.available():
        pytest.skip("native loader did not build")
    ds = CityscapesDataset(fake_cityscapes, "val", height=64,
                           image_dtype="uint8")
    dl = DataLoader(ds, batch_size=6, num_workers=2, backend=backend)
    images, labels, rels, n_valid = next(iter(dl))
    images = np.asarray(images)
    assert images.dtype == np.uint8 and images.shape == (6, 64, 128, 3)
    # both backends resize through uint8 rounding -> at most 1 LSB apart
    ref = np.stack([ds[i][0] for i in range(6)])
    diff = np.abs(images.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1


def test_streaming_segmenter_uint8_equals_f32(fake_cityscapes):
    """uint8 frames normalize on-device to within 1 ulp of the f32 loader
    values (XLA lowers /255 as reciprocal-multiply), so predictions (and
    colorized outputs) agree except at exact argmax ties — empirically
    bit-identical here."""
    import jax
    from erfnet_pytorch_tpu.models import erfnet
    from erfnet_pytorch_tpu.streaming import StreamingSegmenter

    params, state = erfnet.init(jax.random.PRNGKey(0), 20)
    seg = StreamingSegmenter(params, state, dtype=np.float32,
                             use_pallas=False, output="trainId")
    ds8 = CityscapesDataset(fake_cityscapes, "val", height=64,
                            image_dtype="uint8")
    ds = CityscapesDataset(fake_cityscapes, "val", height=64)
    got8 = list(seg.run(DataLoader(ds8, 3, num_workers=2)))
    got = list(seg.run(DataLoader(ds, 3, num_workers=2)))
    assert len(got8) == len(got) == 2
    for (a, ra), (b, rb) in zip(got8, got):
        assert ra == rb
        assert (np.asarray(a) == np.asarray(b)).mean() > 0.999
