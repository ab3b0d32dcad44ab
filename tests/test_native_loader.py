"""Native C++ loader: build, decode/resize parity vs PIL, batch API."""

import os

import numpy as np
import pytest
from PIL import Image

from erfnet_pytorch_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native loader did not build")


def _png(tmp_path, name, arr, mode=None):
    p = str(tmp_path / name)
    Image.fromarray(arr, mode=mode).save(p)
    return p


def test_image_decode_resize_matches_pil(tmp_path):
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (128, 256, 3), dtype=np.uint8)
    p = _png(tmp_path, "img.png", arr)

    lib = native.get_lib()
    import ctypes
    out = np.empty((64, 128, 3), np.float32)
    rc = lib.load_image_f32(p.encode(), 64, 128,
                            out.ctypes.data_as(
                                ctypes.POINTER(ctypes.c_float)))
    assert rc == 0
    ref = np.asarray(Image.open(p).convert("RGB").resize(
        (128, 64), Image.BILINEAR), dtype=np.float32) / 255.0
    # PIL uses fixed-point coeffs + per-pass uint8 rounding; allow 1.5 LSB
    assert np.abs(out - ref).max() <= 2.0 / 255.0


def test_jpeg_decode(tmp_path):
    rng = np.random.RandomState(1)
    arr = rng.randint(0, 255, (96, 96, 3), dtype=np.uint8)
    p = str(tmp_path / "img.jpg")
    Image.fromarray(arr).save(p, quality=95)
    lib = native.get_lib()
    import ctypes
    out = np.empty((96, 96, 3), np.float32)
    rc = lib.load_image_f32(p.encode(), 96, 96,
                            out.ctypes.data_as(
                                ctypes.POINTER(ctypes.c_float)))
    assert rc == 0
    ref = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
    # same-size: only decode differences (libjpeg IDCT) — small
    assert np.abs(out - ref).mean() < 0.02


def test_label_nearest_matches_pil(tmp_path):
    rng = np.random.RandomState(2)
    lab = rng.randint(0, 20, (128, 256), dtype=np.uint8)
    lab[:9] = 255
    p = _png(tmp_path, "lab.png", lab, mode="L")
    lib = native.get_lib()
    import ctypes
    out = np.empty((64, 128), np.int32)
    rc = lib.load_label_i32(p.encode(), 64, 128,
                            out.ctypes.data_as(
                                ctypes.POINTER(ctypes.c_int32)))
    assert rc == 0
    ref = np.asarray(Image.open(p).resize((128, 64), Image.NEAREST),
                     dtype=np.int32)
    np.testing.assert_array_equal(out, ref)


def test_batch_loader(tmp_path):
    rng = np.random.RandomState(3)
    img_paths, lab_paths = [], []
    for i in range(5):
        img_paths.append(_png(tmp_path, f"i{i}.png",
                              rng.randint(0, 255, (100, 200, 3),
                                          dtype=np.uint8)))
        lab_paths.append(_png(tmp_path, f"l{i}.png",
                              rng.randint(0, 20, (100, 200), dtype=np.uint8),
                              mode="L"))
    lab_paths[2] = ""  # missing label -> fill

    bl = native.NativeBatchLoader(num_threads=3)
    imgs, labs = bl.load_batch(img_paths, lab_paths, 64, 128)
    assert imgs.shape == (5, 64, 128, 3) and labs.shape == (5, 64, 128)
    assert (labs[2] == 255).all()
    assert imgs.min() >= 0 and imgs.max() <= 1
    bl.close()

    bl = native.NativeBatchLoader(2)
    with pytest.raises(IOError):
        bl.load_batch(["/nonexistent.png"], [""], 8, 8)
    bl.close()


def test_missing_file_returns_error(tmp_path):
    lib = native.get_lib()
    import ctypes
    out = np.empty((8, 8, 3), np.float32)
    rc = lib.load_image_f32(b"/nonexistent.png", 8, 8,
                            out.ctypes.data_as(
                                ctypes.POINTER(ctypes.c_float)))
    assert rc == -1


def test_dataloader_native_backend_matches_pil(tmp_path):
    """End-to-end: DataLoader(backend=native) vs PIL backend on a synthetic
    Cityscapes tree — same shapes, near-identical pixels, identical labels."""
    from erfnet_pytorch_tpu.data.cityscapes import CityscapesDataset
    from erfnet_pytorch_tpu.data.loader import DataLoader

    rng = np.random.RandomState(0)
    for city in ("aaa",):
        (tmp_path / "leftImg8bit" / "val" / city).mkdir(parents=True)
        (tmp_path / "gtFine" / "val" / city).mkdir(parents=True)
        for i in range(4):
            stem = f"{city}_{i:06d}_000019"
            Image.fromarray(rng.randint(0, 255, (128, 256, 3),
                                        dtype=np.uint8)).save(
                tmp_path / "leftImg8bit" / "val" / city /
                f"{stem}_leftImg8bit.png")
            Image.fromarray(rng.randint(0, 20, (128, 256), dtype=np.uint8),
                            mode="L").save(
                tmp_path / "gtFine" / "val" / city /
                f"{stem}_gtFine_labelTrainIds.png")

    ds = CityscapesDataset(str(tmp_path), "val", height=64)
    pil_batches = list(DataLoader(ds, 2, backend="pil"))
    nat_batches = list(DataLoader(ds, 2, backend="native"))
    assert len(pil_batches) == len(nat_batches) == 2
    for (pi, pl, pr, pn), (ni, nl, nr, nn) in zip(pil_batches, nat_batches):
        assert pr == nr and pn == nn
        assert np.abs(np.asarray(pi) - np.asarray(ni)).max() <= 2.0 / 255
        np.testing.assert_array_equal(np.asarray(pl), np.asarray(nl))


def test_u8_resize_matches_pil_within_1lsb(tmp_path):
    """The uint8 resize rounds to 8 bits BETWEEN the two passes like PIL's
    8bpc resample; float-vs-fixed-point weights leave at most 1 LSB."""
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 255, (128, 256, 3), dtype=np.uint8)
    p = _png(tmp_path, "img.png", arr)
    lib = native.get_lib()
    import ctypes
    out = np.empty((64, 128, 3), np.uint8)
    rc = lib.load_image_u8(p.encode(), 64, 128,
                           out.ctypes.data_as(
                               ctypes.POINTER(ctypes.c_uint8)))
    assert rc == 0
    ref = np.asarray(Image.open(p).convert("RGB").resize(
        (128, 64), Image.BILINEAR))
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.05  # and rarely even that


def test_u8_resize_size_fuzz_vs_pil(tmp_path):
    """Random in/out geometry sweep of the two-pass uint8 resize vs PIL —
    covers up/downscale, extreme aspect changes, and 1-px outputs (the
    tap-window edge cases in make_taps)."""
    rng = np.random.RandomState(7)
    lib = native.get_lib()
    import ctypes
    for trial in range(12):
        ih, iw = int(rng.randint(3, 90)), int(rng.randint(3, 90))
        oh, ow = int(rng.randint(1, 70)), int(rng.randint(1, 70))
        arr = rng.randint(0, 255, (ih, iw, 3), dtype=np.uint8)
        p = _png(tmp_path, f"fz{trial}.png", arr)
        out = np.empty((oh, ow, 3), np.uint8)
        rc = lib.load_image_u8(p.encode(), oh, ow,
                               out.ctypes.data_as(
                                   ctypes.POINTER(ctypes.c_uint8)))
        assert rc == 0, (ih, iw, oh, ow)
        ref = np.asarray(Image.open(p).convert("RGB").resize(
            (ow, oh), Image.BILINEAR))
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1, (ih, iw, oh, ow, diff.max())


def test_f32_path_is_exactly_u8_over_255(tmp_path):
    rng = np.random.RandomState(4)
    arr = rng.randint(0, 255, (100, 180, 3), dtype=np.uint8)
    p = _png(tmp_path, "img.png", arr)
    lib = native.get_lib()
    import ctypes
    f32 = np.empty((64, 128, 3), np.float32)
    u8 = np.empty((64, 128, 3), np.uint8)
    assert lib.load_image_f32(p.encode(), 64, 128,
                              f32.ctypes.data_as(
                                  ctypes.POINTER(ctypes.c_float))) == 0
    assert lib.load_image_u8(p.encode(), 64, 128,
                             u8.ctypes.data_as(
                                 ctypes.POINTER(ctypes.c_uint8))) == 0
    np.testing.assert_array_equal(f32, u8.astype(np.float32) / 255.0)


def test_batch_u8_loader(tmp_path):
    rng = np.random.RandomState(5)
    imgs = [rng.randint(0, 255, (80, 160, 3), dtype=np.uint8)
            for _ in range(3)]
    paths = [_png(tmp_path, f"i{k}.png", a) for k, a in enumerate(imgs)]
    ldr = native.NativeBatchLoader(num_threads=2)
    try:
        out_u8, labs = ldr.load_batch(paths, ["", "", ""], 40, 80,
                                      image_dtype="uint8")
        out_f32, _ = ldr.load_batch(paths, ["", "", ""], 40, 80)
        assert out_u8.dtype == np.uint8 and out_u8.shape == (3, 40, 80, 3)
        assert (labs == 255).all()
        np.testing.assert_array_equal(out_f32,
                                      out_u8.astype(np.float32) / 255.0)
    finally:
        ldr.close()
