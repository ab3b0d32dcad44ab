"""Native C++ PNG writer: encode round-trips vs PIL decode, the batch
API, and the PngBatchSink output stage the eval CLIs use (SURVEY.md §3.3's
device->host save boundary)."""

import os

import numpy as np
import pytest
from PIL import Image

from erfnet_pytorch_tpu import native
from erfnet_pytorch_tpu.data.transforms import CITYSCAPES_PALETTE
from erfnet_pytorch_tpu.streaming import PngBatchSink

PAL = np.asarray(CITYSCAPES_PALETTE, np.uint8)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native loader did not build")


@pytest.fixture(scope="module")
def writer():
    w = native.NativeBatchWriter(num_threads=2)
    yield w
    w.close()


def test_gray_rgb_palette_roundtrip(tmp_path, writer):
    rng = np.random.RandomState(0)
    gray = rng.randint(0, 256, (3, 40, 56), dtype=np.uint8)
    rgb = rng.randint(0, 256, (3, 40, 56, 3), dtype=np.uint8)
    idx = rng.randint(0, 20, (3, 40, 56)).astype(np.uint8)

    gp = [str(tmp_path / f"g{i}.png") for i in range(3)]
    cp = [str(tmp_path / f"c{i}.png") for i in range(3)]
    pp = [str(tmp_path / f"p{i}.png") for i in range(3)]
    writer.write_batch(gp, gray, mode=writer.MODE_GRAY)
    writer.write_batch(cp, rgb, mode=writer.MODE_RGB)
    writer.write_batch(pp, idx, mode=writer.MODE_PAL, palette=PAL)

    for i in range(3):
        np.testing.assert_array_equal(np.asarray(Image.open(gp[i])), gray[i])
        np.testing.assert_array_equal(np.asarray(Image.open(cp[i])), rgb[i])
        im = Image.open(pp[i])
        assert im.mode == "P"
        # palette-indexed decodes to exactly the colorized RGB
        np.testing.assert_array_equal(np.asarray(im.convert("RGB")),
                                      PAL[idx[i]])


def test_levels_round_trip_and_shrink(tmp_path, writer):
    # piecewise-constant map, like real segmentation output
    seg = np.zeros((1, 64, 96), np.uint8)
    seg[0, :32] = 10
    seg[0, :, :48] += 5
    sizes = {}
    for lvl in (0, 1, 6, 9):
        p = str(tmp_path / f"l{lvl}.png")
        writer.write_batch([p], seg, mode=writer.MODE_GRAY, level=lvl)
        np.testing.assert_array_equal(np.asarray(Image.open(p)), seg[0])
        sizes[lvl] = os.path.getsize(p)
    assert sizes[1] < sizes[0]  # level 0 stores raw


def test_write_batch_shape_and_error_paths(tmp_path, writer):
    with pytest.raises(ValueError, match="shape"):
        writer.write_batch(["x"], np.zeros((1, 4, 4), np.uint8),
                           mode=writer.MODE_RGB)
    with pytest.raises(ValueError, match="palette"):
        writer.write_batch(["x"], np.zeros((1, 4, 4), np.uint8),
                           mode=writer.MODE_PAL)
    with pytest.raises(IOError, match="native writer failed"):
        writer.write_batch([str(tmp_path / "no/such/dir/a.png")],
                           np.zeros((1, 4, 4), np.uint8),
                           mode=writer.MODE_GRAY)


def _fake_stream(n=5, h=32, w=48):
    rng = np.random.RandomState(1)
    pred = rng.randint(0, 20, (n, h, w)).astype(np.uint8)
    rels = [f"city{i // 2}/frame{i}.png" for i in range(n)]
    return pred, rels


def test_sink_color_native_vs_pil_identical_pixels(tmp_path):
    pred, rels = _fake_stream()
    nat = PngBatchSink(str(tmp_path / "nat"), "color", backend="native")
    pil = PngBatchSink(str(tmp_path / "pil"), "color", backend="pil")
    assert nat.native and not pil.native
    # native sink asks the device for the raw trainId map; PIL for RGB
    assert nat.device_output == "trainId"
    assert pil.device_output == "color"
    np_paths = nat.write(pred, rels)
    pl_paths = pil.write(PAL[pred], rels)
    assert [os.path.relpath(p, tmp_path / "nat") for p in np_paths] == rels
    for a, b in zip(np_paths, pl_paths):
        ia = np.asarray(Image.open(a).convert("RGB"))
        ib = np.asarray(Image.open(b).convert("RGB"))
        np.testing.assert_array_equal(ia, ib)


def test_sink_labelid_gray(tmp_path):
    ids, rels = _fake_stream(3)
    sink = PngBatchSink(str(tmp_path / "out"), "labelId")
    paths = sink.write(ids, rels)
    for i, p in enumerate(paths):
        im = Image.open(p)
        assert im.mode == "L"
        np.testing.assert_array_equal(np.asarray(im), ids[i])


def test_sink_rejects_unknown_kind(tmp_path):
    with pytest.raises(ValueError, match="kind"):
        PngBatchSink(str(tmp_path), "logits")


def test_write_batch_rejects_out_of_range_level(tmp_path, writer):
    seg = np.zeros((1, 8, 8), np.uint8)
    for bad in (-1, 10, 12):
        with pytest.raises(ValueError, match="level"):
            writer.write_batch([str(tmp_path / "x.png")], seg,
                               mode=writer.MODE_GRAY, level=bad)
    with pytest.raises(ValueError, match="png-level"):
        PngBatchSink(str(tmp_path), "labelId", level=12)


def test_zero_thread_pool_is_clamped(tmp_path):
    """--num-workers 0 is a supported DataLoader value; the native pool
    must clamp it like data.loader does — an actually-zero-worker pool
    would deadlock the first batch call forever (jobs submitted, no
    thread to run them, Latch.Wait inside a GIL-released ctypes call)."""
    sink = PngBatchSink(str(tmp_path), "labelId", backend="native",
                        num_threads=0)
    assert sink.native
    seg = np.full((2, 8, 8), 7, np.uint8)
    paths = sink.write(seg, ["a.png", "b.png"])
    for p in paths:
        np.testing.assert_array_equal(np.asarray(Image.open(p)), seg[0])
