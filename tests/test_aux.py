"""Auxiliary subsystems: VOC12 dataset, profiling utilities, dashboard."""

import os

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from erfnet_pytorch_tpu.data.voc12 import VOC12Dataset
from erfnet_pytorch_tpu.utils.profiling import (StepTimer, TensorBoardWriter,
                                                enable_debug_checks,
                                                disable_debug_checks)
from erfnet_pytorch_tpu.training.visualize import Dashboard


@pytest.fixture(scope="session")
def fake_voc12(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc12")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (96, 128, 3),
                                    dtype=np.uint8)).save(
            root / "images" / f"2007_{i:06d}.jpg")
        lab = Image.fromarray(rng.randint(0, 21, (96, 128),
                                          dtype=np.uint8), mode="P")
        lab.save(root / "labels" / f"2007_{i:06d}.png")
    return str(root)


def test_voc12_walk_and_shapes(fake_voc12):
    ds = VOC12Dataset(fake_voc12, height=48)
    assert len(ds) == 3
    img, lab, rel = ds[0]
    assert img.shape == (48, 64, 3) and img.dtype == np.float32
    assert lab.shape == (48, 64) and lab.dtype == np.int32
    assert rel == "2007_000000.jpg"
    with pytest.raises(FileNotFoundError):
        VOC12Dataset("/nonexistent")


def test_voc12_with_loader(fake_voc12):
    from erfnet_pytorch_tpu.data.loader import DataLoader
    ds = VOC12Dataset(fake_voc12, height=48)
    batches = list(DataLoader(ds, 2, num_workers=2))
    assert batches[0][0].shape == (2, 48, 64, 3)


def test_step_timer():
    t = StepTimer()
    for _ in range(5):
        t.start()
        t.stop()
    assert t.count == 5
    s = t.summary()
    assert "p50" in s and "p95" in s


def test_debug_checks_toggle():
    enable_debug_checks()
    import jax
    assert jax.config.jax_debug_nans
    disable_debug_checks()
    assert not jax.config.jax_debug_nans


def test_tensorboard_writer(tmp_path):
    w = TensorBoardWriter(str(tmp_path / "tb"))
    w.scalar("loss", 1.0, 0)
    w.image("img", np.zeros((4, 4, 3), np.uint8), 0)
    w.flush()
    # events file written by whichever backend was found (torch is baked in)
    files = []
    for dirpath, _d, fs in os.walk(tmp_path / "tb"):
        files += fs
    assert files, "no tensorboard event files written"


def test_dashboard_degrades_without_visdom(capsys):
    d = Dashboard(port=1)  # visdom not installed -> no-op
    d.loss([1.0, 0.5], "loss")
    d.image(np.zeros((3, 4, 4)), "img")
    # reaching here without raising is the contract


def test_dashboard_live_protocol(monkeypatch):
    """With visdom importable, Dashboard must drive the real protocol:
    vis.line for losses, vis.image with CHW data (torch-habit layouts
    accepted) — the reference train/visualize.py contract."""
    import sys
    import types

    calls = []

    class _FakeVisdom:
        def __init__(self, port=None):
            calls.append(("init", port))

        def line(self, y, win=None, opts=None):
            calls.append(("line", np.asarray(y).shape, win))

        def image(self, img, win=None, opts=None):
            calls.append(("image", np.asarray(img).shape, win))

    fake = types.ModuleType("visdom")
    fake.Visdom = _FakeVisdom
    monkeypatch.setitem(sys.modules, "visdom", fake)

    from erfnet_pytorch_tpu.training.visualize import Dashboard as Dash
    d = Dash(port=8123)
    d.loss([1.0, 0.5, 0.25], "train loss")
    d.image(np.zeros((8, 6, 3), np.float32), "input")   # HWC in
    d.image(np.zeros((3, 8, 6), np.float32), "chw in")  # CHW passthrough
    assert ("init", 8123) in calls
    assert ("line", (3,), "train loss") in calls
    # HWC converts to CHW for visdom; CHW passes through
    assert ("image", (3, 8, 6), "input") in calls
    assert ("image", (3, 8, 6), "chw in") in calls


def test_jax_cache_layout_and_legacy_cleanup(tmp_path):
    """enable() scopes the cache under a host-fingerprint subdir and
    deletes legacy root-level entries (unreachable since the scoping),
    leaving non-cache files alone."""
    import jax
    from erfnet_pytorch_tpu.utils import jax_cache

    root = tmp_path / "jax_comp"
    root.mkdir()
    (root / "stale-entry-cache").write_bytes(b"x" * 64)
    (root / "README.txt").write_text("not a cache entry")
    old_dir = jax.config.jax_compilation_cache_dir
    try:
        jax_cache.enable(str(root))
        assert not (root / "stale-entry-cache").exists()
        assert (root / "README.txt").exists()
        sub = jax.config.jax_compilation_cache_dir
        assert os.path.dirname(sub) == str(root) and os.path.isdir(sub)
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)


def test_dashboard_wire_protocol_live_server():
    """Without the visdom package, Dashboard speaks the visdom wire
    protocol itself (JSON POSTs to /events) — verified against a local
    capture server: line payloads carry plotly scatter traces, image
    payloads carry a decodable base64 PNG data: URI with CHW->HWC handled."""
    import base64
    import io
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    posts = []

    class _Capture(BaseHTTPRequestHandler):
        def do_GET(self):  # check_connection probe
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"ok")

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            posts.append((self.path,
                          json.loads(self.rfile.read(n).decode())))
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"win_1")

        def log_message(self, *a):  # silence
            pass

    srv = HTTPServer(("127.0.0.1", 0), _Capture)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        d = Dashboard(port=port)
        assert d._ok, "wire client should have connected"
        d.loss([1.0, 0.5, 0.25], "train loss")
        d.image(np.linspace(0, 1, 4 * 6 * 3,
                            dtype=np.float32).reshape(4, 6, 3), "input")
        assert len(posts) == 2
        path, line = posts[0]
        assert path == "/events"
        assert line["win"] == "train loss" and line["eid"] == "main"
        (trace,) = line["data"]
        assert trace["type"] == "scatter" and trace["mode"] == "lines"
        assert trace["y"] == [1.0, 0.5, 0.25] and trace["x"] == [0.0, 1.0, 2.0]
        path, img = posts[1]
        assert path == "/events"
        (content,) = img["data"]
        assert content["type"] == "image"
        src = content["content"]["src"]
        assert src.startswith("data:image/png;base64,")
        png = base64.b64decode(src.split(",", 1)[1])
        arr = np.asarray(Image.open(io.BytesIO(png)))
        assert arr.shape == (4, 6, 3)  # CHW round-tripped back to HWC pixels
        assert arr.max() == 255 and arr.min() == 0
    finally:
        srv.shutdown()


def test_bench_static_provenance_audit():
    """bench.py's self-audit (BENCH_STATIC.json provenance): unknown or
    unresolvable stamped commits are STALE, perf-path changes since the
    stamp are STALE, and a clean matching state is fresh."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_for_test",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    b = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(b)

    static = b._load_static()
    for key in ("latency_batch1_device_ms_per_img",
                "streaming_1024x2048_device_ms_per_img"):
        assert key in static and "commit" in static[key], static.keys()

    assert b._stale_since("") is True
    assert b._stale_since("doesnotexist123") is True

    calls = {}

    def fake_git(*args):
        calls[args[0]] = args
        if args[0] == "rev-parse":
            return "abc123"           # commit resolves
        if args[0] == "diff":
            return calls.pop("_diff", "")
        return ""                     # clean status

    real = b._git
    b._git = fake_git
    try:
        assert b._stale_since("abc123") is False      # clean + resolvable
        calls["_diff"] = "erfnet_pytorch_tpu/ops/pallas/nb1d.py"
        assert b._stale_since("abc123") is True       # perf path changed
    finally:
        b._git = real


@pytest.fixture(scope="session")
def fake_voc12_train(tmp_path_factory):
    """VOC-style tree whose labels exercise the full void contract:
    classes 0..18 plus a 255-void border band (palette index 255)."""
    root = tmp_path_factory.mktemp("voc12_train")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.RandomState(7)
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (96, 128, 3),
                                    dtype=np.uint8)).save(
            root / "images" / f"2008_{i:06d}.jpg")
        lab = rng.randint(0, 19, (96, 128), dtype=np.uint8)
        lab[:8] = 255   # void band (VOC 'difficult' boundary convention)
        im = Image.fromarray(lab, mode="P")
        # real VOC labels are palette PNGs (pixel value == class index);
        # a P image saved WITHOUT a palette round-trips as garbage
        im.putpalette([c for v in range(256) for c in (v, v, v)])
        im.save(root / "labels" / f"2008_{i:06d}.png")
    return str(root)


def test_voc12_end_to_end_train_and_eval(fake_voc12_train):
    """VOC12 through the REAL training pipeline (VERDICT r4 #6): the
    DataLoader + make_train_step/make_eval_step consume VOC12Dataset
    exactly as they consume Cityscapes — the reference's train/main.py
    hardcodes NUM_CLASSES=20 + Relabel(255,19) regardless of which
    dataset class feeds it (train/dataset.py:VOC12 — SURVEY.md §2a
    row 3), so that is the supported semantics here too: labels 0..18
    + 255-void, void relabeled to 19 whose loss weight is zero."""
    import jax
    import jax.numpy as jnp
    from erfnet_pytorch_tpu.data.loader import DataLoader
    from erfnet_pytorch_tpu.data.voc12 import VOC12Dataset
    from erfnet_pytorch_tpu.models import erfnet
    from erfnet_pytorch_tpu.training import optim
    from erfnet_pytorch_tpu.training.class_weights import DECODER_WEIGHTS
    from erfnet_pytorch_tpu.training.steps import (create_train_state,
                                                   make_train_step,
                                                   make_eval_step)

    ds = VOC12Dataset(fake_voc12_train, height=48)
    dl = DataLoader(ds, 2, shuffle=True, num_workers=2, drop_last=True,
                    seed=0)
    tx = optim.make_adam(5e-3)
    ts = create_train_state(erfnet, jax.random.PRNGKey(0), 20, tx)
    step = make_train_step(erfnet, tx, DECODER_WEIGHTS, enc=False,
                           augment=False)
    losses = []
    for epoch in range(3):
        for images, labels, _rels, _n in dl:
            ts, loss = step(ts, jnp.asarray(images), jnp.asarray(labels),
                            jax.random.PRNGKey(epoch))
            losses.append(float(loss))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses

    ev = make_eval_step(erfnet, DECODER_WEIGHTS, enc=False)
    images, labels, _rels, n_valid = next(iter(DataLoader(ds, 2,
                                                          num_workers=1)))
    loss, preds, tgts = ev(ts, jnp.asarray(images), jnp.asarray(labels))
    assert np.isfinite(float(loss))
    # void relabel: raw 255 pixels surface as class 19 in the eval targets
    t = np.asarray(tgts)
    raw = np.asarray(labels)
    assert (raw == 255).any()           # the fixture's void band survived
    assert (t[raw == 255] == 19).all()
    assert t.max() <= 19 and np.asarray(preds).shape == t.shape

    # all-void batch: the guarded denominator keeps the loss finite
    # (torch's reference NLL yields NaN here — SURVEY.md §7 hard parts)
    void_labels = jnp.full_like(jnp.asarray(labels), 255)
    l2, _p, _t = ev(ts, jnp.asarray(images), void_labels)
    assert np.isfinite(float(l2))


def test_bench_xplane_opline_selection(tmp_path):
    """bench._xplane_opline_ms must aggregate the TPU plane's serialized
    op-stream line and IGNORE both the 'Async XLA Ops' line (overlapping
    copy-start windows summed to ~9x the true span on the r5 trace — the
    bug this pins) and host planes.  Synthetic XSpace in the exact wire
    format scripts/parse_xplane.py reads."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_for_xplane_test",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    def varint(v):
        out = b""
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out += bytes([b | 0x80])
            else:
                return out + bytes([b])

    def field(fno, wt, payload):
        key = varint(fno << 3 | wt)
        if wt == 2:
            return key + varint(len(payload)) + payload
        return key + payload

    def event(mid, dur):
        return field(1, 0, varint(mid)) + field(3, 0, varint(dur))

    def line(name, events):
        buf = field(2, 2, name.encode())
        for e in events:
            buf += field(4, 2, e)
        return buf

    def plane(name, lines):
        buf = field(2, 2, name.encode())
        for ln in lines:
            buf += field(3, 2, ln)
        return buf

    MS = 10 ** 9  # parse_xplane unit: dur/1e9 == ms
    space = (
        field(1, 2, plane("/device:TPU:0", [
            line("XLA Ops", [event(1, 5 * MS)] * 4),          # 20 ms true
            line("Async XLA Ops", [event(2, 100 * MS)] * 2),  # decoy 200 ms
        ]))
        + field(1, 2, plane("/host:CPU", [
            line("python", [event(3, 1000 * MS)]),            # host decoy
        ]))
    )
    pb = tmp_path / "t.xplane.pb"
    pb.write_bytes(space)
    assert bench._xplane_opline_ms(str(pb)) == pytest.approx(20.0)
