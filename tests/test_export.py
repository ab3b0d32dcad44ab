"""AOT serving bundles (.erfx): export round-trip, bucket routing, CLI.

New TPU-native deployment surface (the reference ships raw .pth files +
eval scripts — SURVEY.md §2a rows 15/19); these tests run the portable
pure-StableHLO path on CPU.
"""

import numpy as np

import jax
import jax.numpy as jnp
import pytest

from erfnet_pytorch_tpu.models import erfnet
from erfnet_pytorch_tpu.inference import build_fast_infer
from erfnet_pytorch_tpu.export import (load_servable, predict_uint8,
                                       save_servable)


@pytest.fixture(scope="module")
def net():
    return erfnet.init(jax.random.PRNGKey(0), 20)


def test_export_round_trip_matches_live_infer(tmp_path, net):
    params, state = net
    path = str(tmp_path / "m.erfx")
    header = save_servable(path, params, state, batch_sizes=(1, 2),
                           height=64, width=128, dtype=jnp.float32,
                           use_pallas=False)
    assert [e["batch"] for e in header["entries"]] == [1, 2]
    sv = load_servable(path)
    assert sv.batch_sizes == (1, 2)
    assert sv.input_hw == (64, 128)

    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 128, 3))
    live = build_fast_infer(params, state, dtype=jnp.float32,
                            use_pallas=False, preds_only=True)
    np.testing.assert_array_equal(np.asarray(sv.call(x)),
                                  np.asarray(live(x)))


def test_uint8_spec_bundle_and_frame_coercion(tmp_path, net):
    """input_dtype='uint8' bundles take RAW frames (the exported program
    runs the ToTensor /255 itself); f32-spec bundles apply /255 to uint8
    frames in _coerce (a plain cast used to feed 0-255 floats to a [0,1]
    program).  Both routes must agree with the live pipeline."""
    params, state = net
    rng = np.random.RandomState(0)
    u8 = rng.randint(0, 256, (2, 64, 128, 3), dtype=np.uint8)
    live = build_fast_infer(params, state, dtype=jnp.float32,
                            use_pallas=False, preds_only=True)
    want = np.asarray(live(jnp.asarray(u8).astype(jnp.float32) / 255.0))

    pu8 = str(tmp_path / "u8.erfx")
    hdr = save_servable(pu8, params, state, batch_sizes=(2,), height=64,
                        width=128, dtype=jnp.float32, use_pallas=False,
                        input_dtype="uint8")
    assert hdr["input_dtype"] == "uint8"
    svu = load_servable(pu8)
    assert svu.input_dtype == "uint8"
    np.testing.assert_array_equal(np.asarray(svu.predict(u8)), want)
    # [0,1] float frames re-quantize exactly (round(u8/255*255) == u8)
    np.testing.assert_array_equal(
        np.asarray(svu.predict(u8.astype(np.float32) / 255.0)), want)

    pf = str(tmp_path / "f32.erfx")
    save_servable(pf, params, state, batch_sizes=(2,), height=64,
                  width=128, dtype=jnp.float32, use_pallas=False)
    svf = load_servable(pf)
    assert svf.input_dtype == "float32"  # and old headers default to it
    np.testing.assert_array_equal(np.asarray(svf.predict(u8)), want)


def test_predict_pads_to_bucket_and_slices_back(tmp_path, net):
    params, state = net
    path = str(tmp_path / "m.erfx")
    save_servable(path, params, state, batch_sizes=(4,), height=64,
                  width=128, dtype=jnp.float32, use_pallas=False)
    sv = load_servable(path)
    x = jax.random.uniform(jax.random.PRNGKey(2), (3, 64, 128, 3))
    out = sv.predict(x)
    assert out.shape == (3, 64, 128)
    # per-image equality with the padded full-bucket run
    full = sv.call(jnp.concatenate([x, jnp.zeros((1, 64, 128, 3))], 0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(full[:3]))
    # exact-bucket call still enforced
    with pytest.raises(ValueError):
        sv.call(x)
    with pytest.raises(ValueError):
        sv.predict(jnp.zeros((5, 64, 128, 3)))

    u8 = np.random.RandomState(0).randint(0, 256, (2, 64, 128, 3),
                                          dtype=np.uint8)
    preds = predict_uint8(sv, u8)
    assert preds.shape == (2, 64, 128)
    assert int(jnp.max(preds)) < 20


def test_logits_bundle_contract(tmp_path, net):
    params, state = net
    path = str(tmp_path / "m.erfx")
    save_servable(path, params, state, batch_sizes=(2,), height=64,
                  width=128, dtype=jnp.float32, use_pallas=False,
                  preds_only=False)
    sv = load_servable(path)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 128, 3))
    logits, preds = sv.predict(x)
    assert logits.shape == (1, 64, 128, 20)
    assert preds.shape == (1, 64, 128)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(logits, -1)),
                                  np.asarray(preds))


def test_load_rejects_bad_magic(tmp_path):
    bad = tmp_path / "bad.erfx"
    bad.write_bytes(b"NOTERFX0" + b"\x00" * 16)
    with pytest.raises(ValueError, match="not an .erfx bundle"):
        load_servable(str(bad))


def test_streaming_from_servable_matches_live(tmp_path, net,
                                              fake_cityscapes):
    """Directory streaming from a bundle == live-weights streaming."""
    from erfnet_pytorch_tpu.streaming import StreamingSegmenter
    from erfnet_pytorch_tpu.data.cityscapes import CityscapesDataset
    from erfnet_pytorch_tpu.data.loader import DataLoader

    params, state = net
    path = str(tmp_path / "m.erfx")
    save_servable(path, params, state, batch_sizes=(4,), height=64,
                  width=128, dtype=jnp.float32, use_pallas=False)

    ds = CityscapesDataset(fake_cityscapes, "val", height=64)
    live = StreamingSegmenter(params, state, dtype=jnp.float32,
                              use_pallas=False, output="color")
    served = StreamingSegmenter.from_servable(path, output="color")
    # batch 4 over 6 images: the final short batch exercises bucket padding
    got_live = list(live.run(DataLoader(ds, 4, num_workers=2)))
    got_srv = list(served.run(DataLoader(ds, 4, num_workers=2)))
    assert len(got_live) == len(got_srv) == 2
    for (a, ra), (b, rb) in zip(got_live, got_srv):
        assert ra == rb
        np.testing.assert_array_equal(a, b)

    with pytest.raises(ValueError, match="64x128"):
        served.run([(jnp.zeros((1, 32, 64, 3)), None, ["x"])]).__next__()


def test_color_cli_serves_from_erfx(tmp_path, net, fake_cityscapes):
    from erfnet_pytorch_tpu.cli import eval_cityscapes_color

    params, state = net
    bundle = str(tmp_path / "m.erfx")
    save_servable(bundle, params, state, batch_sizes=(4,), height=64,
                  width=128, dtype=jnp.float32, use_pallas=False)
    outdir = str(tmp_path / "save_color")
    eval_cityscapes_color.main([
        "--erfx", bundle, "--datadir", fake_cityscapes, "--subset", "val",
        "--height", "64", "--batch-size", "4", "--outdir", outdir])
    import glob
    pngs = glob.glob(outdir + "/**/*.png", recursive=True)
    assert len(pngs) == 6


def test_export_cli_end_to_end(tmp_path, net):
    from erfnet_pytorch_tpu.cli import export_model
    from erfnet_pytorch_tpu.training.checkpoint import save_weights

    params, state = net
    ckpt = str(tmp_path / "model_best.pth.native")
    save_weights(ckpt, params, state)
    out = str(tmp_path / "m.erfx")
    header = export_model.main([
        "--state", ckpt, "--output", out, "--batch-sizes", "1",
        "--height", "64", "--width", "128", "--f32", "--xla"])
    assert header["entries"][0]["batch"] == 1
    sv = load_servable(out)
    x = jnp.zeros((1, 64, 128, 3))
    assert sv.predict(x).shape == (1, 64, 128)


def test_export_cli_torch_format(tmp_path, net):
    """--format torch: the CLI writes the reference's state_dict layout
    from a native checkpoint (the one-command 'give my weights to the
    reference's eval scripts' path, VERDICT r4 #4)."""
    import torch

    from erfnet_pytorch_tpu.cli import export_model
    from erfnet_pytorch_tpu.training.checkpoint import save_weights
    import torch_oracle as oracle

    params, state = net
    ckpt = str(tmp_path / "model_best.pth.native")
    save_weights(ckpt, params, state)
    out = str(tmp_path / "for_reference.pth")
    export_model.main(["--state", ckpt, "--output", out,
                       "--format", "torch"])
    tmodel = oracle.Net(20)
    res = tmodel.load_state_dict(
        torch.load(out, map_location="cpu", weights_only=False),
        strict=True)
    assert not res.missing_keys and not res.unexpected_keys

    # DataParallel-style save re-imports through our own shim
    out2 = str(tmp_path / "dp.pth")
    export_model.main(["--state", ckpt, "--output", out2,
                       "--format", "torch", "--module-prefix"])
    from erfnet_pytorch_tpu.utils import torch_import
    sd = torch_import.load_torch_state_dict(out2)
    p2, _s2 = torch_import.net_from_state_dict(sd)
    np.testing.assert_array_equal(
        np.asarray(p2["decoder"]["output_conv"]["w"]),
        np.asarray(params["decoder"]["output_conv"]["w"]))
