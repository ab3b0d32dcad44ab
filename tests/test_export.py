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
