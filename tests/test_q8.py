"""w8a8 int8 inference path: quantizer units, kernel parity vs the f32
BN-folded reference math, calibration, and end-to-end routing.

Interpret-mode only (CPU); compiled-mode Mosaic lowering is spot-checked
on the chip separately (CLAUDE.md round-2 notes: interpret tests do NOT
validate lowering)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from erfnet_pytorch_tpu.ops.pallas.nb1d_q8 import (
    quantize_tap_stack, prepare_nb1d_q8, nb1d_infer_q8,
    nb1d_infer_packed_q8, nb1d_stack_infer_q8, stack_nb1d_q8)
from erfnet_pytorch_tpu.quantize import (_block_acts, calibrate_q8_scales,
                                         save_q8_scales, load_q8_scales)


def _rand_fused(key, C, scale=0.15):
    ks = jax.random.split(key, 8)
    mk = lambda k: jax.random.normal(k, (3, C, C), jnp.float32) * scale
    bk = lambda k: jax.random.normal(k, (C,), jnp.float32) * 0.05
    return {"w1": mk(ks[0]), "b1": bk(ks[1]),
            "w2": mk(ks[2]), "b2": bk(ks[3]),
            "w3": mk(ks[4]), "b3": bk(ks[5]),
            "w4": mk(ks[6]), "b4": bk(ks[7])}


def _acts_from_ref(x, fused, dilated):
    """Calibration absmaxes computed from the same batch (oracle-style)."""
    a1, a2, a3, _ = jax.vmap(lambda xi: _block_acts(xi, fused, dilated))(x)
    f = lambda a: float(jnp.max(jnp.abs(a)))
    return {"in": f(x), "a1": f(a1), "a2": f(a2), "a3": f(a3)}


def _ref_out(x, fused, dilated):
    return jax.vmap(lambda xi: _block_acts(xi, fused, dilated)[3])(x)


def test_quantize_tap_stack_roundtrip_and_zero_columns():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (3, 16, 16), jnp.float32)
    w = w.at[:, :, 3].set(0.0)  # structurally zero column
    q, s = quantize_tap_stack(w)
    assert q.dtype == jnp.int8 and s.shape == (16,)
    assert float(s[3]) == 1.0 and int(jnp.abs(q[:, :, 3]).max()) == 0
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(w))
    assert err.max() <= float(s.max()) / 2 + 1e-6
    # per-column absmax maps to +/-127 exactly
    assert int(jnp.abs(q).max()) == 127


@pytest.mark.parametrize("dilated", [1, 2, 8])
def test_nb1d_q8_matches_f32_reference(dilated):
    key = jax.random.PRNGKey(dilated)
    C, H, W, B = 128, 16, 32, 2
    fused = _rand_fused(key, C)
    x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(9), (B, H, W, C),
                                      jnp.float32))
    acts = _acts_from_ref(x, fused, dilated)
    q = prepare_nb1d_q8(fused, acts)
    out = nb1d_infer_q8(x, q, dilated=dilated, interpret=True)
    ref = _ref_out(x, fused, dilated)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel
    # worst single elements accumulate a few quant steps over 4 convs;
    # bound them relative to the output's own scale
    amax = float(jnp.max(jnp.abs(ref)))
    p99 = float(jnp.quantile(jnp.abs(out - ref), 0.99))
    assert p99 < 0.03 * amax, (p99, amax)


def test_nb1d_q8_packed_matches_f32_reference():
    from erfnet_pytorch_tpu.ops.packed import pack_nb1d_for_pallas
    key = jax.random.PRNGKey(3)
    C, H, W, B, p, dilated = 64, 8, 32, 2, 2, 2
    fused = _rand_fused(key, C)
    x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(4), (B, H, W, C),
                                      jnp.float32))
    acts = _acts_from_ref(x, fused, dilated)
    wf32, s2, s4 = pack_nb1d_for_pallas(fused, p, dilated,
                                        dtype=jnp.float32)
    q = prepare_nb1d_q8(wf32, acts)
    out = nb1d_infer_packed_q8(x, q, p=p, dilated=dilated, s2=s2, s4=s4,
                               interpret=True)
    ref = _ref_out(x, fused, dilated)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel


def test_nb1d_q8_stack_matches_blockwise():
    key = jax.random.PRNGKey(7)
    C, H, W, B = 128, 16, 32, 2
    dils = (1, 2)
    fused = [_rand_fused(k, C) for k in jax.random.split(key, 2)]
    x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(8), (B, H, W, C),
                                      jnp.float32))
    # calibrate each block on its true input
    acts0 = _acts_from_ref(x, fused[0], dils[0])
    y0 = _ref_out(x, fused[0], dils[0])
    acts1 = _acts_from_ref(y0, fused[1], dils[1])
    qs = [prepare_nb1d_q8(fused[0], acts0),
          prepare_nb1d_q8(fused[1], acts1)]
    stacked, inv_ins = stack_nb1d_q8(qs)
    out = nb1d_stack_infer_q8(x, stacked, dils=dils, inv_ins=inv_ins,
                              interpret=True)
    # blockwise q8 kernels (same quantization, residual from the real map)
    seq = nb1d_infer_q8(x, qs[0], dilated=dils[0], interpret=True)
    seq = nb1d_infer_q8(seq, qs[1], dilated=dils[1], interpret=True)
    assert float(jnp.max(jnp.abs(out - seq))) < 1e-4
    ref = _ref_out(y0, fused[1], dils[1])
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.05, rel  # two chained blocks: ~sqrt(2)x one block's noise


def _tiny_model(key, n_classes=20):
    from erfnet_pytorch_tpu.models import erfnet
    return erfnet.init(key, n_classes)


def test_calibrate_uint8_batches_match_f32():
    """Calibration over raw uint8 loader frames (the CLIs' default form)
    normalizes them itself and produces the same scales as the /255 f32
    batches."""
    params, state = _tiny_model(jax.random.PRNGKey(0))
    u8 = np.random.RandomState(0).randint(0, 256, (1, 64, 128, 3),
                                          dtype=np.uint8)
    s8 = calibrate_q8_scales(params, state, [jnp.asarray(u8)])
    sf = calibrate_q8_scales(params, state,
                             [jnp.asarray(u8).astype(jnp.float32) / 255.0])
    assert s8.keys() == sf.keys()
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), rtol=1e-5),
        s8, sf)


def test_calibrate_and_fast_infer_q8_end_to_end(tmp_path):
    from erfnet_pytorch_tpu.inference import build_fast_infer
    params, state = _tiny_model(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 128, 3),
                           jnp.float32)
    scales = calibrate_q8_scales(params, state, [x])
    # every NB1d block in the model got calibrated
    from erfnet_pytorch_tpu.models.erfnet import (ENCODER_LAYER_SPECS,
                                                  DECODER_LAYER_SPECS)
    n_nb1d = sum(1 for k, _ in ENCODER_LAYER_SPECS if k == "nb1d") \
        + sum(1 for k, _ in DECODER_LAYER_SPECS if k == "nb1d")
    assert len(scales) == n_nb1d
    assert all(v["in"] > 0 for v in scales.values())

    p = tmp_path / "scales.json"
    save_q8_scales(str(p), scales)
    loaded = load_q8_scales(str(p))
    assert loaded == {k: {kk: float(vv) for kk, vv in v.items()}
                      for k, v in scales.items()}
    json.loads(p.read_text())  # valid JSON artifact

    infer_f = build_fast_infer(params, state, dtype=jnp.float32,
                               use_pallas=True, interpret=True)
    infer_q = build_fast_infer(params, state, dtype=jnp.float32,
                               use_pallas=True, interpret=True,
                               q8_scales=scales)
    lf, _ = infer_f(x)
    lq, _ = infer_q(x)
    rel = float(jnp.linalg.norm(lq - lf) / jnp.linalg.norm(lf))
    assert rel < 0.06, rel


def test_q8_routing_engaged(monkeypatch):
    """With scales present, eligible blocks must actually take the q8
    kernels (a silent bf16 fallback would pass the numerics test)."""
    import erfnet_pytorch_tpu.ops.pallas.nb1d_q8 as q8mod
    from erfnet_pytorch_tpu.inference import (build_fast_infer, _prepare,
                                              _find_stacks)
    from erfnet_pytorch_tpu.models.erfnet import (ENCODER_LAYER_SPECS,
                                                  DECODER_LAYER_SPECS)
    params, state = _tiny_model(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 128, 3),
                           jnp.float32)
    scales = calibrate_q8_scales(params, state, [x])

    # every prepared NB1d block gets a q8 payload; the stack goes q8
    for tag, specs, layers in (("encoder", ENCODER_LAYER_SPECS, "encoder"),
                               ("decoder", DECODER_LAYER_SPECS, "decoder")):
        prep, prep_q8 = _prepare(params[layers]["layers"],
                                 state[layers]["layers"], specs,
                                 jnp.float32, tag=tag, q8_scales=scales)
        assert set(prep_q8) == set(prep) and prep
    stacks = _find_stacks(ENCODER_LAYER_SPECS, params["encoder"]["layers"],
                          state["encoder"]["layers"], jnp.float32,
                          tag="encoder", q8_scales=scales)
    # the plain C=128 dilated run carries a q8 stack payload
    assert any(p == 1 and q8 is not None
               for (_, p, _, _, q8) in stacks.values())

    calls = {"stack": 0, "packed_stack": 0, "packed": 0}

    def count(name, fn):
        def wrapped(*a, **k):
            calls[name] += 1
            return fn(*a, **k)
        return wrapped

    monkeypatch.setattr(q8mod, "nb1d_stack_infer_q8",
                        count("stack", q8mod.nb1d_stack_infer_q8))
    monkeypatch.setattr(q8mod, "nb1d_stack_infer_packed_q8",
                        count("packed_stack",
                              q8mod.nb1d_stack_infer_packed_q8))
    monkeypatch.setattr(q8mod, "nb1d_infer_packed_q8",
                        count("packed", q8mod.nb1d_infer_packed_q8))
    infer = build_fast_infer(params, state, dtype=jnp.float32,
                             use_pallas=True, interpret=True,
                             q8_scales=scales, preds_only=True)
    infer(x)
    # the dilated C=128 run -> ONE plain q8 stack call; packed runs stay
    # per-block (inference._PACKED_STACKS negative result): 5 encoder
    # C=64 + 2+2 decoder blocks
    assert calls["stack"] == 1
    assert calls["packed_stack"] == 0
    assert calls["packed"] == 9
