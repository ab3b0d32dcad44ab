"""Full fast-path inference (all Pallas kernels) vs the XLA oracle."""

import numpy as np

import jax
import jax.numpy as jnp

from erfnet_pytorch_tpu.models import erfnet
from erfnet_pytorch_tpu.inference import build_fast_infer


def test_fast_infer_matches_xla_fp32():
    params, state = erfnet.init(jax.random.PRNGKey(0), 20)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 256, 3))

    ref_fn = build_fast_infer(params, state, dtype=jnp.float32,
                              use_pallas=False)
    fast_fn = build_fast_infer(params, state, dtype=jnp.float32,
                               use_pallas=True, interpret=True)
    ref_logits, ref_pred = ref_fn(x)
    logits, pred = fast_fn(x)
    assert logits.shape == ref_logits.shape == (1, 128, 256, 20)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=2e-3, atol=2e-3)
    agree = (np.asarray(pred) == np.asarray(ref_pred)).mean()
    assert agree > 0.999, agree


def test_fast_infer_odd_shape_falls_back():
    """Shapes the kernels can't take still produce correct results (XLA
    fallback inside layer_fn)."""
    params, state = erfnet.init(jax.random.PRNGKey(0), 20)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 48, 48, 3))
    ref_fn = build_fast_infer(params, state, dtype=jnp.float32,
                              use_pallas=False)
    fast_fn = build_fast_infer(params, state, dtype=jnp.float32,
                               use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(fast_fn(x)[0]),
                               np.asarray(ref_fn(x)[0]),
                               rtol=2e-3, atol=2e-3)


def test_fast_infer_wb1_stem():
    """W == stem packing factor (128) makes the packed maps Wb == 1 wide;
    the W-block shifts then shift the whole axis out and must return
    zeros (upsampler._bshift guard) instead of building zero-size slices
    — interpret mode accepted those, Mosaic on-chip refused ("vector
    types must have positive constant sizes", seen at eval --height 64).
    Parity here checks the zeros-return is the semantically right value;
    the compiled lowering itself is verified by the on-chip CLI run
    (README hardware table)."""
    params, state = erfnet.init(jax.random.PRNGKey(0), 20)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 128, 3))
    ref_fn = build_fast_infer(params, state, dtype=jnp.float32,
                              use_pallas=False)
    fast_fn = build_fast_infer(params, state, dtype=jnp.float32,
                               use_pallas=True, interpret=True)
    ref_logits, ref_pred = ref_fn(x)
    logits, pred = fast_fn(x)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=2e-3, atol=2e-3)
    assert (np.asarray(pred) == np.asarray(ref_pred)).mean() > 0.999


def test_streaming_segmenter(fake_cityscapes):
    from erfnet_pytorch_tpu.streaming import StreamingSegmenter
    from erfnet_pytorch_tpu.data.cityscapes import CityscapesDataset
    from erfnet_pytorch_tpu.data.loader import DataLoader

    params, state = erfnet.init(jax.random.PRNGKey(0), 20)
    seg = StreamingSegmenter(params, state, dtype=jnp.float32,
                             use_pallas=False, output="color")
    ds = CityscapesDataset(fake_cityscapes, "val", height=64)
    dl = DataLoader(ds, 2, num_workers=2)
    outs = list(seg.run(dl))
    assert len(outs) == 3
    rgb, rels = outs[0]
    assert rgb.shape == (2, 64, 128, 3) and rgb.dtype == np.uint8
    assert len(rels) == 2

    seg = StreamingSegmenter(params, state, dtype=jnp.float32,
                             use_pallas=False, output="labelId")
    ids, _ = next(iter(seg.run(DataLoader(ds, 2, num_workers=2))))
    valid = {7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28,
             31, 32, 33, 0}
    assert set(np.unique(ids)).issubset(valid)


def test_head_argmax_kernel_matches_oracle():
    """Fused head+argmax kernel == matmul-head logits + jnp.argmax,
    including first-max tie semantics."""
    from erfnet_pytorch_tpu.ops.pallas.head_argmax import (
        head_argmax, depth_to_space_planes)
    M, K, C = 1024, 16, 20
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    feats = jax.random.normal(k1, (M, K), jnp.float32)
    W = jax.random.normal(k2, (K, 4 * C), jnp.float32)
    bias = jax.random.normal(k3, (4 * C,), jnp.float32)

    z = feats @ W + bias                               # (M, 4C)
    oracle = jnp.argmax(z.reshape(M, 4, C), axis=-1)   # (M, 4)
    idx = head_argmax(feats, W, bias, G=4, n_classes=C, interpret=True)
    assert idx.shape == (4, M) and idx.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(idx).T, np.asarray(oracle))

    # tied logits -> lowest class index, like jnp.argmax
    idx0 = head_argmax(jnp.zeros((M, K)), jnp.zeros((K, 4 * C)),
                       jnp.zeros((4 * C,)), G=4, n_classes=C,
                       interpret=True)
    assert int(np.asarray(idx0).max()) == 0

    # NaN logits must still yield in-range classes (jnp.argmax does too)
    fn = jnp.full((M, K), jnp.nan, jnp.float32)
    idxn = head_argmax(fn, W, bias, G=4, n_classes=C, interpret=True)
    assert int(np.asarray(idxn).max()) <= C - 1

    # depth-to-space plane order: plane g = (a, b), g = a*2 + b
    planes = jnp.arange(4, dtype=jnp.int32)[:, None] * jnp.ones(
        (4, 8), jnp.int32)
    out = depth_to_space_planes(planes, 1, 2, 4)
    assert out.shape == (1, 4, 8)
    np.testing.assert_array_equal(np.asarray(out[0, :2, :2]),
                                  [[0, 1], [2, 3]])


def test_head_argmax_reused_across_jits():
    """The lru-cached op must not capture trace-local constants: first use
    INSIDE one jit, then reuse in a different jit (the bench's b1 -> b8
    sequence leaked a tracer here)."""
    from erfnet_pytorch_tpu.ops.pallas.head_argmax import head_argmax
    W = jax.random.normal(jax.random.PRNGKey(0), (16, 80), jnp.float32)
    b = jnp.zeros((80,))

    @jax.jit
    def f1(feats):
        return head_argmax(feats, W, b, G=4, n_classes=20, interpret=True)

    @jax.jit
    def f2(feats):
        return head_argmax(feats, W, b, G=4, n_classes=20,
                           interpret=True).sum()

    feats = jax.random.normal(jax.random.PRNGKey(1), (256, 16), jnp.float32)
    out1 = f1(feats)
    out2 = f2(jax.random.normal(jax.random.PRNGKey(2), (512, 16)))
    assert out1.shape == (4, 256) and np.isfinite(float(out2))


def test_preds_only_fast_infer_matches_logits_path():
    params, state = erfnet.init(jax.random.PRNGKey(0), 20)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 256, 3))
    ref_fn = build_fast_infer(params, state, dtype=jnp.float32,
                              use_pallas=True, interpret=True)
    po_fn = build_fast_infer(params, state, dtype=jnp.float32,
                             use_pallas=True, interpret=True,
                             preds_only=True)
    _, ref_pred = ref_fn(x)
    pred = po_fn(x)
    assert pred.shape == ref_pred.shape == (1, 128, 256)
    # head runs as a matmul vs conv_transpose: float-order noise can flip
    # near-tie pixels only
    agree = (np.asarray(pred) == np.asarray(ref_pred)).mean()
    assert agree > 0.999, agree

    # unsupported M (not a multiple of 128) -> in-jit XLA fallback
    x2 = jax.random.uniform(jax.random.PRNGKey(2), (1, 48, 48, 3))
    po2 = build_fast_infer(params, state, dtype=jnp.float32,
                           use_pallas=True, interpret=True, preds_only=True)
    ref2 = build_fast_infer(params, state, dtype=jnp.float32,
                            use_pallas=False, preds_only=True)
    agree2 = (np.asarray(po2(x2)) == np.asarray(ref2(x2))).mean()
    assert agree2 > 0.999, agree2


def test_down_packed_eval_matches_xla_block():
    """Packed-kernel DownsamplerBlock (eval) == XLA conv||pool block, for
    all three channel configs (3->16 stem, 16->64, 64->128)."""
    from erfnet_pytorch_tpu.inference import _apply_down_packed_eval
    from erfnet_pytorch_tpu.models.erfnet import (init_downsampler,
                                                  apply_downsampler)
    for i, (cin, cout, h, w) in enumerate([(3, 16, 64, 256), (16, 64, 32, 128),
                                           (64, 128, 16, 64)]):
        p, s = init_downsampler(jax.random.PRNGKey(i), cin, cout)
        # non-trivial running stats so eval-mode BN is actually exercised
        s = {"bn": {"mean": jax.random.normal(jax.random.PRNGKey(i + 10),
                                              (cout,)) * 0.1,
                    "var": jnp.abs(jax.random.normal(
                        jax.random.PRNGKey(i + 20), (cout,))) + 0.5}}
        x = jax.random.normal(jax.random.PRNGKey(i + 30), (2, h, w, cin))
        out = _apply_down_packed_eval(p, s, x, jnp.float32, True)
        assert out is not None, (cin, cout)
        y, _ = out
        ref, _ = apply_downsampler(p, s, x, train=False)
        assert y.shape == ref.shape == (2, h // 2, w // 2, cout)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_down_packed_eval_blocked_matches_xla_block():
    """H-blocked eval downsampler kernel (small forced VMEM budget ->
    multiple h-blocks with the 1-output-row top halo) == XLA block, for
    all three channel configs.  Checks the j==0 top edge (zero-fill IS
    the conv pad), interior kept-row offsets, and the folded BN+ReLU."""
    from erfnet_pytorch_tpu.ops.pallas.downsampler import (
        downsampler_packed_eval, down_packed_eval_supported,
        _down_blocked_rows)
    from erfnet_pytorch_tpu.models.erfnet import (init_downsampler,
                                                  apply_downsampler, BN_EPS)
    pis = {3: 128, 16: 8, 64: 2}
    for i, (cin, cout, h, w) in enumerate([(3, 16, 64, 256),
                                           (16, 64, 64, 128),
                                           (64, 128, 32, 64)]):
        p, s = init_downsampler(jax.random.PRNGKey(i), cin, cout)
        p = dict(p, bn={"scale": 1.0 + 0.1 * jax.random.normal(
                            jax.random.PRNGKey(i + 40), (cout,)),
                        "bias": jax.random.normal(
                            jax.random.PRNGKey(i + 50), (cout,)) * 0.1})
        s = {"bn": {"mean": jax.random.normal(jax.random.PRNGKey(i + 10),
                                              (cout,)) * 0.1,
                    "var": jnp.abs(jax.random.normal(
                        jax.random.PRNGKey(i + 20), (cout,))) + 0.5}}
        x = jax.random.normal(jax.random.PRNGKey(i + 30), (2, h, w, cin))
        pi = pis[cin]
        X = x.reshape(2, h, w // pi, pi * cin)
        # budget small enough to force >= 2 h-blocks but >= 8 kept rows
        co = (pi // 2) * (cout)
        budget = (2 * (w // pi) * pi * cin + (w // pi) * co) * (h // 4 + 2)
        assert down_packed_eval_supported(X.shape, pi, cout - cin, budget)
        assert _down_blocked_rows(h // 2, w // pi, pi * cin, co,
                                  budget) < h // 2, "want multiple blocks"
        y = downsampler_packed_eval(
            X, p["conv"]["w"], p["conv"]["b"], p["bn"]["scale"],
            p["bn"]["bias"], s["bn"]["mean"], s["bn"]["var"], pi=pi,
            eps=BN_EPS, max_elems=budget, interpret=True)
        y = y.reshape(2, h // 2, w // 2, cout)
        ref, _ = apply_downsampler(p, s, x, train=False)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_ups_packed_eval_blocked_matches_xla_block():
    """H-blocked eval upsampler kernel (BN folded into the tap matrix,
    in-kernel ReLU; 1-input-row BOTTOM halo) == XLA conv_transpose block,
    whole-map and forced-multi-block."""
    from erfnet_pytorch_tpu.ops.pallas.upsampler import (
        upsampler_packed_eval, ups_packed_eval_supported, _ups_blocked_rows)
    from erfnet_pytorch_tpu.models.erfnet import (init_upsampler,
                                                  apply_upsampler, BN_EPS)
    pack = {128: 1, 64: 2, 16: 8}
    for i, (cin, cout, h, w) in enumerate([(128, 64, 16, 64),
                                           (64, 16, 32, 128)]):
        p, s = init_upsampler(jax.random.PRNGKey(i), cin, cout)
        p = dict(p, bn={"scale": 1.0 + 0.1 * jax.random.normal(
                            jax.random.PRNGKey(i + 40), (cout,)),
                        "bias": jax.random.normal(
                            jax.random.PRNGKey(i + 50), (cout,)) * 0.1})
        s = {"bn": {"mean": jax.random.normal(jax.random.PRNGKey(i + 10),
                                              (cout,)) * 0.1,
                    "var": jnp.abs(jax.random.normal(
                        jax.random.PRNGKey(i + 20), (cout,))) + 0.5}}
        x = jax.random.normal(jax.random.PRNGKey(i + 30), (2, h, w, cin))
        ref, _ = apply_upsampler(p, s, x, train=False)
        pi, po = pack[cin], pack[cout]
        X = x.reshape(2, h, w // pi, pi * cin)
        for budget in (1 << 24, None):
            if budget is None:
                # force >= 2 h-blocks (bottom-halo + kept-offset path)
                chm = (po // 2) * cin
                wbo = ((w // pi) * pi * cin) // chm
                W_elems = (w // pi) * pi * cin + 2 * wbo * po * cout
                budget = W_elems * (h // 2 + 1)
                assert _ups_blocked_rows(h, w // pi, pi * cin, wbo,
                                         po * cout, budget) < h
            assert ups_packed_eval_supported(X.shape, pi, po, cout, budget)
            y = upsampler_packed_eval(
                X, p["conv"]["w"], p["conv"]["b"], p["bn"]["scale"],
                p["bn"]["bias"], s["bn"]["mean"], s["bn"]["var"], pi=pi,
                po=po, eps=BN_EPS, max_elems=budget, interpret=True)
            y = y.reshape(2, 2 * h, 2 * w, cout)
            assert y.shape == ref.shape
            np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4)


def test_fast_argmax_matches_jnp_argmax():
    from erfnet_pytorch_tpu.inference import fast_argmax
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 9, 20))
    np.testing.assert_array_equal(np.asarray(fast_argmax(x)),
                                  np.asarray(jnp.argmax(x, -1)))
    # ties -> first index, like jnp.argmax
    t = jnp.zeros((1, 3, 3, 20))
    np.testing.assert_array_equal(np.asarray(fast_argmax(t)),
                                  np.asarray(jnp.argmax(t, -1)))


def test_fast_infer_blocked_path_matches_xla(monkeypatch):
    """Routing check: with the VMEM map budget forced small, the layer_fn
    must take the h-blocked halo kernels (not whole-map, not XLA) and the
    pipeline still matches the XLA oracle."""
    import erfnet_pytorch_tpu.inference as inf

    params, state = erfnet.init(jax.random.PRNGKey(2), 20)
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 128, 256, 3))
    ref_fn = build_fast_infer(params, state, dtype=jnp.float32,
                              use_pallas=False)
    # budget below every stage's whole-map size but enough for >=8-row
    # windows; also disable the stack kernel (whole-map only)
    monkeypatch.setattr(inf, "_MAX_MAP_ELEMS", 24 * 32 * 128)
    fast_fn = build_fast_infer(params, state, dtype=jnp.float32,
                               use_pallas=True, interpret=True,
                               use_stack=False)
    ref_logits, ref_pred = ref_fn(x)
    logits, pred = fast_fn(x)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=2e-3, atol=2e-3)
    assert (np.asarray(pred) == np.asarray(ref_pred)).mean() > 0.999


def test_packed_head_argmax_matches_plain():
    """W-packed (G=4p on 128 lanes) head+argmax == the plain (G=4, K=16)
    path == XLA argmax of the materialized logits — the packed form reads
    the decoder's native packed layout so the lane-padded (M, 16) view
    never materializes."""
    from erfnet_pytorch_tpu.ops.pallas.head_argmax import (
        head_argmax, head_argmax_supported, depth_to_space_planes,
        depth_to_space_planes_packed)
    from erfnet_pytorch_tpu.ops.convt_mm import (
        build_head_matmul, apply_head_matmul, expand_head_matmul_packed)

    rng = np.random.RandomState(0)
    B, H, Wd, K, p, ncls = 2, 8, 64, 16, 8, 20
    y = jnp.asarray(rng.randn(B, H, Wd, K).astype(np.float32))
    w = jnp.asarray(rng.randn(2, 2, K, ncls).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.randn(ncls).astype(np.float32) * 0.1)
    Wm, bm = build_head_matmul(w, b)

    ref = np.asarray(jnp.argmax(apply_head_matmul(y, Wm, bm), axis=-1))

    idx4 = head_argmax(y.reshape(-1, K), Wm, bm, G=4, n_classes=ncls)
    plain = np.asarray(depth_to_space_planes(idx4, B, H, Wd))

    assert head_argmax_supported(B * H * (Wd // p), p * K, 4 * p, ncls)
    Wp, bp = expand_head_matmul_packed(Wm, bm, p)
    yp = y.reshape(B, H, Wd // p, p * K)
    idx32 = head_argmax(yp.reshape(-1, p * K), Wp, bp, G=4 * p,
                        n_classes=ncls)
    packed = np.asarray(depth_to_space_planes_packed(idx32, B, H,
                                                     Wd // p, p))
    np.testing.assert_array_equal(plain, ref)
    np.testing.assert_array_equal(packed, ref)


def test_head_argmax_gate_matches_grouped_kernel_chunk():
    """head_argmax_supported must validate the SAME VMEM chunk the routed
    kernel builds: the grouped builder (G >= 8) pads classes per-group to
    a sublane-tile multiple (20 -> 24), so its chunk derives from the
    padded GC.  Regression: with the gate computing the chunk from the
    UNPADDED GC, M = 12416 (factor 97, reachable via --height/--width)
    passed the gate while the kernel picked a non-128-divisible chunk —
    a Mosaic lowering failure on TPU that CPU interpret mode hides."""
    from erfnet_pytorch_tpu.ops.pallas.head_argmax import (
        _chunk, head_argmax_supported)

    G, ncls, K = 32, 20, 128
    C8 = -(-ncls // 8) * 8
    # the pathological shard size plus a sweep of awkward factorizations
    for M in [12416] + [128 * m for m in range(1, 400, 7)]:
        if head_argmax_supported(M, K, G, ncls):
            assert _chunk(M, G * C8) % 128 == 0, M
