"""Custom-VJP fused train conv-pair kernel (ops/pallas/nb1d_train) parity.

Kernels run in Pallas interpret mode on CPU; the XLA tap-by-tap path
(packed_conv / conv_3tap_mm) is the oracle for both values and gradients
(SURVEY.md §4 unit strategy).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from erfnet_pytorch_tpu.ops.pallas.nb1d_train import (
    fused_pair, fused_train, pair_reference, stack_taps_h, stack_taps_w)
from erfnet_pytorch_tpu.ops.packed import (build_packed_taps_h,
                                           build_packed_taps_w,
                                           nb1d_train_packed)
from erfnet_pytorch_tpu.models.erfnet import (apply_non_bottleneck_1d,
                                              init_non_bottleneck_1d)


def _rand_pair(key, C, B=2, H=8, Wb=16, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (B, H, Wb, C), dtype)
    wh = jax.random.normal(ks[1], (3, C, C)) * 0.05
    ww = jax.random.normal(ks[2], (3, C, C)) * 0.05
    bh = jax.random.normal(ks[3], (C,))
    bw = jax.random.normal(ks[4], (C,))
    return x, wh, bh, ww, bw


@pytest.mark.parametrize("sh,sw,lead", [
    (1, 1, False), (2, 2, True), (16, 8, True), (4, 1, False),
])
def test_fused_pair_value_and_grads(sh, sw, lead):
    x, wh, bh, ww, bw = _rand_pair(jax.random.PRNGKey(sh * 7 + sw), 128)
    f = lambda *a: fused_pair(*a, sh=sh, sw=sw, lead_relu=lead)
    r = lambda *a: pair_reference(*a, sh=sh, sw=sw, lead_relu=lead)
    z, vjp_f = jax.vjp(f, x, wh, bh, ww, bw)
    z_ref, vjp_r = jax.vjp(r, x, wh, bh, ww, bw)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               rtol=1e-5, atol=1e-5)
    g = jax.random.normal(jax.random.PRNGKey(9), z.shape)
    for got, ref, name in zip(vjp_f(g), vjp_r(g), "x wh bh ww bw".split()):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name} (sh={sh} sw={sw})")


def test_fused_pair_bf16_close_to_f32():
    x, wh, bh, ww, bw = _rand_pair(jax.random.PRNGKey(0), 128)
    z32 = pair_reference(x, wh, bh, ww, bw, sh=1, sw=1)
    z16 = fused_pair(x.astype(jnp.bfloat16), wh, bh, ww, bw, sh=1, sw=1)
    assert z16.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(z16, np.float32), np.asarray(z32),
                               rtol=0.1, atol=0.15)
    # weight grads stay f32 even with bf16 activations
    _, vjp = jax.vjp(lambda w: fused_pair(x.astype(jnp.bfloat16), w, bh, ww,
                                          bw, sh=1, sw=1), wh)
    (dwh,) = vjp(jnp.ones((2, 8, 16, 128), jnp.bfloat16))
    assert dwh.dtype == jnp.float32


@pytest.mark.parametrize("p,d", [(2, 1), (8, 1), (2, 16), (8, 2), (4, 2)])
def test_stack_builders_match_packed_taps(p, d):
    w3 = np.random.RandomState(p + d).randn(3, 16, 16).astype(np.float32)
    K, s = stack_taps_w(jnp.asarray(w3), p, d)
    ref = dict(build_packed_taps_w(w3, p, d))
    for i, q in enumerate((-s, 0, s)):
        np.testing.assert_allclose(
            np.asarray(K[i]), ref.get(q, np.zeros((16 * p, 16 * p))),
            rtol=1e-6, atol=1e-6)
    Kh = stack_taps_h(jnp.asarray(w3), p)
    for i, (q, Kref) in enumerate(build_packed_taps_h(w3, p, d)):
        np.testing.assert_allclose(np.asarray(Kh[i]), Kref, atol=1e-6)


@pytest.mark.parametrize("c,p,d,drop", [(16, 8, 1, 0.0), (64, 2, 1, 0.3)])
def test_packed_block_fused_matches_xla(c, p, d, drop):
    params, state = init_non_bottleneck_1d(jax.random.PRNGKey(3), c)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 16 * p, c))
    rng = jax.random.PRNGKey(5)

    def run(params, x):
        y, ns = nb1d_train_packed(params, state, x, p=p, dilated=d,
                                  dropprob=drop, train=True, rng=rng)
        return y, ns

    with fused_train(False):
        (y_ref, ns_ref), vjp_ref = _value_vjp(run, params, x)
    with fused_train(True):
        (y_f, ns_f), vjp_f = _value_vjp(run, params, x)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4), ns_f, ns_ref)
    g = jax.random.normal(jax.random.PRNGKey(6), y_ref.shape)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4),
        vjp_f(g), vjp_ref(g))


def _value_vjp(run, params, x):
    """vjp of y wrt (params, x), also returning the new BN state."""
    y, vjp, ns = jax.vjp(run, params, x, has_aux=True)
    return (y, ns), vjp


@pytest.mark.parametrize("d,drop", [(1, 0.0), (16, 0.3)])
def test_c128_block_fused_matches_xla(d, drop):
    c = 128
    params, state = init_non_bottleneck_1d(jax.random.PRNGKey(7), c)
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 8, 16, c))
    rng = jax.random.PRNGKey(9)

    def run(params, x):
        return apply_non_bottleneck_1d(params, state, x, dilated=d,
                                       dropprob=drop, train=True, rng=rng)

    with fused_train(False):
        (y_ref, ns_ref), vjp_ref = _value_vjp(run, params, x)
    with fused_train(True):
        (y_f, ns_f), vjp_f = _value_vjp(run, params, x)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4), ns_f, ns_ref)
    g = jax.random.normal(jax.random.PRNGKey(10), y_ref.shape)
    # atol floor 1e-3: pre-BN conv bias grads are mathematically ZERO
    # (BN subtracts the mean) — what remains is f32 cancellation noise,
    # and the in-kernel stats backward (dz += gs1 + 2 z gs2) rounds that
    # noise differently from XLA's reduction, both validly
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=3e-4, atol=1e-3),
        vjp_f(g), vjp_ref(g))


@pytest.mark.parametrize("enc", [True, False])
def test_train_step_fused_head_loss_matches(enc):
    """Full train step: fused pairs + fused head+loss vs the XLA path."""
    import numpy as np
    from erfnet_pytorch_tpu.models import erfnet
    from erfnet_pytorch_tpu.training import optim
    from erfnet_pytorch_tpu.training.steps import (create_train_state,
                                                   make_train_step)

    tx = optim.make_adam()
    ts0 = create_train_state(erfnet, jax.random.PRNGKey(0), 20, tx)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 32, 64, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 20, (2, 32, 64)).astype(np.int32))

    def one_step():
        step = make_train_step(erfnet, tx, [1.0 + i * 0.1 for i in range(20)],
                               enc=enc, augment=False)
        ts, loss = step(ts0, images, labels, jax.random.PRNGKey(1))
        return ts, loss

    with fused_train(False):
        ts_ref, loss_ref = one_step()
    with fused_train(True):
        ts_f, loss_f = one_step()
    np.testing.assert_allclose(float(loss_f), float(loss_ref),
                               rtol=1e-5, atol=1e-5)
    # post-Adam params: m/sqrt(v) amplifies fp-noise-level grad deltas to
    # O(lr), so this is a smoke bound; exact grad parity is covered by the
    # op-level tests above
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=5e-3, atol=2.5e-3),
        ts_f.params, ts_ref.params)


@pytest.mark.parametrize("pi,po,cin,cout", [(1, 2, 128, 64), (2, 8, 64, 16)])
def test_upsampler_packed_matches_matmul_form(pi, po, cin, cout):
    from erfnet_pytorch_tpu.ops.pallas.upsampler import upsampler_packed
    from erfnet_pytorch_tpu.ops.convt_mm import (apply_upsampler_matmul,
                                                 build_upsampler_matmul)
    rng = np.random.RandomState(pi * 10 + po)
    B, H, W = 2, 8, 32
    x = jnp.asarray(rng.randn(B, H, W, cin), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
    xp = x.reshape(B, H, W // pi, pi * cin)

    def ref(xp, w, b):
        Wcat, bias = build_upsampler_matmul(w, b)
        y = apply_upsampler_matmul(xp.reshape(B, H, W, cin), Wcat, bias,
                                   relu=False)
        return y.reshape(B, 2 * H, (2 * W) // po, po * cout)

    fused = lambda xp, w, b: upsampler_packed(xp, w, b, pi=pi, po=po)
    y_ref, vjp_r = jax.vjp(ref, xp, w, b)
    y_f, vjp_f = jax.vjp(fused, xp, w, b)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    g = jnp.asarray(rng.randn(*y_ref.shape), jnp.float32)
    for got, want, name in zip(vjp_f(g), vjp_r(g), "x w b".split()):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=f"grad {name}")


@pytest.mark.parametrize("pi,cin,cout", [(8, 16, 64), (2, 64, 128),
                                         (32, 3, 16)])
def test_downsampler_packed_matches_xla(pi, cin, cout):
    from erfnet_pytorch_tpu.ops.pallas.downsampler import downsampler_packed
    from erfnet_pytorch_tpu.ops.packed import (build_downsampler_matmul,
                                               downsampler_conv_matmul,
                                               max_pool2x2_packed)
    rng = np.random.RandomState(pi)
    B, H, W = 2, 16, 2 * pi
    cc = cout - cin
    # exact zeros exercise the pool-backward tie split
    x = jnp.asarray(np.maximum(rng.randn(B, H, W, cin), 0)
                    * (rng.rand(B, H, W, cin) > 0.3), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, cin, cc) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(cc) * 0.1, jnp.float32)
    xp = x.reshape(B, H, W // pi, pi * cin)

    def ref(xp, w, b):
        xf = xp.reshape(B, H, W, cin)
        y = downsampler_conv_matmul(xf, build_downsampler_matmul(w), b)
        p = max_pool2x2_packed(xf)
        return jnp.concatenate([y, p], -1).reshape(
            B, H // 2, W // pi, (pi // 2) * cout)

    fused = lambda xp, w, b: downsampler_packed(xp, w, b, pi=pi)
    y_ref, vjp_r = jax.vjp(ref, xp, w, b)
    y_f, vjp_f = jax.vjp(fused, xp, w, b)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    g = jnp.asarray(rng.randn(*y_ref.shape), jnp.float32)
    for got, want, name in zip(vjp_f(g), vjp_r(g), "x w b".split()):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=f"grad {name}")


def test_head_loss_packed_matches_native():
    """G=32 packed-lane head+loss (feats (M', 128), kron(I_8, W) weights,
    pack_labels_packed) == the G=4 native form — values AND grads."""
    from erfnet_pytorch_tpu.ops.pallas.head_loss import (
        make_head_loss, pack_labels_2x2, pack_labels_packed)
    from erfnet_pytorch_tpu.ops.convt_mm import expand_head_matmul_packed

    B, H, W, p, ncls = 2, 4, 16, 8, 20
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, H, W, 16), jnp.float32)
    W4 = jnp.asarray(rng.randn(16, 4 * ncls) * 0.2, jnp.float32)
    b4 = jnp.asarray(rng.randn(4 * ncls) * 0.1, jnp.float32)
    labels = jnp.asarray(rng.randint(0, ncls, (B, 2 * H, 2 * W)), jnp.int32)
    cw = jnp.asarray([1.0 + 0.1 * i for i in range(ncls)])
    cw = cw.at[ncls - 1].set(0.0)  # void-masked class

    op_n = make_head_loss(cw, n_classes=ncls, G=4, interpret=True)
    op_p = make_head_loss(cw, n_classes=ncls, G=4 * p, interpret=True)

    def loss_native(feats, W4, b4):
        num, den = op_n(feats.reshape(-1, 16), W4, b4,
                        pack_labels_2x2(labels))
        return num / den

    def loss_packed(feats, W4, b4):
        Wp, bp = expand_head_matmul_packed(W4, b4, p)
        num, den = op_p(feats.reshape(B, H, W // p, p * 16)
                        .reshape(-1, p * 16), Wp, bp,
                        pack_labels_packed(labels, p))
        return num / den

    ln, gn = jax.value_and_grad(loss_native, argnums=(0, 1, 2))(feats, W4, b4)
    lp, gp = jax.value_and_grad(loss_packed, argnums=(0, 1, 2))(feats, W4, b4)
    np.testing.assert_allclose(float(lp), float(ln), rtol=1e-5)
    for a, b, name in zip(gp, gn, "feats W bias".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"grad {name}")


@pytest.mark.parametrize("sh,sw", [(1, 1), (16, 8)])
def test_fused_pair_affine_value_and_grads(sh, sw):
    """fused_pair_affine (BN1 affine+relu folded into the lead stage) ==
    the jnp oracle for values and all seven gradients."""
    from erfnet_pytorch_tpu.ops.pallas.nb1d_train import (
        fused_pair_affine, pair_affine_reference)
    x, wh, bh, ww, bw = _rand_pair(jax.random.PRNGKey(sh + 31 * sw), 128)
    ka, kb = jax.random.split(jax.random.PRNGKey(5))
    a = jax.random.normal(ka, (128,)) * 0.3 + 1.0
    b = jax.random.normal(kb, (128,)) * 0.2
    f = lambda *args: fused_pair_affine(*args, sh=sh, sw=sw)
    r = lambda *args: pair_affine_reference(*args, sh=sh, sw=sw)
    z, vjp_f = jax.vjp(f, x, a, b, wh, bh, ww, bw)
    z_ref, vjp_r = jax.vjp(r, x, a, b, wh, bh, ww, bw)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               rtol=1e-5, atol=1e-5)
    g = jax.random.normal(jax.random.PRNGKey(9), z.shape)
    for got, ref, name in zip(vjp_f(g), vjp_r(g),
                              "x a b wh bh ww bw".split()):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name} (sh={sh} sw={sw})")


@pytest.mark.parametrize("sh,sw,drop", [(1, 1, 0.0), (16, 8, 0.3)])
def test_fused_pair_epi_value_and_grads(sh, sw, drop):
    """fused_pair_epi (previous block's BN2+dropout+residual+relu folded
    into the lead stage, dual outputs) == the jnp oracle, values + grads
    through BOTH outputs."""
    from erfnet_pytorch_tpu.ops.pallas.nb1d_train import (
        fused_pair_epi, pair_epi_reference)
    t, wh, bh, ww, bw = _rand_pair(jax.random.PRNGKey(sh * 13 + sw), 128)
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    y_res = jax.random.normal(ks[0], t.shape)
    a = jax.random.normal(ks[1], (128,)) * 0.3 + 1.0
    b = jax.random.normal(ks[2], (128,)) * 0.2
    keep = 1.0 - drop
    if drop > 0:
        m = jnp.where(jax.random.bernoulli(ks[3], keep, (t.shape[0], 128)),
                      1.0 / keep, 0.0)
    else:
        m = jnp.ones((t.shape[0], 128))

    f = lambda *args: fused_pair_epi(*args, m, a, b, wh, bh, ww, bw,
                                     sh=sh, sw=sw)
    r = lambda *args: pair_epi_reference(*args, m, a, b, wh, bh, ww, bw,
                                         sh=sh, sw=sw)
    (z, yn), vjp_f = jax.vjp(f, t, y_res)
    (z_ref, yn_ref), vjp_r = jax.vjp(r, t, y_res)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(yn), np.asarray(yn_ref),
                               rtol=1e-6, atol=1e-6)
    g = (jax.random.normal(jax.random.PRNGKey(9), z.shape),
         jax.random.normal(jax.random.PRNGKey(10), yn.shape))
    for got, ref, name in zip(vjp_f(g), vjp_r(g), "t y_res".split()):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {name}")

    # full-arg grads (a, b, weights) via the affine/weight positions
    fa = lambda t_, a_, b_, wh_, bh_, ww_, bw_: fused_pair_epi(
        t_, y_res, m, a_, b_, wh_, bh_, ww_, bw_, sh=sh, sw=sw)
    ra = lambda t_, a_, b_, wh_, bh_, ww_, bw_: pair_epi_reference(
        t_, y_res, m, a_, b_, wh_, bh_, ww_, bw_, sh=sh, sw=sw)
    out_f, vjp_f2 = jax.vjp(fa, t, a, b, wh, bh, ww, bw)
    out_r, vjp_r2 = jax.vjp(ra, t, a, b, wh, bh, ww, bw)
    for got, ref, name in zip(vjp_f2(g), vjp_r2(g),
                              "t a b wh bh ww bw".split()):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=3e-4, atol=3e-4,
            err_msg=f"grad mismatch for {name}")


def test_fused_pair_stats_value_and_grads():
    """The stats-emitting pair op: (z, sum, sumsq) and ALL grads —
    including the in-kernel dz += gs1 + 2 z gs2 stats backward — must
    match the jnp oracle."""
    from erfnet_pytorch_tpu.ops.pallas.nb1d_train import fused_pair_stats

    x, wh, bh, ww, bw = _rand_pair(jax.random.PRNGKey(3), 128)

    def f(x, wh, bh, ww, bw):
        return fused_pair_stats(x, wh, bh, ww, bw, sh=2, sw=2,
                                lead_relu=True)

    def r(x, wh, bh, ww, bw):
        z = pair_reference(x, wh, bh, ww, bw, sh=2, sw=2, lead_relu=True)
        # per-row stats (B, C): the op emits one stat row per batch image
        zf = z.astype(jnp.float32).reshape(z.shape[0], -1, z.shape[-1])
        return z, jnp.sum(zf, 1), jnp.sum(zf * zf, 1)

    out, vjp_f = jax.vjp(f, x, wh, bh, ww, bw)
    ref, vjp_r = jax.vjp(r, x, wh, bh, ww, bw)
    for got, want, name in zip(out, ref, ("z", "s1", "s2")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-4, err_msg=name)
    ks = jax.random.split(jax.random.PRNGKey(11), 3)
    g = (jax.random.normal(ks[0], out[0].shape),
         jax.random.normal(ks[1], out[1].shape) * 0.01,
         jax.random.normal(ks[2], out[2].shape) * 0.01)
    for got, want, name in zip(vjp_f(g), vjp_r(g), "x wh bh ww bw".split()):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=5e-3,
            err_msg=f"stats-op grad mismatch for {name}")


def test_fused_pair_affine_and_epi_stats_match_references():
    from erfnet_pytorch_tpu.ops.pallas.nb1d_train import (
        fused_pair_affine_stats, fused_pair_epi_stats,
        pair_affine_reference, pair_epi_reference)

    C = 128
    ks = jax.random.split(jax.random.PRNGKey(5), 9)
    x = jax.random.normal(ks[0], (2, 8, 16, C))
    a = jax.random.normal(ks[1], (C,)) * 0.2 + 1.0
    b = jax.random.normal(ks[2], (C,)) * 0.1
    wh = jax.random.normal(ks[3], (3, C, C)) * 0.05
    ww = jax.random.normal(ks[4], (3, C, C)) * 0.05
    bh = jax.random.normal(ks[5], (C,))
    bw = jax.random.normal(ks[6], (C,))

    def sums(z):
        # per-row stats (B, C)
        zf = z.astype(jnp.float32).reshape(z.shape[0], -1, C)
        return jnp.sum(zf, 1), jnp.sum(zf * zf, 1)

    def fa(x, a, b):
        return fused_pair_affine_stats(x, a, b, wh, bh, ww, bw, sh=4, sw=4)

    def ra(x, a, b):
        z = pair_affine_reference(x, a, b, wh, bh, ww, bw, sh=4, sw=4)
        return (z,) + sums(z)

    out, vjp_f = jax.vjp(fa, x, a, b)
    ref, vjp_r = jax.vjp(ra, x, a, b)
    for got, want in zip(out, ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-4)
    g = tuple(jax.random.normal(k, o.shape) * s
              for k, o, s in zip(jax.random.split(ks[7], 3), out,
                                 (1.0, 0.01, 0.01)))
    for got, want, name in zip(vjp_f(g), vjp_r(g), "x a b".split()):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=5e-3, err_msg=name)

    # epi variant: lead epilogue + pair + stats on z
    t = jax.random.normal(ks[8], (2, 8, 16, C))
    y_res = x
    m = jnp.ones((2, C))

    def fe(t, y_res):
        return fused_pair_epi_stats(t, y_res, m, a, b, wh, bh, ww, bw,
                                    sh=2, sw=2)

    def re(t, y_res):
        z, y_next = pair_epi_reference(t, y_res, m, a, b, wh, bh, ww, bw,
                                       sh=2, sw=2)
        return (z, y_next) + sums(z)

    out, vjp_f = jax.vjp(fe, t, y_res)
    ref, vjp_r = jax.vjp(re, t, y_res)
    for got, want in zip(out, ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-4)
    g = tuple(jax.random.normal(k, o.shape) * s
              for k, o, s in zip(jax.random.split(ks[7], 4), out,
                                 (1.0, 1.0, 0.01, 0.01)))
    for got, want, name in zip(vjp_f(g), vjp_r(g), "t y_res".split()):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=5e-3, err_msg=name)


@pytest.mark.parametrize("pi,po,cin,cout", [(1, 2, 128, 64), (2, 8, 64, 16)])
def test_upsampler_packed_stats_matches(pi, po, cin, cout):
    """Stats-emitting upsampler: (y, sum, sumsq) values and grads (with
    the in-kernel stats backward) vs the plain op + XLA reductions."""
    from erfnet_pytorch_tpu.ops.pallas.upsampler import (
        upsampler_packed, upsampler_packed_stats)

    rng = np.random.RandomState(pi * 10 + po)
    B, H, W = 2, 8, 32
    x = jnp.asarray(rng.randn(B, H, W, cin), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)
    xp = x.reshape(B, H, W // pi, pi * cin)

    def ref(xp, w, b):
        y = upsampler_packed(xp, w, b, pi=pi, po=po)
        yf = y.astype(jnp.float32).reshape(y.shape[0], -1, y.shape[-1])
        return y, jnp.sum(yf, 1), jnp.sum(yf * yf, 1)

    def fused(xp, w, b):
        return upsampler_packed_stats(xp, w, b, pi=pi, po=po)

    out_r, vjp_r = jax.vjp(ref, xp, w, b)
    out_f, vjp_f = jax.vjp(fused, xp, w, b)
    for got, want, name in zip(out_f, out_r, ("y", "s1", "s2")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-3, err_msg=name)
    g = (jnp.asarray(rng.randn(*out_r[0].shape), jnp.float32),
         jnp.asarray(rng.randn(*out_r[1].shape) * 0.01, jnp.float32),
         jnp.asarray(rng.randn(*out_r[2].shape) * 0.01, jnp.float32))
    for got, want, name in zip(vjp_f(g), vjp_r(g), "x w b".split()):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-4, atol=3e-3,
                                   err_msg=f"grad {name}")


@pytest.mark.parametrize("pi,cin,cout", [(8, 16, 64), (2, 64, 128),
                                         (32, 3, 16)])
def test_downsampler_packed_stats_matches(pi, cin, cout):
    """Pool+stats downsampler kernel: (y incl pool lanes, sum, sumsq)
    values and grads vs the split conv-kernel + XLA-pool + XLA-stats
    composition (exact pool ties included)."""
    from erfnet_pytorch_tpu.ops.pallas.downsampler import (
        downsampler_packed, downsampler_packed_stats)

    rng = np.random.RandomState(pi)
    B, H, W = 2, 16, 2 * pi
    x = jnp.asarray(np.maximum(rng.randn(B, H, W, cin), 0)
                    .astype(np.float32)).reshape(B, H, W // pi, pi * cin)
    w = jnp.asarray(rng.randn(3, 3, cin, cout - cin) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(cout - cin) * 0.1, jnp.float32)

    def ref(x, w, b):
        y = downsampler_packed(x, w, b, pi=pi)
        yf = y.astype(jnp.float32).reshape(y.shape[0], -1, y.shape[-1])
        return y, jnp.sum(yf, 1), jnp.sum(yf * yf, 1)

    def fused(x, w, b):
        return downsampler_packed_stats(x, w, b, pi=pi)

    out_r, vjp_r = jax.vjp(ref, x, w, b)
    out_f, vjp_f = jax.vjp(fused, x, w, b)
    for got, want, name in zip(out_f, out_r, ("y", "s1", "s2")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-3, err_msg=name)
    g = (jnp.asarray(rng.randn(*out_r[0].shape), jnp.float32),
         jnp.asarray(rng.randn(*out_r[1].shape) * 0.01, jnp.float32),
         jnp.asarray(rng.randn(*out_r[2].shape) * 0.01, jnp.float32))
    for got, want, name in zip(vjp_f(g), vjp_r(g), "x w b".split()):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-4, atol=3e-3,
                                   err_msg=f"grad {name}")


def test_downsampler_packed_stats_bf16_grads():
    """bf16 activations through the stats downsampler must differentiate:
    the pool-branch VJP inside the custom bwd takes an x.dtype cotangent
    (a float32 cast there crashed the whole bf16 train step — the dtype
    the train recipe actually runs)."""
    from erfnet_pytorch_tpu.ops.pallas.downsampler import (
        downsampler_packed_stats)

    pi, cin, cout = 8, 16, 64
    rng = np.random.RandomState(0)
    B, H, W = 2, 16, 2 * pi
    xf = jnp.asarray(np.maximum(rng.randn(B, H, W, cin), 0)
                     .astype(np.float32)).reshape(B, H, W // pi, pi * cin)
    w = jnp.asarray(rng.randn(3, 3, cin, cout - cin) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(cout - cin) * 0.1, jnp.float32)

    def loss(x, w, b):
        y, s1, s2 = downsampler_packed_stats(x, w, b, pi=pi)
        return (jnp.sum(y.astype(jnp.float32) ** 2)
                + jnp.sum(s1) * 1e-3 + jnp.sum(s2) * 1e-4)

    g16 = jax.grad(loss, argnums=(0, 1, 2))(xf.astype(jnp.bfloat16), w, b)
    g32 = jax.grad(loss, argnums=(0, 1, 2))(xf, w, b)
    assert g16[0].dtype == jnp.bfloat16
    for a, e, name in zip(g16, g32, "x w b".split()):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(e), rtol=0.1,
            atol=0.1 * float(np.abs(np.asarray(e)).max()),
            err_msg=f"bf16 grad {name}")


def test_train_step_fused_bf16_multistep_smoke():
    """The SHIPPED hot-loop config end to end on tiny shapes: fused Pallas
    kernels + flat carry + multi_step=2 + compute_dtype=bfloat16 (bench.py
    measure_train).  Guards the bf16 dtype contracts of every custom VJP
    on the path — an f32/bf16 cotangent mismatch in one kernel's bwd
    crashed the real-chip benchmark while all-f32 tests stayed green."""
    import numpy as np
    from erfnet_pytorch_tpu.models import erfnet
    from erfnet_pytorch_tpu.training import optim
    from erfnet_pytorch_tpu.training.steps import (create_train_state,
                                                   make_train_step)
    from erfnet_pytorch_tpu.training.class_weights import DECODER_WEIGHTS

    tx = optim.make_adam()
    ts0 = create_train_state(erfnet, jax.random.PRNGKey(0), 20, tx)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 32, 64, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 20, (2, 32, 64)).astype(np.int32))

    with fused_train(True):
        step = make_train_step(erfnet, tx, DECODER_WEIGHTS, enc=False,
                               augment=True, compute_dtype=jnp.bfloat16,
                               flat=True, multi_step=2)
        fts = step.flatten(ts0)
        fts, losses = step(fts, (images, images), (labels, labels),
                           jax.random.PRNGKey(1))
        assert losses.shape == (2,)
        assert np.all(np.isfinite(np.asarray(losses)))
        assert int(fts.step) == 2


def test_thrw_contract_rejects_dense_ww():
    """ADVICE r4 #1 guard: thrw > 0 with a DENSE ww (not built by
    stack_taps_w) must fail loudly instead of silently computing a wrong
    merged forward/dww; a stack_taps_w-built ww passes, and tracers are
    exempt (checked only when concrete)."""
    from erfnet_pytorch_tpu.ops.pallas.nb1d_train import _check_thrw_contract

    rng = np.random.RandomState(0)
    p, C, d = 8, 16, 1
    x = jnp.asarray(rng.rand(1, 8, 4, p * C).astype(np.float32))
    wh3 = jnp.asarray(rng.randn(3, C, C).astype(np.float32) * 0.05)
    ww3 = jnp.asarray(rng.randn(3, C, C).astype(np.float32) * 0.05)
    Kh = stack_taps_h(wh3, p)
    Kw, s = stack_taps_w(ww3, p, d)
    bh = jnp.zeros(p * C)
    bw = jnp.zeros(p * C)
    thr = d * C  # du * Cc for the shipped du=1 blocks

    # structured ww: fine (both the checker and the real entry point)
    _check_thrw_contract(Kw, thr)
    fused_pair(x, Kh, bh, Kw, bw, sh=1, sw=s, thrw=thr)

    dense = jnp.asarray(rng.randn(3, p * C, p * C).astype(np.float32))
    with pytest.raises(ValueError, match="stack_taps_w"):
        fused_pair(x, Kh, bh, dense, bw, sh=1, sw=s, thrw=thr)
    # thrw == 0: dense ww is legal (unmerged path)
    fused_pair(x, Kh, bh, dense, bw, sh=1, sw=s, thrw=0)
    # traced weights are exempt — the jitted packed train path passes
    # stack_taps_w-built tracers
    jax.jit(lambda w: fused_pair(x, Kh, bh, w, bw, sh=1, sw=s,
                                 thrw=thr))(Kw)
