"""Space-to-depth packed nb1d vs the unpacked XLA reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from erfnet_pytorch_tpu.models.erfnet import (init_non_bottleneck_1d,
                                              apply_non_bottleneck_1d)
from erfnet_pytorch_tpu.ops.pallas.nb1d import fuse_nb1d_params
from erfnet_pytorch_tpu.ops.packed import nb1d_packed, pack_nb1d_params


@pytest.mark.parametrize("c,p,d", [
    (16, 8, 1),    # decoder nb1d(16)
    (64, 2, 1),    # decoder/encoder nb1d(64)
    (16, 8, 2),    # dilation smaller than pack
    (16, 8, 8),    # dilation == pack
    (16, 8, 16),   # dilation > pack
    (16, 4, 1),    # partial pack
])
def test_packed_matches_unpacked(c, p, d):
    params, state = init_non_bottleneck_1d(jax.random.PRNGKey(c + p + d), c)
    # non-trivial BN stats
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    state = {
        "bn1": {"mean": jax.random.normal(ks[0], (c,)) * 0.1,
                "var": jax.random.uniform(ks[1], (c,), minval=0.5,
                                          maxval=1.5)},
        "bn2": {"mean": jax.random.normal(ks[2], (c,)) * 0.1,
                "var": jax.random.uniform(ks[3], (c,), minval=0.5,
                                          maxval=1.5)},
    }
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 24, 40, c))
    ref, _ = apply_non_bottleneck_1d(params, state, x, dilated=d,
                                     dropprob=0.0, train=False)
    packed = pack_nb1d_params(fuse_nb1d_params(params, state), p, d)
    got = nb1d_packed(x, packed)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


def test_packed_p1_is_identity_packing():
    c = 16
    params, state = init_non_bottleneck_1d(jax.random.PRNGKey(0), c)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 24, c))
    ref, _ = apply_non_bottleneck_1d(params, state, x, dilated=1,
                                     dropprob=0.0, train=False)
    packed = pack_nb1d_params(fuse_nb1d_params(params, state), 1, 1)
    got = nb1d_packed(x, packed)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("c,p,d", [(16, 8, 1), (16, 8, 16), (64, 2, 4)])
def test_packed_pallas_kernel_matches(c, p, d):
    from erfnet_pytorch_tpu.ops.packed import pack_nb1d_for_pallas
    from erfnet_pytorch_tpu.ops.pallas.nb1d import nb1d_infer_packed

    params, state = init_non_bottleneck_1d(jax.random.PRNGKey(0), c)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32, c))
    ref, _ = apply_non_bottleneck_1d(params, state, x, dilated=d,
                                     dropprob=0.0, train=False)
    weights, s2, s4 = pack_nb1d_for_pallas(
        fuse_nb1d_params(params, state), p, d)
    got = nb1d_infer_packed(x, weights, p=p, dilated=d, s2=s2, s4=s4,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


def test_downsampler_matmul_matches_conv():
    from erfnet_pytorch_tpu.ops.packed import (build_downsampler_matmul,
                                               downsampler_conv_matmul,
                                               max_pool2x2_packed)
    from erfnet_pytorch_tpu.ops.conv import conv2d, max_pool2d
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 24, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 13).astype(np.float32))
    b = jnp.asarray(rng.randn(13).astype(np.float32))
    ref = conv2d(x, w, b, stride=2, padding=1)
    got = downsampler_conv_matmul(x, build_downsampler_matmul(w), b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(max_pool2x2_packed(x)),
                               np.asarray(max_pool2d(x, 2, 2)),
                               rtol=0, atol=0)
    # differentiable
    g = jax.grad(lambda w: downsampler_conv_matmul(
        x, build_downsampler_matmul(w), b).sum())(w)
    assert np.isfinite(np.asarray(g)).all() and float(np.abs(g).sum()) > 0


def test_nb1d_train_packed_matches_unpacked():
    """Packed train block == unpacked train block: outputs, BN stat
    updates, dropout mask (same rng), gradients."""
    from erfnet_pytorch_tpu.ops.packed import nb1d_train_packed
    from erfnet_pytorch_tpu.models import erfnet as E

    for c, p in ((16, 8), (64, 2)):
        params, state = init_non_bottleneck_1d(jax.random.PRNGKey(c), c)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32, c))
        rng = jax.random.PRNGKey(2)

        # unpacked reference: force the plain path by calling the inner ops
        # with train=True via a channel count not in the pack table
        def unpacked(params, state, x):
            from erfnet_pytorch_tpu.ops.conv import conv_3tap_mm
            from erfnet_pytorch_tpu.ops.batchnorm import batch_norm
            from erfnet_pytorch_tpu.ops.dropout import dropout2d
            y = jax.nn.relu(conv_3tap_mm(x, params["conv3x1_1"]["w"],
                                         params["conv3x1_1"]["b"], axis=1))
            y = conv_3tap_mm(y, params["conv1x3_1"]["w"],
                             params["conv1x3_1"]["b"], axis=2)
            y, bn1s = batch_norm(y, params["bn1"], state["bn1"], train=True,
                                 eps=1e-3)
            y = jax.nn.relu(y)
            y = jax.nn.relu(conv_3tap_mm(y, params["conv3x1_2"]["w"],
                                         params["conv3x1_2"]["b"], axis=1,
                                         dilation=2))
            y = conv_3tap_mm(y, params["conv1x3_2"]["w"],
                             params["conv1x3_2"]["b"], axis=2, dilation=2)
            y, bn2s = batch_norm(y, params["bn2"], state["bn2"], train=True,
                                 eps=1e-3)
            y = dropout2d(rng, y, 0.3, train=True)
            return jax.nn.relu(y + x), {"bn1": bn1s, "bn2": bn2s}

        ref, ref_state = unpacked(params, state, x)
        got, got_state = nb1d_train_packed(params, state, x, p=p, dilated=2,
                                           dropprob=0.3, train=True, rng=rng)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
        for bn in ("bn1", "bn2"):
            for k in ("mean", "var"):
                np.testing.assert_allclose(
                    np.asarray(got_state[bn][k]),
                    np.asarray(ref_state[bn][k]), rtol=1e-4, atol=1e-5)

        g1 = jax.grad(lambda pp: unpacked(pp, state, x)[0].sum())(params)
        g2 = jax.grad(lambda pp: nb1d_train_packed(
            pp, state, x, p=p, dilated=2, dropprob=0.3, train=True,
            rng=rng)[0].sum())(params)
        for key in ("conv3x1_1", "conv1x3_2"):
            np.testing.assert_allclose(np.asarray(g2[key]["w"]),
                                       np.asarray(g1[key]["w"]),
                                       rtol=5e-3, atol=5e-3)
