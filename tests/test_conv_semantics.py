"""Op-level parity vs torch-cpu: conv, conv_transpose, pooling, BN, dropout2d."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from erfnet_pytorch_tpu.ops import (conv2d, conv_transpose2d, max_pool2d,
                                    avg_pool2d)
from erfnet_pytorch_tpu.ops.batchnorm import (batch_norm, init_batch_norm,
                                              fold_batch_norm)
from erfnet_pytorch_tpu.ops.dropout import dropout2d

RTOL, ATOL = 1e-5, 1e-5


def _rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def to_nhwc(x_nchw):
    return jnp.asarray(x_nchw.transpose(0, 2, 3, 1))


def from_nhwc(y):
    return np.asarray(y).transpose(0, 3, 1, 2)


@pytest.mark.parametrize("stride,padding,dilation,k", [
    (2, 1, 1, (3, 3)),          # DownsamplerBlock conv
    (1, (1, 0), 1, (3, 1)),     # factorized 3x1
    (1, (0, 1), 1, (1, 3)),     # factorized 1x3
    (1, (2, 0), (2, 1), (3, 1)),    # dilated 3x1 d=2
    (1, (0, 16), (1, 16), (1, 3)),  # dilated 1x3 d=16
    (1, 0, 1, (1, 1)),          # 1x1 head
])
def test_conv2d_matches_torch(stride, padding, dilation, k):
    cin, cout = 8, 12
    x = _rand(2, cin, 32, 48)
    w = _rand(cout, cin, *k, seed=1)
    b = _rand(cout, seed=2)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                   torch.from_numpy(b), stride=stride, padding=padding,
                   dilation=dilation).numpy()
    got = from_nhwc(conv2d(to_nhwc(x), jnp.asarray(w.transpose(2, 3, 1, 0)),
                           jnp.asarray(b), stride=stride, padding=padding,
                           dilation=dilation))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("k,stride,padding,op,hw", [
    (3, 2, 1, 1, (16, 24)),   # UpsamplerBlock: exactly doubles
    (2, 2, 0, 0, (64, 128)),  # Decoder.output_conv: exactly doubles
])
def test_conv_transpose2d_matches_torch(k, stride, padding, op, hw):
    cin, cout = 6, 4
    x = _rand(2, cin, *hw)
    w = _rand(cin, cout, k, k, seed=3)
    b = _rand(cout, seed=4)
    ref = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                             torch.from_numpy(b), stride=stride,
                             padding=padding, output_padding=op).numpy()
    # store as forward-conv-equivalent HWIO: flip spatial, (I,O,kh,kw)->HWIO
    w_jax = jnp.asarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy())
    got = from_nhwc(conv_transpose2d(to_nhwc(x), w_jax, jnp.asarray(b),
                                     stride=stride, padding=padding,
                                     output_padding=op))
    assert got.shape == ref.shape
    assert got.shape[-2:] == (hw[0] * 2, hw[1] * 2)
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def test_pools_match_torch():
    x = _rand(2, 5, 28, 28)
    ref = F.max_pool2d(torch.from_numpy(x), 2, 2).numpy()
    got = from_nhwc(max_pool2d(to_nhwc(x), 2, 2))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)
    ref = F.avg_pool2d(torch.from_numpy(x), 14, 1).numpy()
    got = from_nhwc(avg_pool2d(to_nhwc(x), 14, 1))
    np.testing.assert_allclose(got, ref, rtol=RTOL, atol=ATOL)


def test_batch_norm_train_and_eval_match_torch():
    c = 7
    x = _rand(4, c, 10, 12)
    bn = torch.nn.BatchNorm2d(c, eps=1e-3, momentum=0.1)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(_rand(c, seed=5)))
        bn.bias.copy_(torch.from_numpy(_rand(c, seed=6)))
        bn.running_mean.copy_(torch.from_numpy(_rand(c, seed=7)))
        bn.running_var.copy_(torch.from_numpy(np.abs(_rand(c, seed=8)) + 0.5))

    # note: np.array(copy=True) — CPU jax zero-copies numpy views, and torch
    # updates running stats in place during the reference forward below.
    params = {"scale": jnp.asarray(bn.weight.detach().numpy()),
              "bias": jnp.asarray(bn.bias.detach().numpy())}
    state = {"mean": jnp.asarray(np.array(bn.running_mean.numpy())),
             "var": jnp.asarray(np.array(bn.running_var.numpy()))}

    # eval mode first (the torch train-mode forward below updates running
    # stats in place)
    bn.eval()
    ref = bn(torch.from_numpy(x)).detach().numpy()
    got, _ = batch_norm(to_nhwc(x), params, state, train=False)
    np.testing.assert_allclose(from_nhwc(got), ref, rtol=1e-4, atol=1e-4)

    # training mode: output + running-stat update
    bn.train()
    ref = bn(torch.from_numpy(x)).detach().numpy()
    got, new_state = batch_norm(to_nhwc(x), params, state, train=True)
    np.testing.assert_allclose(from_nhwc(got), ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state["mean"]),
                               bn.running_mean.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]),
                               bn.running_var.numpy(), rtol=1e-4, atol=1e-5)


def test_fold_batch_norm_matches_unfused():
    cin, cout = 5, 9
    x = to_nhwc(_rand(2, cin, 8, 8))
    w = jnp.asarray(_rand(3, 1, cin, cout, seed=9))
    b = jnp.asarray(_rand(cout, seed=10))
    bnp = {"scale": jnp.asarray(_rand(cout, seed=11)),
           "bias": jnp.asarray(_rand(cout, seed=12))}
    bns = {"mean": jnp.asarray(_rand(cout, seed=13)),
           "var": jnp.asarray(np.abs(_rand(cout, seed=14)) + 0.5)}
    y_ref, _ = batch_norm(conv2d(x, w, b, padding=(1, 0)), bnp, bns,
                          train=False)
    w2, b2 = fold_batch_norm(w, b, bnp, bns)
    y_fold = conv2d(x, w2, b2, padding=(1, 0))
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


def test_dropout2d_is_channelwise():
    x = jnp.ones((4, 6, 6, 16))
    y = dropout2d(jax.random.PRNGKey(0), x, 0.5, train=True)
    y = np.asarray(y)
    # each (n, c) map is either all zero or all 1/keep
    per_map = y.reshape(4, 36, 16)
    assert set(np.unique(per_map.std(axis=1).round(6))) == {0.0}
    vals = np.unique(y.round(6))
    assert set(vals).issubset({0.0, 2.0})
    # eval mode: identity
    np.testing.assert_array_equal(
        np.asarray(dropout2d(jax.random.PRNGKey(0), x, 0.5, train=False)),
        np.asarray(x))
