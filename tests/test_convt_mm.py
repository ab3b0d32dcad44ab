"""Parity-plane matmul transposed convs vs torch / the XLA conv_transpose."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from erfnet_pytorch_tpu.ops.convt_mm import (build_upsampler_matmul,
                                             apply_upsampler_matmul,
                                             build_head_matmul,
                                             apply_head_matmul)
from erfnet_pytorch_tpu.ops.batchnorm import batch_norm


def _rand(*s, seed=0):
    return np.random.RandomState(seed).randn(*s).astype(np.float32)


def test_upsampler_matmul_matches_torch():
    cin, cout, H, W = 8, 6, 10, 14
    x = _rand(2, cin, H, W)
    wt = _rand(cin, cout, 3, 3, seed=1)   # torch (I, O, kh, kw)
    b = _rand(cout, seed=2)
    ref = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(wt),
                             torch.from_numpy(b), stride=2, padding=1,
                             output_padding=1).numpy()
    # our HWIO forward-conv storage: spatial flip + (I,O) order
    w_hwio = jnp.asarray(wt[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy())
    Wcat, bias = build_upsampler_matmul(w_hwio, jnp.asarray(b))
    got = apply_upsampler_matmul(
        jnp.asarray(x.transpose(0, 2, 3, 1)), Wcat, bias, relu=False)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape == (2, cout, 2 * H, 2 * W)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_upsampler_matmul_with_folded_bn_and_relu():
    cin, cout = 8, 6
    x = jnp.asarray(_rand(1, 12, 16, cin, seed=3))
    w = jnp.asarray(_rand(3, 3, cin, cout, seed=4))
    b = jnp.asarray(_rand(cout, seed=5))
    bnp = {"scale": jnp.asarray(_rand(cout, seed=6)),
           "bias": jnp.asarray(_rand(cout, seed=7))}
    bns = {"mean": jnp.asarray(_rand(cout, seed=8)),
           "var": jnp.asarray(np.abs(_rand(cout, seed=9)) + 0.5)}
    from erfnet_pytorch_tpu.ops.conv import conv_transpose2d
    y = conv_transpose2d(x, w, b, stride=2, padding=1, output_padding=1)
    y, _ = batch_norm(y, bnp, bns, train=False)
    ref = jax.nn.relu(y)
    Wcat, bias = build_upsampler_matmul(w, b, bnp, bns)
    got = apply_upsampler_matmul(x, Wcat, bias, relu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_head_matmul_matches_torch():
    cin, cout, H, W = 16, 20, 8, 12
    x = _rand(2, cin, H, W, seed=10)
    wt = _rand(cin, cout, 2, 2, seed=11)
    b = _rand(cout, seed=12)
    ref = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(wt),
                             torch.from_numpy(b), stride=2).numpy()
    w_hwio = jnp.asarray(wt[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy())
    W_, bias = build_head_matmul(w_hwio, jnp.asarray(b))
    got = apply_head_matmul(jnp.asarray(x.transpose(0, 2, 3, 1)), W_, bias)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
