"""Model-level parity: full ERFNet (and ImageNet variant) vs torch oracle,
eval mode, weights transferred via the importer."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from erfnet_pytorch_tpu.models import erfnet, erfnet_imagenet
from erfnet_pytorch_tpu.utils import torch_import

import torch_oracle as oracle

H, W = 64, 128  # small but exercises every stride/dilation (d=16 fits)


def _x(b=2, h=H, w=W, seed=0):
    return np.random.RandomState(seed).rand(b, 3, h, w).astype(np.float32)


def test_full_net_matches_torch():
    tmodel = oracle.Net(20).eval()
    sd = torch_import.state_dict_from_module(tmodel)
    params, state = torch_import.net_from_state_dict(sd)

    x = _x()
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    got, _ = erfnet.apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)),
                          train=False)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape == (2, 20, H, W)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)
    # argmax parity (what mIoU actually consumes)
    assert (got.argmax(1) == ref.argmax(1)).mean() > 0.999


def test_encoder_only_matches_torch():
    tmodel = oracle.Net(20).eval()
    sd = torch_import.state_dict_from_module(tmodel)
    params, state = torch_import.net_from_state_dict(sd)

    x = _x(seed=1)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x), only_encode=True).numpy()
    got, _ = erfnet.apply(params, state, jnp.asarray(x.transpose(0, 2, 3, 1)),
                          train=False, only_encode=True)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == ref.shape == (2, 20, H // 8, W // 8)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_imagenet_variant_matches_torch():
    tmodel = oracle.ERFNetImageNet(100).eval()
    sd = torch_import.state_dict_from_module(tmodel)
    params, state = torch_import.imagenet_from_state_dict(sd)

    x = _x(b=2, h=224, w=224, seed=2)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    got, _ = erfnet_imagenet.apply(params, state,
                                   jnp.asarray(x.transpose(0, 2, 3, 1)),
                                   train=False)
    assert np.asarray(got).shape == ref.shape == (2, 100)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-3)


def test_shapes_512x1024_contract():
    """Reference shape contract: 512x1024 -> encoder 64x128 -> full res out."""
    params, state = erfnet.init(jax.random.PRNGKey(0), 20)
    x = jnp.zeros((1, 512, 1024, 3))
    enc, _ = erfnet.apply(params, state, x, only_encode=True)
    assert enc.shape == (1, 64, 128, 20)
    out, _ = erfnet.apply(params, state, x)
    assert out.shape == (1, 512, 1024, 20)


def test_train_mode_runs_and_updates_bn_state():
    params, state = erfnet.init(jax.random.PRNGKey(0), 20)
    x = jnp.asarray(_x(b=2).transpose(0, 2, 3, 1))
    y, new_state = erfnet.apply(params, state, x, train=True,
                                rng=jax.random.PRNGKey(1))
    assert y.shape == (2, H, W, 20)
    old = state["encoder"]["initial_block"]["bn"]["mean"]
    new = new_state["encoder"]["initial_block"]["bn"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_stage_handoff_encoder_reuse():
    """Net(C, encoder=pretrained) keeps encoder weights (stage-1 -> stage-2)."""
    ep, es = erfnet.init_encoder(jax.random.PRNGKey(0), 20)
    params, state = erfnet.init(jax.random.PRNGKey(1), 20, encoder=(ep, es))
    w0 = params["encoder"]["initial_block"]["conv"]["w"]
    np.testing.assert_array_equal(np.asarray(w0),
                                  np.asarray(ep["initial_block"]["conv"]["w"]))


def test_train_mode_matmul_paths_match_eval_lax_paths():
    """The training path's matmul-form upsampler/head must equal the
    eval-mode lax conv_transpose (fp32) given identical BN stats."""
    from erfnet_pytorch_tpu.models.erfnet import (init_upsampler,
                                                  apply_upsampler,
                                                  apply_decoder,
                                                  init_decoder)
    import jax.numpy as jnp

    p, s = init_upsampler(jax.random.PRNGKey(0), 128, 64)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 16, 128))
    y_train, _ = apply_upsampler(p, s, x, train=True)
    # eval-mode with the same (initial) stats: BN normalize differs only via
    # batch-vs-running stats; to isolate the conv path, zero-init stats and
    # compare conv outputs directly instead
    from erfnet_pytorch_tpu.ops.conv import conv_transpose2d
    from erfnet_pytorch_tpu.ops.convt_mm import (build_upsampler_matmul,
                                                 apply_upsampler_matmul)
    ref = conv_transpose2d(x, p["conv"]["w"], p["conv"]["b"], stride=2,
                           padding=1, output_padding=1)
    Wcat, bias = build_upsampler_matmul(p["conv"]["w"], p["conv"]["b"])
    got = apply_upsampler_matmul(x, Wcat, bias, relu=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # and gradients flow through the traced builder
    g = jax.grad(lambda w: apply_upsampler_matmul(
        x, *build_upsampler_matmul(w, p["conv"]["b"]), relu=False).sum())(
        p["conv"]["w"])
    assert np.isfinite(np.asarray(g)).all() and float(np.abs(g).sum()) > 0
