"""Fused Pallas non_bottleneck_1d kernel vs the XLA reference path
(interpret mode on CPU; the same kernel compiles on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from erfnet_pytorch_tpu.models.erfnet import (init_non_bottleneck_1d,
                                              apply_non_bottleneck_1d)
from erfnet_pytorch_tpu.ops.pallas.nb1d import (fuse_nb1d_params, nb1d_infer,
                                                nb1d_supported,
                                                make_encoder_layer_fn)


def _block(c=128, seed=0):
    params, state = init_non_bottleneck_1d(jax.random.PRNGKey(seed), c)
    # randomize BN stats so folding is non-trivial
    k = jax.random.PRNGKey(seed + 1)
    ks = jax.random.split(k, 4)
    state = {
        "bn1": {"mean": jax.random.normal(ks[0], (c,)) * 0.1,
                "var": jax.random.uniform(ks[1], (c,), minval=0.5,
                                          maxval=1.5)},
        "bn2": {"mean": jax.random.normal(ks[2], (c,)) * 0.1,
                "var": jax.random.uniform(ks[3], (c,), minval=0.5,
                                          maxval=1.5)},
    }
    return params, state


@pytest.mark.parametrize("dilated", [1, 2, 8, 16])
def test_fused_kernel_matches_xla(dilated):
    c, h, w = 128, 32, 64
    params, state = _block(c)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, h, w, c))

    ref, _ = apply_non_bottleneck_1d(params, state, x, dilated=dilated,
                                     dropprob=0.0, train=False)
    fused = fuse_nb1d_params(params, state)
    got = nb1d_infer(x, fused, dilated=dilated, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_supported_gate():
    assert nb1d_supported((1, 64, 128, 128))
    assert not nb1d_supported((1, 64, 128, 64))      # C not 128-aligned
    assert not nb1d_supported((1, 512, 1024, 128))   # too big for VMEM plan


def test_encoder_layer_fn_full_encoder_parity():
    """Whole encoder with fused kernels == plain XLA encoder (inference)."""
    from erfnet_pytorch_tpu.models import erfnet

    params, state = erfnet.init(jax.random.PRNGKey(0), 20)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 128, 3))

    ref, _ = erfnet.apply(params, state, x, train=False, only_encode=True)
    layer_fn = make_encoder_layer_fn(params["encoder"], state["encoder"],
                                     interpret=True)
    got, _ = erfnet.apply(params, state, x, train=False, only_encode=True,
                          encoder_layer_fn=layer_fn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


def test_nb1d_chunked_matches_whole_map():
    """H-chunked execution (halo = 1 + dilated, corrupted rows discarded)
    must be bit-identical to the whole-map kernel."""
    import jax
    import jax.numpy as jnp
    from erfnet_pytorch_tpu.ops.pallas.nb1d import (
        fuse_nb1d_params, nb1d_infer, nb1d_infer_chunked)
    from erfnet_pytorch_tpu.models.erfnet import init_non_bottleneck_1d

    for d in (1, 4):
        params, state = init_non_bottleneck_1d(jax.random.PRNGKey(d), 128)
        fused = fuse_nb1d_params(params, state)
        x = jax.random.normal(jax.random.PRNGKey(d + 10), (2, 48, 16, 128))
        ref = nb1d_infer(x, fused, dilated=d, interpret=True)
        # max_elems forces ~3 chunks at this shape
        out = nb1d_infer_chunked(x, fused, dilated=d, interpret=True,
                                 max_elems=(16 + 2 * (1 + d) + 4)
                                 * 16 * 128)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_nb1d_packed_chunked_matches_whole_map():
    import jax
    import jax.numpy as jnp
    from erfnet_pytorch_tpu.ops.pallas.nb1d import (
        fuse_nb1d_params, nb1d_infer_packed, nb1d_infer_packed_chunked)
    from erfnet_pytorch_tpu.ops.packed import pack_nb1d_for_pallas
    from erfnet_pytorch_tpu.models.erfnet import init_non_bottleneck_1d

    p, d = 2, 1
    params, state = init_non_bottleneck_1d(jax.random.PRNGKey(0), 64)
    fused = fuse_nb1d_params(params, state)
    weights, s2, s4 = pack_nb1d_for_pallas(fused, p, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 40, 32, 64))
    ref = nb1d_infer_packed(x, weights, p=p, dilated=d, s2=s2, s4=s4,
                            interpret=True)
    out = nb1d_infer_packed_chunked(x, weights, p=p, dilated=d, s2=s2,
                                    s4=s4, interpret=True,
                                    max_elems=(8 + 2 * (1 + d) + 6)
                                    * 32 * 64)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_nb1d_blocked_matches_whole_map():
    """The single-call h-blocked halo kernel (grid (B, H/R), clamped
    overlapping DMA windows) must be bit-identical to the whole-map
    kernel — same correctness argument as the chunked form, but one
    pallas_call instead of per-window calls + XLA slices/concat."""
    import jax
    from erfnet_pytorch_tpu.ops.pallas.nb1d import (
        fuse_nb1d_params, nb1d_infer, nb1d_infer_blocked, _blocked_rows)

    from erfnet_pytorch_tpu.models.erfnet import init_non_bottleneck_1d

    for d in (1, 4, 16):
        params, state = init_non_bottleneck_1d(jax.random.PRNGKey(d), 128)
        fused = fuse_nb1d_params(params, state)
        x = jax.random.normal(jax.random.PRNGKey(d + 10), (2, 48, 16, 128))
        max_elems = (16 + 2 * (1 + d) + 8) * 16 * 128
        R = _blocked_rows(48, 16 * 128, 1 + d, max_elems)
        assert R and 48 % R == 0 and R < 48  # really multi-block
        ref = nb1d_infer(x, fused, dilated=d, interpret=True)
        out = nb1d_infer_blocked(x, fused, dilated=d, interpret=True,
                                 max_elems=max_elems)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_nb1d_packed_blocked_matches_whole_map():
    import jax
    from erfnet_pytorch_tpu.ops.pallas.nb1d import (
        fuse_nb1d_params, nb1d_infer_packed, nb1d_infer_packed_blocked)
    from erfnet_pytorch_tpu.ops.packed import pack_nb1d_for_pallas
    from erfnet_pytorch_tpu.models.erfnet import init_non_bottleneck_1d

    p, d = 2, 1
    params, state = init_non_bottleneck_1d(jax.random.PRNGKey(0), 64)
    fused = fuse_nb1d_params(params, state)
    weights, s2, s4 = pack_nb1d_for_pallas(fused, p, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 32, 64))
    ref = nb1d_infer_packed(x, weights, p=p, dilated=d, s2=s2, s4=s4,
                            interpret=True)
    out = nb1d_infer_packed_blocked(x, weights, p=p, dilated=d, s2=s2,
                                    s4=s4, interpret=True,
                                    max_elems=(8 + 2 * (1 + d) + 6)
                                    * 16 * 128)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("c,p", [(64, 2), (16, 8)])
def test_nb1d_packed_side_merge_matches_unmerged(c, p):
    """Merged-side-matmul W-convs (_taps_w thr>0: one lane-iota select +
    one matmul against w0+w2 replaces both side matmuls — valid because
    the packed side matrices' K-row blocks are disjoint for 2*du <= p)
    must equal the 3-matmul form EXACTLY: the same f32 products occur,
    zero rows contribute exact zeros."""
    from erfnet_pytorch_tpu.ops.pallas import nb1d as N
    from erfnet_pytorch_tpu.ops.packed import pack_nb1d_for_pallas
    from erfnet_pytorch_tpu.models.erfnet import init_non_bottleneck_1d

    params, state = _block(c, seed=3)
    fused = N.fuse_nb1d_params(params, state)
    weights, s2, s4 = pack_nb1d_for_pallas(fused, p, 1)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 8 * p, c))
    X = x.reshape(2, 16, 8, p * c)
    thrs = N._merge_thrs(p, c, 1)
    assert thrs == (c, c)
    # a conv whose dilation crosses more than half the packed slots can't
    # merge (side K-rows overlap): the gate must refuse for conv4 while
    # conv2 (always du=1) stays merged
    assert N._merge_thrs(p, c, p) == (c, 0)
    base = N._nb1d_call(X, weights, shifts=(1, s2, 1, s4), interpret=True,
                        thrs=(0, 0))
    merged = N._nb1d_call(X, weights, shifts=(1, s2, 1, s4),
                          interpret=True, thrs=thrs)
    np.testing.assert_array_equal(np.asarray(merged), np.asarray(base))


def test_nb1d_stack_infer_packed_matches_blockwise():
    """One packed multi-block kernel == the per-block packed kernels
    (exact: same weights, same per-block dtype casts)."""
    import jax
    import jax.numpy as jnp
    from erfnet_pytorch_tpu.ops.pallas.nb1d import (
        fuse_nb1d_params, nb1d_infer_packed, nb1d_stack_infer_packed,
        stack_nb1d_params)
    from erfnet_pytorch_tpu.ops.packed import pack_nb1d_for_pallas
    from erfnet_pytorch_tpu.models.erfnet import init_non_bottleneck_1d

    p = 2
    dils = (1, 1, 2)
    blocks = [init_non_bottleneck_1d(k, 64)
              for k in jax.random.split(jax.random.PRNGKey(0), len(dils))]
    packed = [pack_nb1d_for_pallas(fuse_nb1d_params(bp, bs), p, d)
              for (bp, bs), d in zip(blocks, dils)]
    stacked = stack_nb1d_params([w for w, _, _ in packed])
    shifts = tuple((1, s2, d, s4)
                   for (_, s2, s4), d in zip(packed, dils))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32, 64))
    out = nb1d_stack_infer_packed(x, stacked, p=p, shifts=shifts,
                                  interpret=True)
    ref = x
    for (w, s2, s4), d in zip(packed, dils):
        ref = nb1d_infer_packed(ref, w, p=p, dilated=d, s2=s2, s4=s4,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
