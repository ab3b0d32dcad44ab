"""Augment-fold parity: the stem kernel's in-lead-stage translate
(ops/pallas/downsampler.py:downsampler_packed_stats_aug +
ops/augment.co_transform_shifts) must be BIT-EQUAL to the shipped XLA
translate + cast + downsampler_packed_stats pipeline — translate and
dtype casts are pure value copies, so the fold changes scheduling, not
math (reference surface: train/main.py MyCoTransform jitter,
SURVEY.md §2a row 6)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from erfnet_pytorch_tpu.ops.augment import (MAX_SHIFT, apply_shifts,
                                            co_transform,
                                            co_transform_shifts)


def _rand(shape, seed=0, dtype=np.float32):
    return jnp.asarray(np.random.RandomState(seed).rand(*shape)
                       .astype(dtype))


def _rand_labels(shape, seed=1):
    r = np.random.RandomState(seed)
    lab = r.randint(0, 20, shape).astype(np.int32)
    lab[r.rand(*shape) < 0.1] = 255  # raw void
    return jnp.asarray(lab)


@pytest.mark.parametrize("enc", [False, True])
def test_co_transform_shifts_equivalence(enc):
    """co_transform == (apply_shifts on the flipped images, labels) from
    co_transform_shifts, for the same key — identical random stream."""
    images = _rand((8, 16, 32, 3))
    labels = _rand_labels((8, 16, 32))
    rng = jax.random.PRNGKey(7)
    im_ref, lab_ref = co_transform(rng, images, labels, enc=enc,
                                   augment=True)
    im_f, lab_f, shifts = co_transform_shifts(rng, images, labels, enc=enc)
    assert shifts.shape == (8, 2) and shifts.dtype == jnp.float32
    assert np.array_equal(np.asarray(lab_ref), np.asarray(lab_f))
    assert np.array_equal(np.asarray(im_ref),
                          np.asarray(apply_shifts(im_f, shifts)))


def _all_shifts():
    """All (2*MAX_SHIFT+1)^2 (tx, ty) combinations as a (25, 2) batch."""
    ks = range(-MAX_SHIFT, MAX_SHIFT + 1)
    return jnp.asarray([[tx, ty] for tx in ks for ty in ks],
                       jnp.float32)


@pytest.mark.parametrize("out_dtype", [jnp.float32, jnp.bfloat16])
def test_staug_kernel_matches_unfused(out_dtype):
    from erfnet_pytorch_tpu.ops.pallas.downsampler import (
        downsampler_packed_stats, downsampler_packed_stats_aug)

    shifts = _all_shifts()
    B, H, W, pi, cin, cc = shifts.shape[0], 8, 16, 4, 3, 13
    x = _rand((B, H, W, cin), seed=3)
    w = jnp.asarray(np.random.RandomState(4).randn(3, 3, cin, cc)
                    .astype(np.float32) * 0.2)
    b = jnp.asarray(np.random.RandomState(5).randn(cc)
                    .astype(np.float32) * 0.1)

    Xr = x.reshape(B, H, W // pi, pi * cin)
    y, s1, s2 = downsampler_packed_stats_aug(Xr, shifts, w, b, pi=pi,
                                             out_dtype=out_dtype)
    x_ref = apply_shifts(x, shifts).astype(out_dtype)
    y_ref, s1_ref, s2_ref = downsampler_packed_stats(
        x_ref.reshape(B, H, W // pi, pi * cin), w, b, pi=pi)
    assert y.dtype == jnp.dtype(out_dtype)
    assert np.array_equal(np.asarray(y, np.float32),
                          np.asarray(y_ref, np.float32))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s1_ref),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2_ref),
                               rtol=0, atol=1e-5)


def test_staug_weight_grads_match_unfused():
    """dW/db through the aug op == through XLA-translate + the st op
    (same backward kernel on identical augmented maps); the image
    cotangent is documented-zero."""
    from erfnet_pytorch_tpu.ops.pallas.downsampler import (
        downsampler_packed_stats, downsampler_packed_stats_aug)

    shifts = _all_shifts()[::3]
    B, H, W, pi, cin, cc = shifts.shape[0], 8, 16, 4, 3, 13
    x = _rand((B, H, W, cin), seed=8)
    w = jnp.asarray(np.random.RandomState(9).randn(3, 3, cin, cc)
                    .astype(np.float32) * 0.2)
    b = jnp.asarray(np.random.RandomState(10).randn(cc)
                    .astype(np.float32) * 0.1)
    gy = jnp.asarray(np.random.RandomState(11)
                     .randn(B, H // 2, W // pi, (pi // 2) * (cc + cin))
                     .astype(np.float32))
    g1 = jnp.asarray(np.random.RandomState(12)
                     .randn(B, (pi // 2) * (cc + cin)).astype(np.float32))

    def loss_aug(w, b):
        Xr = x.reshape(B, H, W // pi, pi * cin)
        y, s1, s2 = downsampler_packed_stats_aug(
            Xr, shifts, w, b, pi=pi, out_dtype=jnp.float32)
        return (jnp.sum(y * gy) + jnp.sum(s1 * g1)
                + jnp.sum(s2 * (g1 * 0.5)))

    def loss_ref(w, b):
        xs = apply_shifts(x, shifts)
        y, s1, s2 = downsampler_packed_stats(
            xs.reshape(B, H, W // pi, pi * cin), w, b, pi=pi)
        return (jnp.sum(y * gy) + jnp.sum(s1 * g1)
                + jnp.sum(s2 * (g1 * 0.5)))

    ga = jax.grad(loss_aug, argnums=(0, 1))(w, b)
    gr = jax.grad(loss_ref, argnums=(0, 1))(w, b)
    for a, r in zip(ga, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-6, atol=1e-6)


def test_staug_image_cotangent_is_zero():
    from erfnet_pytorch_tpu.ops.pallas.downsampler import (
        downsampler_packed_stats_aug)

    shifts = _all_shifts()[:4]
    B, H, W, pi, cin, cc = 4, 8, 16, 4, 3, 13
    x = _rand((B, H, W, cin), seed=13)
    w = jnp.zeros((3, 3, cin, cc)) + 0.1
    b = jnp.zeros((cc,))

    def loss(xr):
        y, s1, s2 = downsampler_packed_stats_aug(
            xr, shifts, w, b, pi=pi, out_dtype=jnp.float32)
        return jnp.sum(y)

    dx = jax.grad(loss)(x.reshape(B, H, W // pi, pi * cin))
    assert float(jnp.abs(dx).max()) == 0.0


def test_train_step_fold_matches_unfolded():
    """Full fused train step with the aug fold == the same step through a
    model wrapper WITHOUT aug_shift support (XLA co_transform path):
    identical bf16 stem inputs make the whole step deterministic-equal."""
    from erfnet_pytorch_tpu.models import erfnet
    from erfnet_pytorch_tpu.ops.pallas.nb1d_train import fused_train
    from erfnet_pytorch_tpu.training import optim
    from erfnet_pytorch_tpu.training.class_weights import DECODER_WEIGHTS
    from erfnet_pytorch_tpu.training.steps import (create_train_state,
                                                   make_train_step)

    class _NoAugModel:
        init = staticmethod(erfnet.init)

        @staticmethod
        def apply(params, state, x, *, train=False, rng=None,
                  only_encode=False, compute_dtype=None, skip_head=False,
                  keep_packed_feats=False, valid=None):
            return erfnet.apply(params, state, x, train=train, rng=rng,
                                only_encode=only_encode,
                                compute_dtype=compute_dtype,
                                skip_head=skip_head,
                                keep_packed_feats=keep_packed_feats,
                                valid=valid)

    tx = optim.make_adam()
    ts0 = create_train_state(erfnet, jax.random.PRNGKey(0), 20, tx)
    r = np.random.RandomState(0)
    images = jnp.asarray(r.rand(2, 32, 64, 3).astype(np.float32))
    labels = jnp.asarray(r.randint(0, 20, (2, 32, 64)).astype(np.int32))
    key = jax.random.PRNGKey(3)

    with fused_train(True):
        step_fold = make_train_step(erfnet, tx, DECODER_WEIGHTS, enc=False,
                                    augment=True,
                                    compute_dtype=jnp.bfloat16)
        step_ref = make_train_step(_NoAugModel, tx, DECODER_WEIGHTS,
                                   enc=False, augment=True,
                                   compute_dtype=jnp.bfloat16)
        ts_f, loss_f = step_fold(ts0, images, labels, key)
        ts_r, loss_r = step_ref(ts0, images, labels, key)
    assert float(loss_f) == float(loss_r)
    pf, _ = jax.flatten_util.ravel_pytree(ts_f.params)
    pr, _ = jax.flatten_util.ravel_pytree(ts_r.params)
    np.testing.assert_allclose(np.asarray(pf), np.asarray(pr),
                               rtol=0, atol=0)
