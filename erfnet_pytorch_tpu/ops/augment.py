"""On-device joint augmentation — the TPU-native rebuild of the reference's
``train/main.py:MyCoTransform`` (SURVEY.md §2a row 6).

Reference behaviour: after a host-side resize, each (image, label) pair gets
the SAME random horizontal flip and the same random 0-2px translation
(image filled with 0, label filled with 255 -> void), then the encoder stage
additionally downsamples the label x8 (nearest) to the encoder's 1/8 grid.

TPU-first design: the random flip/translate runs *inside the jitted train
step* on already-batched device arrays (vmapped per-sample), so host workers
only decode+resize.  Deviation from the reference (documented): the
reference's PIL expand/crop fills the *trailing* edge with 0 for negative
shifts (an artifact of crop-beyond-bounds); here both label edges fill 255
(void) and both image edges fill 0 — strictly cleaner and within the same
+-2px jitter envelope.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

MAX_SHIFT = 2


def _shift_static(x, k, axis, fill):
    """Static shift by k along axis with constant fill: out[i] = x[i - k]."""
    if k == 0:
        return x
    pad = [(0, 0)] * x.ndim
    sl = [slice(None)] * x.ndim
    if k > 0:
        pad[axis] = (k, 0)
        sl[axis] = slice(None, -k)
    else:
        pad[axis] = (0, -k)
        sl[axis] = slice(-k, None)
    return jnp.pad(x[tuple(sl)], pad, constant_values=fill)


def _sel_batch(x, t, axis, fill):
    """Per-sample static-shift select: out[b] = shift(x[b], t[b]) along
    axis, constant fill.  Gather-free: per-sample dynamic_slice under vmap
    lowers to a slow TPU gather; a select over the 2*MAX_SHIFT+1 static
    shifts vectorizes."""
    out = jnp.zeros_like(x)
    for k in range(-MAX_SHIFT, MAX_SHIFT + 1):
        mask = (t == k).reshape((-1,) + (1,) * (x.ndim - 1))
        out = jnp.where(mask, _shift_static(x, k, axis, fill), out)
    return out


def _translate_batch(img, lab, tx, ty):
    """Shift (B, H, W, C) images / (B, H, W) labels by per-sample
    (tx, ty) in [-MAX_SHIFT, MAX_SHIFT], filling image 0 / label 255."""
    img = _sel_batch(_sel_batch(img, ty, 1, 0.0), tx, 2, 0.0)
    lab = _sel_batch(_sel_batch(lab, ty, 1, 255), tx, 2, 255)
    return img, lab


def apply_shifts(images, shifts):
    """XLA fallback for the in-kernel image translate: shift (B, H, W, C)
    images by per-sample ``shifts`` (B, 2) float (tx, ty) from
    :func:`co_transform_shifts`, filling 0 — exactly the image half of
    ``_translate_batch``."""
    tx = shifts[:, 0].astype(jnp.int32)
    ty = shifts[:, 1].astype(jnp.int32)
    return _sel_batch(_sel_batch(images, ty, 1, 0.0), tx, 2, 0.0)


@partial(jax.jit, static_argnames=("enc", "augment"))
def co_transform(rng, images, labels, *, enc=False, augment=True):
    """Joint batched augmentation.

    images: (B, H, W, 3) float in [0,1]; labels: (B, H, W) int32 with raw
    255-void. Returns (images, labels) with labels Relabel(255 -> 19) and,
    when enc=True, labels nearest-downsampled x8 (PIL-compatible sampling at
    8i+4, verified in tests).
    """
    if augment:
        kf, kt = jax.random.split(rng)
        flip = jax.random.bernoulli(kf, 0.5, (images.shape[0],))
        images = jnp.where(flip[:, None, None, None],
                           images[:, :, ::-1, :], images)
        labels = jnp.where(flip[:, None, None], labels[:, :, ::-1], labels)
        t = jax.random.randint(kt, (images.shape[0], 2), -MAX_SHIFT,
                               MAX_SHIFT + 1)
        images, labels = _translate_batch(images, labels, t[:, 0], t[:, 1])
    if enc:
        labels = labels[:, 4::8, 4::8]
    labels = jnp.where(labels == 255, 19, labels)
    return images, labels


@partial(jax.jit, static_argnames=("enc",))
def co_transform_shifts(rng, images, labels, *, enc=False):
    """:func:`co_transform` with the IMAGE translate returned unapplied.

    Same random stream as ``co_transform`` (identical key splits and
    draws): applies the joint flip to both tensors and the full
    translate + Relabel (+ enc x8 downsample) to the labels, but returns
    the per-sample image shifts as a (B, 2) float32 (tx, ty) so the first
    downsampler kernel can apply them in its lead stage
    (ops/pallas/downsampler.py: downsampler_packed_stats_aug) — the
    full-map XLA translate selects were ~2 HBM passes over the f32 batch.
    The folded result is bit-equal to co_transform + the unfused stem:
    translate and dtype casts are pure value copies, so they commute.

    Returns (images_flipped, labels_done, shifts).
    """
    kf, kt = jax.random.split(rng)
    flip = jax.random.bernoulli(kf, 0.5, (images.shape[0],))
    images = jnp.where(flip[:, None, None, None],
                       images[:, :, ::-1, :], images)
    labels = jnp.where(flip[:, None, None], labels[:, :, ::-1], labels)
    t = jax.random.randint(kt, (images.shape[0], 2), -MAX_SHIFT,
                           MAX_SHIFT + 1)
    labels = _sel_batch(_sel_batch(labels, t[:, 1], 1, 255), t[:, 0], 2,
                        255)
    if enc:
        labels = labels[:, 4::8, 4::8]
    labels = jnp.where(labels == 255, 19, labels)
    return images, labels, t.astype(jnp.float32)


def downsample_label_x8(labels):
    """Nearest x8 label downsample matching PIL Image.NEAREST sampling
    (centers at 8i+4) — used by the eval path for encoder-stage IoU."""
    return labels[..., 4::8, 4::8]
