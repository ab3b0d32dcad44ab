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


def _translate_one(img, lab, tx, ty):
    """Shift one (H, W, C) image / (H, W) label by (tx, ty) in [-2, 2],
    filling image with 0 and label with 255."""
    m = MAX_SHIFT
    ip = jnp.pad(img, ((m, m), (m, m), (0, 0)))
    lp = jnp.pad(lab, ((m, m), (m, m)), constant_values=255)
    # shift content by (+ty, +tx): output(y, x) = input(y - ty, x - tx)
    oy = m - ty
    ox = m - tx
    img2 = jax.lax.dynamic_slice(ip, (oy, ox, 0), img.shape)
    lab2 = jax.lax.dynamic_slice(lp, (oy, ox), lab.shape)
    return img2, lab2


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
        images, labels = jax.vmap(_translate_one)(images, labels,
                                                  t[:, 0], t[:, 1])
    if enc:
        labels = labels[:, 4::8, 4::8]
    labels = jnp.where(labels == 255, 19, labels)
    return images, labels


def downsample_label_x8(labels):
    """Nearest x8 label downsample matching PIL Image.NEAREST sampling
    (centers at 8i+4) — used by the eval path for encoder-stage IoU."""
    return labels[..., 4::8, 4::8]
