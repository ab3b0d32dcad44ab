"""Dropout2d — *channelwise* dropout with torch semantics.

torch.nn.Dropout2d zeroes entire (N, C) feature maps (verified with
torch-cpu at survey time — an easy op to get wrong as elementwise).
NHWC: the mask has shape (B, 1, 1, C) and survivors scale by 1/(1-p).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout2d(rng, x, p, *, train):
    if not train or p == 0.0:
        return x
    keep = 1.0 - p
    mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, x.shape[3]))
    return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)
