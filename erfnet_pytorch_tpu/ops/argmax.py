"""Channel argmax as max + compare + index-min.

XLA's variadic argmax reduce measured ~3.8 ms/img on (B,512,1024,20) f32 on
v5e — 2x the whole network forward.  max/where/min vectorize on the VPU and
keep first-max-index tie semantics identical to jnp.argmax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fast_argmax(logits, axis=-1):
    assert axis in (-1, logits.ndim - 1), "channel-last only"
    c = logits.shape[-1]
    m = jnp.max(logits, axis=-1, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, logits.shape,
                                    logits.ndim - 1)
    return jnp.min(jnp.where(logits >= m, iota, c), axis=-1)
