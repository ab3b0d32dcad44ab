"""ERFNet ImageNet classifier variant — parity with the reference's
``imagenet/erfnet_imagenet.py`` (SURVEY.md §2a row 2).

Structure: Features(encoder + MaxPool2d(2,2) + AvgPool2d(14,1)) -> flatten
-> Linear(128, num_classes).  The encoder reuses the segmentation blocks but
with dropout 0.1 everywhere and *no* prediction head.  Head math at 224x224:
encoder 224 -> 28, extra maxpool -> 14, avgpool(14) -> 1 (verified vs
torch-cpu at survey time).

The ``features.encoder`` attribute path is load-bearing in the reference
(stage-2 pretrained-encoder handoff) — mirrored here as the pytree path
``params["features"]["encoder"]`` with the same inner layout as
``models.erfnet`` encoders, so stage handoff is a plain subtree copy.
"""

from __future__ import annotations

from typing import List, Tuple

import math


import jax
import jax.numpy as jnp

from ..ops.conv import max_pool2d, avg_pool2d
from .erfnet import (init_downsampler, apply_downsampler,
                     init_non_bottleneck_1d, apply_non_bottleneck_1d,
                     _init_layers)

# Same topology as the segmentation encoder, dropout 0.1 throughout.
IMAGENET_ENCODER_LAYER_SPECS: List[Tuple[str, tuple]] = (
    [("down", (16, 64))]
    + [("nb1d", (64, 0.1, 1))] * 5
    + [("down", (64, 128))]
    + [("nb1d", (128, 0.1, d)) for _ in range(2) for d in (2, 4, 8, 16)]
)


def init_encoder(key):
    k0, k1 = jax.random.split(key)
    ip, istate = init_downsampler(k0, 3, 16)
    lp, lstate = _init_layers(k1, IMAGENET_ENCODER_LAYER_SPECS)
    return ({"initial_block": ip, "layers": lp},
            {"initial_block": istate, "layers": lstate})


def apply_encoder(params, state, x, *, train=False, rng=None,
                  compute_dtype=None, valid=None):
    y, is_ = apply_downsampler(params["initial_block"],
                               state["initial_block"], x, train=train,
                               compute_dtype=compute_dtype, valid=valid)
    new_layers = []
    for i, (kind, args) in enumerate(IMAGENET_ENCODER_LAYER_SPECS):
        p, s = params["layers"][i], state["layers"][i]
        if kind == "down":
            y, ns = apply_downsampler(p, s, y, train=train,
                                      compute_dtype=compute_dtype,
                                      valid=valid)
        else:
            c, drop, dil = args
            r = jax.random.fold_in(rng, i) if (rng is not None) else None
            y, ns = apply_non_bottleneck_1d(p, s, y, dilated=dil,
                                            dropprob=drop, train=train,
                                            rng=r, compute_dtype=compute_dtype,
                                            valid=valid)
        new_layers.append(ns)
    return y, {"initial_block": is_, "layers": new_layers}


def init(key, num_classes=1000):
    ke, kl = jax.random.split(key)
    ep, es = init_encoder(ke)
    # torch Linear default init: U(+-1/sqrt(fan_in)), fan_in = 128.
    bound = 1.0 / math.sqrt(128)
    kw, kb = jax.random.split(kl)
    linear = {
        "w": jax.random.uniform(kw, (128, num_classes), jnp.float32,
                                minval=-bound, maxval=bound),
        "b": jax.random.uniform(kb, (num_classes,), jnp.float32,
                                minval=-bound, maxval=bound),
    }
    params = {"features": {"encoder": ep}, "classifier": {"linear": linear}}
    return params, {"features": {"encoder": es}}


def apply(params, state, x, *, train=False, rng=None, compute_dtype=None,
          valid=None):
    """x: (B, 224, 224, 3) -> logits (B, num_classes).  valid: optional
    (B,) 0/1 mask excluding DP batch-pad rows from the BN batch
    statistics (models/erfnet.py:apply has the full story)."""
    y, es = apply_encoder(params["features"]["encoder"],
                          state["features"]["encoder"], x, train=train,
                          rng=rng, compute_dtype=compute_dtype, valid=valid)
    y = max_pool2d(y, 2, 2)           # 28 -> 14
    y = avg_pool2d(y, 14, 1)          # 14 -> 1
    y = y.reshape(y.shape[0], -1)     # (B, 128)
    lin = params["classifier"]["linear"]
    y = y.astype(jnp.float32) @ lin["w"].astype(jnp.float32) + lin["b"]
    return y, {"features": {"encoder": es}}
