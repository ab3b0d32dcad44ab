"""Class-weighted segmentation loss.

Reference: ``train/main.py:CrossEntropyLoss2d`` = NLLLoss2d(weight) over
log_softmax(outputs, dim=1) with per-class weights and weight[19] == 0
masking the void class (SURVEY.md §2a rows 7-8).

torch weighted-mean semantics: loss = sum_i w[t_i] * nll_i / sum_i w[t_i].
Edge case (verified vs torch-cpu at survey time): an all-void crop makes
torch return NaN (0/0); here the denominator is guarded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weighted_log_softmax_nll(logits, targets, class_weights):
    """logits (B,H,W,C) float; targets (B,H,W) int; class_weights (C,).

    Gather-free formulation: XLA lowers per-pixel gathers
    (take_along_axis / weights[targets]) to scalar-indexed loads that crawl
    on the TPU VPU (same pathology as variadic argmax — see ops/argmax.py).
    One-hot selects via an iota comparison vectorize fully:

        nll_i = logsumexp(logits_i) - logits_i[t_i]
        loss  = sum(w[t_i] * nll_i) / sum(w[t_i])
    """
    logits = logits.astype(jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    lse = m[..., 0] + jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1))
    iota = jax.lax.broadcasted_iota(jnp.int32, logits.shape,
                                    logits.ndim - 1)
    onehot = iota == targets[..., None].astype(jnp.int32)
    logit_t = jnp.sum(jnp.where(onehot, logits, 0.0), axis=-1)
    w = jnp.sum(jnp.where(onehot, class_weights.astype(jnp.float32), 0.0),
                axis=-1)
    num = jnp.sum(w * (lse - logit_t))
    den = jnp.sum(w)
    return num / jnp.maximum(den, 1e-12)


def cross_entropy(logits, targets, valid=None):
    """Plain mean CE for the ImageNet classifier head. logits (B, C).
    Gather-free (one-hot select), like the segmentation loss.  ``valid``
    ((B,) 0/1 f32, optional) excludes DP batch-pad rows from the mean —
    ImageNet labels have no void class to zero-weight, so padded batches
    MUST mask here."""
    logits = logits.astype(jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    lse = m[..., 0] + jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1))
    iota = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logit_t = jnp.sum(jnp.where(iota == targets[:, None].astype(jnp.int32),
                                logits, 0.0), axis=-1)
    if valid is None:
        return jnp.mean(lse - logit_t)
    v = valid.astype(jnp.float32)
    return jnp.sum((lse - logit_t) * v) / jnp.maximum(jnp.sum(v), 1.0)
