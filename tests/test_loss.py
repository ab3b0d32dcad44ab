"""Loss parity vs torch NLLLoss(weight) over log_softmax — the reference's
CrossEntropyLoss2d (train/main.py)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from erfnet_pytorch_tpu.ops.loss import weighted_log_softmax_nll, cross_entropy
from erfnet_pytorch_tpu.training.class_weights import (ENCODER_WEIGHTS,
                                                       DECODER_WEIGHTS)


def test_weighted_nll_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 8, 12, 20).astype(np.float32)
    targets = rng.randint(0, 20, (2, 8, 12))
    for weights in (ENCODER_WEIGHTS, DECODER_WEIGHTS):
        ref = F.nll_loss(
            F.log_softmax(torch.from_numpy(logits.transpose(0, 3, 1, 2)),
                          dim=1),
            torch.from_numpy(targets).long(),
            weight=torch.from_numpy(weights)).item()
        got = float(weighted_log_softmax_nll(jnp.asarray(logits),
                                             jnp.asarray(targets),
                                             jnp.asarray(weights)))
        assert abs(got - ref) < 1e-5, (got, ref)


def test_weighted_nll_all_void_guarded():
    logits = jnp.asarray(np.random.RandomState(1).randn(1, 4, 4, 20)
                         .astype(np.float32))
    targets = jnp.full((1, 4, 4), 19, jnp.int32)
    loss = weighted_log_softmax_nll(logits, targets,
                                    jnp.asarray(DECODER_WEIGHTS))
    assert float(loss) == 0.0  # torch would return NaN here


def test_weighted_nll_grad_finite():
    logits = jnp.asarray(np.random.RandomState(2).randn(1, 4, 4, 20)
                         .astype(np.float32))
    targets = jnp.asarray(np.random.RandomState(3).randint(0, 20, (1, 4, 4)))
    g = jax.grad(lambda l: weighted_log_softmax_nll(
        l, targets, jnp.asarray(DECODER_WEIGHTS)))(logits)
    assert np.isfinite(np.asarray(g)).all()


def test_cross_entropy_matches_torch():
    rng = np.random.RandomState(4)
    logits = rng.randn(8, 100).astype(np.float32)
    targets = rng.randint(0, 100, (8,))
    ref = F.cross_entropy(torch.from_numpy(logits),
                          torch.from_numpy(targets).long()).item()
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
    assert abs(got - ref) < 1e-5
