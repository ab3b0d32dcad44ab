"""Optimizers + LR schedule with the reference recipe's exact semantics.

Reference (train/main.py — SURVEY.md §2a row 9): Adam(5e-4, betas=(0.9,
0.999), eps=1e-8, weight_decay=1e-4) with per-epoch poly decay
``lambda1 = (1 - epoch/num_epochs) ** 0.9`` via LambdaLR.
imagenet/main.py (row 18): SGD(momentum=0.9, wd=1e-4), lr x0.1 every 30.

torch coupling detail: Adam's ``weight_decay`` adds wd*p to the *gradient*
before the moment updates (L2, not decoupled AdamW) — hence
``add_decayed_weights`` BEFORE ``scale_by_adam`` in the chain, applied to
every parameter including BN affine (torch default).

The learning rate is an injected hyperparameter (optax.inject_hyperparams),
so per-epoch LR changes mutate one scalar in the optimizer state instead of
retracing the jitted train step.
"""

from __future__ import annotations

import optax


def poly_lr(base_lr: float, epoch: int, num_epochs: int, power: float = 0.9):
    """LambdaLR(lambda1) value for an epoch: base * (1 - e/E)^0.9."""
    return base_lr * (1.0 - epoch / num_epochs) ** power


def step_lr(base_lr: float, epoch: int, step_size: int = 30,
            gamma: float = 0.1):
    """imagenet adjust_learning_rate: base * 0.1^(epoch // 30)."""
    return base_lr * gamma ** (epoch // step_size)


def make_adam(base_lr: float = 5e-4, weight_decay: float = 1e-4,
              b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    def tx(learning_rate):
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
            optax.scale_by_learning_rate(learning_rate),  # = scale(-lr)
        )
    return optax.inject_hyperparams(tx)(learning_rate=base_lr)


def make_sgd(base_lr: float = 0.1, momentum: float = 0.9,
             weight_decay: float = 1e-4):
    def tx(learning_rate):
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.trace(decay=momentum, nesterov=False),
            optax.scale_by_learning_rate(learning_rate),
        )
    return optax.inject_hyperparams(tx)(learning_rate=base_lr)


def set_learning_rate(opt_state, lr: float):
    """Functionally update the injected learning rate in an optimizer state."""
    opt_state.hyperparams["learning_rate"] = (
        opt_state.hyperparams["learning_rate"] * 0 + lr)
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])
