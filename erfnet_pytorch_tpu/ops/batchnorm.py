"""BatchNorm with torch.nn.BatchNorm2d semantics (eps=1e-3 in ERFNet blocks,
momentum=0.1), NHWC.

TPU-native notes:
  * Under ``jit`` with the batch axis sharded by NamedSharding, the
    ``jnp.mean`` over (N, H, W) below reduces over the *global* batch — XLA
    inserts the ICI all-reduce automatically.  That gives cross-replica BN
    (the DataParallel-equivalent contract of SURVEY.md §2b) with zero extra
    code.
  * ``fold_batch_norm`` folds inference-mode BN into a preceding conv's
    weights/bias so the fused Pallas kernels see plain affine epilogues.

Torch parity details (verified against torch-cpu in tests):
  * normalization in training mode uses the *biased* batch variance;
  * running_var is updated with the *unbiased* variance;
  * running = (1 - momentum) * running + momentum * batch_stat.
"""

from __future__ import annotations

import jax.numpy as jnp


def init_batch_norm(c, dtype=jnp.float32):
    params = {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}
    state = {"mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}
    return params, state


def batch_norm_coeffs(x, params, state, *, train, eps=1e-3, momentum=0.1,
                      valid=None):
    """The affine form of batch_norm WITHOUT applying it: returns
    ((a, b) f32 (C,), new_state) with y == x*a + b.  Lets a following
    fused kernel apply the affine in VMEM (the full-map multiply-add and
    its backward otherwise round-trip HBM per block).  ``valid``
    ((B,) 0/1 f32, optional) excludes DP batch-pad rows from the training
    statistics EXACTLY (and, through autodiff of the masked sums, from
    every gradient)."""
    scale = params["scale"].astype(jnp.float32)
    bias = params["bias"].astype(jnp.float32)
    if train:
        # f32-accumulated reductions WITHOUT materializing an f32 copy of x
        # (keeps bf16 activations bf16 on the HBM path)
        if valid is None:
            n = x.shape[0] * x.shape[1] * x.shape[2]
            xs = x
        else:
            v = valid.astype(jnp.float32)
            n = v.sum() * (x.shape[1] * x.shape[2])
            # 0/1 mask: (v*x)^2 == v*x^2, so one masked view serves both
            xs = x * v[:, None, None, None].astype(x.dtype)
        mean = jnp.sum(xs, axis=(0, 1, 2), dtype=jnp.float32) / n
        var = jnp.sum(jnp.square(xs.astype(jnp.float32)), axis=(0, 1, 2),
                      dtype=jnp.float32) / n - jnp.square(mean)
        unbiased = var * (n / jnp.maximum(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean = state["mean"].astype(jnp.float32)
        var = state["var"].astype(jnp.float32)
        new_state = state
    inv = scale * jnp.reciprocal(jnp.sqrt(var + eps))
    return (inv, bias - mean * inv), new_state


def batch_norm(x, params, state, *, train, eps=1e-3, momentum=0.1,
               valid=None):
    """Returns (y, new_state). x: (B, H, W, C)."""
    (a, b), new_state = batch_norm_coeffs(x, params, state, train=train,
                                          eps=eps, momentum=momentum,
                                          valid=valid)
    return x * a.astype(x.dtype) + b.astype(x.dtype), new_state


def fold_batch_norm(w, b, bn_params, bn_state, *, eps=1e-3):
    """Fold inference BN into conv (w HWIO, b (Cout,)) -> (w', b').

    y = (conv(x, w) + b - mean) * g/sqrt(var+eps) + beta
      = conv(x, w * s) + (b - mean) * s + beta,   s = g/sqrt(var+eps)
    """
    s = (bn_params["scale"].astype(jnp.float32)
         * jnp.reciprocal(jnp.sqrt(bn_state["var"].astype(jnp.float32) + eps)))
    w2 = w.astype(jnp.float32) * s  # broadcasts over the trailing Cout dim
    if b is None:
        b = jnp.zeros(w.shape[-1], jnp.float32)
    b2 = (b.astype(jnp.float32) - bn_state["mean"].astype(jnp.float32)) * s \
        + bn_params["bias"].astype(jnp.float32)
    return w2.astype(w.dtype), b2.astype(jnp.float32)
