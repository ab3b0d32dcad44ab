"""Shared in-kernel accumulation helpers for batch-grid Pallas kernels.

Batch-grid kernels revisit their accumulator output blocks once per grid
step (constant index_map); ``acc`` is the init-on-first-program /
else-add pattern, and ``emit_stats`` is the BatchNorm batch sum /
sum-of-squares emission built on it (consumed by
ops/packed.py:_bn_packed_coeffs_from_sums so XLA never re-reads the full
map for the statistics reduction).  One implementation, used by the
nb1d_train pair kernels and the stats-emitting downsampler / upsampler
kernels.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental import pallas as pl


def acc(ref, val, first):
    """``ref[:] = val`` on the first grid program, else ``ref[:] += val``."""
    @pl.when(first)
    def _():
        ref[:] = val

    @pl.when(jnp.logical_not(first))
    def _():
        ref[:] = ref[:] + val


def emit_stats(zf, s1_ref, s2_ref, first):
    """Accumulate the batch sum / sum-of-squares of a flat f32 (M, C)
    activation block into the (1, C) stat accumulators."""
    acc(s1_ref, jnp.sum(zf, axis=0).reshape(1, -1), first)
    acc(s2_ref, jnp.sum(zf * zf, axis=0).reshape(1, -1), first)
