"""Shared in-kernel statistic emission for batch-grid Pallas kernels.

``acc`` is the init-on-first-program / else-add pattern for cross-batch
accumulator outputs (weight gradients).  ``emit_stats`` writes each grid
program's PER-ROW BatchNorm sum / sum-of-squares into its own (1, C)
block of a (B, C) output: the global (masked) reduction over rows is a
tiny differentiable XLA op downstream
(ops/packed.py:stat_sums_from_rows), which is what makes DP batch
padding numerically exact — pad rows are excluded from the statistics by
an ordinary masked sum, and autodiff then zeroes the pad rows'
stat-cotangents (and through them their dW/residual contributions)
without any in-kernel masking.  One implementation, used by the
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


def emit_stats(zf, s1_ref, s2_ref):
    """Write this grid program's batch-row sum / sum-of-squares of a flat
    f32 (M, C) activation block into its own stat block (the stat
    out_specs index by the batch program id).  The stat arrays are
    (B, 1, C) with (1, 1, C) blocks: Mosaic requires the last two block
    dims to be (8,128)-divisible OR equal to the array dims, so a (1, C)
    block over (B, C) does NOT lower — only leading dims may be blocked
    freely by the batch grid (callers squeeze to (B, C) in XLA)."""
    s1_ref[:] = jnp.sum(zf, axis=0).reshape(s1_ref.shape)
    s2_ref[:] = jnp.sum(zf * zf, axis=0).reshape(s2_ref.shape)
