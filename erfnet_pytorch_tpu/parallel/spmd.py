"""SPMD execution of batch-grid Pallas kernels via ``shard_map``.

The reference's one parallelism contract is DataParallel (SURVEY.md §2b):
same math, bigger batch.  The XLA parts of the train step shard
automatically under jit + NamedSharding, but ``pallas_call`` has no SPMD
partitioning rule — without help, a multi-device mesh either fails to
partition or gathers the full batch onto every chip.  This module closes
that gap: training code registers the active mesh here, and every
batch-grid kernel call wraps itself in ``jax.shard_map`` over the mesh's
``data`` axis:

  * batch-leading operands shard over ``data``; weights replicate;
  * batch-shaped outputs come back sharded;
  * cross-batch accumulator outputs (weight grads, loss num/den) are
    computed per-shard by the kernel's batch-grid revisiting and
    ``psum``-reduced over ``data`` inside the shard_map body — exactly
    the gradient all-reduce XLA inserts for the matmul fallback path.

Everything between kernels (BatchNorm statistics, loss normalization,
optimizer) stays in ordinary jit-traced XLA, where reductions over the
sharded batch axis remain GLOBAL collectives — cross-replica BN semantics
are unchanged from the non-fused path.

With no mesh registered (the single-chip default) every wrapper is an
identity and the kernels run exactly as before.
"""

from __future__ import annotations

import functools
from contextlib import contextmanager
from typing import Callable, Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

_STATE = {"mesh": None, "axis": "data", "force": False}


def _axes_tuple(axis) -> Tuple[str, ...]:
    return (axis,) if isinstance(axis, str) else tuple(axis)


def set_mesh(mesh: Optional[Mesh], axis=None, *,
             force: bool = False) -> None:
    """Register (or clear, with None) the mesh Pallas kernels shard over.

    Call once when setting up data-parallel training/eval; the per-call
    wrapping is a trace-time decision, so re-jitting after a change picks
    it up (the step makers build fresh jitted callables anyway).

    ``axis`` is the mesh axis name (or TUPLE of names — a multi-host
    ``("dcn", "data")`` mesh shards the batch over both) that batches
    shard over; None derives it from the mesh via ``mesh_lib.batch_axes``.

    force=True engages the shard_map wrappers even for a 1-way mesh
    (normally an identity) — used by scripts/tpu_shardmap_smoke.py to
    compile every batch-grid kernel THROUGH shard_map in Mosaic compiled
    mode on the single real chip, validating the composition the 8-device
    interpret-mode tests can't.
    """
    if axis is None:
        if mesh is None:
            axis = "data"
        else:
            from . import mesh as mesh_lib
            axis = mesh_lib.batch_axes(mesh)
    _STATE["mesh"] = mesh
    _STATE["axis"] = axis
    _STATE["force"] = force


@contextmanager
def pallas_mesh(mesh: Optional[Mesh], axis=None, *,
                force: bool = False):
    old = (_STATE["mesh"], _STATE["axis"], _STATE["force"])
    set_mesh(mesh, axis, force=force)
    try:
        yield
    finally:
        set_mesh(old[0], old[1], force=old[2])


def active() -> Tuple[Optional[Mesh], Optional[str]]:
    """(mesh, axis) when a >1-way data mesh is registered, else (None, None).

    ``axis`` is a mesh axis name or a tuple of names (multi-host mesh)."""
    mesh = _STATE["mesh"]
    if mesh is None:
        return None, None
    axis = _STATE["axis"]
    n = 1
    for a in _axes_tuple(axis):
        n *= mesh.shape.get(a, 1)
    if n <= 1 and not _STATE["force"]:
        return None, None
    return mesh, axis


def data_shards() -> int:
    """Number of ways the batch axis is sharded (1 when no mesh is active).

    Kernel ``*_supported`` eligibility checks divide their batch/row counts
    by this so they validate the PER-SHARD shapes the kernels will see."""
    mesh, axis = active()
    if mesh is None:
        return 1
    n = 1
    for a in _axes_tuple(axis):
        n *= mesh.shape[a]
    return n


def mesh_keyed_jit(*, static_argnames: Sequence[str] = ()) -> Callable:
    """``jax.jit`` whose cache is ALSO keyed on the registered mesh.

    A module-level ``@jax.jit`` around a function that calls
    ``shard_batch_call`` reads ``_STATE`` at trace time only — if
    ``set_mesh`` changes between two same-shape calls, the plain jit
    replays the stale (un)sharded executable.  This decorator keeps one
    jit cache per ``active()`` registration, so a mesh change triggers a
    fresh trace (``Mesh`` is hashable)."""
    def wrap(f: Callable) -> Callable:
        jits = {}

        @functools.wraps(f)
        def g(*args, **kwargs):
            key = active()
            jf = jits.get(key)
            if jf is None:
                # a FRESH function object per key: jax.jit(f) on the same
                # `f` twice shares the global tracing cache, so the second
                # wrapper would replay the first key's trace (and its
                # baked-in mesh state) instead of re-tracing
                def f_for_key(*a, **kw):
                    return f(*a, **kw)

                jf = jax.jit(f_for_key,
                             static_argnames=tuple(static_argnames))
                jits[key] = jf
            return jf(*args, **kwargs)

        return g

    return wrap


def shard_batch_call(call: Callable, batch_in: Sequence[bool],
                     reduce_out: Optional[Sequence[bool]] = None) -> Callable:
    """Wrap a Pallas-call builder for SPMD over the registered mesh.

    ``call(*args)`` must build its grid/out_shape from its operands' shapes
    (they are per-shard inside shard_map).  ``batch_in[i]``: operand i is
    batch-leading (sharded over ``data``); otherwise replicated.
    ``reduce_out``: None = single batch-sharded output; else one flag per
    tuple output — True marks a cross-batch accumulator that is
    psum-reduced and returned replicated, False a batch-sharded output.

    Identity when no mesh is registered.
    """
    mesh, axis = active()
    if mesh is None:
        return call
    in_specs = tuple(P(axis) if b else P() for b in batch_in)
    if reduce_out is None:
        out_specs: object = P(axis)
        inner = call
    else:
        flags = tuple(reduce_out)
        out_specs = tuple(P() if r else P(axis) for r in flags)

        def inner(*args):
            outs = call(*args)
            return tuple(jax.lax.psum(o, axis) if r else o
                         for o, r in zip(outs, flags))

    return jax.shard_map(inner, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
