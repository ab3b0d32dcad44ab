"""Device-mesh data parallelism — the TPU-native replacement for the
reference's ``torch.nn.DataParallel`` (its only parallelism; SURVEY.md §2b).

Strategy: a 1-D ``data`` mesh axis over ICI.  Batches are sharded
(``P("data")``), parameters/optimizer state replicated (``P()``), and the
whole train step runs under ``jit`` with NamedSharding-annotated inputs —
XLA inserts the gradient/BatchNorm-statistics all-reduces over ICI
automatically (jnp reductions over the sharded batch axis are global).
That reproduces DataParallel's contract — same math, bigger batch — without
NCCL-style explicit scatter/gather.

A second (currently size-1) ``model`` axis is plumbed through the mesh shape
so multi-host / spatially-sharded growth does not change call signatures.

Multi-host growth is exercised, not just plumbed: ``make_mesh_2d`` builds a
``("dcn", "data", "model")`` mesh whose outer axis stands for the
cross-host (DCN) dimension.  Batches shard over BOTH batch axes
(``P(("dcn", "data"))``) — gradient/BN-stat reductions become a two-level
collective XLA lays out as intra-host ICI + cross-host DCN, the standard
TPU-pod pattern.  ``batch_axes`` derives the right spec from any mesh so
the trainer/spmd plumbing is mesh-shape agnostic (equivalence to the
single-device math is tested in tests/test_spmd_fused.py).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = n_data if n_data is not None else len(devices)
    dev_array = np.asarray(devices[:n]).reshape(n, 1)
    return Mesh(dev_array, ("data", "model"))


def make_mesh_2d(n_dcn: int, n_data: int, devices=None) -> Mesh:
    """A (dcn, data, model) mesh: ``n_dcn`` host groups × ``n_data``
    chips each.  The reference never needs multi-host (SURVEY.md §5
    "DCN axis unused at reference scale"), but the framework's DP
    contract must survive pod growth — batches shard over both axes and
    the grad/BN psums become ICI+DCN two-level collectives."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_dcn * n_data
    assert len(devices) >= n, (n, len(devices))
    dev_array = np.asarray(devices[:n]).reshape(n_dcn, n_data, 1)
    return Mesh(dev_array, ("dcn", "data", "model"))


def batch_axes(mesh: Mesh):
    """The mesh axes the batch dimension shards over: ``("dcn", "data")``
    on a multi-host mesh, plain ``"data"`` otherwise."""
    if "dcn" in mesh.shape and mesh.shape["dcn"] > 1:
        return ("dcn", "data")
    return "data"


def make_mesh_for_batch(batch_size: int, devices=None,
                        allow_pad: bool = True) -> Mesh:
    """Data-parallel mesh for a given global batch size.

    With ``allow_pad`` (default) this is the FULL device mesh: callers
    pad non-divisible batches up to a mesh multiple (``DataLoader``'s
    ``pad_to`` repeats images with void labels, which the class-weighted
    loss zeroes) and pass the per-batch ``valid`` mask into the train
    step, which excludes the pad rows from every BN batch statistic and
    gradient (see data/loader.py) — the reference recipe's batch 6 keeps
    all 8 chips busy while computing exactly the unpadded math, where
    torch DataParallel scatters it unevenly with per-replica BN instead
    (train/main.py:main() — SURVEY.md §2b).  ``allow_pad=False``
    restores the shrink-to-divisor behavior for callers that cannot pass
    the mask."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if not allow_pad:
        while n > 1 and batch_size % n != 0:
            n -= 1
    return make_mesh(n, devices)


def pad_to_for_mesh(mesh: Mesh) -> Optional[int]:
    """DataLoader ``pad_to`` value for a mesh (None when 1-way)."""
    n = mesh.shape.get("data", 1) * mesh.shape.get("dcn", 1)
    return n if n > 1 else None


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(batch_axes(mesh)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (or pytree) onto the mesh, sharded over the
    batch axes.

    Single-process: a plain sharded ``device_put``.  Multi-host pods
    (``jax.process_count() > 1``): ``batch`` holds this process's LOCAL
    rows (e.g. from ``DataLoader(process_count=...)``) and the result is
    the GLOBAL array assembled via
    ``jax.make_array_from_process_local_data`` — every host calls this
    with its own block and XLA sees one global batch."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        import numpy as _np
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, _np.asarray(x)), batch)
    return jax.device_put(batch, sh)


def global_batch_from_locals(mesh: Mesh, locals_):
    """Assemble per-host local batches into one global sharded array — the
    single-process twin of the multi-host ``shard_batch`` path, used to
    TEST host-sharded loading without a pod.

    ``locals_[h]`` is the pytree of rows process ``h``'s loader produced
    (``DataLoader(process_index=h, process_count=H)``).  Host ``h`` is
    simulated as owning the ``h``-th contiguous block of ``mesh``'s
    flattened devices (how real pods enumerate ``jax.devices()``); each
    local block is placed shard-by-shard on those devices exactly as
    ``jax.make_array_from_process_local_data`` would place it, then
    stitched with ``make_array_from_single_device_arrays``.  Asserts the
    mesh's batch sharding really maps host blocks to host devices —
    catching any mesh layout whose rows would NOT be host-local."""
    H = len(locals_)
    sh = batch_sharding(mesh)
    flat = list(mesh.devices.flat)
    assert len(flat) % H == 0, (len(flat), H)
    dpp = len(flat) // H

    def one(*xs):
        xs = [np.asarray(x) for x in xs]
        G = sum(x.shape[0] for x in xs)
        assert G % H == 0, (G, H)
        Gl = G // H
        gshape = (G,) + xs[0].shape[1:]
        imap = sh.devices_indices_map(gshape)
        arrs = []
        for h, x in enumerate(xs):
            lo = h * Gl
            for d in flat[h * dpp:(h + 1) * dpp]:
                start, stop, _ = imap[d][0].indices(G)
                assert lo <= start and stop <= lo + Gl, (
                    "mesh device order does not give host-contiguous "
                    "batch blocks", h, d, (start, stop))
                arrs.append(jax.device_put(x[start - lo:stop - lo], d))
        return jax.make_array_from_single_device_arrays(gshape, sh, arrs)

    return jax.tree.map(one, *locals_)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/optimizer state) across the mesh."""
    return jax.device_put(tree, replicated_sharding(mesh))
