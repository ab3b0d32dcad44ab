"""Spatial (H-axis) sharded inference — the context-parallelism analog for
this convnet (SURVEY.md §5 long-context row: the reference's "scale"
dimension is image resolution, not sequence length).

For 1024x2048-class streaming frames, batch parallelism wastes latency;
instead the image's H axis is sharded across the mesh. Convolutions on a
sharded spatial dim need halo exchanges — under ``jit`` with NamedSharding
XLA inserts the ICI halo collectives automatically, so the model code is
unchanged.  Dilated d=16 convs at 1/8 resolution need 16-row halos; XLA
handles that too (at the cost of wider exchanges).

SCOPE — deliberately the plain-XLA ``erfnet.apply`` path, NOT the fused
Pallas pipeline.  The receptive-field arithmetic is why: the full net's
H-receptive radius is ~630 INPUT rows (dominated by the eight d∈{2..16}
NB1d blocks at 1/8 resolution: Σ(1+d)·8 = 544 rows; plus stem/stage-1/
decoder), while an 8-way shard of a 1024-row frame holds 128 rows — so
"replicate a halo, run the per-device fused pipeline, crop" is
impossible (the halo exceeds 4 neighbor shards), and per-block halo
exchange needs MULTI-HOP transfers for the d=16 blocks (17-row halos vs
16-row per-device tiles at 1/8 res).  That is exactly the irregular
communication GSPMD compiles well and a per-image VMEM-resident Mosaic
kernel would have to reimplement as in-kernel RDMA for no parity
benefit — the reference never shards one image, and single-image latency
is already served by the fused batch path (0.854 ms/img device-side).
The H-blocked fused kernels (ops/pallas/nb1d.py:_run_h_chunked) solve a
DIFFERENT problem: VMEM capacity within one device, where the window
clamp needs no communication.

Not required for reference parity; provided as the TPU-native growth
path for high-resolution streaming, tested at the real 1024x2048 shape
on the 8-device virtual mesh (tests/test_training.py).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import erfnet
from ..ops.argmax import fast_argmax


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) sharded over H on the mesh's 'data' axis."""
    return NamedSharding(mesh, P(None, "data"))


def make_spatial_infer(params, batch_stats, mesh, *, compute_dtype=None):
    """Jitted infer(images) with the image H-axis sharded across the mesh.

    images must have H divisible by 8 * mesh data size (the encoder's /8
    stride keeps every intermediate H-shardable).
    """
    ssh = spatial_sharding(mesh)
    rep = NamedSharding(mesh, P())
    params = jax.device_put(params, rep)
    batch_stats = jax.device_put(batch_stats, rep)

    @jax.jit
    def infer(images):
        images = jax.lax.with_sharding_constraint(images, ssh)
        logits, _ = erfnet.apply(params, batch_stats, images, train=False,
                                 compute_dtype=compute_dtype)
        return logits, fast_argmax(logits)

    return infer
