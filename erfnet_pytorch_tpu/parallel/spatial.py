"""Spatial (H-axis) sharded inference — the context-parallelism analog for
this convnet (SURVEY.md §5 long-context row: the reference's "scale"
dimension is image resolution, not sequence length).

For 1024x2048-class streaming frames, batch parallelism wastes latency;
instead the image's H axis is sharded across the mesh. Convolutions on a
sharded spatial dim need halo exchanges — under ``jit`` with NamedSharding
XLA inserts the ICI halo collectives automatically, so the model code is
unchanged.  Dilated d=16 convs at 1/8 resolution need 16-row halos; XLA
handles that too (at the cost of wider exchanges).

Not required for reference parity (the reference never shards one image);
provided as the TPU-native growth path for high-resolution streaming.
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
