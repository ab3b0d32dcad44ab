from .mesh import (make_mesh, make_mesh_2d, batch_axes, batch_sharding,
                   replicated_sharding, shard_batch, replicate)
