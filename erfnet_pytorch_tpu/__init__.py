"""erfnet_pytorch_tpu — a TPU-native rebuild of the capabilities of
lorenwel/erfnet_pytorch (fork of Eromera/erfnet_pytorch).

Design (NOT a port):
  * NHWC layout everywhere; channels ride the 128-lane dimension.
  * Pure-functional models: explicit `params` / `batch_stats` pytrees,
    `init()` / `apply()` pairs — trivially `jit`/`pjit`-able.
  * Factorized 3x1/1x3 convolutions lower to shifted matmuls on the MXU
    (fused Pallas kernels for the hot non_bottleneck_1d blocks).
  * Data-parallelism via `jax.sharding.Mesh` + NamedSharding: batch-axis
    reductions (loss, BatchNorm statistics) become XLA collectives over ICI —
    the TPU-native equivalent of the reference's torch.nn.DataParallel.
  * Checkpoints are flax-msgpack pytrees with the reference's file-name and
    stage semantics; shipped torch ``.pth`` files import via a shim.

Reference parity map lives in SURVEY.md at the repo root.
"""

__version__ = "0.1.0"
