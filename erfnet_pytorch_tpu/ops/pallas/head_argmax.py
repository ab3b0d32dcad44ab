"""Fused head-matmul + channel argmax (Pallas, inference fast path).

Reference surface: the final ``outputs.max(1)[1]`` of every eval CLI
(``eval/eval_iou.py``, ``eval_cityscapes_color.py`` / ``_server.py`` —
SURVEY.md §2a rows 14-16) applied to the ConvTranspose2d(16, C, 2, s2)
head logits (``eval/erfnet.py`` — §2a row 1).

Why a kernel: the XLA pipeline materializes full-resolution logits
(B, 512, 1024, 20) whose 20-wide minor dim gets lane-padded to 128 —
profiling showed the argmax fusion alone at ~15 ms/step (batch 8) plus
~5 ms of head-conv + relayout, half the whole pipeline.  Here the
stride-2 head is the 1-tap parity-plane matmul of
ops/convt_mm.py:build_head_matmul and the argmax runs on the logits
while they are still in VMEM; full-res logits never touch HBM.

Layout trick: logits are computed TRANSPOSED — z = W^T @ feats^T of
shape (G*C, chunk) — so the per-parity-group argmax is a SUBLANE-axis
masked reduction and the output is (G, M) int32 parity planes (no
minor-dim lane padding anywhere).  The caller finishes with a cheap
s32 depth-to-space: (G, M) -> (B, 2H, 2W).

Tie semantics match jnp.argmax (first max wins); when feats are bf16
the logits are rounded to bf16 before comparison so predictions are
bit-identical to the XLA path's bf16 logits + fast_argmax.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...parallel import spmd

_MAX_CHUNK = 16384
_ZT_BUDGET = 32 << 20  # VMEM budget for the (GC, CH) f32 logits block


def _chunk(M: int, GC: int) -> int:
    c = min(M, _MAX_CHUNK, max(128, _ZT_BUDGET // (GC * 4)))
    while M % c:
        c -= 1
    return c


def head_argmax_supported(M: int, K: int, G: int, n_classes: int) -> bool:
    n = spmd.data_shards()
    if M % n:
        return False
    M //= n  # validate the PER-SHARD row count the kernel will see
    # mirror head_argmax's builder choice: the grouped kernel (G >= 8)
    # pads classes per-group to a sublane-tile multiple, so its VMEM
    # chunk derives from the PADDED GC — validating the unpadded one
    # can approve a chunk the routed kernel never uses
    C = -(-n_classes // 8) * 8 if G >= 8 else n_classes
    return (G * n_classes <= 1024 and K <= 512
            and _chunk(M, G * C) % 128 == 0)


def _kernel(feats_ref, W, bias, gid, iota, out_ref, *, G, n_classes,
            round_bf16):
    # z^T: (GC, CH) f32 — lhs (K, GC) contracted on dim 0 vs feats dim 1
    zt = jax.lax.dot_general(
        W[:].astype(feats_ref.dtype), feats_ref[:],
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + bias[:]
    if round_bf16:
        # match the XLA oracle, which argmaxes bf16-materialized logits
        zt = zt.astype(jnp.bfloat16).astype(jnp.float32)
    rows = []
    for g in range(G):
        mask = gid[:] == float(g)                      # (GC, 1)
        zm = jnp.where(mask, zt, -jnp.inf)
        m = jnp.max(zm, axis=0, keepdims=True)         # (1, CH)
        idx = jnp.min(jnp.where(zm >= m, iota[:], float(n_classes)),
                      axis=0, keepdims=True)           # (1, CH) f32
        # all-NaN column -> no lane passes zm >= m and the sentinel
        # survives; clamp so preds stay in-range like jnp.argmax
        rows.append(jnp.minimum(idx, float(n_classes - 1)))
    out_ref[:] = jnp.concatenate(rows, axis=0).astype(jnp.int32)


def _kernel_grouped(feats_ref, W, bias, iota, out_ref, *, G, C8,
                    n_classes, round_bf16):
    """Grouped-reduce variant for large G (the W-packed head): classes
    are padded per-group to C8 (a sublane-tile multiple, pad bias -inf),
    the (G*C8, CH) transposed logits SPLIT their sublane dim into
    (G, C8, CH) — tile-aligned, so Mosaic lowers it — and ONE max/min
    pass reduces every group simultaneously (the per-group masked loop
    of _kernel costs G full passes, measured 1.4x the whole pipeline at
    G=32)."""
    zt = jax.lax.dot_general(
        W[:].astype(feats_ref.dtype), feats_ref[:],
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + bias[:]
    if round_bf16:
        zt = zt.astype(jnp.bfloat16).astype(jnp.float32)
    CH = zt.shape[1]
    z3 = zt.reshape(G, C8, CH)
    m = jnp.max(z3, axis=1, keepdims=True)             # (G, 1, CH)
    idx = jnp.min(jnp.where(z3 >= m, iota[:].reshape(1, C8, 1),
                            float(n_classes)), axis=1)  # (G, CH) f32
    out_ref[:] = jnp.minimum(idx, float(n_classes - 1)).astype(jnp.int32)


@functools.lru_cache(maxsize=None)
def _op_grouped(K: int, G: int, n_classes: int, round_bf16: bool,
                interpret: bool):
    C8 = -(-n_classes // 8) * 8
    GC = G * C8
    iota = np.arange(C8, dtype=np.float32).reshape(C8, 1)
    kernel = functools.partial(_kernel_grouped, G=G, C8=C8,
                               n_classes=n_classes, round_bf16=round_bf16)

    def call(feats, W, bias):
        M = feats.shape[0]
        CH = _chunk(M, GC)
        v = pltpu.VMEM
        return pl.pallas_call(
            kernel,
            grid=(M // CH,),
            in_specs=[
                pl.BlockSpec((CH, K), lambda i: (i, 0), memory_space=v),
                pl.BlockSpec((K, GC), lambda i: (0, 0), memory_space=v),
                pl.BlockSpec((GC, 1), lambda i: (0, 0), memory_space=v),
                pl.BlockSpec((C8, 1), lambda i: (0, 0), memory_space=v),
            ],
            out_specs=pl.BlockSpec((G, CH), lambda i: (0, i),
                                   memory_space=v),
            out_shape=jax.ShapeDtypeStruct((G, M), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * K * GC + 12 * M * GC,
                bytes_accessed=M * K * feats.dtype.itemsize + M * G * 4,
                transcendentals=0),
            interpret=interpret,
        )(feats, W, bias.reshape(GC, 1), iota)

    def padded(feats, W, bias):
        # per-group class padding to C8: zero weight columns, -inf bias,
        # done in XLA once per trace (W is (K, G*n_classes))
        W3 = W.reshape(K, G, n_classes)
        Wp = jnp.pad(W3, ((0, 0), (0, 0), (0, C8 - n_classes)))
        b3 = bias.reshape(G, n_classes)
        bp = jnp.pad(b3, ((0, 0), (0, C8 - n_classes)),
                     constant_values=-jnp.inf)
        return call(feats, Wp.reshape(K, GC), bp.reshape(GC))

    return padded


@functools.lru_cache(maxsize=None)
def _op(K: int, G: int, n_classes: int, round_bf16: bool, interpret: bool):
    GC = G * n_classes
    # numpy (not jnp) constants: the op closure is cached across jits, and
    # a device constant materialized inside one trace would leak into the
    # next as a stale tracer
    gid = np.repeat(np.arange(G, dtype=np.float32), n_classes).reshape(GC, 1)
    iota = np.tile(np.arange(n_classes, dtype=np.float32), G).reshape(GC, 1)
    kernel = functools.partial(_kernel, G=G, n_classes=n_classes,
                               round_bf16=round_bf16)

    def call(feats, W, bias):
        M = feats.shape[0]
        CH = _chunk(M, GC)
        v = pltpu.VMEM
        return pl.pallas_call(
            kernel,
            grid=(M // CH,),
            in_specs=[
                pl.BlockSpec((CH, K), lambda i: (i, 0), memory_space=v),
                pl.BlockSpec((K, GC), lambda i: (0, 0), memory_space=v),
                pl.BlockSpec((GC, 1), lambda i: (0, 0), memory_space=v),
                pl.BlockSpec((GC, 1), lambda i: (0, 0), memory_space=v),
                pl.BlockSpec((GC, 1), lambda i: (0, 0), memory_space=v),
            ],
            out_specs=pl.BlockSpec((G, CH), lambda i: (0, i),
                                   memory_space=v),
            out_shape=jax.ShapeDtypeStruct((G, M), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * K * GC + 12 * M * GC,
                bytes_accessed=M * K * feats.dtype.itemsize + M * G * 4,
                transcendentals=0),
            interpret=interpret,
        )(feats, W, bias.reshape(GC, 1), gid, iota)

    return call


def head_argmax(feats, W, bias, *, G: int, n_classes: int,
                interpret: Optional[bool] = None):
    """feats (M, K) x W (K, G*n_classes) + bias -> (G, M) int32 argmax
    planes (plane g = parity (a, b), g = a*2 + b, the column-block order
    of ops/convt_mm.py:build_head_matmul)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    round_bf16 = feats.dtype == jnp.bfloat16
    builder = _op_grouped if G >= 8 else _op
    op = builder(int(feats.shape[1]), int(G), int(n_classes),
                 bool(round_bf16), bool(interpret))
    mesh, ax = spmd.active()
    if mesh is not None:
        # rows shard over data; the (G, M) plane output shards on axis 1
        from jax.sharding import PartitionSpec as P
        op = jax.shard_map(op, mesh=mesh, in_specs=(P(ax), P(), P()),
                           out_specs=P(None, ax), check_vma=False)
    return op(feats, W.astype(jnp.float32), bias.astype(jnp.float32))


def depth_to_space_planes(idx, B: int, H: int, W: int):
    """(4, B*H*W) parity planes -> (B, 2H, 2W) predictions."""
    return (idx.reshape(2, 2, B, H, W).transpose(2, 3, 0, 4, 1)
            .reshape(B, 2 * H, 2 * W))


def depth_to_space_planes_packed(idx, B: int, H: int, Wb: int, p: int):
    """(p*4, B*H*Wb) W-PACKED parity planes -> (B, 2H, 2*Wb*p).

    Group order (slot j, parity a*2+b): the column-block order of
    ops/convt_mm.py:expand_head_matmul_packed — slot j is canonical W
    position wb*p + j of the packed (B, H, Wb, p*K) feature view, and its
    four parities land at output (2h+a, 2(wb*p+j)+b)."""
    return (idx.reshape(p, 2, 2, B, H, Wb).transpose(3, 4, 1, 5, 0, 2)
            .reshape(B, 2 * H, 2 * Wb * p))
