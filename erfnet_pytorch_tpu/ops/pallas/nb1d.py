"""Fused non_bottleneck_1d inference kernel (Pallas/Mosaic, TPU).

The reference's hot block (train/erfnet.py:non_bottleneck_1d — SURVEY.md
§2b row 1) is four factorized convolutions with BN/ReLU epilogues and a
residual add.  The XLA path materializes every intermediate in HBM; this
kernel keeps the whole block resident in VMEM:

    HBM traffic:  read x once, write out once    (vs 8+ tensor round-trips)

TPU-native formulation: a (3,1) conv with dilation d along H is THREE
shifted (H*W, C) x (C, C) matmuls on the MXU —

    out[h] = x[h-d] @ W0 + x[h] @ W1 + x[h+d] @ W2  (zero outside)

— and likewise along W.  C=128 exactly fills the MXU/lane width.  BatchNorm
(inference) is pre-folded into conv weights, so epilogues are bias+ReLU.

Grid: one program per batch image; the full (H, W, C) feature map lives in
VMEM (64x128x128 f32 = 4 MB for the 512x1024-input encoder).  Larger maps
fall back to XLA (``nb1d_supported``); an H-tiled halo variant is future
work.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..batchnorm import fold_batch_norm
from ...parallel import spmd

# VMEM budget heuristic: full-map-per-image kernel needs ~5 live (H, W, C)
# f32 buffers; stay well under the ~16 MB/core VMEM.
_MAX_MAP_BYTES = 2 * 1024 * 1024


def nb1d_supported(shape, dtype=jnp.float32) -> bool:
    b, h, w, c = shape
    return (c % 128 == 0 and w % 8 == 0
            and b % spmd.data_shards() == 0
            and h * w * c * 4 <= _MAX_MAP_BYTES * 4)


def fuse_nb1d_params(params: Dict[str, Any], state: Dict[str, Any],
                     dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Fold BN into the factorized convs; reshape HWIO weights to (3, C, C).

    conv3x1_1 -> w1/b1 (taps along H, d=1)     + ReLU
    conv1x3_1 -> w2/b2 (taps along W, d=1, BN1 folded) + ReLU
    conv3x1_2 -> w3/b3 (taps along H, d=dil)   + ReLU
    conv1x3_2 -> w4/b4 (taps along W, d=dil, BN2 folded)
    """
    w1 = params["conv3x1_1"]["w"][:, 0]          # (3, C, C)
    b1 = params["conv3x1_1"]["b"]
    w2, b2 = fold_batch_norm(params["conv1x3_1"]["w"],
                             params["conv1x3_1"]["b"],
                             params["bn1"], state["bn1"])
    w2 = w2[0]                                    # (3, C, C)
    w3 = params["conv3x1_2"]["w"][:, 0]
    b3 = params["conv3x1_2"]["b"]
    w4, b4 = fold_batch_norm(params["conv1x3_2"]["w"],
                             params["conv1x3_2"]["b"],
                             params["bn2"], state["bn2"])
    w4 = w4[0]
    to = lambda a: jnp.asarray(a, dtype)
    return {"w1": to(w1), "b1": to(b1), "w2": to(w2), "b2": to(b2),
            "w3": to(w3), "b3": to(b3), "w4": to(w4), "b4": to(b4)}


def _taps_h(x2d, w, d, W, relu, bias):
    """3-tap conv along H on the flattened (H*W, C) map: row shifts are
    contiguous d*W-element shifts.  x2d f32/bf16; accum f32 on the MXU."""
    m1 = jnp.dot(x2d, w[1], preferred_element_type=jnp.float32)
    s = d * W
    if s >= x2d.shape[0]:  # dilation exceeds the map: side taps all-zero
        out = m1 + bias
        return jax.nn.relu(out) if relu else out
    m0 = jnp.dot(x2d, w[0], preferred_element_type=jnp.float32)
    m2 = jnp.dot(x2d, w[2], preferred_element_type=jnp.float32)
    z = jnp.zeros((s, x2d.shape[1]), jnp.float32)
    out = m1 + jnp.concatenate([z, m0[:-s]], axis=0) \
        + jnp.concatenate([m2[s:], z], axis=0)
    out = out + bias
    return jax.nn.relu(out) if relu else out


def _taps_w(x, w, d, H, W, C, relu, bias, thr=0):
    """3-tap conv along W on the (H, W, C) map.

    thr > 0 (packed layouts only): MERGE the two side-tap matmuls into
    one.  The packed side matrices have DISJOINT nonzero K-row blocks
    whenever the unpacked dilation du satisfies 2*du <= p (all shipped
    C=64/C=16 blocks are du=1): w[2] (the +s tap) reads only input slots
    0..du-1 (lanes < thr = du*Cc) and w[0] (the -s tap) only slots
    p-du..p-1 — so one lane-iota select builds an input whose low lanes
    come from the back-shifted map and high lanes from the
    forward-shifted map, and ONE matmul against (w[0] + w[2]) computes
    both side contributions: 3 -> 2 MXU passes per W-conv, a 1/6 MAC
    cut for the whole 12-matmul packed block (the H-convs' kron(I_p, W)
    structure is at its density floor: slot-preserving K rows can only
    ever feed their own slot's 1/p of the output lanes, so no lane
    shuffle can densify them — any shuffle is itself a matmul).

    Weights are cast to x.dtype UNIFORMLY (all three taps, both
    branches) so merged-vs-unmerged stays bit-identical at every
    dtype combination, not just the shipped pre-cast configs."""
    w = w.astype(x.dtype)
    flat = x.reshape(H * W, C)
    m1 = jnp.dot(flat, w[1], preferred_element_type=jnp.float32).reshape(
        H, W, C)
    if d >= W:  # dilation exceeds the map: side taps all-zero
        out = m1 + bias
        return jax.nn.relu(out) if relu else out
    if thr:
        zx = jnp.zeros((H, d, C), x.dtype)
        xa = jnp.concatenate([zx, x[:, :-d]], axis=1)   # w[0]'s source
        xb = jnp.concatenate([x[:, d:], zx], axis=1)    # w[2]'s source
        lane = jax.lax.broadcasted_iota(jnp.int32, (H, W, C), 2)
        sel = jnp.where(lane < thr, xb, xa)
        side = jnp.dot(sel.reshape(H * W, C), w[0] + w[2],
                       preferred_element_type=jnp.float32)
        out = m1 + side.reshape(H, W, C) + bias
        return jax.nn.relu(out) if relu else out
    m0 = jnp.dot(flat, w[0], preferred_element_type=jnp.float32).reshape(
        H, W, C)
    m2 = jnp.dot(flat, w[2], preferred_element_type=jnp.float32).reshape(
        H, W, C)
    z = jnp.zeros((H, d, C), jnp.float32)
    out = m1 + jnp.concatenate([z, m0[:, :-d]], axis=1) \
        + jnp.concatenate([m2[:, d:], z], axis=1)
    out = out + bias
    return jax.nn.relu(out) if relu else out


def _nb1d_kernel(x_ref, w1, b1, w2, b2, w3, b3, w4, b4, out_ref, *,
                 s1: int, s2: int, s3: int, s4: int,
                 H: int, W: int, C: int, thr2: int = 0, thr4: int = 0):
    """Four 3-tap convs with static shift amounts: s1/s3 along H (rows),
    s2/s4 along W.  Unpacked blocks use (1, 1, d, d); space-to-depth packed
    blocks use the block-shift steps from ops/packed.py.  thr2/thr4 > 0
    engage the merged-side-matmul W-convs (see _taps_w)."""
    x = x_ref[0]                                   # (H, W, C)
    xf = x.reshape(H * W, C)
    t = _taps_h(xf, w1[:], s1, W, True, b1[:])       # conv3x1_1 + ReLU
    t = _taps_w(t.reshape(H, W, C).astype(x.dtype), w2[:], s2, H, W, C,
                True, b2[:], thr=thr2)
    t = _taps_h(t.reshape(H * W, C).astype(x.dtype), w3[:], s3, W, True,
                b3[:])
    t = _taps_w(t.reshape(H, W, C).astype(x.dtype), w4[:], s4, H, W, C,
                False, b4[:], thr=thr4)
    out_ref[0] = jax.nn.relu(t + x.astype(jnp.float32)).astype(out_ref.dtype)


def _nb1d_call(x, fused, *, shifts, interpret, thrs=(0, 0)):
    s1, s2, s3, s4 = shifts
    thr2, thr4 = thrs

    def call(x, w1, b1, w2, b2, w3, b3, w4, b4):
        # shapes read INSIDE the (possible) shard_map body: under a
        # registered DP mesh the batch dim here is the per-shard one
        B, H, W, C = x.shape
        kernel = functools.partial(_nb1d_kernel, s1=s1, s2=s2, s3=s3,
                                   s4=s4, H=H, W=W, C=C, thr2=thr2,
                                   thr4=thr4)
        wspec = pl.BlockSpec((3, C, C), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        bspec = pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                wspec, bspec, wspec, bspec, wspec, bspec, wspec, bspec,
            ],
            out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=12 * 2 * H * W * C * C,
                bytes_accessed=2 * H * W * C * x.dtype.itemsize
                + 12 * C * C * 4,
                transcendentals=0),
            interpret=interpret,
        )(x, w1, b1, w2, b2, w3, b3, w4, b4)

    # DataParallel contract (parallel/spmd.py): batch shards over the
    # registered mesh's data axis; the eight weight operands replicate
    return spmd.shard_batch_call(call, (True,) + (False,) * 8)(
        x, fused["w1"], fused["b1"], fused["w2"], fused["b2"],
        fused["w3"], fused["b3"], fused["w4"], fused["b4"])


@spmd.mesh_keyed_jit(static_argnames=("dilated", "interpret"))
def nb1d_infer(x, fused, *, dilated: int, interpret: bool = False):
    """Fused inference non_bottleneck_1d. x: (B, H, W, C) -> same shape."""
    return _nb1d_call(x, fused, shifts=(1, 1, dilated, dilated),
                      interpret=interpret)


# merged-side W-conv matmuls for packed blocks (see _taps_w docstring);
# A/B-measured on-chip by scripts/tpu_c64_dense_ab.py
SIDE_MERGE = True


def _merge_thrs(p: int, c: int, dilated: int):
    """(thr2, thr4) lane thresholds for a packed block's two W-convs
    (conv1x3_1 is always unpacked-dilation 1; conv1x3_2 has ``dilated``).
    The validity rule lives with the packing layout it depends on:
    ops/packed.py:_merge_thrw."""
    from ..packed import _merge_thrw
    if not SIDE_MERGE:
        return (0, 0)
    return (_merge_thrw(p, c, 1), _merge_thrw(p, c, dilated))


@spmd.mesh_keyed_jit(static_argnames=("p", "dilated", "s2", "s4",
                                      "interpret"))
def nb1d_infer_packed(x, packed_w, *, p: int, dilated: int, s2: int,
                      s4: int, interpret: bool = False):
    """Space-to-depth packed fused block: x (B, H, W, C) viewed as
    (B, H, W/p, p*C); packed_w holds (3, pC, pC) tap stacks from
    ops/packed.py (see pack_nb1d_for_pallas)."""
    B, H, W, C = x.shape
    X = x.reshape(B, H, W // p, p * C)
    out = _nb1d_call(X, packed_w, shifts=(1, s2, dilated, s4),
                     interpret=interpret, thrs=_merge_thrs(p, C, dilated))
    return out.reshape(B, H, W, C)


def _h_chunks(H, W_elems, halo, max_elems):
    """Rows per chunk so one (R + 2*halo)-row window fits the VMEM-map
    budget; 0 when even the minimum window doesn't fit."""
    R = max_elems // W_elems - 2 * halo
    R = min(H, R - R % 8)
    return R if R >= 8 else 0


def _run_h_chunked(call, x, halo, R):
    """Run a whole-map kernel over overlapping, CLAMPED H windows.

    A row is exact iff its distance to each window edge is >= halo (the
    block's H-receptive radius) OR that edge is the true map edge, where
    the kernel's own zero-fill is the conv's padding.  (Zero-PADDING the
    input instead would be wrong: pad rows produce relu(bias) != 0
    intermediate activations.)  Windows share one static size, so this is
    a single compiled program; kept rows are bit-identical to the
    whole-map kernel."""
    B, H, W, C = x.shape
    Rw = min(H, R + 2 * halo)
    outs = []
    s = 0
    while s < H:
        keep = min(R, H - s)
        w_s = min(max(s - halo, 0), H - Rw)
        yc = call(jax.lax.slice_in_dim(x, w_s, w_s + Rw, axis=1))
        off = s - w_s
        outs.append(jax.lax.slice_in_dim(yc, off, off + keep, axis=1))
        s += keep
    return jnp.concatenate(outs, axis=1)


def nb1d_infer_chunked(x, fused, *, dilated: int, max_elems: int,
                       interpret: bool = False):
    """nb1d_infer for maps whose full-VMEM form exceeds `max_elems`
    elements: H-chunked with halo = 1 + dilated."""
    B, H, W, C = x.shape
    R = _h_chunks(H, W * C, 1 + dilated, max_elems)
    assert R, (x.shape, dilated)
    return _run_h_chunked(
        lambda xc: nb1d_infer(xc, fused, dilated=dilated,
                              interpret=interpret), x, 1 + dilated, R)


def nb1d_infer_packed_chunked(x, packed_w, *, p: int, dilated: int, s2: int,
                              s4: int, max_elems: int,
                              interpret: bool = False):
    """nb1d_infer_packed for maps beyond the whole-map VMEM budget."""
    B, H, W, C = x.shape
    R = _h_chunks(H, W * C, 1 + dilated, max_elems)
    assert R, (x.shape, p, dilated)
    return _run_h_chunked(
        lambda xc: nb1d_infer_packed(xc, packed_w, p=p, dilated=dilated,
                                     s2=s2, s4=s4, interpret=interpret),
        x, 1 + dilated, R)


def nb1d_chunk_supported(shape, p: int, dilated: int, max_elems: int):
    b, h, w, c = shape
    # w // p >= 2: one-W-block packed maps fail Mosaic's bf16 memref
    # tiling floor (see inference._eligible)
    return (w % p == 0 and (c * p) % 128 == 0 and w // p >= 2 and
            b % spmd.data_shards() == 0 and
            _h_chunks(h, w * c, 1 + dilated, max_elems) > 0)


def _blocked_rows(H, W_elems, halo, max_elems):
    """Kept rows R per h-block for the blocked kernel: the (R + 2*halo)-row
    window must fit the VMEM-map budget, R % 8 == 0, and R must divide H
    (uniform output blocks).  0 when no such R exists."""
    R = min(H, max_elems // W_elems - 2 * halo)
    R -= R % 8
    while R >= 8 and H % R:
        R -= 8
    return max(R, 0)


def _nb1d_blocked_kernel(x_hbm, w1, b1, w2, b2, w3, b3, w4, b4, out_ref,
                         scratch, sem, *, s1, s2, s3, s4, R, Rw, halo,
                         H, W, C, thr2=0, thr4=0):
    """One program = one (image, h-block): DMA the CLAMPED overlapping
    window [w_s, w_s + Rw) from HBM, run the whole 4-conv block on it, and
    write the R kept rows.  Row correctness argument is `_run_h_chunked`'s:
    a row is exact iff its distance to each window edge is >= halo (the
    block's H receptive radius) OR that edge is the true map edge, where
    the kernel's zero-fill IS the conv padding.  (Never zero-PAD the input
    instead — pad rows produce relu(bias) != 0 intermediates that corrupt
    the true edge rows.)"""
    b = pl.program_id(0)
    j = pl.program_id(1)
    s = j * R
    w_s = jnp.clip(s - halo, 0, H - Rw)
    dma = pltpu.make_async_copy(x_hbm.at[b, pl.ds(w_s, Rw)], scratch, sem)
    dma.start()
    dma.wait()
    x = scratch[:]                                  # (Rw, W, C)
    xf = x.reshape(Rw * W, C)
    t = _taps_h(xf, w1[:], s1, W, True, b1[:])
    t = _taps_w(t.reshape(Rw, W, C).astype(x.dtype), w2[:], s2, Rw, W, C,
                True, b2[:], thr=thr2)
    t = _taps_h(t.reshape(Rw * W, C).astype(x.dtype), w3[:], s3, W, True,
                b3[:])
    t = _taps_w(t.reshape(Rw, W, C).astype(x.dtype), w4[:], s4, Rw, W, C,
                False, b4[:], thr=thr4)
    y = jax.nn.relu(t + x.astype(jnp.float32)).astype(out_ref.dtype)
    # x is dead; reuse the scratch window for the dynamic-offset row read
    scratch[:] = y
    out_ref[0] = scratch[pl.ds(s - w_s, R)]


def _nb1d_blocked_call(x, fused, *, shifts, R, halo, interpret,
                       thrs=(0, 0)):
    s1, s2, s3, s4 = shifts
    thr2, thr4 = thrs

    def call(x, w1, b1, w2, b2, w3, b3, w4, b4):
        # per-shard batch under a registered DP mesh (H/W/C are invariant)
        B, H, W, C = x.shape
        nH = H // R
        Rw = min(H, R + 2 * halo)
        kernel = functools.partial(_nb1d_blocked_kernel, s1=s1, s2=s2,
                                   s3=s3, s4=s4, R=R, Rw=Rw, halo=halo,
                                   H=H, W=W, C=C, thr2=thr2, thr4=thr4)
        wspec = pl.BlockSpec((3, C, C), lambda b, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        bspec = pl.BlockSpec((C,), lambda b, j: (0,),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(B, nH),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # whole map stays in HBM
                wspec, bspec, wspec, bspec, wspec, bspec, wspec, bspec,
            ],
            out_specs=pl.BlockSpec((1, R, W, C), lambda b, j: (b, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            scratch_shapes=[
                pltpu.VMEM((Rw, W, C), x.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=12 * 2 * H * W * C * C * Rw // R,
                bytes_accessed=(Rw * nH + H) * W * C * x.dtype.itemsize
                + 12 * C * C * 4,
                transcendentals=0),
            interpret=interpret,
        )(x, w1, b1, w2, b2, w3, b3, w4, b4)

    return spmd.shard_batch_call(call, (True,) + (False,) * 8)(
        x, fused["w1"], fused["b1"], fused["w2"], fused["b2"],
        fused["w3"], fused["b3"], fused["w4"], fused["b4"])


@spmd.mesh_keyed_jit(static_argnames=("dilated", "max_elems", "interpret"))
def nb1d_infer_blocked(x, fused, *, dilated: int, max_elems: int,
                       interpret: bool = False):
    """Big-map NB1d as ONE h-blocked halo kernel (vs nb1d_infer_chunked's
    per-window pallas_calls + XLA slices/concat: each of those costs the
    chip's ~20-30 us fixed per-op overhead and re-touches HBM)."""
    B, H, W, C = x.shape
    halo = 1 + dilated
    R = _blocked_rows(H, W * C, halo, max_elems)
    assert R, (x.shape, dilated)
    return _nb1d_blocked_call(x, fused, shifts=(1, 1, dilated, dilated),
                              R=R, halo=halo, interpret=interpret)


@spmd.mesh_keyed_jit(static_argnames=("p", "dilated", "s2", "s4",
                                      "max_elems", "interpret"))
def nb1d_infer_packed_blocked(x, packed_w, *, p: int, dilated: int, s2: int,
                              s4: int, max_elems: int,
                              interpret: bool = False):
    """Packed-layout h-blocked halo kernel (W-packing keeps H shifts as
    plain row shifts, so the halo is unchanged)."""
    B, H, W, C = x.shape
    X = x.reshape(B, H, W // p, p * C)
    halo = 1 + dilated
    R = _blocked_rows(H, (W // p) * p * C, halo, max_elems)
    assert R, (x.shape, p, dilated)
    out = _nb1d_blocked_call(X, packed_w, shifts=(1, s2, dilated, s4),
                             R=R, halo=halo, interpret=interpret,
                             thrs=_merge_thrs(p, C, dilated))
    return out.reshape(B, H, W, C)


def nb1d_blocked_supported(shape, p: int, dilated: int, max_elems: int):
    b, h, w, c = shape
    # w // p >= 2: see nb1d_chunk_supported
    return (w % p == 0 and (c * p) % 128 == 0 and w // p >= 2 and
            b % spmd.data_shards() == 0 and
            _blocked_rows(h, w * c, 1 + dilated, max_elems) > 0)


def _nb1d_stack_kernel(x_ref, w1, b1, w2, b2, w3, b3, w4, b4, out_ref, *,
                       shifts, H: int, W: int, C: int):
    """K sequential NB1d blocks, all VMEM-resident: one HBM read, one write
    for the whole run (vs 2 per block).  Weight refs are stacked
    (K, 3, C, C) / (K, C); shifts is a static per-block (s1, s2, s3, s4)
    tuple (plain blocks: (1, 1, d, d); packed blocks: the block-shift
    steps from ops/packed.py)."""
    x = x_ref[0]
    for k, (s1, s2, s3, s4) in enumerate(shifts):
        xf = x.reshape(H * W, C)
        t = _taps_h(xf, w1[k], s1, W, True, b1[k])
        t = _taps_w(t.reshape(H, W, C).astype(x.dtype), w2[k], s2, H, W, C,
                    True, b2[k])
        t = _taps_h(t.reshape(H * W, C).astype(x.dtype), w3[k], s3, W, True,
                    b3[k])
        t = _taps_w(t.reshape(H, W, C).astype(x.dtype), w4[k], s4, H, W, C,
                    False, b4[k])
        x = jax.nn.relu(t + x.astype(jnp.float32)).astype(x.dtype)
    out_ref[0] = x.astype(out_ref.dtype)


@spmd.mesh_keyed_jit(static_argnames=("dils", "shifts", "interpret"))
def nb1d_stack_infer(x, stacked, *, dils=None, shifts=None,
                     interpret: bool = False):
    """Fused run of K NB1d blocks. stacked: dict of (K,3,C,C) / (K,C)
    arrays (see stack_nb1d_params).  Pass ``dils`` for plain blocks or
    ``shifts`` (per-block (s1,s2,s3,s4)) for packed runs — the caller
    reshapes to the packed (B, H, W/p, pC) view."""
    if shifts is None:
        shifts = tuple((1, 1, d, d) for d in dils)
    K = len(shifts)

    def call(x, w1, b1, w2, b2, w3, b3, w4, b4):
        # per-shard batch under a registered DP mesh
        B, H, W, C = x.shape
        kernel = functools.partial(_nb1d_stack_kernel, shifts=shifts, H=H,
                                   W=W, C=C)
        wspec = pl.BlockSpec((K, 3, C, C), lambda b: (0, 0, 0, 0),
                             memory_space=pltpu.VMEM)
        bspec = pl.BlockSpec((K, C), lambda b: (0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                wspec, bspec, wspec, bspec, wspec, bspec, wspec, bspec,
            ],
            out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=K * 12 * 2 * H * W * C * C,
                bytes_accessed=2 * H * W * C * x.dtype.itemsize
                + K * 12 * C * C * 4,
                transcendentals=0),
            interpret=interpret,
        )(x, w1, b1, w2, b2, w3, b3, w4, b4)

    return spmd.shard_batch_call(call, (True,) + (False,) * 8)(
        x, stacked["w1"], stacked["b1"], stacked["w2"], stacked["b2"],
        stacked["w3"], stacked["b3"], stacked["w4"], stacked["b4"])


def stack_nb1d_params(fused_list, dtype=jnp.float32):
    """[fuse_nb1d_params / pack_nb1d_for_pallas outputs] -> stacked
    (K,3,C,C)/(K,C) arrays."""
    out = {}
    for key in ("w1", "b1", "w2", "b2", "w3", "b3", "w4", "b4"):
        out[key] = jnp.stack([jnp.asarray(f[key], dtype)
                              for f in fused_list])
    return out


@spmd.mesh_keyed_jit(static_argnames=("p", "shifts", "interpret"))
def nb1d_stack_infer_packed(x, stacked, *, p: int, shifts,
                            interpret: bool = False):
    """Fused run of K space-to-depth packed NB1d blocks: ONE kernel for a
    whole same-C stage (e.g. the encoder's five C=64 d=1 blocks) instead
    of one pallas_call per block — saves (K-1) HBM map round-trips and
    per-call pipeline warmup (measured on the plain C=128 stack: 28.4 ->
    20.9 us/img/block at B=32).  shifts: per-block (1, s2, d, s4) from
    pack_nb1d_for_pallas."""
    B, H, W, C = x.shape
    X = x.reshape(B, H, W // p, p * C)
    out = nb1d_stack_infer(X, stacked, shifts=shifts, interpret=interpret)
    return out.reshape(B, H, W, C)


def make_encoder_layer_fn(encoder_params, encoder_state, *,
                          dtype=jnp.float32, interpret: bool = False):
    """Build a layer_fn for models.erfnet.apply_encoder that routes eligible
    inference-mode NB1d blocks through the fused kernel (XLA handles
    downsamplers and any non-eligible shapes)."""
    from ...models.erfnet import (ENCODER_LAYER_SPECS, apply_downsampler,
                                  apply_non_bottleneck_1d)

    fused = {}
    for i, (kind, args) in enumerate(ENCODER_LAYER_SPECS):
        if kind == "nb1d" and args[0] % 128 == 0:
            fused[i] = fuse_nb1d_params(encoder_params["layers"][i],
                                        encoder_state["layers"][i],
                                        dtype=dtype)

    def layer_fn(kind, i, params, state, x, spec):
        if kind == "down":
            return apply_downsampler(params, state, x, train=False,
                                     compute_dtype=dtype)
        c, drop, dil = spec
        if i in fused and nb1d_supported(x.shape, x.dtype):
            y = nb1d_infer(x.astype(dtype), fused[i], dilated=dil,
                           interpret=interpret)
            return y, state
        return apply_non_bottleneck_1d(params, state, x, dilated=dil,
                                       dropprob=0.0, train=False,
                                       compute_dtype=dtype)

    return layer_fn
