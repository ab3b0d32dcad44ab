"""Packed-layout UpsamplerBlock kernel (Pallas, custom VJP) — train path.

Reference surface: ``train/erfnet.py:UpsamplerBlock`` (ConvTranspose2d
k3 s2 p1 op1 + BN + ReLU; SURVEY.md §2a row 1).  The XLA train path
assembled 4 shifted input copies (ops/convt_mm.py xcat), ran the parity
matmul, depth-to-spaced to full resolution, and space-to-depth re-packed
for the next NB1d stage — ~5 ms/step of pure layout traffic at batch 6.

TPU-native identity used here: a stride-2 transposed conv from a
W-packed input (B, H, Wb, pi*Cin) straight into the NEXT stage's W-packed
layout (B, 2H, Wbo, po*Cout) is

    out_a = sum_{qh, qw in {0,1}}  shift(Xm, qh rows, qw blocks) @ K[a,qh,qw]

with Xm the input with adjacent blocks lane-merged to po/2 slots and
K[a,qh,qw] constant slot-placements of the parity-plane weight blocks
(built by ONE traced einsum -> autodiff maps dK back to the conv weight).
a in {0,1} is the output row parity; rows interleave via a free
(H, 2, ...) -> (2H, ...) leading-dim merge.  8 MXU matmuls per image
replace the whole xcat/d2s/pack chain; the custom-VJP backward runs the
transposed shifts and accumulates dK in f32 across the batch grid.

BatchNorm stays in XLA between stages (ops/packed.py:_bn_packed computes
exact unpacked batch stats on packed tensors).

CLOSED AVENUE (r5, paper analysis — do not A/B): the NB1d W-conv
side-merge does not extend here.  K[a, qh, qw=1] (the block-spill
matrix) is nonzero only at input slot u_in = 0 — but K[a, qh, qw=0]
also uses u_in = 0 (for t's u=0, mw=0 placement), so the candidate
pair's K-row supports OVERLAP at the wrap slot and a lane-select merge
is invalid (the NB1d merge works because the +s/-s SIDE taps occupy
disjoint END slots; a one-sided spill always collides with the main
matrix).  Upper bound if it were valid: 2 of 8 matmuls, with down+ups
together ~0.12 of 0.748 ms/img infer device time (r3 profile) — ~2%
e2e ceiling, below the 3% A/B bar.
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
from .stats import emit_stats


@functools.lru_cache(maxsize=None)
def _ups_placement(pi: int, po: int):
    """One-hot S (2a, 2qh, 2qw, 4row, 4col, po/2 u_in, po t): routes the
    parity-plane weight block (row m = [x, x_h, x_w, x_hw], col n = plane
    a*2+b of ops/convt_mm.py:build_upsampler_matmul) into the packed tap
    matrix K[a, qh, qw].  Output slot t = 2u + b reads merged-input slot
    u + mw, spilling into block qw = (u + mw) // (po/2)."""
    half = po // 2
    assert half % pi == 0
    rowidx = {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3}
    S = np.zeros((2, 2, 2, 4, 4, half, po), np.float32)
    for a in (0, 1):
        for mh in (0, 1):
            for mw in (0, 1):
                for t in range(po):
                    b, u = t % 2, t // 2
                    qw, u_in = (u + mw) // half, (u + mw) % half
                    S[a, mh, qw, rowidx[(mh, mw)], a * 2 + b, u_in, t] += 1
    return S


def build_ups_packed(Wcat, bias4, pi: int, po: int):
    """(Wcat (4Cin, 4Cout), bias4 (4Cout,)) from build_upsampler_matmul ->
    (K (2,2,2, (po/2)*Cin, po*Cout), bias (po*Cout,)).  Traced einsum."""
    cin = Wcat.shape[0] // 4
    cout = Wcat.shape[1] // 4
    half = po // 2
    S = jnp.asarray(_ups_placement(pi, po), Wcat.dtype)
    Wblk = Wcat.reshape(4, cin, 4, cout)
    K = jnp.einsum("aqwmnut,mcnd->aqwuctd", S, Wblk)
    return (K.reshape(2, 2, 2, half * cin, po * cout),
            jnp.tile(bias4[:cout], po))


def _hshift(m, q: int):
    """Axis 0 of (H, Wb, C): out[i] = m[i + q], zero fill."""
    if q == 0:
        return m
    z = jnp.zeros((abs(q),) + m.shape[1:], m.dtype)
    return (jnp.concatenate([m[q:], z], 0) if q > 0
            else jnp.concatenate([z, m[:q]], 0))


def _bshift(m, q: int):
    if q == 0:
        return m
    if abs(q) >= m.shape[1]:
        # whole axis shifted out (Wb == 1 maps, e.g. a 128-wide stem at
        # pi=128): the kept slice m[:, q:] / m[:, :q] would be a
        # zero-size vector, which Mosaic refuses to lower ("vector types
        # must have positive constant sizes") even though the interpret
        # path accepts it — the exact result is all zeros.
        return jnp.zeros_like(m)
    z = jnp.zeros(m.shape[:-2] + (abs(q), m.shape[-1]), m.dtype)
    return (jnp.concatenate([m[:, q:], z], 1) if q > 0
            else jnp.concatenate([z, m[:, :q]], 1))


def _ups_fwd_kernel(x_ref, K, bias, out_ref, *, H, Wbo, Chm, Co):
    x = x_ref[0].reshape(H, Wbo, Chm)          # lane-merge adjacent blocks
    xf = x.reshape(H * Wbo, Chm)
    Kc = K[:].astype(x.dtype)
    b = bias[:].astype(jnp.float32)
    for a in (0, 1):
        acc = None
        for qh in (0, 1):
            for qw in (0, 1):
                m = jnp.dot(xf, Kc[a, qh, qw],
                            preferred_element_type=jnp.float32)
                m = m.reshape(H, Wbo, Co)
                if qh:
                    m = _hshift(m, qh)
                if qw:
                    m = _bshift(m, qw)
                acc = m if acc is None else acc + m
        out_ref[0, :, a] = (acc + b).astype(out_ref.dtype)


def _ups_bwd_kernel(x_ref, g_ref, K, dx_ref, dK_ref, db_ref, *,
                    H, Wbo, Chm, Co):
    _ups_bwd_math(x_ref, g_ref[0], K, dx_ref, dK_ref, db_ref,
                  H=H, Wbo=Wbo, Chm=Chm, Co=Co)


def _ups_bwd_math(x_ref, g, K, dx_ref, dK_ref, db_ref, *,
                  H, Wbo, Chm, Co):
    i = pl.program_id(0)
    x = x_ref[0].reshape(H, Wbo, Chm)
    xf = x.reshape(H * Wbo, Chm)
    Kc = K[:].astype(x.dtype)
    dxm = None
    dKs = []
    db = None
    for a in (0, 1):
        ga = g[:, a]                            # (H, Wbo, Co)
        db_a = jnp.sum(ga.reshape(H * Wbo, Co).astype(jnp.float32), axis=0)
        db = db_a if db is None else db + db_a
        for qh in (0, 1):
            for qw in (0, 1):
                gs = ga
                if qh:
                    gs = _hshift(gs, -qh)
                if qw:
                    gs = _bshift(gs, -qw)
                gsf = gs.reshape(H * Wbo, Co)
                dKs.append(jax.lax.dot_general(
                    xf, gsf, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
                m = jax.lax.dot_general(
                    gsf, Kc[a, qh, qw],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dxm = m if dxm is None else dxm + m
    dx_ref[0] = dxm.reshape(x_ref.shape[1:]).astype(dx_ref.dtype)
    dK = jnp.stack(dKs).reshape(2, 2, 2, Chm, Co)
    db = db.reshape(1, Co)

    @pl.when(i == 0)
    def _():
        dK_ref[:] = dK
        db_ref[:] = db

    @pl.when(i > 0)
    def _():
        dK_ref[:] = dK_ref[:] + dK
        db_ref[:] = db_ref[:] + db


_VMEM_LIMIT = 110 * 1024 * 1024


def _call_fwd(x, K, bias, *, interpret):
    return spmd.shard_batch_call(
        functools.partial(_call_fwd_local, interpret=interpret),
        (True, False, False))(x, K, bias)


def _call_fwd_local(x, K, bias, *, interpret):
    B, H, Wb, Ci = x.shape
    Chm, Co = K.shape[3], K.shape[4]
    Wbo = (H * Wb * Ci) // (H * Chm)
    kernel = functools.partial(_ups_fwd_kernel, H=H, Wbo=Wbo, Chm=Chm, Co=Co)
    v = pltpu.VMEM
    out5 = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Wb, Ci), lambda b: (b, 0, 0, 0),
                         memory_space=v),
            pl.BlockSpec(K.shape, lambda b: (0,) * 5, memory_space=v),
            pl.BlockSpec((Co,), lambda b: (0,), memory_space=v),
        ],
        out_specs=pl.BlockSpec((1, H, 2, Wbo, Co),
                               lambda b: (b, 0, 0, 0, 0), memory_space=v),
        out_shape=jax.ShapeDtypeStruct((B, H, 2, Wbo, Co), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=8 * 2 * H * Wbo * Chm * Co,
            bytes_accessed=2 * H * Wb * Ci * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, K, bias)
    return out5.reshape(B, 2 * H, Wbo, Co)


def _call_bwd(x, g, K, *, interpret):
    dx, dK, db = spmd.shard_batch_call(
        functools.partial(_call_bwd_local, interpret=interpret),
        (True, True, False), reduce_out=(False, True, True))(x, g, K)
    return dx, dK, db.reshape(-1)


def _call_bwd_local(x, g, K, *, interpret):
    B, H, Wb, Ci = x.shape
    Chm, Co = K.shape[3], K.shape[4]
    Wbo = (H * Wb * Ci) // (H * Chm)
    kernel = functools.partial(_ups_bwd_kernel, H=H, Wbo=Wbo, Chm=Chm, Co=Co)
    v = pltpu.VMEM
    dx, dK, db = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Wb, Ci), lambda b: (b, 0, 0, 0),
                         memory_space=v),
            pl.BlockSpec((1, H, 2, Wbo, Co), lambda b: (b, 0, 0, 0, 0),
                         memory_space=v),
            pl.BlockSpec(K.shape, lambda b: (0,) * 5, memory_space=v),
        ],
        out_specs=(
            pl.BlockSpec((1, H, Wb, Ci), lambda b: (b, 0, 0, 0),
                         memory_space=v),
            pl.BlockSpec(K.shape, lambda b: (0,) * 5, memory_space=v),
            pl.BlockSpec((1, Co), lambda b: (0, 0), memory_space=v),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(K.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, Co), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=24 * 2 * H * Wbo * Chm * Co,
            bytes_accessed=4 * H * Wb * Ci * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, g.reshape(B, H, 2, Wbo, Co), K)
    return dx, dK, db


@functools.lru_cache(maxsize=None)
def _ups_op(interpret: bool):
    @jax.custom_vjp
    def op(x, K, bias):
        return _call_fwd(x, K, bias, interpret=interpret)

    def fwd(x, K, bias):
        return _call_fwd(x, K, bias, interpret=interpret), (x, K)

    def bwd(res, g):
        x, K = res
        dx, dK, db = _call_bwd(x, g.astype(x.dtype), K, interpret=interpret)
        return dx, dK.astype(K.dtype), db

    op.defvjp(fwd, bwd)
    return op


def upsampler_packed(x, w_hwio, b, *, pi: int, po: int,
                     interpret: Optional[bool] = None):
    """Packed-in/packed-out UpsamplerBlock conv (pre-BN).

    x: (B, H, Wb, pi*Cin) W-packed activations; w_hwio/b the
    ConvTranspose2d(Cin, Cout, 3, s2, p1, op1) parameters in forward-conv
    HWIO storage (ops/conv.py).  Returns (B, 2H, Wbo, po*Cout) with
    Wbo = Wb * 2 * pi // po.  Differentiable in x, w, b.
    """
    from ..convt_mm import build_upsampler_matmul
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    Wcat, bias4 = build_upsampler_matmul(w_hwio, b)
    K, bias = build_ups_packed(Wcat, bias4, pi, po)
    return _ups_op(bool(interpret))(x, K.astype(jnp.float32),
                                    bias.astype(jnp.float32))


def ups_packed_supported(x_shape, pi: int, po: int) -> bool:
    b, h, wb, ci = x_shape
    cin = ci // pi
    half = po // 2
    return (ci % 128 == 0 and half % pi == 0
            and (wb * pi * 2) % po == 0
            and h * wb * ci <= 2 * 1024 * 1024
            and b % spmd.data_shards() == 0)


# ---------------------------------------------------------------------------
# Stats-emitting variant: the kernel also writes the output's PER-ROW
# batch sum / sum-of-squares (the following BatchNorm's cross-batch
# statistics; ops/packed.py:stat_sums_from_rows reduces the rows —
# pad-row-exact under DP padding) and the backward folds the per-row
# stats cotangents in-kernel — same design as ops/pallas/nb1d_train.py's
# ``*_stats`` ops.
# ---------------------------------------------------------------------------

def _ups_fwd_kernel_st(x_ref, K, bias, out_ref, s1_ref, s2_ref, *,
                       H, Wbo, Chm, Co):
    _ups_fwd_kernel(x_ref, K, bias, out_ref, H=H, Wbo=Wbo, Chm=Chm, Co=Co)
    z = out_ref[0].astype(jnp.float32).reshape(H * 2 * Wbo, Co)
    emit_stats(z, s1_ref, s2_ref)


def _ups_bwd_kernel_st(x_ref, g_ref, z_ref, gs1, gs2, K, dx_ref, dK_ref,
                       db_ref, *, H, Wbo, Chm, Co):
    # fold dz += gs1[b] + 2 z gs2[b] into the incoming cotangent, then
    # reuse the base backward math on the adjusted gradient
    g = g_ref[0].astype(jnp.float32)
    z = z_ref[0].astype(jnp.float32)
    g = (g + gs1[:].reshape(1, 1, 1, Co)
         + 2.0 * z * gs2[:].reshape(1, 1, 1, Co)).astype(g_ref.dtype)
    _ups_bwd_math(x_ref, g, K, dx_ref, dK_ref, db_ref,
                  H=H, Wbo=Wbo, Chm=Chm, Co=Co)


def _call_fwd_st(x, K, bias, *, interpret):
    def call(x, K, bias):
        B, H, Wb, Ci = x.shape
        Chm, Co = K.shape[3], K.shape[4]
        Wbo = (H * Wb * Ci) // (H * Chm)
        kernel = functools.partial(_ups_fwd_kernel_st, H=H, Wbo=Wbo,
                                   Chm=Chm, Co=Co)
        v = pltpu.VMEM
        # (B, 1, Co) stat arrays with (1, 1, Co) blocks: Mosaic requires
        # the LAST TWO block dims to be (8,128)-divisible or equal to the
        # array dims — a (1, Co) block over (B, Co) does not lower
        sspec = pl.BlockSpec((1, 1, Co), lambda b: (b, 0, 0),
                             memory_space=v)
        out5, s1, s2 = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, Wb, Ci), lambda b: (b, 0, 0, 0),
                             memory_space=v),
                pl.BlockSpec(K.shape, lambda b: (0,) * 5, memory_space=v),
                pl.BlockSpec((Co,), lambda b: (0,), memory_space=v),
            ],
            out_specs=(pl.BlockSpec((1, H, 2, Wbo, Co),
                                    lambda b: (b, 0, 0, 0, 0),
                                    memory_space=v), sspec, sspec),
            out_shape=(jax.ShapeDtypeStruct((B, H, 2, Wbo, Co), x.dtype),
                       jax.ShapeDtypeStruct((B, 1, Co), jnp.float32),
                       jax.ShapeDtypeStruct((B, 1, Co), jnp.float32)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=8 * 2 * H * Wbo * Chm * Co,
                bytes_accessed=2 * H * Wb * Ci * x.dtype.itemsize,
                transcendentals=0),
            interpret=interpret,
        )(x, K, bias)
        return out5.reshape(B, 2 * H, Wbo, Co), s1[:, 0], s2[:, 0]

    return spmd.shard_batch_call(
        call, (True, False, False),
        reduce_out=(False, False, False))(x, K, bias)


def _call_bwd_st(x, g, z, gs1, gs2, K, *, interpret):
    def call(x, g, z, gs1, gs2, K):
        B, H, Wb, Ci = x.shape
        Chm, Co = K.shape[3], K.shape[4]
        Wbo = (H * Wb * Ci) // (H * Chm)
        kernel = functools.partial(_ups_bwd_kernel_st, H=H, Wbo=Wbo,
                                   Chm=Chm, Co=Co)
        v = pltpu.VMEM
        g5 = g.reshape(B, H, 2, Wbo, Co)
        z5 = z.reshape(B, H, 2, Wbo, Co)
        gs1, gs2 = gs1[:, None], gs2[:, None]  # (B, 1, Co), see fwd sspec
        sspec = pl.BlockSpec((1, 1, Co), lambda b: (b, 0, 0),
                             memory_space=v)
        map5 = pl.BlockSpec((1, H, 2, Wbo, Co), lambda b: (b, 0, 0, 0, 0),
                            memory_space=v)
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, Wb, Ci), lambda b: (b, 0, 0, 0),
                             memory_space=v),
                map5, map5, sspec, sspec,
                pl.BlockSpec(K.shape, lambda b: (0,) * 5, memory_space=v),
            ],
            out_specs=(
                pl.BlockSpec((1, H, Wb, Ci), lambda b: (b, 0, 0, 0),
                             memory_space=v),
                pl.BlockSpec(K.shape, lambda b: (0,) * 5, memory_space=v),
                pl.BlockSpec((1, Co), lambda b: (0, 0), memory_space=v),
            ),
            out_shape=(
                jax.ShapeDtypeStruct(x.shape, x.dtype),
                jax.ShapeDtypeStruct(K.shape, jnp.float32),
                jax.ShapeDtypeStruct((1, Co), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=24 * 2 * H * Wbo * Chm * Co,
                bytes_accessed=5 * H * Wb * Ci * x.dtype.itemsize,
                transcendentals=0),
            interpret=interpret,
        )(x, g5, z5, gs1, gs2, K)

    dx, dK, db = spmd.shard_batch_call(
        call, (True, True, True, True, True, False),
        reduce_out=(False, True, True))(x, g, z, gs1, gs2, K)
    return dx, dK, db.reshape(-1)


@functools.lru_cache(maxsize=None)
def _ups_op_st(interpret: bool):
    @jax.custom_vjp
    def op(x, K, bias):
        return _call_fwd_st(x, K, bias, interpret=interpret)

    def fwd(x, K, bias):
        y, s1, s2 = _call_fwd_st(x, K, bias, interpret=interpret)
        return (y, s1, s2), (x, K, y)

    def bwd(res, g):
        x, K, y = res
        gy, gs1, gs2 = g
        dx, dK, db = _call_bwd_st(
            x, gy.astype(x.dtype), y, gs1.astype(jnp.float32),
            gs2.astype(jnp.float32), K, interpret=interpret)
        return dx, dK.astype(K.dtype), db

    op.defvjp(fwd, bwd)
    return op


def upsampler_packed_stats(x, w_hwio, b, *, pi: int, po: int,
                           interpret=None):
    """upsampler_packed that also returns (y, s1, s2) batch statistics of
    the output (per output lane, f32) for the following BatchNorm."""
    from ..convt_mm import build_upsampler_matmul
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    Wcat, bias4 = build_upsampler_matmul(w_hwio, b)
    K, bias = build_ups_packed(Wcat, bias4, pi, po)
    return _ups_op_st(bool(interpret))(x, K.astype(jnp.float32),
                                       bias.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Eval variant, h-blocked for big maps: ConvTranspose + folded running-stat
# BN (into the tap matrix, via build_upsampler_matmul's bn args) + ReLU in
# one kernel, grid (B, H/R).  The s2 k3 p1 op1 transposed conv reads input
# rows i and i+1 for output packed-row i, so the halo is 1 input row on
# the BOTTOM edge only (the in-kernel _hshift zero-fill at the window's
# last row IS the conv padding iff the window ends at the true bottom;
# interior windows drop that row via the kept-slice).  Profiled
# motivation: the two XLA conv_transpose upsamplers + their relayout
# copies cost ~2.6 ms of the 6.2 ms device step at 1024x2048 batch 1.
# ---------------------------------------------------------------------------

def _ups_blocked_rows(H, Wb, Ci, Wbo, Co, max_elems):
    """Kept packed-H rows R per block: per row the window holds 1 input
    row (Wb*Ci) + 2 output parity rows (2*Wbo*Co); R % 8 == 0, R | H."""
    W_elems = Wb * Ci + 2 * Wbo * Co
    cap = max_elems // W_elems
    R = H if cap >= H else cap - 1      # whole map needs no halo row
    R -= R % 8
    while R >= 8 and H % R:
        R -= 8
    return max(R, 0)


def _ups_eval_kernel_blocked(x_hbm, K, bias, out_ref, scratch, ybuf, sem,
                             *, R, Rw, H, Wbo, Chm, Co):
    b = pl.program_id(0)
    j = pl.program_id(1)
    s = j * R
    w_s = jnp.clip(s, 0, H - Rw)
    dma = pltpu.make_async_copy(x_hbm.at[b, pl.ds(w_s, Rw)], scratch, sem)
    dma.start()
    dma.wait()
    x = scratch[:]                             # (Rw, Wb, Ci)
    xf = x.reshape(Rw, Wbo, Chm).reshape(Rw * Wbo, Chm)
    Kc = K[:].astype(x.dtype)
    bia = bias[:].astype(jnp.float32)
    for a in (0, 1):
        acc = None
        for qh in (0, 1):
            for qw in (0, 1):
                m = jnp.dot(xf, Kc[a, qh, qw],
                            preferred_element_type=jnp.float32)
                m = m.reshape(Rw, Wbo, Co)
                if qh:
                    m = _hshift(m, qh)
                if qw:
                    m = _bshift(m, qw)
                acc = m if acc is None else acc + m
        ybuf[:, a] = jnp.maximum(acc + bia, 0.0).astype(ybuf.dtype)
    out_ref[0] = ybuf[pl.ds(s - w_s, R)]


def _call_ups_eval_blocked(x, K, bias, *, R, interpret):
    B, H, Wb, Ci = x.shape
    Chm, Co = K.shape[3], K.shape[4]
    Wbo = (Wb * Ci) // Chm
    nH = H // R
    Rw = min(H, R + 1)
    kernel = functools.partial(_ups_eval_kernel_blocked, R=R, Rw=Rw, H=H,
                               Wbo=Wbo, Chm=Chm, Co=Co)
    v = pltpu.VMEM
    out5 = pl.pallas_call(
        kernel,
        grid=(B, nH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(K.shape, lambda b, j: (0,) * 5, memory_space=v),
            pl.BlockSpec((Co,), lambda b, j: (0,), memory_space=v),
        ],
        out_specs=pl.BlockSpec((1, R, 2, Wbo, Co),
                               lambda b, j: (b, j, 0, 0, 0),
                               memory_space=v),
        out_shape=jax.ShapeDtypeStruct((B, H, 2, Wbo, Co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((Rw, Wb, Ci), x.dtype),
            pltpu.VMEM((Rw, 2, Wbo, Co), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=8 * 2 * H * Wbo * Chm * Co * Rw // R,
            bytes_accessed=(Rw * nH + 2 * H) * Wb * Ci * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, K, bias)
    return out5.reshape(B, 2 * H, Wbo, Co)


@spmd.mesh_keyed_jit(static_argnames=("pi", "po", "eps", "max_elems",
                                      "interpret"))
def upsampler_packed_eval(x, w_hwio, b, gamma, beta, mean, var, *, pi: int,
                          po: int, eps: float, max_elems: int,
                          interpret: Optional[bool] = None):
    """Whole eval UpsamplerBlock (ConvTranspose2d k3 s2 p1 op1 -> BN with
    running stats -> ReLU, ``train/erfnet.py:UpsamplerBlock`` in eval
    mode) as one h-blocked Pallas kernel, packed-in/packed-out.
    x (B, H, Wb, pi*Cin) -> (B, 2H, Wbo, po*Cout)."""
    from ..convt_mm import build_upsampler_matmul
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    Wcat, bias4 = build_upsampler_matmul(
        w_hwio, b, {"scale": gamma, "bias": beta},
        {"mean": mean, "var": var}, eps=eps)
    K, bias = build_ups_packed(Wcat, bias4, pi, po)
    B, H, Wb, Ci = x.shape
    half = po // 2
    Chm = half * (Ci // pi)
    Wbo = (Wb * Ci) // Chm
    Co = K.shape[-1]
    R = _ups_blocked_rows(H, Wb, Ci, Wbo, Co, max_elems)
    call = functools.partial(_call_ups_eval_blocked, R=R,
                             interpret=bool(interpret))
    return spmd.shard_batch_call(call, (True, False, False))(
        x, K.astype(jnp.float32), bias.astype(jnp.float32))


def ups_packed_eval_supported(x_shape, pi: int, po: int, cout: int,
                              max_elems: int) -> bool:
    b, h, wb, ci = x_shape
    half = po // 2
    if not (ci % 128 == 0 and half % pi == 0 and (wb * pi * 2) % po == 0
            and wb >= 2  # Wb==1 fails Mosaic's bf16 memref tiling floor
            and b % spmd.data_shards() == 0):
        return False
    chm = half * (ci // pi)
    wbo = (wb * ci) // chm
    return (wbo >= 2
            and _ups_blocked_rows(h, wb, ci, wbo, po * cout, max_elems) >= 8)
