"""w8a8 int8 fused non_bottleneck_1d inference kernels (Pallas/Mosaic).

Optional quantized fast path for the reference's hot block
(train/erfnet.py:non_bottleneck_1d — SURVEY.md §2b row 1).  The v5e MXU
runs int8 x int8 -> s32 at 2x the bf16 rate; on the NB1d op mix (12
small-K matmuls + 4 requant epilogues per block) the measured win is
~1.3x (scripts/tpu_q8_microbench.py: 90.6 bf16 vs 118.7 int8 eff
T(FL)OP/s), the rest being VPU requant work overlapped imperfectly.

Scheme (standard post-training w8a8, no reference counterpart — the
reference is f32-only):

  * weights: symmetric per-output-column int8.  Each conv's three tap
    matrices accumulate into ONE s32 value per output column, so the
    column scale is shared across taps (absmax over all 3).
  * activations: symmetric per-tensor scales, calibrated offline
    (quantize.py) from the f32 intermediates.  Every NB1d input and
    every intra-block intermediate is post-ReLU, so the int8 range is
    used as [0, 127].
  * epilogues: s32 -> f32, one fused multiply by
    m_k = s_in_k * sw_k / s_out_k (vector), bias b_k / s_out_k, then
    round+clip back to int8.  ReLU folds into the [0, 127] clamp.
  * conv4 + residual run in REAL units (m4 = s_a3 * sw4, bias raw) and
    add the exact un-quantized block input — the residual path carries
    no quantization error.

Kernel I/O is bf16/f32: drop-in for nb1d_infer / nb1d_infer_packed /
nb1d_stack_infer, enabled per-block when calibrated scales exist.
Zero-fill shift semantics stay exact: real 0 is int8 0 (symmetric).
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_QMAX = 127.0


def quantize_tap_stack(w) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(3, K, N) f32 tap stack -> (int8 stack, (N,) per-column scale).

    Columns that are structurally zero (packed-layout padding) get scale
    1 so the divide is safe; their quantized taps are zero."""
    w = np.asarray(w, np.float32)
    amax = np.abs(w).max(axis=(0, 1))
    scale = np.where(amax > 0, amax / _QMAX, 1.0).astype(np.float32)
    q = np.rint(w / scale).clip(-127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(scale)


def prepare_nb1d_q8(weights: Dict[str, jnp.ndarray],
                    acts: Dict[str, float]) -> Dict[str, jnp.ndarray]:
    """Fused (BN-folded) f32 tap stacks + calibrated activation absmaxes
    -> kernel operands.

    ``weights``: fuse_nb1d_params / pack_nb1d_for_pallas output
    (w1..w4 (3,K,N), b1..b4 (N,)).  ``acts``: {"in","a1","a2","a3"}
    per-tensor absmaxes of the block input and the three post-ReLU
    intermediates (see quantize.py).  Returns q1..q4 int8 stacks,
    m1..m4 / f1..f4 f32 requant multiplier+bias vectors, and the input
    scale s_in (conv4's multiplier is in real units)."""
    s_in = float(acts["in"]) / _QMAX or 1.0
    s1 = float(acts["a1"]) / _QMAX or 1.0
    s2 = float(acts["a2"]) / _QMAX or 1.0
    s3 = float(acts["a3"]) / _QMAX or 1.0
    q1, sw1 = quantize_tap_stack(weights["w1"])
    q2, sw2 = quantize_tap_stack(weights["w2"])
    q3, sw3 = quantize_tap_stack(weights["w3"])
    q4, sw4 = quantize_tap_stack(weights["w4"])
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return {
        "q1": q1, "m1": f32(s_in * sw1 / s1), "f1": f32(weights["b1"]) / s1,
        "q2": q2, "m2": f32(s1 * sw2 / s2), "f2": f32(weights["b2"]) / s2,
        "q3": q3, "m3": f32(s2 * sw3 / s3), "f3": f32(weights["b3"]) / s3,
        "q4": q4, "m4": f32(s3 * sw4), "f4": f32(weights["b4"]),
        "s_in": np.float32(s_in),
    }


def _quant_in(x, inv_s):
    """Real (post-ReLU) activations -> int8 in [0, 127]."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) * inv_s),
                    0.0, _QMAX).astype(jnp.int8)


def _q_taps_h(q2d, w, d, W):
    """3-tap conv along H on the flattened (H*W, N) int8 map: s32
    accumulation; row shifts are contiguous d*W-element shifts."""
    acc = jnp.dot(q2d, w[1], preferred_element_type=jnp.int32)
    s = d * W
    if s >= q2d.shape[0]:
        return acc
    m0 = jnp.dot(q2d, w[0], preferred_element_type=jnp.int32)
    m2 = jnp.dot(q2d, w[2], preferred_element_type=jnp.int32)
    z = jnp.zeros((s, acc.shape[1]), jnp.int32)
    return acc + jnp.concatenate([z, m0[:-s]], axis=0) \
        + jnp.concatenate([m2[s:], z], axis=0)


def _q_taps_w(q, w, d, H, W, N):
    """3-tap conv along W on the (H, W, N) int8 map, s32 accumulation."""
    flat = q.reshape(H * W, N)
    acc = jnp.dot(flat, w[1], preferred_element_type=jnp.int32
                  ).reshape(H, W, N)
    if d >= W:
        return acc
    m0 = jnp.dot(flat, w[0], preferred_element_type=jnp.int32
                 ).reshape(H, W, N)
    m2 = jnp.dot(flat, w[2], preferred_element_type=jnp.int32
                 ).reshape(H, W, N)
    z = jnp.zeros((H, d, N), jnp.int32)
    return acc + jnp.concatenate([z, m0[:, :-d]], axis=1) \
        + jnp.concatenate([m2[:, d:], z], axis=1)


def _requant(acc, m, f):
    """s32 conv accum -> int8 next-conv input; ReLU folds into the
    [0, 127] clamp."""
    y = acc.astype(jnp.float32) * m + f
    return jnp.clip(jnp.round(y), 0.0, _QMAX).astype(jnp.int8)


def _q8_block(x, q, *, shifts, H, W, C, inv_in):
    """One int8 NB1d block on a real-valued (H, W, C) map; returns the
    real-valued output (residual added exactly)."""
    s1, s2, s3, s4 = shifts
    qx = _quant_in(x, inv_in)
    t = _requant(_q_taps_h(qx.reshape(H * W, C), q["q1"], s1, W),
                 q["m1"], q["f1"])
    t = _requant(_q_taps_w(t.reshape(H, W, C), q["q2"], s2, H, W, C)
                 .reshape(H * W, C), q["m2"], q["f2"])
    t = _requant(_q_taps_h(t, q["q3"], s3, W), q["m3"], q["f3"])
    acc = _q_taps_w(t.reshape(H, W, C), q["q4"], s4, H, W, C)
    y = acc.astype(jnp.float32).reshape(H * W, C) * q["m4"] + q["f4"]
    return jax.nn.relu(y.reshape(H, W, C) + x.astype(jnp.float32))


_Q_KEYS = ("q1", "m1", "f1", "q2", "m2", "f2", "q3", "m3", "f3",
           "q4", "m4", "f4")


def _nb1d_q8_kernel(x_ref, *refs, shifts, H, W, C, inv_in):
    q = {k: r[:] for k, r in zip(_Q_KEYS, refs[:-1])}
    out_ref = refs[-1]
    y = _q8_block(x_ref[0], q, shifts=shifts, H=H, W=W, C=C, inv_in=inv_in)
    out_ref[0] = y.astype(out_ref.dtype)


def _q8_specs(C, n_prog_dims=1):
    idx0 = (lambda b: (0, 0, 0)) if n_prog_dims == 1 else \
        (lambda b, j: (0, 0, 0))
    idx1 = (lambda b: (0,)) if n_prog_dims == 1 else (lambda b, j: (0,))
    qspec = pl.BlockSpec((3, C, C), idx0, memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((C,), idx1, memory_space=pltpu.VMEM)
    return [qspec if k[0] == "q" else vspec for k in _Q_KEYS]


def _nb1d_q8_call(x, q, *, shifts, inv_in, interpret):
    B, H, W, C = x.shape
    kernel = functools.partial(_nb1d_q8_kernel, shifts=shifts, H=H, W=W,
                               C=C, inv_in=inv_in)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + _q8_specs(C),
        out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=12 * 2 * H * W * C * C,
            bytes_accessed=2 * H * W * C * x.dtype.itemsize + 12 * C * C,
            transcendentals=0),
        interpret=interpret,
    )(x, *(q[k] for k in _Q_KEYS))


@functools.partial(jax.jit,
                   static_argnames=("dilated", "inv_in", "interpret"))
def _nb1d_infer_q8(x, q, *, dilated, inv_in, interpret):
    return _nb1d_q8_call(x, q, shifts=(1, 1, dilated, dilated),
                         inv_in=inv_in, interpret=interpret)


def nb1d_infer_q8(x, q, *, dilated: int, interpret: bool = False):
    """int8 fused NB1d block: drop-in for nb1d_infer (bf16/f32 I/O).
    The input scale is static (baked into the compiled kernel)."""
    return _nb1d_infer_q8(x, {k: q[k] for k in _Q_KEYS}, dilated=dilated,
                          inv_in=1.0 / float(q["s_in"]),
                          interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("p", "dilated", "s2", "s4", "inv_in",
                                    "interpret"))
def _nb1d_infer_packed_q8(x, q, *, p, dilated, s2, s4, inv_in, interpret):
    B, H, W, C = x.shape
    X = x.reshape(B, H, W // p, p * C)
    out = _nb1d_q8_call(X, q, shifts=(1, s2, dilated, s4), inv_in=inv_in,
                        interpret=interpret)
    return out.reshape(B, H, W, C)


def nb1d_infer_packed_q8(x, q, *, p: int, dilated: int, s2: int, s4: int,
                         interpret: bool = False):
    """int8 space-to-depth packed NB1d block: drop-in for
    nb1d_infer_packed (q built from pack_nb1d_for_pallas f32 stacks)."""
    return _nb1d_infer_packed_q8(x, {k: q[k] for k in _Q_KEYS}, p=p,
                                 dilated=dilated, s2=s2, s4=s4,
                                 inv_in=1.0 / float(q["s_in"]),
                                 interpret=interpret)


def _nb1d_q8_stack_kernel(x_ref, *refs, shifts, H, W, C, inv_ins):
    qs = {}
    for k, r in zip(_Q_KEYS, refs[:-1]):
        qs[k] = r[:]
    out_ref = refs[-1]
    x = x_ref[0].astype(jnp.float32)
    for j, s in enumerate(shifts):
        q = {k: qs[k][j] for k in _Q_KEYS}
        x = _q8_block(x, q, shifts=s, H=H, W=W, C=C, inv_in=inv_ins[j])
    out_ref[0] = x.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("shifts", "inv_ins",
                                             "interpret"))
def _stack_q8_call(x, stacked, *, shifts, inv_ins, interpret):
    B, H, W, C = x.shape
    K = len(shifts)
    kernel = functools.partial(_nb1d_q8_stack_kernel, shifts=shifts, H=H,
                               W=W, C=C, inv_ins=inv_ins)
    qspec = pl.BlockSpec((K, 3, C, C), lambda b: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((K, C), lambda b: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [qspec if k[0] == "q" else vspec for k in _Q_KEYS],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=K * 12 * 2 * H * W * C * C,
            bytes_accessed=2 * H * W * C * x.dtype.itemsize
            + K * 12 * C * C,
            transcendentals=0),
        interpret=interpret,
    )(x, *(stacked[k] for k in _Q_KEYS))


def nb1d_stack_infer_q8(x, stacked, *, inv_ins, dils=None, shifts=None,
                        interpret: bool = False):
    """int8 fused run of K consecutive NB1d blocks: drop-in for
    nb1d_stack_infer.  stacked: dict of (K,3,C,C) int8 / (K,C) f32 arrays
    (see stack_nb1d_q8); inv_ins: static per-block 1/s_in tuple.  Pass
    ``dils`` for plain blocks or per-block ``shifts`` for packed runs."""
    if shifts is None:
        shifts = tuple((1, 1, d, d) for d in dils)
    return _stack_q8_call(x, stacked, shifts=shifts, inv_ins=inv_ins,
                          interpret=interpret)


def stack_nb1d_q8(q_list: Sequence[Dict[str, jnp.ndarray]]):
    """[prepare_nb1d_q8 outputs] -> (stacked arrays, static inv_ins)."""
    out = {k: jnp.stack([q[k] for q in q_list]) for k in _Q_KEYS}
    inv_ins = tuple(1.0 / float(q["s_in"]) for q in q_list)
    return out, inv_ins


@functools.partial(jax.jit, static_argnames=("p", "shifts", "inv_ins",
                                             "interpret"))
def nb1d_stack_infer_packed_q8(x, stacked, *, p: int, shifts, inv_ins,
                               interpret: bool = False):
    """int8 fused run of K space-to-depth packed NB1d blocks: drop-in for
    nb1d_stack_infer_packed (stacked built from pack_nb1d_for_pallas f32
    stacks)."""
    B, H, W, C = x.shape
    X = x.reshape(B, H, W // p, p * C)
    out = _stack_q8_call(X, stacked, shifts=shifts, inv_ins=inv_ins,
                         interpret=interpret)
    return out.reshape(B, H, W, C)
