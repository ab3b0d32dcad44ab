"""Custom-VJP fused NB1d conv-pair kernels — the TRAINING-path hot op.

The reference's non_bottleneck_1d (train/erfnet.py — SURVEY.md §2a row 1)
is two factorized-conv pairs separated by BatchNorms.  In matmul form the
XLA training step is PER-OP-OVERHEAD bound on this chip (~20-30 us fixed
cost per op; the math itself is microseconds), so each pair

    pair(x) = conv_w( relu( conv_h(maybe_relu(x)) + bh ) ) + bw

is fused into ONE Pallas forward kernel and ONE Pallas backward kernel
(jax.custom_vjp).  Cross-batch BatchNorm stays in XLA between pairs (its
batch reduction must see all images); the backward kernel RECOMPUTES the
intra-pair activations from the saved input (flash-attention-style), so
the only residual is the pair input — no extra HBM traffic vs XLA AD.

Geometry: x is (B, H, Wb, C) with C a multiple of 128 — either the real
128-channel encoder maps (Wb = W) or space-to-depth packed small-channel
maps (ops/packed.py: (H, W/p, p*C)).  A 3-tap factorized conv is three
shifted (H*Wb, C) x (C, C) MXU matmuls:

    H-axis taps: row shift by sh*Wb in the flattened map
    W-axis taps: block shift by sw along Wb (block-tridiagonal packed K)

Weight gradients are accumulated across the batch grid in f32 via output
revisiting (constant index_map + @pl.when(b == 0) init-else-add).

Tap-stack builders (stack_taps_h / stack_taps_w) produce the packed
(3, pC, pC) weights as a single traced einsum against a constant one-hot
placement tensor, so JAX autodiff transposes dK back to the original
(3, C, C) conv weights in one op.
"""

from __future__ import annotations

import functools
from contextlib import contextmanager
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...parallel import spmd
from .stats import acc as _acc, emit_stats as _emit_stats_flat

# ---------------------------------------------------------------------------
# Enable switch: auto = fused kernels on TPU, plain-XLA path on CPU (the
# interpreter is for parity tests, not speed).
# ---------------------------------------------------------------------------

_ENABLED: Optional[bool] = None  # None = auto

# Per-direction side-merge of the packed W-convs' side-tap matmuls
# (thrw > 0; see _conv3_w).  Module CONSTANTS baked into the lru-cached
# kernel ops at build time (flipping them mid-process without clearing
# the _pair_op* caches replays stale programs — the A/B script clears
# them).  Measured on v5e (TRAIN_MERGE_AB.json): see the file for the
# shipped configuration's numbers.
FWD_SIDE_MERGE = True
BWD_SIDE_MERGE = True


def _check_thrw_contract(ww, thrw):
    """Fail loudly on thrw misuse (see the fused_pair docstring): with the
    side-merge enabled, ``thrw > 0`` asserts that ``ww[2]`` has nonzero
    K-rows only in ``[0, thrw)`` and ``ww[0]`` only in ``[C-thrw, C)`` —
    true by construction for ``stack_taps_w`` output (2*du <= p), and the
    merged forward/side-dW math is WRONG for any other ww.  Only concrete
    (non-traced) weights can be checked; under jit the contract is the
    caller's responsibility (the packed train path satisfies it)."""
    if not thrw or not (FWD_SIDE_MERGE or BWD_SIDE_MERGE):
        return
    if isinstance(ww, jax.core.Tracer):
        return
    w = np.asarray(ww)
    C = w.shape[-1]
    if w[0][: C - thrw].any() or w[2][thrw:].any():
        raise ValueError(
            f"thrw={thrw} passed with a dense ww: the side-merge requires "
            f"ww built by stack_taps_w (ww[2] rows >= {thrw} and ww[0] "
            f"rows < {C - thrw} must be zero); a dense ww would compute a "
            f"wrong forward and wrong dww under the merge")


def fused_train_enabled() -> bool:
    if _ENABLED is None:
        # auto: on for accelerators — single-chip, or multi-chip once the
        # trainer registers its DP mesh (parallel/spmd.py wraps each
        # batch-grid kernel in shard_map over the data axis).  Off on CPU
        # (interpret mode is for tests) and off when >1 device is visible
        # but no mesh was registered (plain jit would gather the batch).
        return (jax.default_backend() not in ("cpu",)
                and (jax.device_count() == 1
                     or spmd.active()[0] is not None))
    return _ENABLED


def set_fused_train(v: Optional[bool]) -> None:
    global _ENABLED
    _ENABLED = v


@contextmanager
def fused_train(v: Optional[bool]):
    global _ENABLED
    old = _ENABLED
    _ENABLED = v
    try:
        yield
    finally:
        _ENABLED = old


# VMEM sizing guard: per-image map element count (backward holds ~6-8 live
# (M, C) buffers; 2M f32 elements each stays within the v5e's VMEM).
_MAX_MAP_ELEMS = 2 * 1024 * 1024


def pair_supported(shape) -> bool:
    b, h, wb, c = shape
    return (c % 128 == 0 and (h * wb) % 8 == 0
            and h * wb * c <= _MAX_MAP_ELEMS
            and b % spmd.data_shards() == 0)


# ---------------------------------------------------------------------------
# Traced packed tap-stack builders (single einsum — differentiable, cheap).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _w_placement(p: int, d: int) -> Tuple[np.ndarray, int]:
    """One-hot placement S (3, 3, p, p): S[qi, k, j_in, j_out] = 1 where the
    W-axis tap k (offset (k-1)*d) routes output slot j_out from block-shift
    q in (-s, 0, s) slot j_in.  Mirrors ops/packed.py:build_packed_taps_w."""
    entries, qs = [], set()
    for k, o in ((0, -d), (1, 0), (2, +d)):
        for j_out in range(p):
            src = j_out + o
            q, j_in = src // p, src % p
            entries.append((q, k, j_in, j_out))
            qs.add(q)
    s = max(abs(q) for q in qs) or 1
    assert qs <= {-s, 0, s}, f"asymmetric packed taps {sorted(qs)}"
    qidx = {-s: 0, 0: 1, s: 2}
    S = np.zeros((3, 3, p, p), np.float32)
    for q, k, j_in, j_out in entries:
        S[qidx[q], k, j_in, j_out] += 1.0
    return S, s


def stack_taps_w(w3, p: int, d: int):
    """(3, C, C) W-axis taps -> ((3, pC, pC) block stack, block shift s)."""
    if p == 1:
        return w3, d
    S, s = _w_placement(p, d)
    C = w3.shape[1]
    K = jnp.einsum("qkij,kcd->qicjd", jnp.asarray(S, w3.dtype), w3)
    return K.reshape(3, p * C, p * C), s


def stack_taps_h(w3, p: int):
    """(3, C, C) H-axis taps -> block-diagonal (3, pC, pC) (kron(I_p, w))."""
    if p == 1:
        return w3
    C = w3.shape[1]
    eye = jnp.eye(p, dtype=w3.dtype)
    return jnp.einsum("ij,kcd->kicjd", eye, w3).reshape(3, p * C, p * C)


# ---------------------------------------------------------------------------
# Shared jnp tap math (used inside the kernels AND as the jnp oracle).
# out[i] = sum_k x[i + q_k] @ W_k, q_k = (k-1)*s; shift applied to the
# matmul RESULT (all three matmuls share the x operand).  trans=True gives
# the AD transpose: sum_k x[i - q_k] @ W_k^T.
# ---------------------------------------------------------------------------

def _rshift(m, q: int):
    """Rows of (M, C): out[i] = m[i + q], zero fill."""
    if q == 0:
        return m
    z = jnp.zeros((abs(q),) + m.shape[1:], m.dtype)
    return (jnp.concatenate([m[q:], z], 0) if q > 0
            else jnp.concatenate([z, m[:q]], 0))


def _bshift(m, q: int):
    """Axis -2 of (H, Wb, C): out[:, j] = m[:, j + q], zero fill."""
    if q == 0:
        return m
    if abs(q) >= m.shape[1]:
        # Wb == 1: the kept slice would be zero-size, which Mosaic
        # rejects (see upsampler._bshift); the exact result is zeros.
        return jnp.zeros_like(m)
    z = jnp.zeros(m.shape[:-2] + (abs(q), m.shape[-1]), m.dtype)
    return (jnp.concatenate([m[:, q:], z], 1) if q > 0
            else jnp.concatenate([z, m[:, :q]], 1))


def _dot(x2d, w, trans: bool):
    dn = (((1,), (1,)), ((), ())) if trans else (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(x2d, w, dimension_numbers=dn,
                               preferred_element_type=jnp.float32)


def _conv3_h(x2d, w3, srows: int, trans: bool = False):
    """f32 (M, C) = 3-tap H conv on the flattened map (row shift srows)."""
    acc = None
    for k in range(3):
        q = (k - 1) * srows * (-1 if trans else 1)
        if abs(q) >= x2d.shape[0]:
            continue
        m = _rshift(_dot(x2d, w3[k], trans), q)
        acc = m if acc is None else acc + m
    return acc


def _conv3_w(x3d, w3, s: int, trans: bool = False, thr: int = 0):
    """f32 (H, Wb, C) = 3-tap W conv (block shift s along Wb).

    thr > 0 (packed stacks whose side matrices have DISJOINT nonzero
    K-row blocks — 2*du <= p, see ops/pallas/nb1d.py:_taps_w): the two
    side-tap matmuls merge into ONE against (w3[0] + w3[2]) on a
    lane-iota-selected input.  The select threshold and merged matrix are
    IDENTICAL for trans=True: transposition swaps each side matrix's
    row/col blocks symmetrically, so w2^T occupies rows 0:thr and w0^T
    rows pC-thr:pC — the same low-lanes-from-back-shift /
    high-lanes-from-forward-shift split."""
    H, Wb, C = x3d.shape
    if thr and s < Wb:
        flat = x3d.reshape(H * Wb, C)
        acc = _dot(flat, w3[1], trans).reshape(H, Wb, -1)
        # the LOW-lane K block is w2's rows (non-trans) or w0's cols
        # (trans) — both sourced from x[:, j+s]; the HIGH block is w0's
        # rows / w2's cols, both from x[:, j-s].  (Transposition swaps
        # the matrices' block positions AND which matrix reads which
        # shift — the two swaps cancel, so the select is direction-free.)
        xfwd = _bshift(x3d, s)                       # x[:, j+s]
        xback = _bshift(x3d, -s)                     # x[:, j-s]
        lane = jax.lax.broadcasted_iota(jnp.int32, x3d.shape, 2)
        sel = jnp.where(lane < thr, xfwd, xback)
        acc = acc + _dot(sel.reshape(H * Wb, C), w3[0] + w3[2],
                         trans).reshape(H, Wb, -1)
        return acc
    acc = None
    for k in range(3):
        q = (k - 1) * s * (-1 if trans else 1)
        if abs(q) >= Wb:
            continue
        m = _bshift(_dot(x3d.reshape(H * Wb, C), w3[k],
                         trans).reshape(H, Wb, -1), q)
        acc = m if acc is None else acc + m
    return acc


def _pair_math(x, wh, bh, ww, bw, *, sh, sw, thrw=0, lead_relu, a=None, b=None):
    """Forward pair on one (H, Wb, C) image; returns (t1 (M,C) act-dtype,
    z (H, Wb, C) f32).  With a/b (act-dtype (C,)) the lead stage is the
    BN1 affine + relu: t0 = relu(x*a + b)."""
    H, Wb, C = x.shape
    if a is not None:
        t0 = jax.nn.relu(x * a + b)
    elif lead_relu:
        t0 = jax.nn.relu(x)
    else:
        t0 = x
    z1 = _conv3_h(t0.reshape(H * Wb, C), wh, sh * Wb) + bh
    t1 = jax.nn.relu(z1).astype(x.dtype)
    z = _conv3_w(t1.reshape(H, Wb, C), ww, sw, thr=thrw) + bw
    return t1, z


def pair_reference(x, wh, bh, ww, bw, *, sh, sw, thrw=0, lead_relu=False):
    """Pure-jnp oracle for fused_pair (same math, batched via vmap)."""
    def one(img):
        whc = wh.astype(img.dtype)
        wwc = ww.astype(img.dtype)
        _, z = _pair_math(img, whc, bh.astype(jnp.float32),
                          wwc, bw.astype(jnp.float32),
                          sh=sh, sw=sw, thrw=thrw, lead_relu=lead_relu)
        return z.astype(img.dtype)
    return jax.vmap(one)(x)


def pair_affine_reference(x, a, b, wh, bh, ww, bw, *, sh, sw, thrw=0):
    """Pure-jnp oracle for fused_pair_affine."""
    def one(img):
        _, z = _pair_math(img, wh.astype(img.dtype),
                          bh.astype(jnp.float32), ww.astype(img.dtype),
                          bw.astype(jnp.float32), sh=sh, sw=sw, thrw=thrw,
                          lead_relu=False, a=a.astype(img.dtype),
                          b=b.astype(img.dtype))
        return z.astype(img.dtype)
    return jax.vmap(one)(x)


# ---------------------------------------------------------------------------
# Kernels.
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, wh, bh, ww, bw, z_ref, *, sh, sw, thrw=0, lead_relu):
    x = x_ref[0]
    _, z = _pair_math(x, wh[:].astype(x.dtype), bh[:].astype(jnp.float32),
                      ww[:].astype(x.dtype), bw[:].astype(jnp.float32),
                      sh=sh, sw=sw, thrw=thrw, lead_relu=lead_relu)
    z_ref[0] = z.astype(z_ref.dtype)


def _pair_bwd_core(t0, g, whc, wwc, bh_f32, *, sh, sw, thrw=0):
    """Shared pair backward on one image given the recomputed lead
    activation t0 (H, Wb, C).  Returns (dt0 (M, C) f32, dwh, dbh, dww,
    dbw).  ReLU masks compare in f32 — Mosaic/v5e cannot cmpf packed-bf16
    vectors."""
    H, Wb, C = g.shape
    M = H * Wb
    t0f = t0.reshape(M, C)
    z1 = _conv3_h(t0f, whc, sh * Wb) + bh_f32       # f32 recompute
    t1 = jax.nn.relu(z1).astype(t0.dtype).reshape(H, Wb, C)

    # W-conv grads: dww[k] = bshift(t1, q_k)^T @ g; dbw = sum g
    gf = g.reshape(M, C)
    dbw = jnp.sum(gf.astype(jnp.float32), axis=0).reshape(1, C)
    if thrw and sw < Wb:
        # merged side-dW: ONE (M, pC)^T@(M, pC) matmul computes both side
        # taps' structural blocks (dww[0] lives in rows pC-thr:, dww[2]
        # in rows 0:thr — disjoint, mirroring the weights).  Rows outside
        # each tap's support are correlations the stacked-weight
        # cotangent NEVER uses (stack_taps_w's einsum transpose projects
        # them out), so they are masked to zero — callers passing thrw
        # must build ww via stack_taps_w (the packed train path does).
        tc = _bshift(t1, sw)                          # t1[:, j+sw]
        tb = _bshift(t1, -sw)                         # t1[:, j-sw]
        lane = jax.lax.broadcasted_iota(jnp.int32, t1.shape, 2)
        # per-tap form: dww[k] = bshift(t1, (k-1)*sw)^T @ g — so dww[2]
        # (support rows 0:thr) reads t1[:, j+sw] and dww[0] (support
        # rows pC-thr:) reads t1[:, j-sw]; the select mirrors the
        # forward's low-from-forward / high-from-back split
        sel = jnp.where(lane < thrw, tc, tb)
        merged = jax.lax.dot_general(
            sel.reshape(M, C), gf,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
        dww0 = jnp.where(rows >= C - thrw, merged, 0.0)
        dww2 = jnp.where(rows < thrw, merged, 0.0)
        tk1 = t1.reshape(M, C)
        dww1 = jax.lax.dot_general(
            tk1, gf, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dww = jnp.stack([dww0, dww1, dww2])
    else:
        dww = []
        for k in range(3):
            q = (k - 1) * sw
            if abs(q) >= Wb:
                dww.append(jnp.zeros((C, C), jnp.float32))
                continue
            tk = _bshift(t1, q).reshape(M, C)
            dww.append(jax.lax.dot_general(
                tk, gf, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        dww = jnp.stack(dww)

    # through the inter-conv ReLU
    dt1 = _conv3_w(g, wwc, sw, trans=True, thr=thrw)  # f32 (H, Wb, C)
    dz1 = jnp.where(z1.reshape(H, Wb, C) > 0, dt1, 0.0)
    dz1f = dz1.reshape(M, C)
    dbh = jnp.sum(dz1f, axis=0).reshape(1, C)
    dz1c = dz1f.astype(t0.dtype)

    # H-conv grads: dwh[k] = rshift(t0f, q_k)^T @ dz1
    dwh = []
    for k in range(3):
        q = (k - 1) * sh * Wb
        if abs(q) >= M:
            dwh.append(jnp.zeros((C, C), jnp.float32))
            continue
        dwh.append(jax.lax.dot_general(
            _rshift(t0f, q), dz1c,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    dwh = jnp.stack(dwh)

    dt0 = _conv3_h(dz1c, whc, sh * Wb, trans=True)  # f32 (M, C)
    return dt0, dwh, dbh, dww, dbw


def _emit_stats(z_ref, s1_ref, s2_ref):
    """Write this batch row's sum / sum-of-squares of the just-written
    output block into its own (1, C) row of the (B, C) stat outputs — the
    cross-batch BatchNorm statistics reductions that otherwise re-read
    the full map in XLA.  The (masked) reduction over rows is a tiny
    differentiable XLA op (ops/packed.py:stat_sums_from_rows), which is
    what makes DP batch padding numerically exact."""
    z = z_ref[0].astype(jnp.float32)
    zf = z.reshape(z.shape[0] * z.shape[1], z.shape[2])
    _emit_stats_flat(zf, s1_ref, s2_ref)


def _adjust_g(g, z_ref, gs1, gs2):
    """Fold the BN-statistics cotangents into the upstream gradient:
    d(sum)/dz = 1, d(sumsq)/dz = 2z — the backward of _emit_stats, applied
    in-kernel so XLA never runs the broadcast+mul+add full-map pass."""
    zf = z_ref[0].astype(jnp.float32)
    adj = g.astype(jnp.float32) + gs1[:].reshape(1, 1, -1) \
        + 2.0 * zf * gs2[:].reshape(1, 1, -1)
    return adj.astype(g.dtype)


def _bwd_kernel(x_ref, g_ref, wh, bh, ww, dx_ref, dwh_ref, dbh_ref,
                dww_ref, dbw_ref, *, sh, sw, thrw=0, lead_relu):
    b = pl.program_id(0)
    x = x_ref[0]                                    # (H, Wb, C)
    g = g_ref[0]
    H, Wb, C = x.shape
    M = H * Wb
    whc = wh[:].astype(x.dtype)
    wwc = ww[:].astype(x.dtype)
    t0 = jax.nn.relu(x) if lead_relu else x
    dt0, dwh, dbh, dww, dbw = _pair_bwd_core(
        t0, g, whc, wwc, bh[:].astype(jnp.float32), sh=sh, sw=sw, thrw=thrw)
    if lead_relu:
        dt0 = jnp.where(x.reshape(M, C).astype(jnp.float32) > 0, dt0, 0.0)
    dx_ref[0] = dt0.reshape(H, Wb, C).astype(dx_ref.dtype)
    first = b == 0
    _acc(dwh_ref, dwh, first)
    _acc(dbh_ref, dbh, first)
    _acc(dww_ref, dww, first)
    _acc(dbw_ref, dbw, first)


def _fwd_kernel_affine(x_ref, av, bv, wh, bh, ww, bw, z_ref, *, sh, sw, thrw=0):
    x = x_ref[0]
    _, z = _pair_math(x, wh[:].astype(x.dtype), bh[:].astype(jnp.float32),
                      ww[:].astype(x.dtype), bw[:].astype(jnp.float32),
                      sh=sh, sw=sw, thrw=thrw, lead_relu=False,
                      a=av[:].astype(x.dtype), b=bv[:].astype(x.dtype))
    z_ref[0] = z.astype(z_ref.dtype)


def _bwd_kernel_affine(x_ref, g_ref, av, bv, wh, bh, ww, dx_ref, da_ref,
                       db_ref, dwh_ref, dbh_ref, dww_ref, dbw_ref, *,
                       sh, sw, thrw=0):
    b = pl.program_id(0)
    x = x_ref[0]
    g = g_ref[0]
    H, Wb, C = x.shape
    M = H * Wb
    ac = av[:].astype(x.dtype)
    bc = bv[:].astype(x.dtype)
    pre = x * ac + bc                               # BN1 affine (act dtype)
    t0 = jax.nn.relu(pre)
    dt0, dwh, dbh, dww, dbw = _pair_bwd_core(
        t0, g, wh[:].astype(x.dtype), ww[:].astype(x.dtype),
        bh[:].astype(jnp.float32), sh=sh, sw=sw, thrw=thrw)
    dpre = jnp.where(pre.reshape(M, C).astype(jnp.float32) > 0, dt0, 0.0)
    da = jnp.sum(dpre * x.reshape(M, C).astype(jnp.float32),
                 axis=0).reshape(1, C)
    db = jnp.sum(dpre, axis=0).reshape(1, C)
    dx = dpre * av[:].reshape(1, C)
    dx_ref[0] = dx.reshape(H, Wb, C).astype(dx_ref.dtype)
    first = b == 0
    _acc(da_ref, da, first)
    _acc(db_ref, db, first)
    _acc(dwh_ref, dwh, first)
    _acc(dbh_ref, dbh, first)
    _acc(dww_ref, dww, first)
    _acc(dbw_ref, dbw, first)


def _map_spec(H, Wb, C):
    return pl.BlockSpec((1, H, Wb, C), lambda b: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)


def _wspec(C):
    return pl.BlockSpec((3, C, C), lambda b: (0, 0, 0),
                        memory_space=pltpu.VMEM)


def _bspec(C):
    return pl.BlockSpec((C,), lambda b: (0,), memory_space=pltpu.VMEM)


_VMEM_LIMIT = 110 * 1024 * 1024


def _fwd_call(x, wh, bh, ww, bw, *, sh, sw, thrw=0, lead_relu, interpret):
    def call(x, wh, bh, ww, bw):
        # shapes read INSIDE: under shard_map they are the per-shard views
        B, H, Wb, C = x.shape
        kernel = functools.partial(_fwd_kernel, sh=sh, sw=sw, thrw=thrw * FWD_SIDE_MERGE,
                                   lead_relu=lead_relu)
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[_map_spec(H, Wb, C), _wspec(C), _bspec(C), _wspec(C),
                      _bspec(C)],
            out_specs=_map_spec(H, Wb, C),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=6 * 2 * H * Wb * C * C,
                bytes_accessed=2 * H * Wb * C * x.dtype.itemsize
                + 6 * C * C * 4,
                transcendentals=0),
            interpret=interpret,
        )(x, wh, bh, ww, bw)

    return spmd.shard_batch_call(
        call, (True, False, False, False, False))(x, wh, bh, ww, bw)


def _bwd_call(x, g, wh, bh, ww, *, sh, sw, thrw=0, lead_relu, interpret):
    def call(x, g, wh, bh, ww):
        B, H, Wb, C = x.shape
        kernel = functools.partial(_bwd_kernel, sh=sh, sw=sw, thrw=thrw * BWD_SIDE_MERGE,
                                   lead_relu=lead_relu)
        acc_w = pl.BlockSpec((3, C, C), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        acc_b = pl.BlockSpec((1, C), lambda b: (0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[_map_spec(H, Wb, C), _map_spec(H, Wb, C), _wspec(C),
                      _bspec(C), _wspec(C)],
            out_specs=(_map_spec(H, Wb, C), acc_w, acc_b, acc_w, acc_b),
            out_shape=(
                jax.ShapeDtypeStruct(x.shape, x.dtype),        # dx
                jax.ShapeDtypeStruct((3, C, C), jnp.float32),  # dwh
                jax.ShapeDtypeStruct((1, C), jnp.float32),     # dbh
                jax.ShapeDtypeStruct((3, C, C), jnp.float32),  # dww
                jax.ShapeDtypeStruct((1, C), jnp.float32),     # dbw
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=15 * 2 * H * Wb * C * C,
                bytes_accessed=3 * H * Wb * C * x.dtype.itemsize
                + 12 * C * C * 4,
                transcendentals=0),
            interpret=interpret,
        )(x, g, wh, bh, ww)

    # per-shard dW/db partials psum-reduce to the global weight grads
    return spmd.shard_batch_call(
        call, (True, True, False, False, False),
        reduce_out=(False, True, True, True, True))(x, g, wh, bh, ww)


@functools.lru_cache(maxsize=None)
def _pair_op(sh: int, sw: int, thrw: int, lead_relu: bool, interpret: bool):
    @jax.custom_vjp
    def op(x, wh, bh, ww, bw):
        return _fwd_call(x, wh, bh, ww, bw, sh=sh, sw=sw, thrw=thrw,
                         lead_relu=lead_relu, interpret=interpret)

    def fwd(x, wh, bh, ww, bw):
        z = _fwd_call(x, wh, bh, ww, bw, sh=sh, sw=sw, thrw=thrw,
                      lead_relu=lead_relu, interpret=interpret)
        return z, (x, wh, bh, ww)

    def bwd(res, g):
        x, wh, bh, ww = res
        dx, dwh, dbh, dww, dbw = _bwd_call(
            x, g.astype(x.dtype), wh, bh, ww, sh=sh, sw=sw, thrw=thrw,
            lead_relu=lead_relu, interpret=interpret)
        return (dx, dwh.astype(wh.dtype), dbh.reshape(-1).astype(bh.dtype),
                dww.astype(ww.dtype), dbw.reshape(-1))

    op.defvjp(fwd, bwd)
    return op


def fused_pair(x, wh, bh, ww, bw, *, sh: int, sw: int, thrw: int = 0,
               lead_relu: bool = False, interpret: Optional[bool] = None):
    """Fused factorized-conv pair with a Pallas custom VJP.

    x: (B, H, Wb, C) activations (C % 128 == 0; packed or native layout).
    wh/ww: (3, C, C) tap stacks (H-axis / W-axis), f32 recommended — weight
    grads then come back f32 regardless of the activation dtype.
    bh/bw: (C,).  sh: H shift in rows; sw: W shift in Wb blocks.
    lead_relu folds a leading ReLU (the post-BN1 one) into the kernel.
    Returns z = conv_w(relu(conv_h(maybe_relu(x)) + bh)) + bw, x.dtype.

    thrw > 0 (packed layouts' W-conv side-merge) REQUIRES ww built by
    stack_taps_w with 2*du <= p: the merge assumes ww[0]/ww[2] have the
    disjoint structural K-row blocks that builder produces (and the
    merged side-dW masks rows outside that support, which stack_taps_w's
    VJP projects out anyway).  An arbitrary dense ww with thrw > 0
    silently computes a WRONG forward and wrong dww; concrete weights
    are checked (_check_thrw_contract), traced ones cannot be.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    _check_thrw_contract(ww, thrw)
    dbw = bw.astype(jnp.float32)
    return _pair_op(int(sh), int(sw), int(thrw), bool(lead_relu), bool(interpret))(
        x, wh, bh.astype(jnp.float32), ww, dbw)


def _fwd_call_affine(x, av, bv, wh, bh, ww, bw, *, sh, sw, thrw=0, interpret):
    def call(x, av, bv, wh, bh, ww, bw):
        B, H, Wb, C = x.shape
        kernel = functools.partial(_fwd_kernel_affine, sh=sh, sw=sw, thrw=thrw * FWD_SIDE_MERGE)
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[_map_spec(H, Wb, C), _bspec(C), _bspec(C), _wspec(C),
                      _bspec(C), _wspec(C), _bspec(C)],
            out_specs=_map_spec(H, Wb, C),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=6 * 2 * H * Wb * C * C,
                bytes_accessed=2 * H * Wb * C * x.dtype.itemsize
                + 6 * C * C * 4,
                transcendentals=0),
            interpret=interpret,
        )(x, av, bv, wh, bh, ww, bw)

    return spmd.shard_batch_call(
        call, (True,) + (False,) * 6)(x, av, bv, wh, bh, ww, bw)


def _bwd_call_affine(x, g, av, bv, wh, bh, ww, *, sh, sw, thrw=0, interpret):
    def call(x, g, av, bv, wh, bh, ww):
        B, H, Wb, C = x.shape
        kernel = functools.partial(_bwd_kernel_affine, sh=sh, sw=sw, thrw=thrw * BWD_SIDE_MERGE)
        acc_w = pl.BlockSpec((3, C, C), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        acc_b = pl.BlockSpec((1, C), lambda b: (0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[_map_spec(H, Wb, C), _map_spec(H, Wb, C), _bspec(C),
                      _bspec(C), _wspec(C), _bspec(C), _wspec(C)],
            out_specs=(_map_spec(H, Wb, C), acc_b, acc_b, acc_w, acc_b,
                       acc_w, acc_b),
            out_shape=(
                jax.ShapeDtypeStruct(x.shape, x.dtype),        # dx
                jax.ShapeDtypeStruct((1, C), jnp.float32),     # da
                jax.ShapeDtypeStruct((1, C), jnp.float32),     # db
                jax.ShapeDtypeStruct((3, C, C), jnp.float32),  # dwh
                jax.ShapeDtypeStruct((1, C), jnp.float32),     # dbh
                jax.ShapeDtypeStruct((3, C, C), jnp.float32),  # dww
                jax.ShapeDtypeStruct((1, C), jnp.float32),     # dbw
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=15 * 2 * H * Wb * C * C,
                bytes_accessed=3 * H * Wb * C * x.dtype.itemsize
                + 12 * C * C * 4,
                transcendentals=0),
            interpret=interpret,
        )(x, g, av, bv, wh, bh, ww)

    return spmd.shard_batch_call(
        call, (True, True) + (False,) * 5,
        reduce_out=(False,) + (True,) * 6)(x, g, av, bv, wh, bh, ww)


@functools.lru_cache(maxsize=None)
def _pair_affine_op(sh: int, sw: int, thrw: int, interpret: bool):
    @jax.custom_vjp
    def op(x, av, bv, wh, bh, ww, bw):
        return _fwd_call_affine(x, av, bv, wh, bh, ww, bw, sh=sh, sw=sw, thrw=thrw,
                                interpret=interpret)

    def fwd(x, av, bv, wh, bh, ww, bw):
        z = _fwd_call_affine(x, av, bv, wh, bh, ww, bw, sh=sh, sw=sw, thrw=thrw,
                             interpret=interpret)
        return z, (x, av, bv, wh, bh, ww)

    def bwd(res, g):
        x, av, bv, wh, bh, ww = res
        dx, da, db, dwh, dbh, dww, dbw = _bwd_call_affine(
            x, g.astype(x.dtype), av, bv, wh, bh, ww, sh=sh, sw=sw, thrw=thrw,
            interpret=interpret)
        return (dx, da.reshape(-1).astype(av.dtype),
                db.reshape(-1).astype(bv.dtype), dwh.astype(wh.dtype),
                dbh.reshape(-1).astype(bh.dtype), dww.astype(ww.dtype),
                dbw.reshape(-1))

    op.defvjp(fwd, bwd)
    return op


def pair_epi_reference(t, y_res, m, a, b, wh, bh, ww, bw, *, sh, sw, thrw=0):
    """Pure-jnp oracle for fused_pair_epi.  m: (B, C) dropout mask already
    scaled to {0, 1/keep} (ones when dropout is off)."""
    def one(ti, yi, mi):
        ac, bc = a.astype(ti.dtype), b.astype(ti.dtype)
        y_next = jax.nn.relu((ti * ac + bc) * mi.astype(ti.dtype) + yi)
        _, z = _pair_math(y_next, wh.astype(ti.dtype),
                          bh.astype(jnp.float32), ww.astype(ti.dtype),
                          bw.astype(jnp.float32), sh=sh, sw=sw, thrw=thrw,
                          lead_relu=False)
        return z.astype(ti.dtype), y_next
    return jax.vmap(one)(t, y_res, m)


def _fwd_kernel_epi(t_ref, y_ref, m_ref, av, bv, wh, bh, ww, bw, z_ref,
                    yout_ref, *, sh, sw, thrw=0):
    t = t_ref[0]
    y_res = y_ref[0]
    ac = av[:].astype(t.dtype)
    bc = bv[:].astype(t.dtype)
    m = m_ref[0, 0].astype(t.dtype)               # (C,)
    y_next = jax.nn.relu((t * ac + bc) * m + y_res)
    _, z = _pair_math(y_next, wh[:].astype(t.dtype),
                      bh[:].astype(jnp.float32), ww[:].astype(t.dtype),
                      bw[:].astype(jnp.float32), sh=sh, sw=sw, thrw=thrw,
                      lead_relu=False)
    yout_ref[0] = y_next.astype(yout_ref.dtype)
    z_ref[0] = z.astype(z_ref.dtype)


def _bwd_kernel_epi(t_ref, y_ref, m_ref, av, bv, wh, bh, ww, gz_ref, gy_ref,
                    dt_ref, dyres_ref, da_ref, db_ref, dwh_ref, dbh_ref,
                    dww_ref, dbw_ref, *, sh, sw, thrw=0):
    b = pl.program_id(0)
    t = t_ref[0]
    y_res = y_ref[0]
    gz = gz_ref[0]
    gy = gy_ref[0]
    H, Wb, C = t.shape
    M = H * Wb
    ac = av[:].astype(t.dtype)
    bc = bv[:].astype(t.dtype)
    mc = m_ref[0, 0].astype(t.dtype)
    pre = (t * ac + bc) * mc + y_res              # act dtype (XLA parity)
    y_next = jax.nn.relu(pre)
    dt0, dwh, dbh, dww, dbw = _pair_bwd_core(
        y_next, gz, wh[:].astype(t.dtype), ww[:].astype(t.dtype),
        bh[:].astype(jnp.float32), sh=sh, sw=sw, thrw=thrw)
    # y_next is also an op OUTPUT (the next residual) — add its cotangent
    dt0 = dt0 + gy.reshape(M, C).astype(jnp.float32)
    dsum = jnp.where(pre.reshape(M, C).astype(jnp.float32) > 0, dt0, 0.0)
    dyres_ref[0] = dsum.reshape(H, Wb, C).astype(dyres_ref.dtype)
    dpre2 = dsum * m_ref[0]                       # f32 (dropout backward)
    da = jnp.sum(dpre2 * t.reshape(M, C).astype(jnp.float32),
                 axis=0).reshape(1, C)
    db = jnp.sum(dpre2, axis=0).reshape(1, C)
    dt = dpre2 * av[:].reshape(1, C)
    dt_ref[0] = dt.reshape(H, Wb, C).astype(dt_ref.dtype)
    first = b == 0
    _acc(da_ref, da, first)
    _acc(db_ref, db, first)
    _acc(dwh_ref, dwh, first)
    _acc(dbh_ref, dbh, first)
    _acc(dww_ref, dww, first)
    _acc(dbw_ref, dbw, first)


def _mask_spec(C):
    # (B, 1, C) array, (1, 1, C) block: Mosaic requires the block's last
    # two dims be (8k, 128k) or equal the array's — (1, C) qualifies
    return pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _fwd_call_epi(t, y_res, m, av, bv, wh, bh, ww, bw, *, sh, sw, thrw=0,
                  interpret):
    def call(t, y_res, m, av, bv, wh, bh, ww, bw):
        B, H, Wb, C = t.shape
        kernel = functools.partial(_fwd_kernel_epi, sh=sh, sw=sw, thrw=thrw * FWD_SIDE_MERGE)
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[_map_spec(H, Wb, C), _map_spec(H, Wb, C),
                      _mask_spec(C), _bspec(C), _bspec(C), _wspec(C),
                      _bspec(C), _wspec(C), _bspec(C)],
            out_specs=(_map_spec(H, Wb, C), _map_spec(H, Wb, C)),
            out_shape=(jax.ShapeDtypeStruct(t.shape, t.dtype),
                       jax.ShapeDtypeStruct(t.shape, t.dtype)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=6 * 2 * H * Wb * C * C,
                bytes_accessed=4 * H * Wb * C * t.dtype.itemsize
                + 6 * C * C * 4,
                transcendentals=0),
            interpret=interpret,
        )(t, y_res, m, av, bv, wh, bh, ww, bw)

    return spmd.shard_batch_call(
        call, (True, True, True) + (False,) * 6,
        reduce_out=(False, False))(t, y_res, m, av, bv, wh, bh, ww, bw)


def _bwd_call_epi(t, y_res, m, av, bv, wh, bh, ww, gz, gy, *, sh, sw, thrw=0,
                  interpret):
    def call(t, y_res, m, av, bv, wh, bh, ww, gz, gy):
        B, H, Wb, C = t.shape
        kernel = functools.partial(_bwd_kernel_epi, sh=sh, sw=sw, thrw=thrw * BWD_SIDE_MERGE)
        acc_w = pl.BlockSpec((3, C, C), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        acc_b = pl.BlockSpec((1, C), lambda b: (0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[_map_spec(H, Wb, C), _map_spec(H, Wb, C),
                      _mask_spec(C), _bspec(C), _bspec(C), _wspec(C),
                      _bspec(C), _wspec(C), _map_spec(H, Wb, C),
                      _map_spec(H, Wb, C)],
            out_specs=(_map_spec(H, Wb, C), _map_spec(H, Wb, C), acc_b,
                       acc_b, acc_w, acc_b, acc_w, acc_b),
            out_shape=(
                jax.ShapeDtypeStruct(t.shape, t.dtype),        # dt
                jax.ShapeDtypeStruct(t.shape, t.dtype),        # dy_res
                jax.ShapeDtypeStruct((1, C), jnp.float32),     # da
                jax.ShapeDtypeStruct((1, C), jnp.float32),     # db
                jax.ShapeDtypeStruct((3, C, C), jnp.float32),  # dwh
                jax.ShapeDtypeStruct((1, C), jnp.float32),     # dbh
                jax.ShapeDtypeStruct((3, C, C), jnp.float32),  # dww
                jax.ShapeDtypeStruct((1, C), jnp.float32),     # dbw
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=15 * 2 * H * Wb * C * C,
                bytes_accessed=6 * H * Wb * C * t.dtype.itemsize
                + 12 * C * C * 4,
                transcendentals=0),
            interpret=interpret,
        )(t, y_res, m, av, bv, wh, bh, ww, gz, gy)

    return spmd.shard_batch_call(
        call, (True, True, True, False, False, False, False, False, True,
               True),
        reduce_out=(False, False) + (True,) * 6)(
        t, y_res, m, av, bv, wh, bh, ww, gz, gy)


@functools.lru_cache(maxsize=None)
def _pair_epi_op(sh: int, sw: int, thrw: int, interpret: bool):
    @jax.custom_vjp
    def op(t, y_res, m, av, bv, wh, bh, ww, bw):
        return _fwd_call_epi(t, y_res, m, av, bv, wh, bh, ww, bw, sh=sh,
                             sw=sw, thrw=thrw, interpret=interpret)

    def fwd(t, y_res, m, av, bv, wh, bh, ww, bw):
        z, y_next = _fwd_call_epi(t, y_res, m, av, bv, wh, bh, ww, bw,
                                  sh=sh, sw=sw, thrw=thrw, interpret=interpret)
        return (z, y_next), (t, y_res, m, av, bv, wh, bh, ww)

    def bwd(res, g):
        t, y_res, m, av, bv, wh, bh, ww = res
        gz, gy = g
        dt, dyres, da, db, dwh, dbh, dww, dbw = _bwd_call_epi(
            t, y_res, m, av, bv, wh, bh, ww, gz.astype(t.dtype),
            gy.astype(t.dtype), sh=sh, sw=sw, thrw=thrw, interpret=interpret)
        # the dropout mask is a function of the rng only — no grad path
        return (dt, dyres, jnp.zeros_like(m),
                da.reshape(-1).astype(av.dtype),
                db.reshape(-1).astype(bv.dtype), dwh.astype(wh.dtype),
                dbh.reshape(-1).astype(bh.dtype), dww.astype(ww.dtype),
                dbw.reshape(-1))

    op.defvjp(fwd, bwd)
    return op


def fused_pair_epi(t, y_res, m, a, b, wh, bh, ww, bw, *, sh: int, sw: int, thrw: int = 0,
                   interpret: Optional[bool] = None):
    """fused_pair with the PREVIOUS block's epilogue folded in as the lead
    stage — the chain carry of a fused NB1d run:

        y_next = relu( (t*a + b) * m + y_res )      # BN2 -> dropout -> +res
        z      = conv_w( relu( conv_h(y_next) + bh ) ) + bw

    t: previous block's second-pair raw output (pre-BN2); y_res: previous
    block's input (the residual); m: (B, C) channelwise dropout mask scaled
    to {0, 1/keep} (ones when off); a/b: BN2 affine (batch_norm_coeffs).
    Returns (z, y_next) — y_next is this block's residual.  The epilogue's
    three full-map XLA ops (and their backward) never touch HBM.
    thrw > 0 requires a stack_taps_w-built ww (see fused_pair).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    _check_thrw_contract(ww, thrw)
    m3 = m.astype(jnp.float32).reshape(m.shape[0], 1, m.shape[1])
    return _pair_epi_op(int(sh), int(sw), int(thrw), bool(interpret))(
        t, y_res, m3, a.astype(jnp.float32), b.astype(jnp.float32), wh,
        bh.astype(jnp.float32), ww, bw.astype(jnp.float32))


def fused_pair_affine(x, a, b, wh, bh, ww, bw, *, sh: int, sw: int, thrw: int = 0,
                      interpret: Optional[bool] = None):
    """fused_pair with the BN1 affine folded in as the lead stage:

        z = conv_w( relu( conv_h( relu(x*a + b) ) + bh ) ) + bw

    a/b are the (C,) BatchNorm scale/shift (ops/batchnorm.py:
    batch_norm_coeffs) — the full-map ``x*a + b`` never touches HBM, and
    the custom VJP emits da/db so JAX backprops them through the batch
    statistics (the cross-batch reductions stay in XLA).
    thrw > 0 requires a stack_taps_w-built ww (see fused_pair).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    _check_thrw_contract(ww, thrw)
    return _pair_affine_op(int(sh), int(sw), int(thrw), bool(interpret))(
        x, a.astype(jnp.float32), b.astype(jnp.float32), wh,
        bh.astype(jnp.float32), ww, bw.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Stats-emitting variants: each kernel ALSO accumulates the batch
# sum / sum-of-squares of its output across the batch grid (the next
# BatchNorm's cross-batch statistics), and the backward folds the stats
# cotangents (dz += gs1[b] + 2 z gs2[b]) in-kernel.  Per BN this removes
# the XLA full-map stats-reduction read in forward and the
# broadcast/mul/add pass (plus its extra map reads) in backward.  Stats
# are PER-ROW (B, C): the tiny (masked) reduction over rows runs in
# ordinary differentiable XLA (ops/packed.py:stat_sums_from_rows) — under
# shard_map the rows stay batch-sharded and the global sum is the usual
# jit-inserted collective, which IS the cross-replica global-batch BN
# semantics; with DP batch padding the mask excludes pad rows EXACTLY,
# and AD zeroes their dW/residual contributions through the masked sum.
# ---------------------------------------------------------------------------

def _sspec(C):
    """Per-row (1, 1, C) block of a (B, 1, C) stat array, indexed by the
    batch grid program (both the fwd outputs and the bwd gs1/gs2 inputs).
    3-D so the LAST TWO block dims equal the array dims — Mosaic rejects
    a (1, C) block over (B, C) (sublane size 1 is neither 8-divisible nor
    equal to B); callers squeeze/unsqueeze the unit axis in XLA."""
    return pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _stats_shapes(B, C):
    return (jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32))


def _fwd_kernel_st(x_ref, wh, bh, ww, bw, z_ref, s1_ref, s2_ref, *,
                   sh, sw, thrw=0, lead_relu=False):
    _fwd_kernel(x_ref, wh, bh, ww, bw, z_ref, sh=sh, sw=sw, thrw=thrw,
                lead_relu=lead_relu)
    _emit_stats(z_ref, s1_ref, s2_ref)


def _bwd_kernel_st(x_ref, g_ref, z_ref, gs1, gs2, wh, bh, ww, dx_ref,
                   dwh_ref, dbh_ref, dww_ref, dbw_ref, *, sh, sw, thrw=0,
                   lead_relu):
    b = pl.program_id(0)
    x = x_ref[0]
    g = _adjust_g(g_ref[0], z_ref, gs1, gs2)
    H, Wb, C = x.shape
    M = H * Wb
    t0 = jax.nn.relu(x) if lead_relu else x
    dt0, dwh, dbh, dww, dbw = _pair_bwd_core(
        t0, g, wh[:].astype(x.dtype), ww[:].astype(x.dtype),
        bh[:].astype(jnp.float32), sh=sh, sw=sw, thrw=thrw)
    if lead_relu:
        dt0 = jnp.where(x.reshape(M, C).astype(jnp.float32) > 0, dt0, 0.0)
    dx_ref[0] = dt0.reshape(H, Wb, C).astype(dx_ref.dtype)
    first = b == 0
    _acc(dwh_ref, dwh, first)
    _acc(dbh_ref, dbh, first)
    _acc(dww_ref, dww, first)
    _acc(dbw_ref, dbw, first)


def _fwd_call_st(x, wh, bh, ww, bw, *, sh, sw, thrw=0, lead_relu, interpret):
    def call(x, wh, bh, ww, bw):
        B, H, Wb, C = x.shape
        kernel = functools.partial(_fwd_kernel_st, sh=sh, sw=sw, thrw=thrw * FWD_SIDE_MERGE,
                                   lead_relu=lead_relu)
        z, s1, s2 = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[_map_spec(H, Wb, C), _wspec(C), _bspec(C), _wspec(C),
                      _bspec(C)],
            out_specs=(_map_spec(H, Wb, C), _sspec(C), _sspec(C)),
            out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),)
            + _stats_shapes(B, C),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=6 * 2 * H * Wb * C * C,
                bytes_accessed=2 * H * Wb * C * x.dtype.itemsize
                + 6 * C * C * 4,
                transcendentals=0),
            interpret=interpret,
        )(x, wh, bh, ww, bw)
        return z, s1[:, 0], s2[:, 0]

    return spmd.shard_batch_call(
        call, (True, False, False, False, False),
        reduce_out=(False, False, False))(x, wh, bh, ww, bw)


def _bwd_call_st(x, g, z, gs1, gs2, wh, bh, ww, *, sh, sw, thrw=0, lead_relu,
                 interpret):
    def call(x, g, z, gs1, gs2, wh, bh, ww):
        B, H, Wb, C = x.shape
        gs1, gs2 = gs1[:, None], gs2[:, None]  # (B, 1, C) for _sspec
        kernel = functools.partial(_bwd_kernel_st, sh=sh, sw=sw, thrw=thrw * BWD_SIDE_MERGE,
                                   lead_relu=lead_relu)
        acc_w = pl.BlockSpec((3, C, C), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        acc_b = pl.BlockSpec((1, C), lambda b: (0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[_map_spec(H, Wb, C), _map_spec(H, Wb, C),
                      _map_spec(H, Wb, C), _sspec(C), _sspec(C), _wspec(C),
                      _bspec(C), _wspec(C)],
            out_specs=(_map_spec(H, Wb, C), acc_w, acc_b, acc_w, acc_b),
            out_shape=(
                jax.ShapeDtypeStruct(x.shape, x.dtype),
                jax.ShapeDtypeStruct((3, C, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((3, C, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=15 * 2 * H * Wb * C * C,
                bytes_accessed=4 * H * Wb * C * x.dtype.itemsize
                + 12 * C * C * 4,
                transcendentals=0),
            interpret=interpret,
        )(x, g, z, gs1, gs2, wh, bh, ww)

    return spmd.shard_batch_call(
        call, (True, True, True, True, True, False, False, False),
        reduce_out=(False, True, True, True, True))(
        x, g, z, gs1, gs2, wh, bh, ww)


@functools.lru_cache(maxsize=None)
def _pair_op_st(sh: int, sw: int, thrw: int, lead_relu: bool, interpret: bool):
    @jax.custom_vjp
    def op(x, wh, bh, ww, bw):
        return _fwd_call_st(x, wh, bh, ww, bw, sh=sh, sw=sw, thrw=thrw,
                            lead_relu=lead_relu, interpret=interpret)

    def fwd(x, wh, bh, ww, bw):
        z, s1, s2 = _fwd_call_st(x, wh, bh, ww, bw, sh=sh, sw=sw, thrw=thrw,
                                 lead_relu=lead_relu, interpret=interpret)
        return (z, s1, s2), (x, wh, bh, ww, z)

    def bwd(res, g):
        x, wh, bh, ww, z = res
        gz, gs1, gs2 = g
        dx, dwh, dbh, dww, dbw = _bwd_call_st(
            x, gz.astype(x.dtype), z, gs1.astype(jnp.float32),
            gs2.astype(jnp.float32), wh, bh, ww, sh=sh, sw=sw, thrw=thrw,
            lead_relu=lead_relu, interpret=interpret)
        return (dx, dwh.astype(wh.dtype), dbh.reshape(-1).astype(bh.dtype),
                dww.astype(ww.dtype), dbw.reshape(-1))

    op.defvjp(fwd, bwd)
    return op


def fused_pair_stats(x, wh, bh, ww, bw, *, sh: int, sw: int, thrw: int = 0,
                     lead_relu: bool = False,
                     interpret: Optional[bool] = None):
    """fused_pair that also returns the output's PER-ROW batch statistics:
    (z, s1 (B, C) f32 row sums, s2 (B, C) f32 row sums-of-squares) for the
    following BatchNorm (reduce with ops/packed.py:stat_sums_from_rows).
    thrw > 0 requires a stack_taps_w-built ww (see fused_pair)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    _check_thrw_contract(ww, thrw)
    return _pair_op_st(int(sh), int(sw), int(thrw), bool(lead_relu), bool(interpret))(
        x, wh, bh.astype(jnp.float32), ww, bw.astype(jnp.float32))


def _fwd_kernel_affine_st(x_ref, av, bv, wh, bh, ww, bw, z_ref, s1_ref,
                          s2_ref, *, sh, sw, thrw=0):
    _fwd_kernel_affine(x_ref, av, bv, wh, bh, ww, bw, z_ref, sh=sh, sw=sw, thrw=thrw)
    _emit_stats(z_ref, s1_ref, s2_ref)


def _bwd_kernel_affine_st(x_ref, g_ref, z_ref, gs1, gs2, av, bv, wh, bh,
                          ww, dx_ref, da_ref, db_ref, dwh_ref, dbh_ref,
                          dww_ref, dbw_ref, *, sh, sw, thrw=0):
    b = pl.program_id(0)
    x = x_ref[0]
    g = _adjust_g(g_ref[0], z_ref, gs1, gs2)
    H, Wb, C = x.shape
    M = H * Wb
    ac = av[:].astype(x.dtype)
    bc = bv[:].astype(x.dtype)
    pre = x * ac + bc
    t0 = jax.nn.relu(pre)
    dt0, dwh, dbh, dww, dbw = _pair_bwd_core(
        t0, g, wh[:].astype(x.dtype), ww[:].astype(x.dtype),
        bh[:].astype(jnp.float32), sh=sh, sw=sw, thrw=thrw)
    dpre = jnp.where(pre.reshape(M, C).astype(jnp.float32) > 0, dt0, 0.0)
    da = jnp.sum(dpre * x.reshape(M, C).astype(jnp.float32),
                 axis=0).reshape(1, C)
    db = jnp.sum(dpre, axis=0).reshape(1, C)
    dx = dpre * av[:].reshape(1, C)
    dx_ref[0] = dx.reshape(H, Wb, C).astype(dx_ref.dtype)
    first = b == 0
    _acc(da_ref, da, first)
    _acc(db_ref, db, first)
    _acc(dwh_ref, dwh, first)
    _acc(dbh_ref, dbh, first)
    _acc(dww_ref, dww, first)
    _acc(dbw_ref, dbw, first)


def _fwd_call_affine_st(x, av, bv, wh, bh, ww, bw, *, sh, sw, thrw=0, interpret):
    def call(x, av, bv, wh, bh, ww, bw):
        B, H, Wb, C = x.shape
        kernel = functools.partial(_fwd_kernel_affine_st, sh=sh, sw=sw, thrw=thrw * FWD_SIDE_MERGE)
        z, s1, s2 = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[_map_spec(H, Wb, C), _bspec(C), _bspec(C), _wspec(C),
                      _bspec(C), _wspec(C), _bspec(C)],
            out_specs=(_map_spec(H, Wb, C), _sspec(C), _sspec(C)),
            out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),)
            + _stats_shapes(B, C),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=6 * 2 * H * Wb * C * C,
                bytes_accessed=2 * H * Wb * C * x.dtype.itemsize
                + 6 * C * C * 4,
                transcendentals=0),
            interpret=interpret,
        )(x, av, bv, wh, bh, ww, bw)
        return z, s1[:, 0], s2[:, 0]

    return spmd.shard_batch_call(
        call, (True,) + (False,) * 6,
        reduce_out=(False, False, False))(x, av, bv, wh, bh, ww, bw)


def _bwd_call_affine_st(x, g, z, gs1, gs2, av, bv, wh, bh, ww, *, sh, sw, thrw=0,
                        interpret):
    def call(x, g, z, gs1, gs2, av, bv, wh, bh, ww):
        B, H, Wb, C = x.shape
        gs1, gs2 = gs1[:, None], gs2[:, None]  # (B, 1, C) for _sspec
        kernel = functools.partial(_bwd_kernel_affine_st, sh=sh, sw=sw, thrw=thrw * BWD_SIDE_MERGE)
        acc_w = pl.BlockSpec((3, C, C), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        acc_b = pl.BlockSpec((1, C), lambda b: (0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[_map_spec(H, Wb, C), _map_spec(H, Wb, C),
                      _map_spec(H, Wb, C), _sspec(C), _sspec(C), _bspec(C),
                      _bspec(C), _wspec(C), _bspec(C), _wspec(C)],
            out_specs=(_map_spec(H, Wb, C), acc_b, acc_b, acc_w, acc_b,
                       acc_w, acc_b),
            out_shape=(
                jax.ShapeDtypeStruct(x.shape, x.dtype),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((3, C, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((3, C, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=15 * 2 * H * Wb * C * C,
                bytes_accessed=4 * H * Wb * C * x.dtype.itemsize
                + 12 * C * C * 4,
                transcendentals=0),
            interpret=interpret,
        )(x, g, z, gs1, gs2, av, bv, wh, bh, ww)

    return spmd.shard_batch_call(
        call, (True, True, True, True, True) + (False,) * 5,
        reduce_out=(False,) + (True,) * 6)(
        x, g, z, gs1, gs2, av, bv, wh, bh, ww)


@functools.lru_cache(maxsize=None)
def _pair_affine_op_st(sh: int, sw: int, thrw: int, interpret: bool):
    @jax.custom_vjp
    def op(x, av, bv, wh, bh, ww, bw):
        return _fwd_call_affine_st(x, av, bv, wh, bh, ww, bw, sh=sh, sw=sw, thrw=thrw,
                                   interpret=interpret)

    def fwd(x, av, bv, wh, bh, ww, bw):
        z, s1, s2 = _fwd_call_affine_st(x, av, bv, wh, bh, ww, bw, sh=sh,
                                        sw=sw, thrw=thrw,
                                        interpret=interpret)
        return (z, s1, s2), (x, av, bv, wh, bh, ww, z)

    def bwd(res, g):
        x, av, bv, wh, bh, ww, z = res
        gz, gs1, gs2 = g
        dx, da, db, dwh, dbh, dww, dbw = _bwd_call_affine_st(
            x, gz.astype(x.dtype), z, gs1.astype(jnp.float32),
            gs2.astype(jnp.float32), av, bv, wh, bh, ww, sh=sh, sw=sw, thrw=thrw,
            interpret=interpret)
        return (dx, da.reshape(-1).astype(av.dtype),
                db.reshape(-1).astype(bv.dtype), dwh.astype(wh.dtype),
                dbh.reshape(-1).astype(bh.dtype), dww.astype(ww.dtype),
                dbw.reshape(-1))

    op.defvjp(fwd, bwd)
    return op


def fused_pair_affine_stats(x, a, b, wh, bh, ww, bw, *, sh: int, sw: int, thrw: int = 0,
                            interpret: Optional[bool] = None):
    """fused_pair_affine that also returns (z, s1, s2) batch statistics.
    thrw > 0 requires a stack_taps_w-built ww (see fused_pair)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    _check_thrw_contract(ww, thrw)
    return _pair_affine_op_st(int(sh), int(sw), int(thrw), bool(interpret))(
        x, a.astype(jnp.float32), b.astype(jnp.float32), wh,
        bh.astype(jnp.float32), ww, bw.astype(jnp.float32))


def _fwd_kernel_epi_st(t_ref, y_ref, m_ref, av, bv, wh, bh, ww, bw, z_ref,
                       yout_ref, s1_ref, s2_ref, *, sh, sw, thrw=0):
    _fwd_kernel_epi(t_ref, y_ref, m_ref, av, bv, wh, bh, ww, bw, z_ref,
                    yout_ref, sh=sh, sw=sw, thrw=thrw)
    _emit_stats(z_ref, s1_ref, s2_ref)


def _bwd_kernel_epi_st(t_ref, y_ref, m_ref, av, bv, wh, bh, ww, gz_ref,
                       gy_ref, z_ref, gs1, gs2, dt_ref, dyres_ref, da_ref,
                       db_ref, dwh_ref, dbh_ref, dww_ref, dbw_ref, *,
                       sh, sw, thrw=0):
    b = pl.program_id(0)
    t = t_ref[0]
    y_res = y_ref[0]
    gz = _adjust_g(gz_ref[0], z_ref, gs1, gs2)
    gy = gy_ref[0]
    H, Wb, C = t.shape
    M = H * Wb
    ac = av[:].astype(t.dtype)
    bc = bv[:].astype(t.dtype)
    mc = m_ref[0, 0].astype(t.dtype)
    pre = (t * ac + bc) * mc + y_res
    y_next = jax.nn.relu(pre)
    dt0, dwh, dbh, dww, dbw = _pair_bwd_core(
        y_next, gz, wh[:].astype(t.dtype), ww[:].astype(t.dtype),
        bh[:].astype(jnp.float32), sh=sh, sw=sw, thrw=thrw)
    dt0 = dt0 + gy.reshape(M, C).astype(jnp.float32)
    dsum = jnp.where(pre.reshape(M, C).astype(jnp.float32) > 0, dt0, 0.0)
    dyres_ref[0] = dsum.reshape(H, Wb, C).astype(dyres_ref.dtype)
    dpre2 = dsum * m_ref[0]
    da = jnp.sum(dpre2 * t.reshape(M, C).astype(jnp.float32),
                 axis=0).reshape(1, C)
    db = jnp.sum(dpre2, axis=0).reshape(1, C)
    dt = dpre2 * av[:].reshape(1, C)
    dt_ref[0] = dt.reshape(H, Wb, C).astype(dt_ref.dtype)
    first = b == 0
    _acc(da_ref, da, first)
    _acc(db_ref, db, first)
    _acc(dwh_ref, dwh, first)
    _acc(dbh_ref, dbh, first)
    _acc(dww_ref, dww, first)
    _acc(dbw_ref, dbw, first)


def _fwd_call_epi_st(t, y_res, m, av, bv, wh, bh, ww, bw, *, sh, sw, thrw=0,
                     interpret):
    def call(t, y_res, m, av, bv, wh, bh, ww, bw):
        B, H, Wb, C = t.shape
        kernel = functools.partial(_fwd_kernel_epi_st, sh=sh, sw=sw, thrw=thrw * FWD_SIDE_MERGE)
        z, y_next, s1, s2 = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[_map_spec(H, Wb, C), _map_spec(H, Wb, C),
                      _mask_spec(C), _bspec(C), _bspec(C), _wspec(C),
                      _bspec(C), _wspec(C), _bspec(C)],
            out_specs=(_map_spec(H, Wb, C), _map_spec(H, Wb, C), _sspec(C),
                       _sspec(C)),
            out_shape=(jax.ShapeDtypeStruct(t.shape, t.dtype),
                       jax.ShapeDtypeStruct(t.shape, t.dtype))
            + _stats_shapes(B, C),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=6 * 2 * H * Wb * C * C,
                bytes_accessed=4 * H * Wb * C * t.dtype.itemsize
                + 6 * C * C * 4,
                transcendentals=0),
            interpret=interpret,
        )(t, y_res, m, av, bv, wh, bh, ww, bw)
        return z, y_next, s1[:, 0], s2[:, 0]

    return spmd.shard_batch_call(
        call, (True, True, True) + (False,) * 6,
        reduce_out=(False, False, False, False))(
        t, y_res, m, av, bv, wh, bh, ww, bw)


def _bwd_call_epi_st(t, y_res, m, av, bv, wh, bh, ww, gz, gy, z, gs1, gs2,
                     *, sh, sw, thrw=0, interpret):
    def call(t, y_res, m, av, bv, wh, bh, ww, gz, gy, z, gs1, gs2):
        B, H, Wb, C = t.shape
        gs1, gs2 = gs1[:, None], gs2[:, None]  # (B, 1, C) for _sspec
        kernel = functools.partial(_bwd_kernel_epi_st, sh=sh, sw=sw, thrw=thrw * BWD_SIDE_MERGE)
        acc_w = pl.BlockSpec((3, C, C), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        acc_b = pl.BlockSpec((1, C), lambda b: (0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[_map_spec(H, Wb, C), _map_spec(H, Wb, C),
                      _mask_spec(C), _bspec(C), _bspec(C), _wspec(C),
                      _bspec(C), _wspec(C), _map_spec(H, Wb, C),
                      _map_spec(H, Wb, C), _map_spec(H, Wb, C), _sspec(C),
                      _sspec(C)],
            out_specs=(_map_spec(H, Wb, C), _map_spec(H, Wb, C), acc_b,
                       acc_b, acc_w, acc_b, acc_w, acc_b),
            out_shape=(
                jax.ShapeDtypeStruct(t.shape, t.dtype),
                jax.ShapeDtypeStruct(t.shape, t.dtype),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((3, C, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((3, C, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=15 * 2 * H * Wb * C * C,
                bytes_accessed=7 * H * Wb * C * t.dtype.itemsize
                + 12 * C * C * 4,
                transcendentals=0),
            interpret=interpret,
        )(t, y_res, m, av, bv, wh, bh, ww, gz, gy, z, gs1, gs2)

    return spmd.shard_batch_call(
        call, (True, True, True, False, False, False, False, False, True,
               True, True, True, True),
        reduce_out=(False, False) + (True,) * 6)(
        t, y_res, m, av, bv, wh, bh, ww, gz, gy, z, gs1, gs2)


@functools.lru_cache(maxsize=None)
def _pair_epi_op_st(sh: int, sw: int, thrw: int, interpret: bool):
    @jax.custom_vjp
    def op(t, y_res, m, av, bv, wh, bh, ww, bw):
        return _fwd_call_epi_st(t, y_res, m, av, bv, wh, bh, ww, bw, sh=sh,
                                sw=sw, thrw=thrw, interpret=interpret)

    def fwd(t, y_res, m, av, bv, wh, bh, ww, bw):
        z, y_next, s1, s2 = _fwd_call_epi_st(
            t, y_res, m, av, bv, wh, bh, ww, bw, sh=sh, sw=sw, thrw=thrw,
            interpret=interpret)
        return (z, y_next, s1, s2), (t, y_res, m, av, bv, wh, bh, ww, z)

    def bwd(res, g):
        t, y_res, m, av, bv, wh, bh, ww, z = res
        gz, gy, gs1, gs2 = g
        dt, dyres, da, db, dwh, dbh, dww, dbw = _bwd_call_epi_st(
            t, y_res, m, av, bv, wh, bh, ww, gz.astype(t.dtype),
            gy.astype(t.dtype), z, gs1.astype(jnp.float32),
            gs2.astype(jnp.float32), sh=sh, sw=sw, thrw=thrw, interpret=interpret)
        return (dt, dyres, jnp.zeros_like(m),
                da.reshape(-1).astype(av.dtype),
                db.reshape(-1).astype(bv.dtype), dwh.astype(wh.dtype),
                dbh.reshape(-1).astype(bh.dtype), dww.astype(ww.dtype),
                dbw.reshape(-1))

    op.defvjp(fwd, bwd)
    return op


def fused_pair_epi_stats(t, y_res, m, a, b, wh, bh, ww, bw, *, sh: int,
                         sw: int, thrw: int = 0,
                         interpret: Optional[bool] = None):
    """fused_pair_epi that also returns (z, y_next, s1, s2).
    thrw > 0 requires a stack_taps_w-built ww (see fused_pair)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    _check_thrw_contract(ww, thrw)
    m3 = m.astype(jnp.float32).reshape(m.shape[0], 1, m.shape[1])
    return _pair_epi_op_st(int(sh), int(sw), int(thrw), bool(interpret))(
        t, y_res, m3, a.astype(jnp.float32), b.astype(jnp.float32), wh,
        bh.astype(jnp.float32), ww, bw.astype(jnp.float32))
