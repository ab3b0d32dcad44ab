"""Packed-layout DownsamplerBlock kernel (Pallas, custom VJP) — train path.

Reference surface: ``train/erfnet.py:DownsamplerBlock`` = cat[Conv2d(k3 s2
p1, Cin -> Cout-Cin), MaxPool2d(2,2)] -> BN -> ReLU (SURVEY.md §2a row 1).
The XLA train path space-to-depths the input, runs the conv as a matmul,
slot-maxes the pool, concatenates, and re-packs for the next packed stage —
several full-map layout copies per block at batch 6.

Packed-native identity: from a W-packed input (B, H, Wb, pi*Cin), one
output "super-column" group (pi/2 output pixels = one input block) is

    out = sum_{mh in 0..2, q in {-1,0}} bshift(A_mh @ K[mh,q], q) + pool

with row operands A = [hshift(r1,-1), r0, r1] (r0/r1 the even/odd input
rows) and K[mh,q] constant slot placements of the 3x3 weights into the
(pi/2)*(Cc+Cin)-lane output layout (pool lanes zero).  The 2x2 max-pool is
pure lane-group maxima, W-pairs first then rows — the same associativity
as ops/packed.py:max_pool2x2_packed, and the backward splits ties 0.5/0.5
exactly like jax.lax.max so gradients match the XLA oracle bit-for-bit on
tied (post-ReLU zero) inputs.

The caller reshapes the (B, H/2, Wb, (pi/2)*(Cc+Cin)) result to the next
stage's W-packed layout (a free row-major regroup).  6 MXU matmuls per
image replace the whole s2d/pool/concat/repack chain; backward accumulates
dK/dbias in f32 across the batch grid.

CLOSED AVENUE (r5, paper analysis — do not A/B): the NB1d W-conv
side-merge (nb1d.py:_taps_w) does NOT extend here.  The merge requires
the two candidate matrices to have DISJOINT nonzero K-row blocks; the
(mh, q=0) main and (mh, q=-1) wrap matrices OVERLAP at slot u = pi-1
(the main matrix needs it for t = pi/2-1, mw=2; the wrap matrix for
t=0, mw=0), so a lane-select merged input cannot route one source per
K-row.  The mh direction is the proven kron density floor.  Even if the
q-pair merged, the bound is 1/6 of stem MACs with the stem at 0.080 of
0.748 ms/img infer device time (r3 profile) and not MAC-bound: < 1.8%
e2e — below the 3% A/B bar before validity even enters.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stats import emit_stats
from .upsampler import _hshift, _bshift

from ...parallel import spmd


@functools.lru_cache(maxsize=None)
def _down_placement(pi: int, cin: int, cc: int):
    """One-hot S (3 mh, 2 q, 3 mw, pi u, S_out t): output column t reads
    input column 2t + mw - 1 (block shift q=-1 when negative)."""
    s_out = pi // 2
    S = np.zeros((3, 2, 3, pi, s_out), np.float32)
    for mh in range(3):
        for mw in range(3):
            for t in range(s_out):
                c = 2 * t + mw - 1
                q, u = (0, c) if c >= 0 else (1, c + pi)  # q index 1 == -1
                S[mh, q, mw, u, t] += 1
    return S


def build_down_packed(w, b, pi: int):
    """w (3,3,Cin,Cc), b (Cc,) -> (K (3,2, pi*Cin, S_out*Ct), bias_placed
    (S_out*Ct,)) with Ct = Cc + Cin; conv lanes at offset 0 of each Ct
    group, pool lanes zero.  Traced (differentiable) einsum + pad."""
    cin, cc = w.shape[2], w.shape[3]
    ct = cc + cin
    s_out = pi // 2
    S = jnp.asarray(_down_placement(pi, cin, cc), w.dtype)
    K = jnp.einsum("hqmut,hmcd->hqutcd", S, w)     # (3,2,pi,S_out,Cin,Cc)
    K = K.transpose(0, 1, 2, 4, 3, 5)              # (3,2,pi,Cin,S_out,Cc)
    K = jnp.pad(K, [(0, 0)] * 4 + [(0, 0), (0, cin)])
    K = K.reshape(3, 2, pi * cin, s_out * ct)
    bias = jnp.pad(b, (0, cin)).reshape(1, ct)
    bias = jnp.tile(bias, (s_out, 1)).reshape(s_out * ct)
    return K, bias


def _tie(a, b):
    """d(max(a,b))/da with jax.lax.max tie semantics (0.5 on equality).
    Arithmetic form (sign(0) == 0 -> 0.5): boolean masks on non-128-lane
    slices trip a Mosaic relayout bug on v5e."""
    return 0.5 * (jnp.sign(a.astype(jnp.float32) - b.astype(jnp.float32))
                  + 1.0)


def _split_rows(x, H2, Wb, C):
    """(H, Wb, C) -> even rows r0, odd rows r1, each (H2, Wb, C)."""
    x4 = x.reshape(H2, 2, Wb, C)
    return x4[:, 0], x4[:, 1]


def _pool_pieces(r0, r1, s_out, cin, C):
    """W-pair maxima per row plane, then the row max — the reference
    pooling order.  Returns list of (M, cin) per output column t plus the
    intermediates needed by the backward."""
    w0, w1, pool = [], [], []
    for t in range(s_out):
        a0 = r0[..., 2 * t * cin:(2 * t + 1) * cin]
        b0 = r0[..., (2 * t + 1) * cin:(2 * t + 2) * cin]
        a1 = r1[..., 2 * t * cin:(2 * t + 1) * cin]
        b1 = r1[..., (2 * t + 1) * cin:(2 * t + 2) * cin]
        m0 = jnp.maximum(a0, b0)
        m1 = jnp.maximum(a1, b1)
        w0.append((a0, b0, m0))
        w1.append((a1, b1, m1))
        pool.append(jnp.maximum(m0, m1))
    return w0, w1, pool


def _down_fwd_kernel(x_ref, K, bias, out_ref, *, H2, Wb, Cin, Cc):
    C = x_ref.shape[-1]
    pi = C // Cin
    s_out = pi // 2
    ct = Cc + Cin
    x = x_ref[0]
    r0, r1 = _split_rows(x, H2, Wb, C)
    A = (_hshift(r1, -1), r0, r1)
    Kc = K[:].astype(x.dtype)
    acc = None
    for mh in range(3):
        af = A[mh].reshape(H2 * Wb, C)
        for qi, q in ((0, 0), (1, -1)):
            m = jnp.dot(af, Kc[mh, qi],
                        preferred_element_type=jnp.float32)
            m = _bshift(m.reshape(H2, Wb, s_out * ct), q)
            acc = m if acc is None else acc + m
    out_ref[0] = (acc + bias[:]).astype(out_ref.dtype)


def _down_bwd_kernel(x_ref, g_ref, K, dx_ref, dK_ref, db_ref, *,
                     H2, Wb, Cin, Cc):
    i = pl.program_id(0)
    C = x_ref.shape[-1]
    pi = C // Cin
    s_out = pi // 2
    ct = Cc + Cin
    x = x_ref[0]
    g = g_ref[0]                                   # (H2, Wb, s_out*ct)
    r0, r1 = _split_rows(x, H2, Wb, C)
    A = (_hshift(r1, -1), r0, r1)
    Kc = K[:].astype(x.dtype)
    # accumulate-dtype sum: materializing g in f32 blew the VMEM budget
    db = jnp.sum(g.reshape(H2 * Wb, s_out * ct), axis=0,
                 dtype=jnp.float32).reshape(1, -1)

    dKs = [[None, None] for _ in range(3)]
    dA = [None, None, None]
    for qi, q in ((0, 0), (1, -1)):
        gs = (g if q == 0 else _bshift(g, -q)).reshape(H2 * Wb,
                                                       s_out * ct)
        for mh in range(3):
            af = A[mh].reshape(H2 * Wb, C)
            dKs[mh][qi] = jax.lax.dot_general(
                af, gs, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = jax.lax.dot_general(
                gs, Kc[mh, qi], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dA[mh] = m if dA[mh] is None else dA[mh] + m
    dK = jnp.stack([d for row in dKs for d in row]).reshape(
        3, 2, C, s_out * ct)

    dr0 = dA[1].reshape(H2, Wb, C)
    dr1 = (dA[2].reshape(H2, Wb, C)
           + _hshift(dA[0].reshape(H2, Wb, C), 1))
    dx = jnp.stack([dr0, dr1], axis=1).reshape(2 * H2, Wb, C)
    dx_ref[0] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dK_ref[:] = dK
        db_ref[:] = db

    @pl.when(i > 0)
    def _():
        dK_ref[:] = dK_ref[:] + dK
        db_ref[:] = db_ref[:] + db


_VMEM_LIMIT = 110 * 1024 * 1024


def _call_fwd(x, K, bias, *, Cin, Cc, interpret):
    return spmd.shard_batch_call(
        functools.partial(_call_fwd_local, Cin=Cin, Cc=Cc,
                          interpret=interpret),
        (True, False, False))(x, K, bias)


def _call_fwd_local(x, K, bias, *, Cin, Cc, interpret):
    B, H, Wb, C = x.shape
    H2 = H // 2
    co = K.shape[-1]
    kernel = functools.partial(_down_fwd_kernel, H2=H2, Wb=Wb, Cin=Cin,
                               Cc=Cc)
    v = pltpu.VMEM
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Wb, C), lambda b: (b, 0, 0, 0),
                         memory_space=v),
            pl.BlockSpec(K.shape, lambda b: (0,) * 4, memory_space=v),
            pl.BlockSpec((co,), lambda b: (0,), memory_space=v),
        ],
        out_specs=pl.BlockSpec((1, H2, Wb, co), lambda b: (b, 0, 0, 0),
                               memory_space=v),
        out_shape=jax.ShapeDtypeStruct((B, H2, Wb, co), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=6 * 2 * H2 * Wb * C * co,
            bytes_accessed=(H * Wb * C + H2 * Wb * co) * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, K, bias)


def _call_bwd(x, g, K, *, Cin, Cc, interpret):
    dx, dK, db = spmd.shard_batch_call(
        functools.partial(_call_bwd_local, Cin=Cin, Cc=Cc,
                          interpret=interpret),
        (True, True, False), reduce_out=(False, True, True))(x, g, K)
    return dx, dK, db.reshape(-1)


def _call_bwd_local(x, g, K, *, Cin, Cc, interpret):
    B, H, Wb, C = x.shape
    H2 = H // 2
    co = K.shape[-1]
    kernel = functools.partial(_down_bwd_kernel, H2=H2, Wb=Wb, Cin=Cin,
                               Cc=Cc)
    v = pltpu.VMEM
    dx, dK, db = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Wb, C), lambda b: (b, 0, 0, 0),
                         memory_space=v),
            pl.BlockSpec((1, H2, Wb, co), lambda b: (b, 0, 0, 0),
                         memory_space=v),
            pl.BlockSpec(K.shape, lambda b: (0,) * 4, memory_space=v),
        ],
        out_specs=(
            pl.BlockSpec((1, H, Wb, C), lambda b: (b, 0, 0, 0),
                         memory_space=v),
            pl.BlockSpec(K.shape, lambda b: (0,) * 4, memory_space=v),
            pl.BlockSpec((1, co), lambda b: (0, 0), memory_space=v),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(K.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, co), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=18 * 2 * H2 * Wb * C * co,
            bytes_accessed=3 * H * Wb * C * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, g, K)
    return dx, dK, db


@functools.lru_cache(maxsize=None)
def _down_op(Cin: int, Cc: int, interpret: bool):
    @jax.custom_vjp
    def op(x, K, bias):
        return _call_fwd(x, K, bias, Cin=Cin, Cc=Cc, interpret=interpret)

    def bwd(res, g):
        x, K = res
        dx, dK, db = _call_bwd(x, g.astype(x.dtype), K, Cin=Cin, Cc=Cc,
                               interpret=interpret)
        return dx, dK.astype(K.dtype), db

    op.defvjp(lambda x, K, bias: (
        _call_fwd(x, K, bias, Cin=Cin, Cc=Cc, interpret=interpret),
        (x, K)), bwd)
    return op


def down_pool_packed(x, pi: int, cin: int, cc: int):
    """MaxPool2d(2,2) of the logical map under W-packing, placed into the
    kernel's output lane layout (zeros over the conv lanes).  Plain jnp —
    JAX AD supplies the pool gradients (exact oracle tie semantics), and
    XLA fuses the maxima/pad into the kernel-output add."""
    B, H, Wb, C = x.shape
    s_out = pi // 2
    # reference associativity: W pair first, then the row pair
    mw = jnp.max(x.reshape(B, H, Wb, s_out, 2, cin), axis=4)
    mp = jnp.max(mw.reshape(B, H // 2, 2, Wb, s_out, cin), axis=2)
    mp = jnp.pad(mp, [(0, 0)] * 4 + [(cc, 0)])
    return mp.reshape(B, H // 2, Wb, s_out * (cc + cin))


def downsampler_packed(x, w_hwio, b, *, pi: int,
                       interpret: Optional[bool] = None):
    """Packed-in DownsamplerBlock conv+pool+concat (pre-BN).

    x: (B, H, Wb, pi*Cin) W-packed; w_hwio (3,3,Cin,Cout-Cin), b likewise.
    Returns (B, H/2, Wb, (pi/2)*Cout); the caller reshapes to the next
    stage's (B, H/2, Wb*(pi/2)/po, po*Cout) — a free row-major regroup.
    Differentiable in x, w, b.  The conv runs in the Pallas kernel; the
    pool lanes are added by ``down_pool_packed`` (kernel leaves them 0 —
    the in-kernel pool backward's lane-sliced tie masks blew Mosaic's
    register allocator on v5e).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cin, cc = w_hwio.shape[2], w_hwio.shape[3]
    K, bias = build_down_packed(w_hwio.astype(jnp.float32),
                                b.astype(jnp.float32), pi)
    conv = _down_op(cin, cc, bool(interpret))(x, K, bias)
    return conv + down_pool_packed(x, pi, cin, cc).astype(conv.dtype)


# ---------------------------------------------------------------------------
# Pool + stats variant: the forward kernel ALSO computes the 2x2 max-pool
# lanes and the output's batch sum / sum-of-squares (the following
# BatchNorm's cross-batch statistics), so XLA runs neither the pool
# passes, the concat-add, nor any full-map stat reduction.  The backward
# keeps the proven decomposition: the existing conv backward kernel on
# the stats-adjusted gradient plus jax AD of the (exact-tie) pool — the
# in-kernel pool BACKWARD is what blew Mosaic's register allocator.
# ---------------------------------------------------------------------------

def _pool_selectors(pi, cin, cc, dtype):
    """0/1 lane-shuffle matrices for the in-kernel pool, built from iota
    comparisons (Pallas kernels cannot capture array constants).  Mosaic
    cannot shape-cast the lane dimension (reshaping (.., pi*cin) to
    (.., s_out, 2, cin) fails infer-vector-layout on v5e), so the W-pair
    gather and the output-lane placement run as tiny MXU matmuls instead:
    S0/S1 pick the even/odd W-parity lanes, E embeds the pooled lanes at
    their (cc-offset) slots of each output group."""
    s_out = pi // 2
    ct = cc + cin
    C, K = pi * cin, s_out * cin

    def one_hot(rows, cols, src_of_col):
        r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
        k = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
        return (r == src_of_col(k)).astype(dtype)

    S0 = one_hot(C, K, lambda k: (k // cin) * 2 * cin + k % cin)
    S1 = one_hot(C, K, lambda k: (k // cin) * 2 * cin + cin + k % cin)
    E = one_hot(K, s_out * ct, lambda j: jnp.where(
        j % ct >= cc, (j // ct) * cin + j % ct - cc, -1))
    return S0, S1, E


def _down_pool_lanes(x, H2, Wb, pi, cin, cc):
    """In-kernel 2x2 max-pool of one W-packed image into the kernel's
    output lane layout (zeros over the conv lanes) — the single-image
    mirror of down_pool_packed, same W-pairs-then-rows associativity.
    Lane movement is selector matmuls (exact: each column has at most one
    1, so the MXU copies values bit-for-bit even in bf16); reshapes touch
    only leading dims, which Mosaic lowers."""
    s_out = pi // 2
    S0, S1, E = _pool_selectors(pi, cin, cc, x.dtype)
    xm = x.reshape(2 * H2 * Wb, pi * cin)
    a = jnp.dot(xm, S0, preferred_element_type=jnp.float32)
    b = jnp.dot(xm, S1, preferred_element_type=jnp.float32)
    mw = jnp.maximum(a, b).reshape(H2, 2, Wb, s_out * cin)
    mp = jnp.maximum(mw[:, 0], mw[:, 1])           # row pair
    out = jnp.dot(mp.reshape(H2 * Wb, s_out * cin), E.astype(jnp.float32),
                  preferred_element_type=jnp.float32)
    return out.reshape(H2, Wb, s_out * (cc + cin))


def _down_fwd_kernel_st(x_ref, K, bias, out_ref, s1_ref, s2_ref, *,
                        H2, Wb, Cin, Cc):
    _down_fwd_kernel(x_ref, K, bias, out_ref, H2=H2, Wb=Wb, Cin=Cin, Cc=Cc)
    x = x_ref[0]
    pi = x.shape[-1] // Cin
    y = out_ref[0] + _down_pool_lanes(x, H2, Wb, pi, Cin,
                                      Cc).astype(out_ref.dtype)
    out_ref[0] = y
    yf = y.astype(jnp.float32).reshape(H2 * Wb, -1)
    emit_stats(yf, s1_ref, s2_ref)


def _call_fwd_st(x, K, bias, *, Cin, Cc, interpret):
    def call(x, K, bias):
        B, H, Wb, C = x.shape
        H2 = H // 2
        co = K.shape[-1]
        kernel = functools.partial(_down_fwd_kernel_st, H2=H2, Wb=Wb,
                                   Cin=Cin, Cc=Cc)
        v = pltpu.VMEM
        # (B, 1, co) stat arrays with (1, 1, co) blocks: Mosaic requires
        # the LAST TWO block dims to be (8,128)-divisible or equal to the
        # array dims — a (1, co) block over (B, co) does not lower
        sspec = pl.BlockSpec((1, 1, co), lambda b: (b, 0, 0),
                             memory_space=v)
        y, s1, s2 = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, Wb, C), lambda b: (b, 0, 0, 0),
                             memory_space=v),
                pl.BlockSpec(K.shape, lambda b: (0,) * 4, memory_space=v),
                pl.BlockSpec((co,), lambda b: (0,), memory_space=v),
            ],
            out_specs=(pl.BlockSpec((1, H2, Wb, co), lambda b: (b, 0, 0, 0),
                                    memory_space=v), sspec, sspec),
            out_shape=(jax.ShapeDtypeStruct((B, H2, Wb, co), x.dtype),
                       jax.ShapeDtypeStruct((B, 1, co), jnp.float32),
                       jax.ShapeDtypeStruct((B, 1, co), jnp.float32)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=6 * 2 * H2 * Wb * C * co,
                bytes_accessed=(H * Wb * C + H2 * Wb * co)
                * x.dtype.itemsize,
                transcendentals=0),
            interpret=interpret,
        )(x, K, bias)
        return y, s1[:, 0], s2[:, 0]

    return spmd.shard_batch_call(
        call, (True, False, False),
        reduce_out=(False, False, False))(x, K, bias)


@functools.lru_cache(maxsize=None)
def _down_op_st(Cin: int, Cc: int, pi: int, interpret: bool):
    @jax.custom_vjp
    def op(x, K, bias):
        return _call_fwd_st(x, K, bias, Cin=Cin, Cc=Cc, interpret=interpret)

    def fwd(x, K, bias):
        y, s1, s2 = _call_fwd_st(x, K, bias, Cin=Cin, Cc=Cc,
                                 interpret=interpret)
        return (y, s1, s2), (x, K, y)

    def bwd(res, g):
        x, K, y = res
        gy, gs1, gs2 = g
        # one fused XLA pass builds the stats-adjusted cotangent (per-row
        # gs1/gs2: (B, co)); it is shared by the conv backward kernel and
        # the pool backward
        g_adj = (gy.astype(jnp.float32)
                 + gs1.astype(jnp.float32)[:, None, None, :]
                 + 2.0 * y.astype(jnp.float32)
                 * gs2.astype(jnp.float32)[:, None, None, :]
                 ).astype(x.dtype)
        dx_conv, dK, db = _call_bwd(x, g_adj, K, Cin=Cin, Cc=Cc,
                                    interpret=interpret)
        # cotangent dtype must match down_pool_packed's output dtype
        # (x.dtype — bf16 under the train step's compute_dtype)
        _, pool_vjp = jax.vjp(
            lambda xx: down_pool_packed(xx, pi, Cin, Cc), x)
        dx_pool, = pool_vjp(g_adj)
        return (dx_conv + dx_pool.astype(dx_conv.dtype),
                dK.astype(K.dtype), db)

    op.defvjp(fwd, bwd)
    return op


def downsampler_packed_stats(x, w_hwio, b, *, pi: int, interpret=None):
    """Packed DownsamplerBlock conv+pool+bias in ONE kernel, returning
    (y, s1, s2) where s1/s2 (B, co) are the output's PER-ROW per-lane
    sums and sums-of-squares (the following BatchNorm consumes them via
    ops/packed.py:stat_sums_from_rows + _bn_packed_coeffs_from_sums)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cin, cc = w_hwio.shape[2], w_hwio.shape[3]
    K, bias = build_down_packed(w_hwio.astype(jnp.float32),
                                b.astype(jnp.float32), pi)
    return _down_op_st(cin, cc, int(pi), bool(interpret))(x, K, bias)


def down_packed_supported(x_shape, pi: int) -> bool:
    b, h, wb, c = x_shape
    # wb >= 2: one-W-block maps hit Mosaic's bf16 tiling floor (size-1
    # second-minor memref slices must align to the sublane pair) — the
    # XLA block handles such tiny maps
    return (c % pi == 0 and pi % 2 == 0 and pi >= 2 and h % 2 == 0
            and wb >= 2
            and h * wb * c <= 2 * 1024 * 1024 and (c // pi) * pi == c
            and b % spmd.data_shards() == 0)


# ---------------------------------------------------------------------------
# Augment-folded stem variant: the train step's per-sample ±2px translate
# (ops/augment.py, reference ``train/main.py:MyCoTransform`` jitter —
# SURVEY.md §2a row 6) applies INSIDE the stem kernel's lead stage, on the
# raw (flipped-only) f32 image the kernel was going to read anyway — the
# full-map XLA translate selects plus the f32->bf16 cast pass were ~3 HBM
# round trips over the batch.  The epilogue-carry pattern, applied to the
# step's prologue.
#
# The backward also drops structurally dead work: the stem's input is the
# image batch (data, never differentiated), so the dx half of the bwd
# kernel (6 of 12 MXU dots) and the pool VJP vanish; dK/db accumulate
# exactly as before on the kernel-emitted augmented map.
# ---------------------------------------------------------------------------

from ..augment import MAX_SHIFT as _MAX_SHIFT


def _aug_translate(x, tx, ty, cin):
    """In-kernel per-image translate of a W-packed map (H, Wb, pi*cin):
    out[h, w] = x[h - ty, w - tx], zero fill — bit-identical to the image
    half of ops/augment._translate_batch (shifts are pure value copies).

    H shifts select over the 2*MAX_SHIFT+1 static leading-dim shifts with
    arithmetic masks.  W shifts cross pi-block lane boundaries, so they
    run as one-hot selector matmuls built from iota-vs-scalar comparisons
    (Mosaic rule: lane shuffles must be 0/1 MXU matmuls; each column has
    at most one 1, so even bf16 copies values exactly) plus a _bshift for
    the cross-block lanes."""
    H, Wb, C = x.shape
    pi = C // cin
    xty = None
    for k in range(-_MAX_SHIFT, _MAX_SHIFT + 1):
        m = (ty == k).astype(x.dtype)
        term = m * _hshift(x, -k)
        xty = term if xty is None else xty + term
    # dst lane q = u'*cin + c reads src lane r = (u' - tx)*cin + c, from
    # the previous/next block when u' - tx leaves [0, pi)
    r = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
    q = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
    u = q // cin - tx
    same = ((r == q - tx * cin) & (u >= 0) & (u < pi)).astype(x.dtype)
    prev = ((r == q - tx * cin + C) & (u < 0)).astype(x.dtype)
    nxt = ((r == q - tx * cin - C) & (u >= pi)).astype(x.dtype)
    out = jnp.dot(xty.reshape(H * Wb, C), same,
                  preferred_element_type=jnp.float32)
    out = out + jnp.dot(_bshift(xty, -1).reshape(H * Wb, C), prev,
                        preferred_element_type=jnp.float32)
    out = out + jnp.dot(_bshift(xty, 1).reshape(H * Wb, C), nxt,
                        preferred_element_type=jnp.float32)
    return out.reshape(H, Wb, C).astype(x.dtype)


def _down_fwd_kernel_staug(aug_ref, x_ref, K, bias, out_ref, s1_ref,
                           s2_ref, xa_ref, *, H2, Wb, Cin, Cc):
    # aug_ref holds the WHOLE (B, 2) shifts array in SMEM (Mosaic rejects
    # blocked SMEM specs whose trailing dims aren't tile multiples; a
    # full-shape block is exempt) — index this program's row directly
    b = pl.program_id(0)
    tx = aug_ref[b, 0].astype(jnp.int32)
    ty = aug_ref[b, 1].astype(jnp.int32)
    x = x_ref[0].astype(xa_ref.dtype)       # in-kernel compute-dtype cast
    x = _aug_translate(x, tx, ty, Cin)
    xa_ref[0] = x
    pi = x.shape[-1] // Cin
    s_out = pi // 2
    ct = Cc + Cin
    r0, r1 = _split_rows(x, H2, Wb, x.shape[-1])
    A = (_hshift(r1, -1), r0, r1)
    Kc = K[:].astype(x.dtype)
    acc = None
    for mh in range(3):
        af = A[mh].reshape(H2 * Wb, x.shape[-1])
        for qi, q in ((0, 0), (1, -1)):
            m = jnp.dot(af, Kc[mh, qi],
                        preferred_element_type=jnp.float32)
            m = _bshift(m.reshape(H2, Wb, s_out * ct), q)
            acc = m if acc is None else acc + m
    conv = (acc + bias[:]).astype(out_ref.dtype)
    y = conv + _down_pool_lanes(x, H2, Wb, pi, Cin, Cc).astype(out_ref.dtype)
    out_ref[0] = y
    yf = y.astype(jnp.float32).reshape(H2 * Wb, -1)
    emit_stats(yf, s1_ref, s2_ref)


def _call_fwd_staug(aug, x, K, bias, *, Cin, Cc, out_dtype, interpret):
    def call(aug, x, K, bias):
        B, H, Wb, C = x.shape
        H2 = H // 2
        co = K.shape[-1]
        kernel = functools.partial(_down_fwd_kernel_staug, H2=H2, Wb=Wb,
                                   Cin=Cin, Cc=Cc)
        v = pltpu.VMEM
        sspec = pl.BlockSpec((1, 1, co), lambda b: (b, 0, 0),
                             memory_space=v)
        y, s1, s2, xa = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((B, 2), lambda b: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, H, Wb, C), lambda b: (b, 0, 0, 0),
                             memory_space=v),
                pl.BlockSpec(K.shape, lambda b: (0,) * 4, memory_space=v),
                pl.BlockSpec((co,), lambda b: (0,), memory_space=v),
            ],
            out_specs=(pl.BlockSpec((1, H2, Wb, co),
                                    lambda b: (b, 0, 0, 0),
                                    memory_space=v),
                       sspec, sspec,
                       pl.BlockSpec((1, H, Wb, C), lambda b: (b, 0, 0, 0),
                                    memory_space=v)),
            out_shape=(jax.ShapeDtypeStruct((B, H2, Wb, co), out_dtype),
                       jax.ShapeDtypeStruct((B, 1, co), jnp.float32),
                       jax.ShapeDtypeStruct((B, 1, co), jnp.float32),
                       jax.ShapeDtypeStruct((B, H, Wb, C), out_dtype)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=6 * 2 * H2 * Wb * C * co + 6 * H * Wb * C * C,
                bytes_accessed=(H * Wb * C * x.dtype.itemsize
                                + (H * Wb * C + H2 * Wb * co)
                                * jnp.dtype(out_dtype).itemsize),
                transcendentals=0),
            interpret=interpret,
        )(aug, x, K, bias)
        return y, s1[:, 0], s2[:, 0], xa

    return spmd.shard_batch_call(
        call, (True, True, False, False),
        reduce_out=(False,) * 4)(aug, x, K, bias)


def _down_bwd_kernel_nodx(x_ref, g_ref, dK_ref, db_ref, *, H2, Wb, Cin,
                          Cc):
    """dK/db-only backward on the kernel-emitted augmented map — the
    stem's input cotangent is structurally unused (image data), so the
    dx dots and the pool VJP of _down_bwd_kernel are dead work here."""
    i = pl.program_id(0)
    C = x_ref.shape[-1]
    pi = C // Cin
    s_out = pi // 2
    ct = Cc + Cin
    x = x_ref[0]
    g = g_ref[0]
    r0, r1 = _split_rows(x, H2, Wb, C)
    A = (_hshift(r1, -1), r0, r1)
    db = jnp.sum(g.reshape(H2 * Wb, s_out * ct), axis=0,
                 dtype=jnp.float32).reshape(1, -1)
    dKs = [[None, None] for _ in range(3)]
    for qi, q in ((0, 0), (1, -1)):
        gs = (g if q == 0 else _bshift(g, -q)).reshape(H2 * Wb,
                                                       s_out * ct)
        for mh in range(3):
            af = A[mh].reshape(H2 * Wb, C)
            dKs[mh][qi] = jax.lax.dot_general(
                af, gs, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    dK = jnp.stack([d for row in dKs for d in row]).reshape(
        3, 2, C, s_out * ct)

    @pl.when(i == 0)
    def _():
        dK_ref[:] = dK
        db_ref[:] = db

    @pl.when(i > 0)
    def _():
        dK_ref[:] = dK_ref[:] + dK
        db_ref[:] = db_ref[:] + db


def _call_bwd_nodx(xa, g, kshape, *, Cin, Cc, interpret):
    def call(xa, g):
        B, H, Wb, C = xa.shape
        H2 = H // 2
        co = kshape[-1]
        kernel = functools.partial(_down_bwd_kernel_nodx, H2=H2, Wb=Wb,
                                   Cin=Cin, Cc=Cc)
        v = pltpu.VMEM
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, Wb, C), lambda b: (b, 0, 0, 0),
                             memory_space=v),
                pl.BlockSpec((1, H2, Wb, co), lambda b: (b, 0, 0, 0),
                             memory_space=v),
            ],
            out_specs=(
                pl.BlockSpec(kshape, lambda b: (0,) * 4, memory_space=v),
                pl.BlockSpec((1, co), lambda b: (0, 0), memory_space=v),
            ),
            out_shape=(
                jax.ShapeDtypeStruct(kshape, jnp.float32),
                jax.ShapeDtypeStruct((1, co), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=12 * 2 * H2 * Wb * C * co,
                bytes_accessed=(H * Wb * C + H2 * Wb * co)
                * xa.dtype.itemsize,
                transcendentals=0),
            interpret=interpret,
        )(xa, g)

    dK, db = spmd.shard_batch_call(call, (True, True),
                                   reduce_out=(True, True))(xa, g)
    return dK, db.reshape(-1)


@functools.lru_cache(maxsize=None)
def _down_op_staug(Cin: int, Cc: int, out_dtype, in_dtype,
                   interpret: bool):
    kw = dict(Cin=Cin, Cc=Cc, out_dtype=out_dtype, interpret=interpret)

    @jax.custom_vjp
    def op(aug, x, K, bias):
        y, s1, s2, _ = _call_fwd_staug(aug, x, K, bias, **kw)
        return y, s1, s2

    def fwd(aug, x, K, bias):
        y, s1, s2, xa = _call_fwd_staug(aug, x, K, bias, **kw)
        return (y, s1, s2), (xa, y)

    def bwd(res, g):
        xa, y = res
        C = xa.shape[-1]
        kshape = (3, 2, C, (C // Cin // 2) * (Cc + Cin))
        gy, gs1, gs2 = g
        g_adj = (gy.astype(jnp.float32)
                 + gs1.astype(jnp.float32)[:, None, None, :]
                 + 2.0 * y.astype(jnp.float32)
                 * gs2.astype(jnp.float32)[:, None, None, :]
                 ).astype(xa.dtype)
        dK, db = _call_bwd_nodx(xa, g_adj, kshape, Cin=Cin, Cc=Cc,
                                interpret=interpret)
        return (jnp.zeros(xa.shape[:1] + (2,), jnp.float32),
                jnp.zeros(xa.shape, in_dtype), dK, db)

    op.defvjp(fwd, bwd)
    return op


def downsampler_packed_stats_aug(x, shifts, w_hwio, b, *, pi: int,
                                 out_dtype, interpret=None):
    """Stem DownsamplerBlock with the train-time ±2px translate and the
    compute-dtype cast folded into the kernel's lead stage.

    x: the RAW (flip applied, translate NOT applied) W-packed image
    (B, H, Wb, pi*Cin) in its input dtype; shifts: (B, 2) float32
    (tx, ty) from ops/augment.co_transform_shifts.  Returns (y, s1, s2)
    exactly as downsampler_packed_stats on the XLA-translated input —
    bit-equal, since translate and casts are pure value copies.

    The x cotangent is structurally unused (images are data): the
    backward returns zeros for it and skips the dx dots + pool VJP — do
    not differentiate this op w.r.t. the image."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cin, cc = w_hwio.shape[2], w_hwio.shape[3]
    K, bias = build_down_packed(w_hwio.astype(jnp.float32),
                                b.astype(jnp.float32), pi)
    op = _down_op_staug(cin, cc, jnp.dtype(out_dtype), x.dtype,
                        bool(interpret))
    return op(shifts, x, K, bias)


# ---------------------------------------------------------------------------
# Eval variant, h-blocked for big maps (1024x2048 streaming — SURVEY.md §7
# config 5): conv + in-kernel pool + folded eval-BatchNorm (running stats
# are a fixed per-channel affine at inference) + ReLU in ONE kernel, grid
# (B, Ho/Ro).  The 3x3 s2 p1 conv reads one input row ABOVE each output
# row pair and none below, so the halo is 1 OUTPUT row on the top edge
# only; the window start stays even to preserve the kernel's r0/r1 row
# parity.  Whole-map-sized inputs take the same kernel with one h-block.
# Profiled motivation: at 1024x2048 the three XLA-fallback downsampler
# blocks cost ~10 ms of the 14.9 ms device step (stem conv 3.15 + stem
# pool 2.0 + concat/BN 1.66 + down2 conv 2.12 + down2 pool 1.09 ...).
# ---------------------------------------------------------------------------

def _down_blocked_rows(Ho, Wb, C, co, max_elems):
    """Kept OUTPUT rows Ro per h-block: per output row the window holds
    2 input rows (2*Wb*C elems) + 1 output row (Wb*co); the (Ro + 1)-row
    window must fit the budget, Ro % 8 == 0 (sublane-aligned dynamic
    slice), and Ro must divide Ho.  0 when no such Ro exists."""
    W_elems = 2 * Wb * C + Wb * co
    R = min(Ho, max_elems // W_elems - 1)
    R -= R % 8
    while R >= 8 and Ho % R:
        R -= 8
    return max(R, 0)


def _down_eval_kernel_blocked(x_hbm, K, bias, scale, shift, out_ref,
                              scratch, ybuf, sem, *, Ro, Rwo, Ho, Wb,
                              Cin, Cc):
    b = pl.program_id(0)
    j = pl.program_id(1)
    s = j * Ro
    w_s = jnp.clip(s - 1, 0, Ho - Rwo)
    dma = pltpu.make_async_copy(x_hbm.at[b, pl.ds(2 * w_s, 2 * Rwo)],
                                scratch, sem)
    dma.start()
    dma.wait()
    x = scratch[:]                                  # (2*Rwo, Wb, C)
    C = x.shape[-1]
    pi = C // Cin
    s_out = pi // 2
    ct = Cc + Cin
    r0, r1 = _split_rows(x, Rwo, Wb, C)
    # row correctness: _hshift's zero-fill on the window's first output
    # row IS the conv padding iff w_s == 0 (the true top edge); interior
    # windows drop that row via the kept-slice offset s - w_s == 1.
    A = (_hshift(r1, -1), r0, r1)
    Kc = K[:].astype(x.dtype)
    acc = None
    for mh in range(3):
        af = A[mh].reshape(Rwo * Wb, C)
        for qi, q in ((0, 0), (1, -1)):
            m = jnp.dot(af, Kc[mh, qi],
                        preferred_element_type=jnp.float32)
            m = _bshift(m.reshape(Rwo, Wb, s_out * ct), q)
            acc = m if acc is None else acc + m
    y = acc + bias[:] + _down_pool_lanes(x, Rwo, Wb, pi, Cin, Cc)
    y = jnp.maximum(y * scale[:] + shift[:], 0.0)
    ybuf[:] = y.astype(ybuf.dtype)
    out_ref[0] = ybuf[pl.ds(s - w_s, Ro)]


def _call_down_eval_blocked(x, K, bias, scale, shift, *, Cin, Cc, Ro,
                            interpret):
    B, H, Wb, C = x.shape
    Ho = H // 2
    co = K.shape[-1]
    nH = Ho // Ro
    Rwo = min(Ho, Ro + 1)
    kernel = functools.partial(_down_eval_kernel_blocked, Ro=Ro, Rwo=Rwo,
                               Ho=Ho, Wb=Wb, Cin=Cin, Cc=Cc)
    v = pltpu.VMEM
    vec = lambda n: pl.BlockSpec((n,), lambda b, j: (0,), memory_space=v)
    return pl.pallas_call(
        kernel,
        grid=(B, nH),
        in_specs=[
            # pin to HBM: with pl.ANY the compiler stages maps that fit in
            # VMEM, where memref_slice demands 128-aligned lane dims — the
            # stem's packed C = 96 then fails to lower; HBM is untiled so
            # the row-window DMA is shape-free (and skips the staging copy)
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(K.shape, lambda b, j: (0,) * 4, memory_space=v),
            vec(co), vec(co), vec(co),
        ],
        out_specs=pl.BlockSpec((1, Ro, Wb, co), lambda b, j: (b, j, 0, 0),
                               memory_space=v),
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wb, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * Rwo, Wb, C), x.dtype),
            pltpu.VMEM((Rwo, Wb, co), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=6 * 2 * Ho * Wb * C * co * Rwo // Ro,
            bytes_accessed=(2 * Rwo * nH + Ho) * Wb
            * max(C, co) * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, K, bias, scale, shift)


@spmd.mesh_keyed_jit(static_argnames=("pi", "eps", "max_elems",
                                      "interpret"))
def downsampler_packed_eval(x, w_hwio, b, gamma, beta, mean, var, *,
                            pi: int, eps: float, max_elems: int,
                            interpret: Optional[bool] = None):
    """Whole eval DownsamplerBlock (conv || pool -> BN(running stats) ->
    ReLU, `train/erfnet.py:DownsamplerBlock` in eval mode) as one
    h-blocked Pallas kernel.  x (B, H, Wb, pi*Cin) W-packed; returns
    (B, H/2, Wb, (pi/2)*Cout) ready for the next stage's free regroup."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cin, cc = w_hwio.shape[2], w_hwio.shape[3]
    K, bias = build_down_packed(w_hwio.astype(jnp.float32),
                                b.astype(jnp.float32), pi)
    inv = (gamma.astype(jnp.float32)
           * jax.lax.rsqrt(var.astype(jnp.float32) + eps))
    sft = beta.astype(jnp.float32) - mean.astype(jnp.float32) * inv
    s_vec = jnp.tile(inv, pi // 2)
    t_vec = jnp.tile(sft, pi // 2)
    B, H, Wb, C = x.shape
    co = (pi // 2) * (cc + cin)
    Ro = _down_blocked_rows(H // 2, Wb, C, co, max_elems)
    call = functools.partial(_call_down_eval_blocked, Cin=cin, Cc=cc,
                             Ro=Ro, interpret=bool(interpret))
    return spmd.shard_batch_call(
        call, (True,) + (False,) * 4)(x, K, bias, s_vec, t_vec)


def down_packed_eval_supported(x_shape, pi: int, cc: int,
                               max_elems: int) -> bool:
    b, h, wb, c = x_shape
    if not (pi % 2 == 0 and pi >= 2 and c % pi == 0 and h % 2 == 0
            and wb >= 2  # Wb==1 fails Mosaic's bf16 memref tiling floor
            and b % spmd.data_shards() == 0):
        return False
    co = (pi // 2) * (cc + c // pi)
    return _down_blocked_rows(h // 2, wb, c, co, max_elems) >= 8
