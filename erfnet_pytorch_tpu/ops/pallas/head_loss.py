"""Fused head-matmul + class-weighted NLL loss (Pallas, custom VJP).

Reference surface: ``train/main.py:CrossEntropyLoss2d`` applied to the
model's final ConvTranspose2d(16, C, 2, s2) logits (SURVEY.md §2a rows
1, 7).  The XLA train path materialized full-resolution logits
(B, 512, 1024, 20), depth-to-spaced them, and built f32 one-hot selects —
~15 ms/step of pure HBM traffic at batch 6.

This op consumes the PRE-HEAD features instead and fuses

    z = feats @ W + bias            # per-row G pixel groups x 20 classes
    nll_p = logsumexp(z_p) - z_p[t_p]
    num  += w[t_p] * nll_p ;  den += w[t_p]

into one pass (logits never leave VMEM); the custom-VJP backward
recomputes the softmax and emits dfeats / dW / dbias directly.  The
stride-2 transposed-conv head is exactly a (K, 4*20) matmul on parity
planes (ops/convt_mm.py:build_head_matmul), so G=4 covers the decoder
head and G=1 the encoder-stage 1x1 prediction head.

Per-pixel group reductions run on the MXU via constant 0/1 selector
matmuls (S: lane-groups -> pixel, R: pixel -> lane-groups); the log-sum-exp
shift is the per-ROW max (over the G*20 lanes) — mathematically exact,
and underflow-safe unless logits within one 2x2 output block differ by
>80, which bf16 activations cannot produce.

Weighted-mean semantics match torch NLLLoss2d(weight): loss = num/den
with den guarded (all-void crop -> 0, not NaN; SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...parallel import spmd

_MAX_CHUNK = 16384
_CHUNK_VMEM_BUDGET = 60 * 1024 * 1024  # ~6 live (CH, GC) f32 buffers


def _chunk(M: int, GC: int = 80) -> int:
    budget = max(8, _CHUNK_VMEM_BUDGET // (6 * 4 * GC))
    c = min(M, _MAX_CHUNK, budget)
    while M % c:
        c -= 1
    return c


def head_loss_supported(M: int, K: int, G: int, n_classes: int) -> bool:
    n = spmd.data_shards()
    if M % n:
        return False
    M //= n  # validate the PER-SHARD row count the kernel will see
    return (G * n_classes <= 768 and K <= 512 and M % 8 == 0
            and _chunk(M, G * n_classes) % 8 == 0)


def _consts(G: int, n_classes: int, class_weights):
    GC = G * n_classes
    R = np.zeros((G, GC), np.float32)
    for p in range(G):
        R[p, p * n_classes:(p + 1) * n_classes] = 1.0
    iota = np.tile(np.arange(n_classes, dtype=np.float32), G)[None, :]
    cw = jnp.tile(jnp.asarray(class_weights, jnp.float32), G)[None, :]
    return jnp.asarray(R), jnp.asarray(R.T), jnp.asarray(iota), cw


def _zgroup(feats, W, bias, labels, R, iota, cw):
    """Shared fwd math on one chunk: returns (z, onehot, wt4, m, e)."""
    z = jnp.dot(feats, W.astype(feats.dtype),
                preferred_element_type=jnp.float32) + bias  # (CH, GC) f32
    lrep = jnp.dot(labels.astype(jnp.float32), R,
                   preferred_element_type=jnp.float32)      # (CH, GC)
    onehot = jnp.where(iota == lrep, 1.0, 0.0)
    m = jnp.max(z, axis=1, keepdims=True)
    e = jnp.exp(z - m)
    return z, onehot, m, e


def _fwd_kernel(feats_ref, W, bias, labels_ref, R, S, iota, cw,
                num_ref, den_ref):
    i = pl.program_id(0)
    feats = feats_ref[:]
    z, onehot, m, e = _zgroup(feats, W[:], bias[:], labels_ref[:], R[:],
                              iota[:], cw[:])
    s4 = jnp.dot(e, S[:], preferred_element_type=jnp.float32)   # (CH, G)
    zt4 = jnp.dot(z * onehot, S[:], preferred_element_type=jnp.float32)
    wt4 = jnp.dot(onehot * cw[:], S[:], preferred_element_type=jnp.float32)
    lse4 = m + jnp.log(s4)
    num_p = jnp.sum(wt4 * (lse4 - zt4))
    den_p = jnp.sum(wt4)

    @pl.when(i == 0)
    def _():
        num_ref[0, 0] = num_p
        den_ref[0, 0] = den_p

    @pl.when(i > 0)
    def _():
        num_ref[0, 0] = num_ref[0, 0] + num_p
        den_ref[0, 0] = den_ref[0, 0] + den_p


def _bwd_kernel(feats_ref, W, bias, labels_ref, R, S, iota, cw, gnum_ref,
                dfeats_ref, dW_ref, db_ref):
    i = pl.program_id(0)
    feats = feats_ref[:]
    z, onehot, m, e = _zgroup(feats, W[:], bias[:], labels_ref[:], R[:],
                              iota[:], cw[:])
    s4 = jnp.dot(e, S[:], preferred_element_type=jnp.float32)
    wt4 = jnp.dot(onehot * cw[:], S[:], preferred_element_type=jnp.float32)
    p = e * jnp.dot(1.0 / s4, R[:], preferred_element_type=jnp.float32)
    wrep = jnp.dot(wt4, R[:], preferred_element_type=jnp.float32)
    dz = (gnum_ref[0, 0] * wrep * (p - onehot)).astype(feats.dtype)
    dfeats_ref[:] = jax.lax.dot_general(
        dz, W[:].astype(feats.dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dfeats_ref.dtype)
    dW = jax.lax.dot_general(feats, dz,
                             dimension_numbers=(((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    db = jnp.sum(dz.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dW_ref[:] = dW
        db_ref[:] = db

    @pl.when(i > 0)
    def _():
        dW_ref[:] = dW_ref[:] + dW
        db_ref[:] = db_ref[:] + db


def _specs(CH, K, G, GC):
    v = pltpu.VMEM
    return [
        pl.BlockSpec((CH, K), lambda i: (i, 0), memory_space=v),   # feats
        pl.BlockSpec((K, GC), lambda i: (0, 0), memory_space=v),   # W
        pl.BlockSpec((GC,), lambda i: (0,), memory_space=v),       # bias
        pl.BlockSpec((CH, G), lambda i: (i, 0), memory_space=v),   # labels
        pl.BlockSpec((G, GC), lambda i: (0, 0), memory_space=v),   # R
        pl.BlockSpec((GC, G), lambda i: (0, 0), memory_space=v),   # S
        pl.BlockSpec((1, GC), lambda i: (0, 0), memory_space=v),   # iota
        pl.BlockSpec((1, GC), lambda i: (0, 0), memory_space=v),   # cw
    ]


def make_head_loss(class_weights, *, n_classes: int, G: int,
                   interpret: Optional[bool] = None):
    """Returns op(feats (M, K) act-dtype, W (K, G*n_classes) f32,
    bias (G*n_classes,) f32, labels (M, G) int32) -> (num, den) f32 scalars.

    loss = num / max(den, eps) (caller divides).  Differentiable in feats,
    W, bias via a Pallas backward; labels get a symbolic-zero cotangent.
    ``class_weights`` is closed over as a constant (the reference hardcodes
    both stage weight sets — SURVEY.md §2a row 8).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    R, S, iota, cw = _consts(G, n_classes, class_weights)
    GC = G * n_classes

    def fwd_call(feats, W, bias, labels):
        # rows shard over the data axis (M is B-major); per-shard num/den
        # partial sums psum to the global weighted-NLL accumulators
        num, den = spmd.shard_batch_call(
            _fwd_local, (True, False, False, True),
            reduce_out=(True, True))(feats, W, bias, labels)
        return num[0, 0], den[0, 0]

    def _fwd_local(feats, W, bias, labels):
        M, K = feats.shape
        CH = _chunk(M, GC)
        acc = pl.BlockSpec((1, 1), lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
        num, den = pl.pallas_call(
            _fwd_kernel,
            grid=(M // CH,),
            in_specs=_specs(CH, K, G, GC),
            out_specs=(acc, acc),
            out_shape=(jax.ShapeDtypeStruct((1, 1), jnp.float32),
                       jax.ShapeDtypeStruct((1, 1), jnp.float32)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * M * K * GC + 8 * M * GC,
                bytes_accessed=M * K * feats.dtype.itemsize + M * G * 4,
                transcendentals=2 * M * GC),
            interpret=interpret,
        )(feats, W, bias, labels, R, S, iota, cw)
        return num, den

    def bwd_call(feats, W, bias, labels, gnum):
        dfeats, dW, db = spmd.shard_batch_call(
            _bwd_local, (True, False, False, True, False),
            reduce_out=(False, True, True))(
            feats, W, bias, labels, gnum.reshape(1, 1).astype(jnp.float32))
        return dfeats, dW, db.reshape(-1)

    def _bwd_local(feats, W, bias, labels, gnum2d):
        M, K = feats.shape
        CH = _chunk(M, GC)
        v = pltpu.VMEM
        dfeats, dW, db = pl.pallas_call(
            _bwd_kernel,
            grid=(M // CH,),
            in_specs=_specs(CH, K, G, GC) + [
                pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)],
            out_specs=(
                pl.BlockSpec((CH, K), lambda i: (i, 0), memory_space=v),
                pl.BlockSpec((K, GC), lambda i: (0, 0), memory_space=v),
                pl.BlockSpec((1, GC), lambda i: (0, 0), memory_space=v),
            ),
            out_shape=(
                jax.ShapeDtypeStruct(feats.shape, feats.dtype),
                jax.ShapeDtypeStruct((K, GC), jnp.float32),
                jax.ShapeDtypeStruct((1, GC), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=6 * M * K * GC + 10 * M * GC,
                bytes_accessed=2 * M * K * feats.dtype.itemsize
                + M * G * 4,
                transcendentals=M * GC),
            interpret=interpret,
        )(feats, W, bias, labels, R, S, iota, cw, gnum2d)
        return dfeats, dW, db

    @jax.custom_vjp
    def op(feats, W, bias, labels):
        return fwd_call(feats, W, bias, labels)

    def fwd(feats, W, bias, labels):
        return fwd_call(feats, W, bias, labels), (feats, W, bias, labels)

    def bwd(res, g):
        feats, W, bias, labels = res
        gnum, _gden = g  # den is independent of feats/W/bias
        dfeats, dW, db = bwd_call(feats, W, bias, labels, gnum)
        dlabels = np.zeros(labels.shape, jax.dtypes.float0)
        return dfeats, dW.astype(W.dtype), db.astype(bias.dtype), dlabels

    op.defvjp(fwd, bwd)
    return op


def pack_labels_2x2(labels):
    """Full-res int labels (B, 2H, 2W) -> (B*H*W, 4) in the parity-plane
    order of ops/convt_mm.py:apply_head_matmul (block col = a*2 + b)."""
    B, H2, W2 = labels.shape
    H, W = H2 // 2, W2 // 2
    return (labels.reshape(B, H, 2, W, 2).transpose(0, 1, 3, 2, 4)
            .reshape(B * H * W, 4))


def pack_labels_packed(labels, p: int):
    """Full-res int labels (B, 2H, 2W) -> (B*H*(W//p), 4p) matching the
    W-packed pre-head feature rows (B, H, W//p, p*K): the feature row for
    packed block wb covers pixels (2h+a, 2*(p*wb+j)+b); label column
    g = j*4 + a*2 + b matches ops/convt_mm.py:expand_head_matmul_packed's
    output-group order."""
    B, H2, W2 = labels.shape
    H, W = H2 // 2, W2 // 2
    Wb = W // p
    x = labels.reshape(B, H, 2, Wb, p, 2)       # [B, h, a, wb, j, b]
    x = x.transpose(0, 1, 3, 4, 2, 5)            # [B, h, wb, j, a, b]
    return x.reshape(B * H * Wb, 4 * p)
