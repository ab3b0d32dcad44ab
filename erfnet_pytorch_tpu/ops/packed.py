"""Space-to-depth packed factorized convolutions — the lane-utilization fix
for ERFNet's small-channel stages on the MXU.

Problem: the decoder's non_bottleneck_1d blocks run at C=16/64 — a
(H·W, 16) x (16, 16) matmul uses 1.5% of the 128x128 MXU and measures
~0.75 TFLOPs effective.  TPU-native fix: pack p consecutive W-positions
into channels (free reshape in NHWC: (H, W, C) -> (H, W/p, p*C)) and
express each 3-tap factorized conv as <=3 DENSE (pC, pC) matmuls on
block-shifted inputs:

    out = sum_q  shift_wb(X, q) @ K_q  + bias

where K_q packs every tap whose source lands q blocks away
(block-tridiagonal structure for W-taps; block-diagonal for H-taps).
The dense form wastes ~p/3 x FLOPs on structural zeros but fills all 128
lanes — a large net win for C*p = 128 (measured ~6x on the C=16 stage).

Zero-padding semantics are exact: any tap source outside the image maps to
an out-of-range block, and block shifts zero-fill.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp


def build_packed_taps_w(w3: np.ndarray, p: int, d: int):
    """W-axis 3-tap conv (offsets -d, 0, +d) -> [(q, K_q)] with K_q
    (p*C, p*C).  w3: (3, C, C) HWIO-squeezed tap matrices."""
    w3 = np.asarray(w3, np.float32)
    C = w3.shape[1]
    Ks: Dict[int, np.ndarray] = {}
    for k, o in ((0, -d), (1, 0), (2, +d)):
        for j_out in range(p):
            src = j_out + o
            q, j_in = src // p, src % p
            K = Ks.setdefault(q, np.zeros((p * C, p * C), np.float32))
            K[j_in * C:(j_in + 1) * C, j_out * C:(j_out + 1) * C] += w3[k]
    return sorted(Ks.items())


def build_packed_taps_h(w3: np.ndarray, p: int, d: int):
    """H-axis 3-tap conv -> [(row_shift, K)] with block-diagonal K (the p
    packed groups transform independently along H)."""
    w3 = np.asarray(w3, np.float32)
    C = w3.shape[1]
    out = []
    for k, o in ((0, -d), (1, 0), (2, +d)):
        K = np.zeros((p * C, p * C), np.float32)
        for j in range(p):
            K[j * C:(j + 1) * C, j * C:(j + 1) * C] = w3[k]
        out.append((o, K))
    return out


def _shift(x, q, axis):
    """Shift x by q along axis with zero fill: out[i] = x[i + q]."""
    if q == 0:
        return x
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    if q > 0:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(q, None)
        pad[axis] = (0, q)
    else:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(None, q)
        pad[axis] = (-q, 0)
    return jnp.pad(x[tuple(sl)], pad)


def packed_conv(X, taps, bias, *, axis, relu):
    """X: (..., H, Wb, pC); taps: [(q, K (pC,pC))]; axis: -3 (H) or -2 (Wb).
    bias: (pC,) pre-tiled."""
    acc = None
    for q, K in taps:
        if abs(q) >= X.shape[axis]:
            continue  # tap outside the map (tiny inputs, large dilation)
        t = jnp.dot(_shift(X, q, axis).reshape(-1, X.shape[-1]),
                    K.astype(X.dtype),
                    preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    acc = acc + bias
    if relu:
        acc = jax.nn.relu(acc)
    return acc.reshape(X.shape[:-1] + (X.shape[-1],)).astype(X.dtype)


def pack_nb1d_params(fused: Dict[str, jnp.ndarray], p: int, dilated: int,
                     dtype=jnp.float32):
    """Convert fuse_nb1d_params output (BN-folded (3,C,C)/(C,) tensors) to
    packed tap matrices + tiled biases."""
    def cvt(taps):
        return [(q, jnp.asarray(K, dtype)) for q, K in taps]

    def tile(b):
        return jnp.tile(jnp.asarray(b, jnp.float32), p)

    return {
        "p": p, "d": dilated,
        "c1": cvt(build_packed_taps_h(np.asarray(fused["w1"]), p, 1)),
        "b1": tile(fused["b1"]),
        "c2": cvt(build_packed_taps_w(np.asarray(fused["w2"]), p, 1)),
        "b2": tile(fused["b2"]),
        "c3": cvt(build_packed_taps_h(np.asarray(fused["w3"]), p, dilated)),
        "b3": tile(fused["b3"]),
        "c4": cvt(build_packed_taps_w(np.asarray(fused["w4"]), p, dilated)),
        "b4": tile(fused["b4"]),
    }


def _tap_stack(taps, pc, dtype):
    """[(q, K)] -> ((3, pC, pC) stack ordered (-s, 0, +s), s).  Requires the
    symmetric {-s, 0, s} structure (true for all ERFNet d/p combos)."""
    qs = sorted(q for q, _ in taps)
    s = max(abs(q) for q in qs) if any(qs) else 1
    assert set(qs) <= {-s, 0, s}, f"asymmetric packed taps {qs}"
    by_q = dict(taps)
    zero = np.zeros((pc, pc), np.float32)
    stack = np.stack([np.asarray(by_q.get(q, zero)) for q in (-s, 0, s)])
    return jnp.asarray(stack, dtype), s


def pack_nb1d_for_pallas(fused: Dict[str, jnp.ndarray], p: int,
                         dilated: int, dtype=jnp.float32):
    """fuse_nb1d_params output -> ((3,pC,pC)-stacked weights dict, s2, s4)
    for ops.pallas.nb1d.nb1d_infer_packed."""
    C = np.asarray(fused["b1"]).shape[0]
    pc = p * C

    def tile(b):
        return jnp.tile(jnp.asarray(b, jnp.float32), p)

    w1, _ = _tap_stack(build_packed_taps_h(np.asarray(fused["w1"]), p, 1),
                       pc, dtype)
    w2, s2 = _tap_stack(build_packed_taps_w(np.asarray(fused["w2"]), p, 1),
                        pc, dtype)
    w3, _ = _tap_stack(build_packed_taps_h(np.asarray(fused["w3"]), p,
                                           dilated), pc, dtype)
    w4, s4 = _tap_stack(build_packed_taps_w(np.asarray(fused["w4"]), p,
                                            dilated), pc, dtype)
    weights = {"w1": w1, "b1": tile(fused["b1"]),
               "w2": w2, "b2": tile(fused["b2"]),
               "w3": w3, "b3": tile(fused["b3"]),
               "w4": w4, "b4": tile(fused["b4"])}
    return weights, s2, s4


def space_to_depth2(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C) with slot order (a, b, c)."""
    B, H, W, C = x.shape
    return (x.reshape(B, H // 2, 2, W // 2, 2, C)
             .transpose(0, 1, 3, 2, 4, 5)
             .reshape(B, H // 2, W // 2, 4 * C))


def build_downsampler_matmul(w):
    """3x3 stride-2 pad-1 conv -> <=4 dense (4Cin, Cout) matmuls on the
    space-to-depth-2 input.  Per-dim tap map (output block i reads input
    rows 2i-1..2i+1): m=0 -> (block i-1, slot 1); m=1 -> (i, 0);
    m=2 -> (i, 1).  Pure jnp (traceable/differentiable) — XLA's strided
    conv wgrad spends ~10 ms/step in layout copies on v5e.

    Returns [(qh, qw, K)] with q in {-1, 0} (shift amount in blocks)."""
    w = jnp.asarray(w)
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    dim_taps = [(-1, 1, 0), (0, 0, 1), (0, 1, 2)]  # (q, slot, m)
    Ks = {}
    for qh, ah, mh in dim_taps:
        for qw, aw, mw in dim_taps:
            K = Ks.setdefault((qh, qw),
                              jnp.zeros((4 * cin, cout), jnp.float32))
            row = (ah * 2 + aw) * cin
            Ks[(qh, qw)] = K.at[row:row + cin, :].add(
                w[mh, mw].astype(jnp.float32))
    return sorted(Ks.items())


def downsampler_conv_matmul(x, taps, b, *, compute_dtype=None):
    """x (B, H, W, Cin) -> (B, H/2, W/2, Cout) == conv2d(k3, s2, p1)."""
    X = space_to_depth2(x)
    if compute_dtype is not None:
        X = X.astype(compute_dtype)
    B, Hb, Wb, c4 = X.shape
    out = None
    for (qh, qw), K in taps:
        t = X
        # packed._shift semantics: out[i] = x[i + q] — exactly "read from
        # block i+q" with zero fill at the image border
        if qh:
            t = _shift(t, qh, 1)
        if qw:
            t = _shift(t, qw, 2)
        m = jnp.dot(t.reshape(-1, c4),
                    K.astype(X.dtype) if compute_dtype else K,
                    preferred_element_type=jnp.float32)
        out = m if out is None else out + m
    cout = out.shape[-1]
    out = out.reshape(B, Hb, Wb, cout) + b.astype(out.dtype)
    return out.astype(compute_dtype or jnp.float32)


def max_pool2x2_packed(x):
    """MaxPool2d(2, 2) as an elementwise max over the 4 space-to-depth
    slots (backward = select masks, not XLA's select-and-scatter)."""
    B, H, W, C = x.shape
    X = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return jnp.max(jnp.max(X, axis=4), axis=2)


# ---------------------------------------------------------------------------
# Differentiable (training) packed NB1d: traced weight packing, packed-space
# BatchNorm with exact torch stats, tiled channelwise dropout.
# ---------------------------------------------------------------------------

def taps_w_traced(w3, p, d):
    """Traceable build_packed_taps_w: w3 (3, C, C) traced -> [(q, K)]."""
    C = w3.shape[1]
    Ks: Dict[int, jnp.ndarray] = {}
    for k, o in ((0, -d), (1, 0), (2, +d)):
        for j_out in range(p):
            src = j_out + o
            q, j_in = src // p, src % p
            K = Ks.setdefault(q, jnp.zeros((p * C, p * C), w3.dtype))
            Ks[q] = K.at[j_in * C:(j_in + 1) * C,
                         j_out * C:(j_out + 1) * C].add(w3[k])
    return sorted(Ks.items())


def taps_h_traced(w3, p, d):
    """Traceable build_packed_taps_h: block-diag via kron -> [(o, K)]."""
    eye = jnp.eye(p, dtype=w3.dtype)
    return [(o, jnp.kron(eye, w3[k])) for k, o in ((0, -d), (1, 0), (2, +d))]


def _bn_packed(Xp, bn_params, bn_state, *, p, train, eps=1e-3,
               momentum=0.1, valid=None):
    """BatchNorm over the TRUE channels of a packed (B, H, Wb, pC) tensor:
    stats aggregate across the p position slots (exactly the unpacked
    batch stats); affine applied tiled."""
    (a, b), new_state = _bn_packed_coeffs(Xp, bn_params, bn_state, p=p,
                                          train=train, eps=eps,
                                          momentum=momentum, valid=valid)
    return Xp * a.astype(Xp.dtype) + b.astype(Xp.dtype), new_state


def _bn_packed_coeffs(Xp, bn_params, bn_state, *, p, train, eps=1e-3,
                      momentum=0.1, valid=None):
    """_bn_packed's affine WITHOUT applying: ((a, b) f32 (pC,), new_state)
    for folding into a following fused kernel's lead stage.  ``valid``
    ((B,) 0/1 f32, optional) excludes DP pad rows from the statistics."""
    C = bn_params["scale"].shape[0]
    scale = bn_params["scale"].astype(jnp.float32)
    bias = bn_params["bias"].astype(jnp.float32)
    if train:
        # f32-accumulated reductions WITHOUT materializing an f32 copy of
        # Xp (keeps bf16 activations bf16 on the HBM path, like
        # ops/batchnorm.py); the 0/1 mask multiplies in Xp.dtype —
        # (v*x)^2 == v*x^2 for 0/1 masks, so one view serves both sums
        n_img = Xp.shape[1] * Xp.shape[2] * p
        if valid is None:
            n = Xp.shape[0] * n_img
            xs = Xp
        else:
            n = valid.astype(jnp.float32).sum() * n_img
            xs = Xp * valid.astype(Xp.dtype)[:, None, None, None]
        s1 = jnp.sum(xs, axis=(0, 1, 2), dtype=jnp.float32)
        s2 = jnp.sum(jnp.square(xs.astype(jnp.float32)), axis=(0, 1, 2),
                     dtype=jnp.float32)
        mean = s1.reshape(p, C).sum(0) / n
        var = s2.reshape(p, C).sum(0) / n - jnp.square(mean)
        unbiased = var * (n / jnp.maximum(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * bn_state["mean"] + momentum * mean,
            "var": (1 - momentum) * bn_state["var"] + momentum * unbiased,
        }
    else:
        mean = bn_state["mean"].astype(jnp.float32)
        var = bn_state["var"].astype(jnp.float32)
        new_state = bn_state
    inv = scale * jax.lax.rsqrt(var + eps)
    return (jnp.tile(inv, p), jnp.tile(bias - mean * inv, p)), new_state


def stat_sums_from_rows(s1_rows, s2_rows, n_img, valid=None):
    """Reduce the fused kernels' PER-ROW batch statistics (B, pC) to
    global sums — the only cross-batch stat work XLA runs, and the point
    where DP batch padding becomes numerically EXACT: ``valid`` ((B,) 0/1
    f32, optional) masks pad rows out of the sums, and autodiff of this
    masked sum zeroes the pad rows' stat cotangents (hence their dW /
    residual contributions in the kernels' backward).  ``n_img``: element
    count per true channel per batch row.  Returns (s1, s2, n); n is
    traced when valid is given."""
    if valid is None:
        return (s1_rows.sum(0), s2_rows.sum(0),
                s1_rows.shape[0] * n_img)
    v = valid.astype(jnp.float32)
    return ((v[:, None] * s1_rows).sum(0),
            (v[:, None] * s2_rows).sum(0), v.sum() * n_img)


def _bn_packed_coeffs_from_sums(s1, s2, n, bn_params, bn_state, *, p,
                                eps=1e-3, momentum=0.1, out_p=None):
    """_bn_packed_coeffs (train mode) with the batch sum / sum-of-squares
    SUPPLIED by the producing fused kernel (ops/pallas/nb1d_train.py
    ``*_stats`` ops, reduced by :func:`stat_sums_from_rows`) — the
    full-map XLA reduction never runs.  s1/s2: (pC,)-reshapeable f32;
    n: GLOBAL element count per true channel (traced under DP padding).
    ``out_p``: tile the returned affine to a different slot count than the
    stats layout (the downsampler emits stats in its s_out-slot kernel
    layout while the caller applies BN on the po-slot regrouped view)."""
    C = bn_params["scale"].shape[0]
    scale = bn_params["scale"].astype(jnp.float32)
    bias = bn_params["bias"].astype(jnp.float32)
    mean = s1.reshape(p, C).sum(0) / n
    var = s2.reshape(p, C).sum(0) / n - jnp.square(mean)
    unbiased = var * (n / jnp.maximum(n - 1, 1))
    new_state = {
        "mean": (1 - momentum) * bn_state["mean"] + momentum * mean,
        "var": (1 - momentum) * bn_state["var"] + momentum * unbiased,
    }
    inv = scale * jax.lax.rsqrt(var + eps)
    t = p if out_p is None else out_p
    return (jnp.tile(inv, t), jnp.tile(bias - mean * inv, t)), new_state


def _merge_thrw(p: int, C: int, du: int) -> int:
    """Side-merge lane threshold for a packed W conv (see
    ops/pallas/nb1d_train.py:_conv3_w thr / nb1d.py:_taps_w): the two
    side-tap matrices' K-row blocks are disjoint iff 2*du <= p, letting
    the kernels run them as ONE matmul.  0 disables the merge."""
    return du * C if p >= 2 and 2 * du <= p else 0


def _nb1d_train_packed_core(params, state, X, *, p, C, dilated, dropprob,
                            train, rng, bn_eps, valid=None):
    """One NB1d block on an ALREADY-PACKED (B, H, Wb, pC) tensor.

    When the fused train kernels are enabled (TPU default) each conv pair
    runs as ONE Pallas forward + ONE custom-VJP backward kernel — the XLA
    tap-by-tap form below is the CPU path and the numerics oracle.
    ``valid``: optional (B,) 0/1 mask excluding DP pad rows from the BN
    batch statistics (stat_sums_from_rows)."""
    from .pallas.nb1d_train import (fused_pair_stats,
                                    fused_pair_affine_stats,
                                    fused_train_enabled, pair_supported,
                                    stack_taps_h, stack_taps_w)

    def w3(name):
        w = params[name]["w"]
        return w[:, 0] if w.shape[1] == 1 else w[0]

    if train and fused_train_enabled() and pair_supported(X.shape):
        n_img = X.shape[1] * X.shape[2] * p
        tile = lambda name: jnp.tile(params[name]["b"], p)
        ww2, s2 = stack_taps_w(w3("conv1x3_1"), p, 1)
        t, s1a, s1b = fused_pair_stats(
            X, stack_taps_h(w3("conv3x1_1"), p), tile("conv3x1_1"), ww2,
            tile("conv1x3_1"), sh=1, sw=s2, thrw=_merge_thrw(p, C, 1))
        # BN1 per-row stats come OUT of the kernel; only the tiny masked
        # row-sum + (pC,) coeff math runs in XLA, and the affine + relu
        # fold into the second pair kernel's lead stage (full map never
        # re-materialized or re-read)
        (a1, b1), bn1s = _bn_packed_coeffs_from_sums(
            *stat_sums_from_rows(s1a, s1b, n_img, valid),
            params["bn1"], state["bn1"], p=p, eps=bn_eps)
        ww4, s4 = stack_taps_w(w3("conv1x3_2"), p, dilated)
        t, s2a, s2b = fused_pair_affine_stats(
            t, a1, b1, stack_taps_h(w3("conv3x1_2"), p), tile("conv3x1_2"),
            ww4, tile("conv1x3_2"), sh=dilated, sw=s4,
            thrw=_merge_thrw(p, C, dilated))
        (a2, b2), bn2s = _bn_packed_coeffs_from_sums(
            *stat_sums_from_rows(s2a, s2b, n_img, valid),
            params["bn2"], state["bn2"], p=p, eps=bn_eps)
        t = t * a2.astype(t.dtype) + b2.astype(t.dtype)
        return _nb1d_epilogue(params, X, t, bn1s, bn2s, p=p, C=C,
                              dropprob=dropprob, train=train, rng=rng)

    def taps(name, build, d):
        return build(w3(name), p, d), jnp.tile(params[name]["b"], p)

    t1, b1 = taps("conv3x1_1", taps_h_traced, 1)
    t = packed_conv(X, t1, b1.astype(jnp.float32), axis=-3, relu=True)
    t2, b2 = taps("conv1x3_1", taps_w_traced, 1)
    t = packed_conv(t, t2, b2.astype(jnp.float32), axis=-2, relu=False)
    t, bn1s = _bn_packed(t, params["bn1"], state["bn1"], p=p, train=train,
                         eps=bn_eps, valid=valid)
    t = jax.nn.relu(t)
    t3, b3 = taps("conv3x1_2", taps_h_traced, dilated)
    t = packed_conv(t, t3, b3.astype(jnp.float32), axis=-3, relu=True)
    t4, b4 = taps("conv1x3_2", taps_w_traced, dilated)
    t = packed_conv(t, t4, b4.astype(jnp.float32), axis=-2, relu=False)
    t, bn2s = _bn_packed(t, params["bn2"], state["bn2"], p=p, train=train,
                         eps=bn_eps, valid=valid)
    return _nb1d_epilogue(params, X, t, bn1s, bn2s, p=p, C=C,
                          dropprob=dropprob, train=train, rng=rng)


def _nb1d_epilogue(params, X, t, bn1s, bn2s, *, p, C, dropprob, train, rng):
    if train and dropprob > 0:
        keep = 1.0 - dropprob
        mask = jax.random.bernoulli(rng, keep, (X.shape[0], 1, 1, C))
        mask = jnp.tile(mask, (1, 1, 1, p))
        t = jnp.where(mask, t / keep, jnp.zeros_like(t)).astype(t.dtype)
    y = jax.nn.relu(t + X.astype(t.dtype))
    return y, {"bn1": bn1s, "bn2": bn2s}


def nb1d_train_packed(params, state, x, *, p, dilated, dropprob, train,
                      rng=None, compute_dtype=None, bn_eps=1e-3,
                      valid=None):
    """Differentiable packed non_bottleneck_1d — same math as the unpacked
    block (models/erfnet.py:apply_non_bottleneck_1d) with p*C = 128 lanes:
    weight gradients become (pC, pC) matmuls instead of lane-starved
    (C, C) reductions.  Returns (y, new_bn_state)."""
    B, H, W, C = x.shape
    assert W % p == 0
    X = x.reshape(B, H, W // p, p * C)
    if compute_dtype is not None:
        X = X.astype(compute_dtype)
    y, ns = _nb1d_train_packed_core(params, state, X, p=p, C=C,
                                    dilated=dilated, dropprob=dropprob,
                                    train=train, rng=rng, bn_eps=bn_eps,
                                    valid=valid)
    return y.reshape(B, H, W, C).astype(x.dtype), ns


def _drop_mask_packed(rng, p_drop, B, C, p):
    """Packed-lane dropout2d mask {0, 1/keep} as (B, pC) f32 — same
    bernoulli draw as _nb1d_epilogue (shape (B,1,1,C), tiled per slot)."""
    if p_drop <= 0 or rng is None:
        return jnp.ones((B, p * C), jnp.float32)
    keep = 1.0 - p_drop
    mask = jax.random.bernoulli(rng, keep, (B, 1, 1, C))
    return jnp.tile(jnp.where(mask[:, 0, 0, :], 1.0 / keep, 0.0), (1, p))


def _packed_fused_carry_run(params_list, state_list, X, *, p, C, dils,
                            drops, rngs, bn_eps, valid=None):
    """Fused-kernel run with the epilogue CARried between blocks: each
    block's BN2-affine + dropout + residual + relu applies inside the next
    block's fused_pair_epi lead stage (models/erfnet.py:_fused_nb1d_run is
    the unpacked twin)."""
    from .pallas.nb1d_train import (fused_pair_stats,
                                    fused_pair_affine_stats,
                                    fused_pair_epi_stats, stack_taps_h,
                                    stack_taps_w)
    B = X.shape[0]
    n_img = X.shape[1] * X.shape[2] * p
    new_states = []
    pending = None
    for params, state, d, dp, r in zip(params_list, state_list, dils,
                                       drops, rngs):
        def w3(name):
            w = params[name]["w"]
            return w[:, 0] if w.shape[1] == 1 else w[0]

        tile = lambda name: jnp.tile(params[name]["b"], p)
        wh1 = stack_taps_h(w3("conv3x1_1"), p)
        ww2, s2 = stack_taps_w(w3("conv1x3_1"), p, 1)
        if pending is None:
            z1, s1a, s1b = fused_pair_stats(X, wh1, tile("conv3x1_1"), ww2,
                                            tile("conv1x3_1"), sh=1, sw=s2,
                                            thrw=_merge_thrw(p, C, 1))
            y_in = X
        else:
            z1, y_in, s1a, s1b = fused_pair_epi_stats(
                *pending, wh1, tile("conv3x1_1"), ww2, tile("conv1x3_1"),
                sh=1, sw=s2, thrw=_merge_thrw(p, C, 1))
        # per-row batch statistics come OUT of the kernels; XLA runs only
        # the tiny masked row-sum (pad-row-exact, batch-sharded rows sum
        # via the jit-inserted collective) + the (pC,) coeff math
        (a1, b1), bn1s = _bn_packed_coeffs_from_sums(
            *stat_sums_from_rows(s1a, s1b, n_img, valid),
            params["bn1"], state["bn1"], p=p, eps=bn_eps)
        ww4, s4 = stack_taps_w(w3("conv1x3_2"), p, d)
        t, s2a, s2b = fused_pair_affine_stats(
            z1, a1, b1, stack_taps_h(w3("conv3x1_2"), p), tile("conv3x1_2"),
            ww4, tile("conv1x3_2"), sh=d, sw=s4,
            thrw=_merge_thrw(p, C, d))
        (a2, b2), bn2s = _bn_packed_coeffs_from_sums(
            *stat_sums_from_rows(s2a, s2b, n_img, valid),
            params["bn2"], state["bn2"], p=p, eps=bn_eps)
        pending = (t, y_in, _drop_mask_packed(r, dp, B, C, p), a2, b2)
        new_states.append({"bn1": bn1s, "bn2": bn2s})
    t, y_in, m, a2, b2 = pending
    X = jax.nn.relu((t * a2.astype(t.dtype) + b2.astype(t.dtype))
                    * m[:, None, None, :].astype(t.dtype)
                    + y_in.astype(t.dtype))
    return X, new_states


def nb1d_train_packed_core_run(params_list, state_list, X, *, p, C, dils,
                               drops, train, rngs, bn_eps=1e-3,
                               valid=None):
    """Run of NB1d blocks on an ALREADY-PACKED (B, H, Wb, pC) tensor —
    the decoder's packed-through train path (models/erfnet.py) keeps
    activations packed across upsampler boundaries.  Returns (X, states)."""
    from .pallas.nb1d_train import fused_train_enabled, pair_supported
    if train and fused_train_enabled() and pair_supported(X.shape):
        return _packed_fused_carry_run(params_list, state_list, X, p=p,
                                       C=C, dils=dils, drops=drops,
                                       rngs=rngs, bn_eps=bn_eps,
                                       valid=valid)
    new_states = []
    for params, state, d, dp, r in zip(params_list, state_list, dils,
                                       drops, rngs):
        X, ns = _nb1d_train_packed_core(params, state, X, p=p, C=C,
                                        dilated=d, dropprob=dp, train=train,
                                        rng=r, bn_eps=bn_eps, valid=valid)
        new_states.append(ns)
    return X, new_states


def nb1d_train_packed_run(params_list, state_list, x, *, p, dils, drops,
                          train, rngs, compute_dtype=None, bn_eps=1e-3,
                          valid=None):
    """A run of consecutive same-C NB1d blocks, packed ONCE for the whole
    stage — avoids the lane-padded (M, C<128) layout round-trips at block
    boundaries that dominate the small-channel stages.  Returns
    (y, [new_bn_states])."""
    B, H, W, C = x.shape
    assert W % p == 0
    X = x.reshape(B, H, W // p, p * C)
    if compute_dtype is not None:
        X = X.astype(compute_dtype)
    new_states = []
    for params, state, d, dp, r in zip(params_list, state_list, dils,
                                       drops, rngs):
        X, ns = _nb1d_train_packed_core(params, state, X, p=p, C=C,
                                        dilated=d, dropprob=dp, train=train,
                                        rng=r, bn_eps=bn_eps, valid=valid)
        new_states.append(ns)
    return X.reshape(B, H, W, C).astype(x.dtype), new_states


def nb1d_packed(x, packed):
    """Inference non_bottleneck_1d on a space-to-depth packed layout.

    x: (B, H, W, C) -> same; internally (B, H, W/p, p*C).  Pure jnp — XLA
    fuses the shifts into the matmul epilogues; also the numerics oracle
    for the Pallas variant.
    """
    B, H, W, C = x.shape
    p = packed["p"]
    assert W % p == 0, (W, p)
    X = x.reshape(B, H, W // p, p * C)
    t = packed_conv(X, packed["c1"], packed["b1"], axis=-3, relu=True)
    t = packed_conv(t, packed["c2"], packed["b2"], axis=-2, relu=True)
    t = packed_conv(t, packed["c3"], packed["b3"], axis=-3, relu=True)
    t = packed_conv(t, packed["c4"], packed["b4"], axis=-2, relu=False)
    out = jax.nn.relu(t.astype(jnp.float32) + X.astype(jnp.float32))
    return out.reshape(B, H, W, C).astype(x.dtype)
