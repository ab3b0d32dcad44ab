"""ERFNet segmentation model — TPU-native functional rebuild.

Capability parity with the reference's ``train/erfnet.py`` (and its eval/
duplicate; SURVEY.md §2a row 1): DownsamplerBlock, non_bottleneck_1d,
Encoder (1 + 16 blocks + 1x1 head), UpsamplerBlock, Decoder, Net with
``only_encode`` / encoder-predict modes.

Architecture (reference math, shape-verified vs torch-cpu):
  Encoder:  Down(3,16) -> Down(16,64) -> 5x NB1d(64, p=.03, d=1)
            -> Down(64,128) -> 2x [NB1d(128,.3,2), (.,4), (.,8), (.,16)]
            [predict: 1x1 conv -> num_classes at 1/8 resolution]
  Decoder:  Up(128,64) -> 2x NB1d(64,0,1) -> Up(64,16) -> 2x NB1d(16,0,1)
            -> ConvTranspose(16, C, k2 s2)  (full resolution)

TPU-first design choices (NOT a port):
  * NHWC; params/batch_stats are plain pytrees; apply() is pure and jittable.
  * Python-level block loop unrolls at trace time (27 convs — fine for XLA).
  * The hot 128-channel dilated NB1d blocks can run through a fused Pallas
    kernel at inference (see ops/pallas/nb1d.py); XLA path is the fallback
    and the parity oracle.
  * Dropout2d RNG is derived per-block via fold_in — deterministic under jit.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp

from ..ops.conv import (conv2d, conv_3tap_mm, conv_transpose2d, max_pool2d,
                        init_conv, init_conv_transpose)
from ..ops.batchnorm import batch_norm, init_batch_norm
from ..ops.dropout import dropout2d

BN_EPS = 1e-3


# ---------------------------------------------------------------------------
# Block definitions.  Each block: init(key) -> (params, state),
# apply(params, state, x, ...) -> (y, new_state).
# ---------------------------------------------------------------------------

def init_downsampler(key, cin, cout):
    kc, kb = jax.random.split(key)
    conv = init_conv(kc, 3, 3, cin, cout - cin)
    bnp, bns = init_batch_norm(cout)
    return {"conv": conv, "bn": bnp}, {"bn": bns}


def apply_downsampler(params, state, x, *, train, compute_dtype=None,
                      valid=None):
    # cat[conv(cin -> cout-cin, k3 s2 p1), maxpool2](x) -> BN -> relu
    if train:
        # space-to-depth matmul conv + slot-max pool: XLA's strided conv
        # wgrad and select-and-scatter backward are layout-copy-bound
        from ..ops.packed import (build_downsampler_matmul,
                                  downsampler_conv_matmul, max_pool2x2_packed)
        taps = build_downsampler_matmul(params["conv"]["w"])
        y = downsampler_conv_matmul(x, taps, params["conv"]["b"],
                                    compute_dtype=compute_dtype)
        p = max_pool2x2_packed(x).astype(y.dtype)
    else:
        y = conv2d(x, params["conv"]["w"], params["conv"]["b"], stride=2,
                   padding=1, compute_dtype=compute_dtype)
        p = max_pool2d(x, 2, 2).astype(y.dtype)
    y = jnp.concatenate([y, p], axis=-1)
    y, bns = batch_norm(y, params["bn"], state["bn"], train=train,
                        eps=BN_EPS, valid=valid)
    return jax.nn.relu(y), {"bn": bns}


def init_non_bottleneck_1d(key, c):
    k = jax.random.split(key, 6)
    p = {
        "conv3x1_1": init_conv(k[0], 3, 1, c, c),
        "conv1x3_1": init_conv(k[1], 1, 3, c, c),
        "conv3x1_2": init_conv(k[2], 3, 1, c, c),
        "conv1x3_2": init_conv(k[3], 1, 3, c, c),
    }
    bn1p, bn1s = init_batch_norm(c)
    bn2p, bn2s = init_batch_norm(c)
    p["bn1"], p["bn2"] = bn1p, bn2p
    return p, {"bn1": bn1s, "bn2": bn2s}


_TRAIN_PACK = {64: 2, 16: 8}  # space-to-depth factors -> 128 lanes


def apply_non_bottleneck_1d(params, state, x, *, dilated, dropprob, train,
                            rng=None, compute_dtype=None, valid=None):
    c = x.shape[-1]
    p = _TRAIN_PACK.get(c)
    if train and p is not None and x.shape[-2] % p == 0:
        # space-to-depth packed block: fills the 128 MXU lanes and turns
        # weight gradients into (pC, pC) matmuls (C=16 wgrads measured
        # ~3 ms/step as lane-starved (16,16) reductions)
        from ..ops.packed import nb1d_train_packed
        return nb1d_train_packed(params, state, x, p=p, dilated=dilated,
                                 dropprob=dropprob, train=train, rng=rng,
                                 compute_dtype=compute_dtype, bn_eps=BN_EPS,
                                 valid=valid)
    from ..ops.pallas.nb1d_train import (fused_pair_stats,
                                         fused_pair_affine_stats,
                                         fused_train_enabled,
                                         pair_supported)
    if (train and c % 128 == 0 and fused_train_enabled()
            and pair_supported(x.shape)):
        # fused conv-pair Pallas kernels with custom VJP (one fwd + one bwd
        # dispatch per pair; the step is per-op-overhead bound on this
        # chip).  Both BatchNorms consume IN-KERNEL batch statistics.
        from ..ops.packed import (_bn_packed_coeffs_from_sums,
                                  stat_sums_from_rows)
        xc = x.astype(compute_dtype) if compute_dtype else x
        n_img = x.shape[1] * x.shape[2]
        y, s1a, s1b = fused_pair_stats(
            xc, params["conv3x1_1"]["w"][:, 0], params["conv3x1_1"]["b"],
            params["conv1x3_1"]["w"][0], params["conv1x3_1"]["b"],
            sh=1, sw=1)
        # BN1 affine + relu fold into the next pair kernel's lead stage
        (a1, b1), bn1s = _bn_packed_coeffs_from_sums(
            *stat_sums_from_rows(s1a, s1b, n_img, valid),
            params["bn1"], state["bn1"], p=1, eps=BN_EPS)
        y, s2a, s2b = fused_pair_affine_stats(
            y, a1, b1, params["conv3x1_2"]["w"][:, 0],
            params["conv3x1_2"]["b"], params["conv1x3_2"]["w"][0],
            params["conv1x3_2"]["b"], sh=dilated, sw=dilated)
        (a2, b2), bn2s = _bn_packed_coeffs_from_sums(
            *stat_sums_from_rows(s2a, s2b, n_img, valid),
            params["bn2"], state["bn2"], p=1, eps=BN_EPS)
        y = y * a2.astype(y.dtype) + b2.astype(y.dtype)
    else:
        # factorized convs as shifted MXU matmuls (conv_3tap_mm): same math
        # as lax convs with SAME padding, ~9x faster fwd+bwd on TPU
        y = conv_3tap_mm(x, params["conv3x1_1"]["w"],
                         params["conv3x1_1"]["b"],
                         axis=1, compute_dtype=compute_dtype)
        y = jax.nn.relu(y)
        y = conv_3tap_mm(y, params["conv1x3_1"]["w"],
                         params["conv1x3_1"]["b"],
                         axis=2, compute_dtype=compute_dtype)
        y, bn1s = batch_norm(y, params["bn1"], state["bn1"], train=train,
                             eps=BN_EPS, valid=valid)
        y = jax.nn.relu(y)
        y = conv_3tap_mm(y, params["conv3x1_2"]["w"],
                         params["conv3x1_2"]["b"],
                         axis=1, dilation=dilated,
                         compute_dtype=compute_dtype)
        y = jax.nn.relu(y)
        y = conv_3tap_mm(y, params["conv1x3_2"]["w"],
                         params["conv1x3_2"]["b"],
                         axis=2, dilation=dilated,
                         compute_dtype=compute_dtype)
        y, bn2s = batch_norm(y, params["bn2"], state["bn2"], train=train,
                             eps=BN_EPS, valid=valid)
    if train and dropprob > 0:
        y = dropout2d(rng, y, dropprob, train=True)
    y = jax.nn.relu(y + x.astype(y.dtype))
    return y, {"bn1": bn1s, "bn2": bn2s}


def init_upsampler(key, cin, cout):
    conv = init_conv_transpose(key, 3, 3, cin, cout)
    bnp, bns = init_batch_norm(cout)
    return {"conv": conv, "bn": bnp}, {"bn": bns}


def apply_upsampler(params, state, x, *, train, compute_dtype=None,
                    valid=None):
    if train:
        # parity-plane matmul form: XLA's ConvTranspose backward spends
        # ~10 ms/step in kernel-gradient layout copies; matmul AD doesn't
        from ..ops.convt_mm import (build_upsampler_matmul,
                                    apply_upsampler_matmul)
        Wcat, bias = build_upsampler_matmul(params["conv"]["w"],
                                            params["conv"]["b"],
                                            dtype=compute_dtype
                                            or jnp.float32)
        y = apply_upsampler_matmul(
            x.astype(compute_dtype) if compute_dtype else x, Wcat, bias,
            relu=False)
    else:
        y = conv_transpose2d(x, params["conv"]["w"], params["conv"]["b"],
                             stride=2, padding=1, output_padding=1,
                             compute_dtype=compute_dtype)
    y, bns = batch_norm(y, params["bn"], state["bn"], train=train,
                        eps=BN_EPS, valid=valid)
    return jax.nn.relu(y), {"bn": bns}


# ---------------------------------------------------------------------------
# Encoder / Decoder / Net.  Layer specs are static python structures — the
# pytree for `layers` is a list whose entries mirror torch's ModuleList
# indices (load-bearing for checkpoint name mapping, SURVEY.md §2a row 12).
# ---------------------------------------------------------------------------

# (kind, args) — kind in {"down", "nb1d"}; nb1d args = (channels, drop, dil)
ENCODER_LAYER_SPECS: List[Tuple[str, tuple]] = (
    [("down", (16, 64))]
    + [("nb1d", (64, 0.03, 1))] * 5
    + [("down", (64, 128))]
    + [("nb1d", (128, 0.3, d)) for _ in range(2) for d in (2, 4, 8, 16)]
)

DECODER_LAYER_SPECS: List[Tuple[str, tuple]] = [
    ("up", (128, 64)),
    ("nb1d", (64, 0.0, 1)),
    ("nb1d", (64, 0.0, 1)),
    ("up", (64, 16)),
    ("nb1d", (16, 0.0, 1)),
    ("nb1d", (16, 0.0, 1)),
]


def _init_layers(key, specs):
    params, state = [], []
    keys = jax.random.split(key, len(specs))
    for k, (kind, args) in zip(keys, specs):
        if kind == "down":
            p, s = init_downsampler(k, *args)
        elif kind == "up":
            p, s = init_upsampler(k, *args)
        else:
            p, s = init_non_bottleneck_1d(k, args[0])
        params.append(p)
        state.append(s)
    return params, state


def init_encoder(key, num_classes):
    k0, k1, k2 = jax.random.split(key, 3)
    ip, istate = init_downsampler(k0, 3, 16)
    lp, lstate = _init_layers(k1, ENCODER_LAYER_SPECS)
    params = {"initial_block": ip, "layers": lp,
              "output_conv": init_conv(k2, 1, 1, 128, num_classes)}
    return params, {"initial_block": istate, "layers": lstate}


def _apply_layer_seq(specs, layers_params, layers_state, y, *, train, rng,
                     compute_dtype, layer_fn, rng_base, apply_up=None,
                     valid=None):
    """Shared encoder/decoder layer loop.  In the training path, maximal
    runs of same-C small-channel NB1d blocks execute space-to-depth packed
    end-to-end (ops/packed.py:nb1d_train_packed_run) — the lane-padded
    (M, C<128) layouts at block boundaries otherwise dominate."""
    n = len(specs)
    new_layers: List[Any] = [None] * n
    i = 0
    while i < n:
        kind, args = specs[i]
        p, s = layers_params[i], layers_state[i]
        if layer_fn is not None:
            y, new_layers[i] = layer_fn(kind, i, p, s, y, args)
            i += 1
            continue
        if kind == "down":
            y, new_layers[i] = apply_downsampler(
                p, s, y, train=train, compute_dtype=compute_dtype,
                valid=valid)
            i += 1
            continue
        if kind == "up":
            y, new_layers[i] = apply_up(p, s, y)
            i += 1
            continue
        c, drop, dil = args
        pack = _TRAIN_PACK.get(c)
        if train and pack is not None and y.shape[-2] % pack == 0:
            j = i
            while (j < n and specs[j][0] == "nb1d"
                   and specs[j][1][0] == c):
                j += 1
            from ..ops.packed import nb1d_train_packed_run
            idxs = list(range(i, j))
            rngs = [jax.random.fold_in(rng, rng_base + k)
                    if rng is not None else None for k in idxs]
            y, run_states = nb1d_train_packed_run(
                [layers_params[k] for k in idxs],
                [layers_state[k] for k in idxs], y, p=pack,
                dils=[specs[k][1][2] for k in idxs],
                drops=[specs[k][1][1] for k in idxs], train=train,
                rngs=rngs, compute_dtype=compute_dtype, bn_eps=BN_EPS,
                valid=valid)
            for k, ns in zip(idxs, run_states):
                new_layers[k] = ns
            i = j
            continue
        r = jax.random.fold_in(rng, rng_base + i) if (rng is not None) \
            else None
        y, new_layers[i] = apply_non_bottleneck_1d(
            p, s, y, dilated=dil, dropprob=drop, train=train, rng=r,
            compute_dtype=compute_dtype, valid=valid)
        i += 1
    return y, new_layers


def _fused_nb1d_run(layers, lstate, y, idxs, specs, *, rng, rng_base=0,
                    valid=None):
    """A run of same-C NB1d blocks through the fused pair kernels with the
    EPILOGUE CARried into the next block's first kernel (each block's
    BN2-affine + dropout + residual + relu applies inside the next
    fused_pair_epi lead stage).  Exactly ops/packed.py's
    _packed_fused_carry_run at pack factor p=1 — the tap-stack/tile/mask
    helpers all degenerate to identities there.
    Returns (y_out, {i: bn_state})."""
    from ..ops.packed import _packed_fused_carry_run
    rngs = [jax.random.fold_in(rng, rng_base + i) if rng is not None
            else None for i in idxs]
    y, states = _packed_fused_carry_run(
        [layers[i] for i in idxs], [lstate[i] for i in idxs], y,
        p=1, C=y.shape[-1], dils=[specs[i][1][2] for i in idxs],
        drops=[specs[i][1][1] for i in idxs], rngs=rngs, bn_eps=BN_EPS,
        valid=valid)
    return y, dict(zip(idxs, states))


_STEM_PI = 32  # image W-packing for the packed stem kernel (32*3=96 lanes)


def _encoder_packed_ok(shape):
    from ..ops.pallas.downsampler import down_packed_supported
    from ..ops.pallas.nb1d_train import pair_supported
    b, h, w, c = shape
    kinds = [k for k, _ in ENCODER_LAYER_SPECS]
    return (c == 3 and h % 8 == 0 and w % (2 * _STEM_PI) == 0
            and kinds == ["down"] + ["nb1d"] * 5 + ["down"] + ["nb1d"] * 8
            and down_packed_supported((b, h, w // _STEM_PI, _STEM_PI * 3),
                                      _STEM_PI)
            and down_packed_supported((b, h // 2, w // 16, 128), 8)
            and down_packed_supported((b, h // 4, w // 8, 128), 2)
            and pair_supported((b, h // 4, w // 8, 128))
            and pair_supported((b, h // 8, w // 8, 128)))


def _apply_encoder_packed_train(params, state, x, *, rng, compute_dtype,
                                valid=None, aug_shift=None):
    """Encoder train path in W-packed layouts end to end: packed stem
    (Down 3->16) -> packed Down(16,64) -> packed C64 run -> Down(64,128)
    -> dilated C128 blocks (fused conv-pair kernels).  No s2d/pool/pack
    layout round-trips between stages."""
    from ..ops.packed import (_bn_packed_coeffs_from_sums,
                              nb1d_train_packed_core_run,
                              stat_sums_from_rows)
    from ..ops.pallas.downsampler import downsampler_packed_stats
    B, H, W, _ = x.shape
    layers, lstate = params["layers"], state["layers"]
    new_layers: List[Any] = [None] * len(layers)
    xc = x.astype(compute_dtype) if compute_dtype is not None else x

    def bn_relu(p, s, y, s1, s2, po, cout):
        b_, h2, wb, cl = y.shape
        n_img = h2 * wb * (cl // cout)
        (a, bb), bns = _bn_packed_coeffs_from_sums(
            *stat_sums_from_rows(s1, s2, n_img, valid),
            p["bn"], s["bn"], p=cl // cout, eps=BN_EPS, out_p=po)
        y = y.reshape(b_, h2, (wb * cl) // (po * cout), po * cout)
        return jax.nn.relu(y * a.astype(y.dtype) + bb.astype(y.dtype)), \
            {"bn": bns}

    def down(p, s, X, pi, po, cout):
        # ONE kernel: conv + max-pool lanes + bias + per-row BN statistics
        y, s1, s2 = downsampler_packed_stats(X, p["conv"]["w"],
                                             p["conv"]["b"], pi=pi)
        return bn_relu(p, s, y, s1, s2, po, cout)

    # stem: image W-packed view (free row-major regroup)
    p0, s0 = params["initial_block"], state["initial_block"]
    if aug_shift is not None:
        # augment fold: the stem kernel applies the per-sample ±2px
        # translate AND the compute-dtype cast in its lead stage on the
        # raw flipped image (ops/pallas/downsampler.py staug) — the XLA
        # translate selects + cast pass never run
        from ..ops.pallas.downsampler import downsampler_packed_stats_aug
        Xr = x.reshape(B, H, W // _STEM_PI, _STEM_PI * 3)
        y, s1, s2 = downsampler_packed_stats_aug(
            Xr, aug_shift, p0["conv"]["w"], p0["conv"]["b"], pi=_STEM_PI,
            out_dtype=compute_dtype if compute_dtype is not None
            else x.dtype)
        X, is_ = bn_relu(p0, s0, y, s1, s2, 8, 16)  # (B, H/2, W/16, 128)
    else:
        X = xc.reshape(B, H, W // _STEM_PI, _STEM_PI * 3)
        X, is_ = down(p0, s0, X, _STEM_PI, 8, 16)   # (B, H/2, W/16, 128)
    X, new_layers[0] = down(layers[0], lstate[0], X, 8, 2, 64)
    rngs = [jax.random.fold_in(rng, i) if rng is not None else None
            for i in range(1, 6)]
    X, run_states = nb1d_train_packed_core_run(
        layers[1:6], lstate[1:6], X, p=2, C=64,
        dils=[ENCODER_LAYER_SPECS[k][1][2] for k in range(1, 6)],
        drops=[ENCODER_LAYER_SPECS[k][1][1] for k in range(1, 6)],
        train=True, rngs=rngs, bn_eps=BN_EPS, valid=valid)
    new_layers[1:6] = run_states
    X, new_layers[6] = down(layers[6], lstate[6], X, 2, 1, 128)
    # dilated C128 stack with the epilogue carried between fused kernels
    y, run_new = _fused_nb1d_run(layers, lstate, X, list(range(7, 15)),
                                 ENCODER_LAYER_SPECS, rng=rng, valid=valid)
    for i, ns in run_new.items():
        new_layers[i] = ns
    return y, {"initial_block": is_, "layers": new_layers}


def apply_encoder(params, state, x, *, train=False, rng=None, predict=False,
                  compute_dtype=None, layer_fn=None, initial_fn=None,
                  valid=None, aug_shift=None):
    """layer_fn: optional override(kind, idx, params, state, x, spec) for
    fused-kernel substitution at inference; initial_fn likewise overrides
    the stem DownsamplerBlock.  valid: optional (B,) 0/1 mask excluding DP
    batch-pad rows from every BN batch statistic.  aug_shift: optional
    (B, 2) f32 per-sample translate (ops/augment.co_transform_shifts) —
    folded into the packed stem kernel when that path engages, applied as
    the equivalent XLA shift otherwise."""
    from ..ops.pallas.nb1d_train import fused_train_enabled
    if (train and layer_fn is None and fused_train_enabled()
            and _encoder_packed_ok(x.shape)):
        y, new_state = _apply_encoder_packed_train(
            params, state, x, rng=rng, compute_dtype=compute_dtype,
            valid=valid, aug_shift=aug_shift)
        if predict:
            y = conv2d(y, params["output_conv"]["w"],
                       params["output_conv"]["b"],
                       compute_dtype=compute_dtype)
        return y, new_state
    if aug_shift is not None:
        from ..ops.augment import apply_shifts
        x = apply_shifts(x, aug_shift)
    if initial_fn is not None:
        y, is_ = initial_fn(params["initial_block"], state["initial_block"],
                            x)
    else:
        y, is_ = apply_downsampler(params["initial_block"],
                                   state["initial_block"], x, train=train,
                                   compute_dtype=compute_dtype, valid=valid)
    y, new_layers = _apply_layer_seq(ENCODER_LAYER_SPECS, params["layers"],
                                     state["layers"], y, train=train,
                                     rng=rng, compute_dtype=compute_dtype,
                                     layer_fn=layer_fn, rng_base=0,
                                     valid=valid)
    new_state = {"initial_block": is_, "layers": new_layers}
    if predict:
        y = conv2d(y, params["output_conv"]["w"], params["output_conv"]["b"],
                   compute_dtype=compute_dtype)
    return y, new_state


def init_decoder(key, num_classes):
    k1, k2 = jax.random.split(key)
    lp, lstate = _init_layers(k1, DECODER_LAYER_SPECS)
    params = {"layers": lp,
              "output_conv": init_conv_transpose(k2, 2, 2, 16, num_classes)}
    return params, {"layers": lstate}


def _decoder_packed_ok(shape):
    """Packed-through decoder train path applies to the canonical layer
    list on 128-channel encoder maps that fit the kernels' VMEM budget."""
    from ..ops.pallas.upsampler import ups_packed_supported
    from ..ops.pallas.nb1d_train import pair_supported
    b, h, w, c = shape
    return (c == 128 and w % 4 == 0
            and [k for k, _ in DECODER_LAYER_SPECS]
            == ["up", "nb1d", "nb1d", "up", "nb1d", "nb1d"]
            and ups_packed_supported(shape, 1, 2)
            and ups_packed_supported((b, 2 * h, w, 128), 2, 8)
            and pair_supported((b, 2 * h, w, 128))
            and pair_supported((b, 4 * h, w // 2, 128)))


def _apply_decoder_packed_train(params, state, x, *, rng, compute_dtype,
                                keep_packed=False, valid=None):
    """Decoder train path entirely in W-packed layouts: packed upsampler
    kernels (ops/pallas/upsampler.py) feed the packed NB1d runs directly —
    no full-resolution d2s/pack layout round-trips between stages.
    Returns (pre-head features (B, 4H, 4W_in, 16), new layer states); with
    keep_packed=True the features stay W-packed (B, 4H, W_in/2, 128) for
    the packed fused head+loss (the (M, 16) native view has a lane-padded
    layout that costs ~1 ms/step in relayouts)."""
    from ..ops.packed import (_bn_packed_coeffs_from_sums,
                              nb1d_train_packed_core_run,
                              stat_sums_from_rows)
    from ..ops.pallas.upsampler import upsampler_packed_stats
    layers, lstate = params["layers"], state["layers"]
    new_layers: List[Any] = [None] * len(layers)
    X = x.astype(compute_dtype) if compute_dtype is not None else x

    def up(i, X, pi, po, p_bn):
        # the kernel emits per-row BN statistics (masked row-sum in XLA)
        y, s1, s2 = upsampler_packed_stats(X, layers[i]["conv"]["w"],
                                           layers[i]["conv"]["b"],
                                           pi=pi, po=po)
        n_img = y.shape[1] * y.shape[2] * p_bn
        (a, b), bns = _bn_packed_coeffs_from_sums(
            *stat_sums_from_rows(s1, s2, n_img, valid),
            layers[i]["bn"], lstate[i]["bn"], p=p_bn, eps=BN_EPS)
        new_layers[i] = {"bn": bns}
        return jax.nn.relu(y * a.astype(y.dtype) + b.astype(y.dtype))

    def run(idxs, X, p, C):
        rngs = [jax.random.fold_in(rng, 100 + k) if rng is not None
                else None for k in idxs]
        X, states = nb1d_train_packed_core_run(
            [layers[k] for k in idxs], [lstate[k] for k in idxs], X,
            p=p, C=C, dils=[DECODER_LAYER_SPECS[k][1][2] for k in idxs],
            drops=[DECODER_LAYER_SPECS[k][1][1] for k in idxs],
            train=True, rngs=rngs, bn_eps=BN_EPS, valid=valid)
        for k, ns in zip(idxs, states):
            new_layers[k] = ns
        return X

    X = up(0, X, 1, 2, 2)          # (B, 2H, W, 128) = packed-p2 C64
    X = run([1, 2], X, 2, 64)
    X = up(3, X, 2, 8, 8)          # (B, 4H, W/2, 128) = packed-p8 C16
    X = run([4, 5], X, 8, 16)
    if keep_packed:
        return X, new_layers
    B, H4, Wb, pc = X.shape
    y = X.reshape(B, H4, Wb * 8, 16)   # unpack for the head
    return y, new_layers


def apply_decoder(params, state, x, *, train=False, rng=None,
                  compute_dtype=None, layer_fn=None, output_conv_fn=None,
                  keep_packed_feats=False, valid=None):
    from ..ops.pallas.nb1d_train import fused_train_enabled
    if (train and layer_fn is None and fused_train_enabled()
            and _decoder_packed_ok(x.shape)):
        y, new_layers = _apply_decoder_packed_train(
            params, state, x, rng=rng, compute_dtype=compute_dtype,
            keep_packed=keep_packed_feats, valid=valid)
    else:
        y, new_layers = _apply_layer_seq(
            DECODER_LAYER_SPECS, params["layers"], state["layers"], x,
            train=train, rng=rng, compute_dtype=compute_dtype,
            layer_fn=layer_fn, rng_base=100, valid=valid,
            apply_up=lambda p, s, t: apply_upsampler(
                p, s, t, train=train, compute_dtype=compute_dtype,
                valid=valid))
    if output_conv_fn is not None:
        y = output_conv_fn(y)
    elif train:
        # matmul form (see apply_upsampler): avoids the full-res ConvT
        # backward's reverse + layout copies
        from ..ops.convt_mm import build_head_matmul, apply_head_matmul
        Wh, bh = build_head_matmul(params["output_conv"]["w"],
                                   params["output_conv"]["b"],
                                   dtype=compute_dtype or jnp.float32)
        y = apply_head_matmul(
            y.astype(compute_dtype) if compute_dtype else y, Wh, bh)
    else:
        y = conv_transpose2d(y, params["output_conv"]["w"],
                             params["output_conv"]["b"], stride=2, padding=0,
                             output_padding=0, compute_dtype=compute_dtype)
    return y, {"layers": new_layers}


def init(key, num_classes=20, encoder=None):
    """Net(num_classes, encoder=...) — pass (params, state) of a pretrained
    encoder to reproduce the reference's stage-1 -> stage-2 handoff."""
    ke, kd = jax.random.split(key)
    if encoder is None:
        ep, es = init_encoder(ke, num_classes)
    else:
        ep, es = encoder
    dp, ds = init_decoder(kd, num_classes)
    return {"encoder": ep, "decoder": dp}, {"encoder": es, "decoder": ds}


def apply(params, state, x, *, train=False, rng=None, only_encode=False,
          compute_dtype=None, encoder_layer_fn=None, decoder_layer_fn=None,
          decoder_output_conv_fn=None, skip_head=False,
          encoder_initial_fn=None, keep_packed_feats=False, valid=None,
          aug_shift=None):
    """Forward pass. x: (B, H, W, 3) -> logits (B, H', W', num_classes).

    only_encode=True mirrors ``Net.forward(input, only_encode=True)``:
    encoder with its 1x1 prediction head at 1/8 resolution.
    skip_head=True returns PRE-head features (the fused head+loss train
    kernel applies the prediction head itself — ops/pallas/head_loss.py);
    with keep_packed_feats=True they stay W-packed (channel dim 128) when
    the packed decoder path ran — callers dispatch on the channel dim.
    valid: optional (B,) 0/1 mask that excludes DP batch-pad rows from
    every BatchNorm batch statistic (and, via autodiff of the masked stat
    sums, from every gradient) — making padded multi-chip training
    numerically identical to the unpadded batch.
    aug_shift: optional (B, 2) f32 per-sample ±2px translate (tx, ty)
    from ops/augment.co_transform_shifts, folded into the stem kernel's
    lead stage when the packed train path engages (bit-equal XLA shift
    otherwise) — the train step passes images un-translated with it.
    """
    if only_encode:
        y, es = apply_encoder(params["encoder"], state["encoder"], x,
                              train=train, rng=rng, predict=not skip_head,
                              compute_dtype=compute_dtype,
                              layer_fn=encoder_layer_fn,
                              initial_fn=encoder_initial_fn, valid=valid,
                              aug_shift=aug_shift)
        return y, {"encoder": es, "decoder": state["decoder"]}
    y, es = apply_encoder(params["encoder"], state["encoder"], x, train=train,
                          rng=rng, predict=False, compute_dtype=compute_dtype,
                          layer_fn=encoder_layer_fn,
                          initial_fn=encoder_initial_fn, valid=valid,
                          aug_shift=aug_shift)
    y, ds = apply_decoder(params["decoder"], state["decoder"], y, train=train,
                          rng=rng, compute_dtype=compute_dtype,
                          layer_fn=decoder_layer_fn,
                          output_conv_fn=(lambda t: t) if skip_head
                          else decoder_output_conv_fn,
                          keep_packed_feats=skip_head and keep_packed_feats,
                          valid=valid)
    return y, {"encoder": es, "decoder": ds}
