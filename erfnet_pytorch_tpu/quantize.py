"""Post-training int8 calibration for the w8a8 NB1d inference path.

Collects the per-tensor activation absmaxes the int8 kernels
(ops/pallas/nb1d_q8.py) need: for every eligible NB1d block, the block
input and the three post-ReLU intra-block intermediates, computed with
the SAME BN-folded tap math as the kernels (fuse_nb1d_params +
_taps_h/_taps_w) so calibration sees exactly the values the kernel
quantizes.  One f32 forward per calibration batch; scales are the
running max across batches.

No reference counterpart (the reference is f32-only; SURVEY.md §6 —
this is an optional speed/accuracy tradeoff on top of parity).  Scales
serialize to JSON so eval CLIs can calibrate once and reuse.
"""

from __future__ import annotations

import json
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .models import erfnet
from .models.erfnet import (ENCODER_LAYER_SPECS, DECODER_LAYER_SPECS,
                            apply_downsampler, apply_upsampler,
                            apply_non_bottleneck_1d)
from .ops.pallas.nb1d import fuse_nb1d_params, _taps_h, _taps_w

# channel counts the fused kernels can take (see inference._PACK)
_Q8_CHANNELS = (16, 64, 128)

ScaleKey = Tuple[str, int]
Scales = Dict[ScaleKey, Dict[str, float]]


def _block_acts(x, fused, dilated):
    """(H, W, C) f32 -> (a1, a2, a3, out): the post-ReLU intermediates and
    output of one NB1d block, in the kernel's exact BN-folded form."""
    H, W, C = x.shape
    a1 = _taps_h(x.reshape(H * W, C), fused["w1"], 1, W, True, fused["b1"])
    a2 = _taps_w(a1.reshape(H, W, C), fused["w2"], 1, H, W, C, True,
                 fused["b2"])
    a3 = _taps_h(a2.reshape(H * W, C), fused["w3"], dilated, W, True,
                 fused["b3"])
    t4 = _taps_w(a3.reshape(H, W, C), fused["w4"], dilated, H, W, C, False,
                 fused["b4"])
    out = jax.nn.relu(t4 + x)
    return a1, a2, a3, out


@jax.jit
def _amax(a) -> jnp.ndarray:
    return jnp.max(jnp.abs(a)).astype(jnp.float32)


def _make_calib_layer_fn(layers_params, layers_state, specs, tag, record):
    fused = {}
    for i, (kind, args) in enumerate(specs):
        if kind == "nb1d" and args[0] in _Q8_CHANNELS:
            fused[i] = fuse_nb1d_params(layers_params[i], layers_state[i],
                                        dtype=jnp.float32)

    def layer_fn(kind, i, params, state, x, spec):
        if kind == "down":
            return apply_downsampler(params, state, x, train=False,
                                     compute_dtype=jnp.float32)
        if kind == "up":
            return apply_upsampler(params, state, x, train=False,
                                   compute_dtype=jnp.float32)
        c, _drop, dil = spec
        if i not in fused:
            return apply_non_bottleneck_1d(params, state, x, dilated=dil,
                                           dropprob=0.0, train=False,
                                           compute_dtype=jnp.float32)
        a1, a2, a3, out = jax.vmap(
            lambda xi: _block_acts(xi, fused[i], dil))(
                x.astype(jnp.float32))
        rec = record.setdefault((tag, i),
                                {"in": 0.0, "a1": 0.0, "a2": 0.0,
                                 "a3": 0.0})
        for key, a in (("in", x), ("a1", a1), ("a2", a2), ("a3", a3)):
            rec[key] = max(rec[key], float(_amax(a)))
        return out, state

    return layer_fn


def calibrate_q8_scales(params, batch_stats, batches,
                        scales: Scales | None = None) -> Scales:
    """Run f32 calibration forwards over ``batches`` (iterable of
    (B, H, W, 3) images) and return per-block activation absmaxes.
    Pass a previous result as ``scales`` to keep accumulating."""
    record: Scales = dict(scales or {})
    enc_fn = _make_calib_layer_fn(params["encoder"]["layers"],
                                  batch_stats["encoder"]["layers"],
                                  ENCODER_LAYER_SPECS, "encoder", record)
    dec_fn = _make_calib_layer_fn(params["decoder"]["layers"],
                                  batch_stats["decoder"]["layers"],
                                  DECODER_LAYER_SPECS, "decoder", record)
    from .data.transforms import to_tensor
    for images in batches:
        # raw uint8 loader frames take the same ToTensor normalize every
        # consuming step applies — calibration must see the kernels' inputs
        x = to_tensor(jnp.asarray(images))
        erfnet.apply(params, batch_stats, x, train=False,
                     compute_dtype=jnp.float32, encoder_layer_fn=enc_fn,
                     decoder_layer_fn=dec_fn)
    return record


def save_q8_scales(path: str, scales: Scales) -> None:
    with open(path, "w") as f:
        json.dump([{"tag": t, "layer": i, **v}
                   for (t, i), v in sorted(scales.items())], f, indent=1)


def load_q8_scales(path: str) -> Scales:
    with open(path) as f:
        rows = json.load(f)
    return {(r["tag"], r["layer"]): {k: r[k]
                                     for k in ("in", "a1", "a2", "a3")}
            for r in rows}


def resolve_q8_scales(args, params, batch_stats, calib_batches):
    """CLI-side resolution of the add_int8_flags surface
    (inference.add_int8_flags): None unless --int8; load --q8-scales when
    the file exists; otherwise calibrate on ``calib_batches`` (an iterable
    of image batches, consumed up to --q8-calib-batches) and save to
    --q8-scales if given."""
    import itertools
    import os

    if not getattr(args, "int8", False):
        return None
    path = getattr(args, "q8_scales", None)
    if path and os.path.exists(path):
        print(f"int8: loading calibration scales from {path}")
        return load_q8_scales(path)
    n = max(1, int(getattr(args, "q8_calib_batches", 4)))
    used = 0

    def counted():
        nonlocal used
        for b in itertools.islice(iter(calib_batches), n):
            used += 1
            yield b

    scales = calibrate_q8_scales(params, batch_stats, counted())
    print(f"int8: calibrated activation scales on {used} batches")
    if path:
        save_q8_scales(path, scales)
        print(f"int8: saved calibration scales to {path}")
    return scales
