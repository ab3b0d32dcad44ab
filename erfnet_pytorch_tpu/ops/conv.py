"""Convolution / pooling primitives with torch-exact spatial semantics,
NHWC layout, lowered through XLA onto the TPU MXU.

Parity targets (reference, cited per SURVEY.md — mount empty at build time):
  * ``train/erfnet.py`` blocks: Conv2d 3x3 s2 p1; factorized (3,1)/(1,3)
    convs with ``padding=(d,0)/(0,d)`` and ``dilation=(d,1)/(1,d)``; 1x1.
  * ``train/erfnet.py:UpsamplerBlock``: ConvTranspose2d(3, s2, p1, op1),
    and ``Decoder.output_conv``: ConvTranspose2d(2, s2).
  * ``DownsamplerBlock`` / imagenet ``Features``: MaxPool2d(2,2), AvgPool2d.

Weight layout: HWIO (kh, kw, cin, cout).  ConvTranspose weights are stored in
*forward-conv-equivalent* HWIO form (spatially flipped, I/O as the equivalent
forward conv), so transposed convolution is exactly
``conv_general_dilated(..., lhs_dilation=stride)`` — the canonical XLA
fractional-stride lowering.  The torch importer performs the flip/transpose.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def _pair(v: Union[int, Sequence[int]]) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    a, b = v
    return (int(a), int(b))


def conv2d(x, w, b=None, *, stride=1, padding=0, dilation=1,
           compute_dtype=None):
    """torch.nn.functional.conv2d semantics, NHWC/HWIO.

    x: (B, H, W, Cin); w: (kh, kw, Cin, Cout); b: (Cout,) or None.
    padding is symmetric per-dim (torch int / pair semantics).
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    # output dtype follows the compute dtype so AD transpose rules see
    # uniform dtypes (MXU accumulates in f32 internally either way)
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=(dh, dw),
        dimension_numbers=_DN,
        preferred_element_type=compute_dtype or jnp.float32,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_transpose2d(x, w, b=None, *, stride=2, padding=0, output_padding=0,
                     compute_dtype=None):
    """torch.nn.functional.conv_transpose2d semantics.

    ``w`` is stored HWIO in forward-conv-equivalent form (see module
    docstring), so this is a regular conv with ``lhs_dilation=stride`` and
    padding ``(k-1-p, k-1-p+op)`` per spatial dim:
        out = (in-1)*s - 2p + k + op     (torch formula)
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    oph, opw = _pair(output_padding)
    kh, kw = w.shape[0], w.shape[1]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding=((kh - 1 - ph, kh - 1 - ph + oph),
                 (kw - 1 - pw, kw - 1 - pw + opw)),
        lhs_dilation=(sh, sw),
        dimension_numbers=_DN,
        preferred_element_type=compute_dtype or jnp.float32,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def max_pool2d(x, window=2, stride=2):
    """torch MaxPool2d(window, stride), no padding (floor mode)."""
    wh, ww = _pair(window)
    sh, sw = _pair(stride)
    neg = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    return lax.reduce_window(
        x, neg, lax.max,
        window_dimensions=(1, wh, ww, 1),
        window_strides=(1, sh, sw, 1),
        padding="VALID",
    )


def avg_pool2d(x, window, stride=1):
    """torch AvgPool2d(window, stride), no padding."""
    wh, ww = _pair(window)
    sh, sw = _pair(stride)
    s = lax.reduce_window(
        x.astype(jnp.float32), 0.0, lax.add,
        window_dimensions=(1, wh, ww, 1),
        window_strides=(1, sh, sw, 1),
        padding="VALID",
    )
    return (s / float(wh * ww)).astype(x.dtype)


def _shift(x, k, axis):
    """Static zero-fill shift along a spatial axis: out[i] = x[i - k]."""
    if k == 0:
        return x
    pad = [(0, 0)] * x.ndim
    sl = [slice(None)] * x.ndim
    if k > 0:
        pad[axis] = (k, 0)
        sl[axis] = slice(None, -k)
    else:
        pad[axis] = (0, -k)
        sl[axis] = slice(-k, None)
    return jnp.pad(x[tuple(sl)], pad)


def conv_3tap_mm(x, w, b=None, *, axis, dilation=1, compute_dtype=None):
    """Factorized (3,1)/(1,3) conv as three shifted (M, C) x (C, C) matmuls.

    Numerically equal to ``conv2d`` with SAME dilation padding, but lowers
    to plain MXU matmuls whose AD transposes are also matmuls — XLA's conv
    dgrad/wgrad for 3x1 dilated kernels measured ~9x slower on v5e (the
    training hot path).  axis: 1 (H) or 2 (W); w: HWIO (3,1,C,C)/(1,3,C,C).
    """
    taps = w[:, 0] if w.shape[1] == 1 else w[0]     # (3, Cin, Cout)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        taps = taps.astype(compute_dtype)
    cin = x.shape[-1]
    cout = taps.shape[-1]
    flatshape = x.shape[:-1] + (cout,)
    out = None
    for k in range(3):
        s = -(k - 1) * dilation
        if abs(s) >= x.shape[axis]:
            continue  # tap entirely outside the map (tiny inputs, large d)
        m = jnp.dot(_shift(x, s, axis).reshape(-1, cin),
                    taps[k], preferred_element_type=jnp.float32)
        out = m if out is None else out + m
    out = out.reshape(flatshape)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(compute_dtype or jnp.float32)


# ---------------------------------------------------------------------------
# Initializers — match torch _ConvNd defaults: kaiming_uniform(a=sqrt(5)) on
# weight => U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias U(+-1/sqrt(fan_in)).
# ---------------------------------------------------------------------------

def init_conv(key, kh, kw, cin, cout, *, bias=True, dtype=jnp.float32):
    fan_in = cin * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    kw_, kb_ = jax.random.split(key)
    p = {"w": jax.random.uniform(kw_, (kh, kw, cin, cout), dtype,
                                 minval=-bound, maxval=bound)}
    if bias:
        p["b"] = jax.random.uniform(kb_, (cout,), dtype,
                                    minval=-bound, maxval=bound)
    return p


def init_conv_transpose(key, kh, kw, cin, cout, *, bias=True,
                        dtype=jnp.float32):
    # torch ConvTranspose2d weight is (cin, cout, kh, kw); its fan_in is
    # cout*kh*kw (dim-1 x receptive field). Stored here directly in
    # forward-conv-equivalent HWIO (kh, kw, cin, cout) — a flip of iid
    # uniform noise is iid uniform, so init distribution matches torch.
    fan_in = cout * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    kw_, kb_ = jax.random.split(key)
    p = {"w": jax.random.uniform(kw_, (kh, kw, cin, cout), dtype,
                                 minval=-bound, maxval=bound)}
    if bias:
        p["b"] = jax.random.uniform(kb_, (cout,), dtype,
                                    minval=-bound, maxval=bound)
    return p
