"""Stride-2 transposed convolutions as parity-plane matmuls.

A ConvTranspose2d(k=3, s=2, p=1, op=1) writes each output parity plane
(a, b) from at most 4 input neighbors — so the whole upsampler collapses to
ONE dense matmul on the MXU:

    out[2i+a, 2j+b] = [x, x_h+1, x_w+1, x_hw+1][i, j] @ Wcat[:, (a, b)]

with Wcat a (4*Cin, 4*Cout) block matrix of the 9 kernel taps (zeros where
a parity plane has no tap) and a free depth-to-space at the end.  K=4*Cin
and N=4*Cout land in the MXU's happy zone (512x256 for the 128->64
upsampler vs the naive K=128/N=64), and inference BatchNorm folds straight
into Wcat/bias.

The k=2, s=2 head (Decoder.output_conv) is the 1-tap special case:
out(a, b) = x @ w[1-a, 1-b].

Derivation (forward-conv view of our HWIO-flipped storage, verified against
torch ConvTranspose2d in tests): dilated input g = 2i', window t in 0..2
with lo-pad 1 -> plane a uses taps t = 1-a (m=0) and t = 3-a (m=+1, only
for a=1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _fold(w, b, bn_params=None, bn_state=None, eps=1e-3):
    if bn_params is None:
        return jnp.asarray(w, jnp.float32), jnp.asarray(b, jnp.float32)
    from .batchnorm import fold_batch_norm
    w2, b2 = fold_batch_norm(jnp.asarray(w), jnp.asarray(b), bn_params,
                             bn_state, eps=eps)
    return jnp.asarray(w2, jnp.float32), jnp.asarray(b2, jnp.float32)


def build_upsampler_matmul(w_hwio, b, bn_params=None, bn_state=None,
                           dtype=jnp.float32, eps=1e-3):
    """ConvTranspose2d(Cin, Cout, 3, s2, p1, op1) [+ folded BN] ->
    (Wcat (4Cin, 4Cout), bias (4Cout,)).

    Row blocks: [x, x_h+1, x_w+1, x_hw+1]; col blocks: planes (a, b)
    row-major.  w_hwio is the forward-conv-equivalent HWIO storage of
    ops/conv.py (spatially flipped torch weight).  Pure jnp — traceable and
    differentiable, so the training path can use it under grad."""
    w, b = _fold(w_hwio, b, bn_params, bn_state, eps=eps)
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    Wcat = jnp.zeros((4 * cin, 4 * cout), jnp.float32)

    # plane taps: a=0 -> t_h=1 (m=0); a=1 -> t_h=0 (m=0), t_h=2 (m=+1)
    for a in (0, 1):
        for bb in (0, 1):
            # (m_h, m_w) -> row index in [x, x_h, x_w, x_hw]
            for m_h, t_h in (((0, 1),) if a == 0 else ((0, 0), (1, 2))):
                for m_w, t_w in (((0, 1),) if bb == 0 else ((0, 0), (1, 2))):
                    row = {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3}[
                        (m_h, m_w)]
                    col = a * 2 + bb
                    Wcat = Wcat.at[row * cin:(row + 1) * cin,
                                   col * cout:(col + 1) * cout].add(
                        w[t_h, t_w])
    bias = jnp.tile(b, 4)
    return Wcat.astype(dtype), bias.astype(jnp.float32)


def apply_upsampler_matmul(x, Wcat, bias, *, relu=True):
    """x: (B, H, W, Cin) -> (B, 2H, 2W, Cout)."""
    B, H, W, cin = x.shape
    cout = Wcat.shape[1] // 4
    zh = jnp.zeros((B, 1, W, cin), x.dtype)
    zw = jnp.zeros((B, H, 1, cin), x.dtype)
    xh = jnp.concatenate([x[:, 1:], zh], axis=1)          # x[i+1, j]
    xw = jnp.concatenate([x[:, :, 1:], zw], axis=2)       # x[i, j+1]
    xhw = jnp.concatenate([xh[:, :, 1:], zw], axis=2)     # x[i+1, j+1]
    xcat = jnp.concatenate([x, xh, xw, xhw], axis=-1)     # (B,H,W,4Cin)
    y = jnp.dot(xcat.reshape(-1, 4 * cin), Wcat.astype(xcat.dtype),
                preferred_element_type=jnp.float32) + bias
    if relu:
        y = jax.nn.relu(y)
    y = y.reshape(B, H, W, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(B, 2 * H, 2 * W, cout).astype(x.dtype)


def build_head_matmul(w_hwio, b, dtype=jnp.float32):
    """ConvTranspose2d(Cin, Cout, 2, s2) -> (W (Cin, 4Cout), bias).
    Pure jnp (traceable/differentiable)."""
    w = jnp.asarray(w_hwio, jnp.float32)
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (2, 2)
    # cols ordered by plane (a, b) row-major; plane (a,b) uses w[1-a, 1-b]
    W = jnp.concatenate([w[1, 1], w[1, 0], w[0, 1], w[0, 0]], axis=1)
    bias = jnp.tile(jnp.asarray(b, jnp.float32), 4)
    return W.astype(dtype), bias.astype(jnp.float32)


def expand_head_matmul_packed(W, bias, p: int):
    """Head matmul (K, GC) -> W-packed-lane form (p*K, p*GC).

    A W-packed feature row carries p pixels (slot-major lanes j*K..j*K+K);
    the block-diagonal kron(I_p, W) maps slot j's features to output
    column block j (groups ordered (j, parity) — the label order of
    ops/pallas/head_loss.py:pack_labels_packed).  Pure jnp, so autodiff
    folds the p diagonal blocks' gradients back onto the original W."""
    K, GC = W.shape
    eye = jnp.eye(p, dtype=W.dtype)
    Wp = jnp.einsum("ij,kl->ikjl", eye, W).reshape(p * K, p * GC)
    return Wp, jnp.tile(bias, p)


def apply_head_matmul(x, W, bias):
    """x: (B, H, W, Cin) -> (B, 2H, 2W, Cout) logits.

    The depth-to-space transpose runs in the input dtype (bf16 halves the
    full-resolution data movement; profiling showed an 4.3+3.2 ms/step f32
    reshape+transpose here), then widens to f32."""
    B, H, Wd, cin = x.shape
    cout = W.shape[1] // 4
    y = jnp.dot(x.reshape(-1, cin), W.astype(x.dtype),
                preferred_element_type=jnp.float32) + bias
    y = y.astype(x.dtype)
    y = y.reshape(B, H, Wd, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
    # stays in the input dtype: the loss upcasts, and an f32 output would
    # make the backward transpose run at double width
    return y.reshape(B, 2 * H, 2 * Wd, cout)
