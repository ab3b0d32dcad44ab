"""int8-vs-bf16 MXU rate microbench for the NB1d kernel pattern.

Decides whether a w8a8 quantized inference path is worth building: the
fused NB1d kernels (84% of inference FLOPs) are 12 chained
(H*W, 128) x (128, 128) matmuls with 4 bias/ReLU epilogues per block.
This kernel reproduces that op mix in bf16 (f32 accum, the shipped path)
and int8 (s32 accum + requantize epilogues, the candidate path) and
times both on-chip.  v5e datasheet rate is 2x for int8 — but only if
Mosaic lowers the int8 dots onto the MXU at these small-K shapes.

Run (TPU): python scripts/tpu_q8_microbench.py
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from erfnet_pytorch_tpu.utils.timing import timed_chain  # noqa: E402

M, C, CONVS = 8192, 128, 4  # 64x128 map, 4 convs x 3 taps = 12 matmuls


def _bf16_kernel(x_ref, w_ref, b_ref, o_ref):
    x = x_ref[0]
    for k in range(CONVS):
        acc = jnp.dot(x, w_ref[3 * k], preferred_element_type=jnp.float32)
        acc += jnp.dot(x, w_ref[3 * k + 1],
                       preferred_element_type=jnp.float32)
        acc += jnp.dot(x, w_ref[3 * k + 2],
                       preferred_element_type=jnp.float32)
        x = jax.nn.relu(acc + b_ref[k]).astype(jnp.bfloat16)
    o_ref[0] = x


def _q8_kernel(x_ref, w_ref, b_ref, o_ref):
    x = x_ref[0]
    for k in range(CONVS):
        acc = jnp.dot(x, w_ref[3 * k], preferred_element_type=jnp.int32)
        acc += jnp.dot(x, w_ref[3 * k + 1],
                       preferred_element_type=jnp.int32)
        acc += jnp.dot(x, w_ref[3 * k + 2],
                       preferred_element_type=jnp.int32)
        y = jax.nn.relu(acc.astype(jnp.float32) * (1.0 / 1024.0) + b_ref[k])
        x = jnp.clip(jnp.round(y * 16.0), -127, 127).astype(jnp.int8)
    o_ref[0] = x


def _q8raw_kernel(x_ref, w_ref, b_ref, o_ref):
    # dot-rate ceiling probe: minimal epilogue (shift-truncate requant)
    x = x_ref[0]
    for k in range(CONVS):
        acc = jnp.dot(x, w_ref[3 * k], preferred_element_type=jnp.int32)
        acc += jnp.dot(x, w_ref[3 * k + 1],
                       preferred_element_type=jnp.int32)
        acc += jnp.dot(x, w_ref[3 * k + 2],
                       preferred_element_type=jnp.int32)
        x = jnp.clip(acc >> 7, -127, 127).astype(jnp.int8)
    o_ref[0] = x


def _q8bf16_kernel(x_ref, w_ref, b_ref, o_ref):
    # requant epilogue in bf16 instead of f32 (halves VPU traffic; the
    # ~2^-9 relative rounding of the s32 accum is < 1/4 quant step)
    x = x_ref[0]
    for k in range(CONVS):
        acc = jnp.dot(x, w_ref[3 * k], preferred_element_type=jnp.int32)
        acc += jnp.dot(x, w_ref[3 * k + 1],
                       preferred_element_type=jnp.int32)
        acc += jnp.dot(x, w_ref[3 * k + 2],
                       preferred_element_type=jnp.int32)
        y = acc.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 1024.0) \
            + b_ref[k].astype(jnp.bfloat16)
        # Mosaic can't legalize math.roundeven on bf16 — +0.5 then the
        # truncating cast is exact round-half-up on the clamped range
        x = jnp.clip(y * 16.0 + 0.5, 0, 127).astype(jnp.int8)
    o_ref[0] = x


def _call(kernel, x, w, b):
    B = x.shape[0]
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, M, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * CONVS, C, C), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CONVS, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, M, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=3 * CONVS * 2 * M * C * C,
            bytes_accessed=2 * M * C * x.dtype.itemsize + 3 * CONVS * C * C,
            transcendentals=0),
    )(x, w, b)


def main(batch=8, iters=20, inner=16):
    # `inner` kernel calls chain inside ONE jit dispatch: a single call is
    # ~300 us of compute, under this tunnel's ~2.5 ms dispatch overhead —
    # un-amortized, the measurement is dispatch-bound (observed 2.8 ms/call
    # for both dtypes).
    key = jax.random.PRNGKey(0)
    flops = batch * 3 * CONVS * 2 * M * C * C
    for name, dtype, kernel in (("bf16", jnp.bfloat16, _bf16_kernel),
                                ("int8", jnp.int8, _q8_kernel),
                                ("int8_raw", jnp.int8, _q8raw_kernel),
                                ("int8_bf16e", jnp.int8, _q8bf16_kernel)):
        if dtype == jnp.int8:
            x = jax.random.randint(key, (batch, M, C), -127, 128, jnp.int32
                                   ).astype(jnp.int8)
            w = jax.random.randint(key, (3 * CONVS, C, C), -8, 9, jnp.int32
                                   ).astype(jnp.int8)
        else:
            x = jax.random.normal(key, (batch, M, C), dtype)
            w = (jax.random.normal(key, (3 * CONVS, C, C), jnp.float32)
                 * 0.05).astype(dtype)
        b = jnp.zeros((CONVS, C), jnp.float32)
        run = functools.partial(_call, kernel)

        @jax.jit
        def step(carry):
            y = x + (carry * 0).astype(x.dtype)
            for _ in range(inner):
                y = run(y, w, b)
            return y[0, 0].astype(jnp.float32).sum() % 1024.0

        dt = timed_chain(step, jnp.float32(0), iters) / inner
        print(f"{name}: {dt * 1e6:9.1f} us/call  "
              f"{flops / dt / 1e12:6.1f} T(FL)OP/s")


if __name__ == "__main__":
    main()
