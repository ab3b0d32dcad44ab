"""Per-kernel bf16-vs-int8 A/B at the benchmark shapes (B=32), inner-loop
chained to amortize the tunnel dispatch.  Pinpoints where the w8a8 NB1d
path wins or loses vs the bf16 kernels (the e2e pipeline measured 0.96x).

Run (TPU): python scripts/tpu_q8_kernel_bench.py
"""

from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from erfnet_pytorch_tpu.utils.jax_cache import enable as _enable_cache
_enable_cache()
from erfnet_pytorch_tpu.utils.timing import timed_chain  # noqa: E402


def _rand_fused(key, C, scale=0.15):
    ks = jax.random.split(key, 8)
    mk = lambda k: jax.random.normal(k, (3, C, C), jnp.float32) * scale
    bk = lambda k: jax.random.normal(k, (C,), jnp.float32) * 0.05
    return {"w1": mk(ks[0]), "b1": bk(ks[1]),
            "w2": mk(ks[2]), "b2": bk(ks[3]),
            "w3": mk(ks[4]), "b3": bk(ks[5]),
            "w4": mk(ks[6]), "b4": bk(ks[7])}


def _acts(C):
    # representative scales; exact values don't affect timing
    return {"in": 4.0, "a1": 4.0, "a2": 4.0, "a3": 4.0}


def timeit(name, fn, x, iters=12, inner=8):
    @jax.jit
    def step(carry):
        y = x + (carry * 0).astype(x.dtype)
        for _ in range(inner):
            y = fn(y)
        return y[0, 0, 0].astype(jnp.float32).sum() % 1024.0

    dt = timed_chain(step, jnp.float32(0), iters) / inner
    per_img = dt / x.shape[0]
    print(f"{name}: {dt * 1e3:7.3f} ms/call  {per_img * 1e6:7.1f} us/img")
    return dt


def main():
    from erfnet_pytorch_tpu.ops.pallas.nb1d import (
        fuse_nb1d_params, nb1d_infer, nb1d_infer_packed, nb1d_stack_infer,
        stack_nb1d_params)
    from erfnet_pytorch_tpu.ops.pallas.nb1d_q8 import (
        prepare_nb1d_q8, nb1d_infer_q8, nb1d_infer_packed_q8,
        nb1d_stack_infer_q8, stack_nb1d_q8)
    from erfnet_pytorch_tpu.ops.packed import pack_nb1d_for_pallas

    B = 32
    key = jax.random.PRNGKey(0)

    # plain C=128 d=2 at the encoder map
    fused = _rand_fused(key, 128)
    qpl = prepare_nb1d_q8(fused, _acts(128))
    fb = {k: jnp.asarray(v, jnp.bfloat16) for k, v in fused.items()}
    x = jax.random.normal(key, (B, 64, 128, 128), jnp.bfloat16)
    timeit("plain bf16 (B,64,128,128) d2", lambda v: nb1d_infer(
        v, fb, dilated=2), x)
    timeit("plain int8 (B,64,128,128) d2", lambda v: nb1d_infer_q8(
        v, qpl, dilated=2), x)

    # packed C=64 p=2 at the stage-2 map
    fused64 = _rand_fused(jax.random.PRNGKey(1), 64)
    wb, s2, s4 = pack_nb1d_for_pallas(fused64, 2, 1, dtype=jnp.bfloat16)
    wf32, _, _ = pack_nb1d_for_pallas(fused64, 2, 1, dtype=jnp.float32)
    qpk = prepare_nb1d_q8(wf32, _acts(64))
    x64 = jax.random.normal(key, (B, 128, 256, 64), jnp.bfloat16)
    timeit("packed bf16 (B,128,256,64) p2", lambda v: nb1d_infer_packed(
        v, wb, p=2, dilated=1, s2=s2, s4=s4), x64)
    timeit("packed int8 (B,128,256,64) p2", lambda v: nb1d_infer_packed_q8(
        v, qpk, p=2, dilated=1, s2=s2, s4=s4), x64)

    # 8-block dilated stack
    dils = (2, 4, 8, 16, 2, 4, 8, 16)
    fl = [_rand_fused(k, 128) for k in jax.random.split(key, 8)]
    stacked = stack_nb1d_params(fl, dtype=jnp.bfloat16)
    q8s, inv_ins = stack_nb1d_q8([prepare_nb1d_q8(f, _acts(128))
                                  for f in fl])
    timeit("stack bf16 8 dilated blocks", lambda v: nb1d_stack_infer(
        v, stacked, dils=dils), x, inner=4)
    timeit("stack int8 8 dilated blocks", lambda v: nb1d_stack_infer_q8(
        v, q8s, dils=dils, inv_ins=inv_ins), x, inner=4)


if __name__ == "__main__":
    main()
