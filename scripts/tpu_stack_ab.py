"""Same-process A/B: K per-block packed NB1d calls vs ONE packed stack
kernel at the encoder stage-2 shape (B=32, (128,256,64), p=2, d=1 x5).

Run (TPU): python scripts/tpu_stack_ab.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from erfnet_pytorch_tpu.utils.jax_cache import enable as _enable_cache
_enable_cache()
from erfnet_pytorch_tpu.utils.timing import timed_chain  # noqa: E402


def main(B=32, K=5, iters=12, inner=6):
    from erfnet_pytorch_tpu.ops.pallas.nb1d import (
        nb1d_infer_packed, nb1d_stack_infer_packed, stack_nb1d_params)
    from erfnet_pytorch_tpu.ops.packed import pack_nb1d_for_pallas
    from erfnet_pytorch_tpu.models.erfnet import init_non_bottleneck_1d

    p, d = 2, 1
    blocks = [init_non_bottleneck_1d(k, 64)
              for k in jax.random.split(jax.random.PRNGKey(0), K)]
    from erfnet_pytorch_tpu.ops.pallas.nb1d import fuse_nb1d_params
    packed = [pack_nb1d_for_pallas(fuse_nb1d_params(bp, bs), p, d,
                                   dtype=jnp.bfloat16)
              for bp, bs in blocks]
    stacked = stack_nb1d_params([w for w, _, _ in packed],
                                dtype=jnp.bfloat16)
    shifts = tuple((1, s2, d, s4) for (_, s2, s4), d in
                   zip(packed, [d] * K))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 128, 256, 64),
                          jnp.bfloat16)

    def blockwise(v):
        for (w, s2, s4) in packed:
            v = nb1d_infer_packed(v, w, p=p, dilated=d, s2=s2, s4=s4)
        return v

    def stackwise(v):
        return nb1d_stack_infer_packed(v, stacked, p=p, shifts=shifts)

    for name, fn in (("blockwise x5", blockwise), ("stack x1", stackwise)):
        @jax.jit
        def step(carry, fn=fn):
            y = x + (carry * 0).astype(x.dtype)
            for _ in range(inner):
                y = fn(y)
            return y[0, 0, 0].astype(jnp.float32).sum() % 1024.0

        dt = timed_chain(step, jnp.float32(0), iters) / inner
        print(f"{name}: {dt * 1e3:7.3f} ms/call  "
              f"{dt / B * 1e6 / K:6.1f} us/img/block")


if __name__ == "__main__":
    main()
