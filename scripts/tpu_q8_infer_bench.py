"""bf16 vs w8a8-int8 end-to-end inference throughput at the headline
config (512x1024, preds pipeline).  Needs /tmp/q8_scales.json from
`tpu_q8_validate.py --stage calib` (same deterministic init).

Run (TPU): python scripts/tpu_q8_infer_bench.py [--batch 32]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from erfnet_pytorch_tpu.utils.jax_cache import enable as _enable_cache
_enable_cache()
from erfnet_pytorch_tpu.utils.timing import timed_chain  # noqa: E402


def measure(params, batch_stats, batch, iters, q8=None):
    from erfnet_pytorch_tpu.inference import build_fast_infer
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 512, 1024, 3))
    infer = build_fast_infer(params, batch_stats, dtype=jnp.bfloat16,
                             preds_only=True, q8_scales=q8)

    @jax.jit
    def step(carry):
        pred = infer(x + carry * 0.0)
        return (pred.sum() % 1024).astype(jnp.float32)

    dt = timed_chain(step, jnp.float32(0), iters)
    return batch / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=16)
    a = ap.parse_args()
    from erfnet_pytorch_tpu.models import erfnet
    from erfnet_pytorch_tpu.quantize import load_q8_scales
    params, batch_stats = erfnet.init(jax.random.PRNGKey(0), 20)
    scales = load_q8_scales("/tmp/q8_scales.json")
    bf16 = measure(params, batch_stats, a.batch, a.iters)
    print(f"bf16 B={a.batch}: {bf16:7.1f} img/s "
          f"({1000 * a.batch / bf16 / a.batch:.2f} ms/img)")
    q8 = measure(params, batch_stats, a.batch, a.iters, q8=scales)
    print(f"int8 B={a.batch}: {q8:7.1f} img/s "
          f"({1000 / q8 * a.batch / a.batch:.2f} ms/img)  "
          f"speedup {q8 / bf16:.3f}x")


if __name__ == "__main__":
    main()
