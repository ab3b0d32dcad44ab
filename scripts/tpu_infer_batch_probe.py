"""One-experiment inference batch-size probe (tunnel policy: 1 run/proc).

Measures the bench.py fast-infer pipeline at ONE batch size, with the
input passed as a jit ARGUMENT instead of a closed-over constant: a
closed-over device array is embedded into the serialized HLO, so the
remote-compile request grows with batch (B=64 previously hit the relay's
HTTP 413 size limit).  As an argument the input is a runtime parameter
and the compile payload stays batch-independent.

Usage: python scripts/tpu_infer_batch_probe.py --batch 48 [--iters 16]
"""

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from erfnet_pytorch_tpu.utils.jax_cache import enable as _enable_cache
_enable_cache()

from erfnet_pytorch_tpu.utils.timing import timed_chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, required=True)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=1024)
    args = ap.parse_args()

    from erfnet_pytorch_tpu.models import erfnet
    from erfnet_pytorch_tpu.inference import build_fast_infer

    print("devices:", jax.devices(), flush=True)
    params, batch_stats = erfnet.init(jax.random.PRNGKey(0), 20)
    infer = build_fast_infer(params, batch_stats, dtype=jnp.bfloat16,
                             use_pallas=True, preds_only=True)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (args.batch, args.height, args.width, 3))

    @jax.jit
    def step(carry, x):
        pred = infer(x + carry * 0.0)
        return (pred.sum() % 1024).astype(jnp.float32)

    dt = timed_chain(lambda c: step(c, x), jnp.float32(0), args.iters)
    print(json.dumps({
        "batch": args.batch,
        "ms_per_img": round(dt / args.batch * 1e3, 3),
        "img_per_s": round(args.batch / dt, 1),
    }))


if __name__ == "__main__":
    main()
