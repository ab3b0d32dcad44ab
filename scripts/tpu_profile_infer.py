"""One-experiment TPU inference-pipeline profile (tunnel policy: 1 run/proc).

Profiles the bench.py fast-infer pipeline (forward + fast_argmax + carry
reduction) under jax.profiler.trace and prints the device-plane op
aggregation via scripts/parse_xplane.py.

Usage: python scripts/tpu_profile_infer.py [--batch 8] [--steps 5]
"""

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from prof_common import parse_latest_trace, repo_root_on_path
repo_root_on_path()

from erfnet_pytorch_tpu.utils.jax_cache import enable as _enable_cache
_enable_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/prof_infer")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--with-logits", action="store_true",
                    help="profile the (logits, preds) path instead of the "
                         "preds-only head+argmax fast path")
    args = ap.parse_args()

    from erfnet_pytorch_tpu.models import erfnet
    from erfnet_pytorch_tpu.inference import build_fast_infer

    print("devices:", jax.devices(), flush=True)
    params, batch_stats = erfnet.init(jax.random.PRNGKey(0), 20)
    infer = build_fast_infer(params, batch_stats, dtype=jnp.bfloat16,
                             use_pallas=not args.no_pallas,
                             preds_only=not args.with_logits)
    x = jax.random.uniform(jax.random.PRNGKey(1),
                           (args.batch, args.height, args.width, 3))

    # the bench.py carry-chained step (what the headline number measures).
    # x is a jit ARGUMENT, not a closure: a closed-over device array is
    # serialized INTO the HLO compile request and the relay 413s/wedges
    # past ~100 MB (B=32 is already 200 MB of f32 input).
    @jax.jit
    def step(carry, x):
        out = infer(x + carry * 0.0)
        pred = out if not args.with_logits else out[1]
        return (pred.sum() % 1024).astype(jnp.float32)

    t0 = time.perf_counter()
    carry = step(jnp.float32(0), x)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    for _ in range(3):
        carry = step(carry, x)
    float(carry)

    jax.profiler.start_trace(args.logdir)
    for _ in range(args.steps):
        carry = step(carry, x)
    float(carry)
    jax.profiler.stop_trace()

    parse_latest_trace(args.logdir, args.top)


if __name__ == "__main__":
    main()
