"""One-experiment TPU train-step profile (tunnel policy: single run/process).

Runs a few warm train steps under jax.profiler.trace and prints the
device-plane op aggregation via scripts/parse_xplane.py.

Usage: python scripts/tpu_profile_step.py [--logdir /tmp/prof] [--top 40]
"""

import argparse
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from prof_common import parse_latest_trace, repo_root_on_path
repo_root_on_path()

from erfnet_pytorch_tpu.utils.jax_cache import enable as _enable_cache
_enable_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/prof_step")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--flat", action="store_true",
                    help="flat-carry params/optimizer (FlatState)")
    ap.add_argument("--multi", type=int, default=1,
                    help="optimizer steps per dispatch (the shipped bench "
                         "config is --flat --multi 2)")
    args = ap.parse_args()

    from erfnet_pytorch_tpu.models import erfnet
    from erfnet_pytorch_tpu.training import optim
    from erfnet_pytorch_tpu.training.steps import (create_train_state,
                                                   make_train_step)
    from erfnet_pytorch_tpu.training.class_weights import DECODER_WEIGHTS

    print("devices:", jax.devices(), flush=True)
    tx = optim.make_adam()
    ts = create_train_state(erfnet, jax.random.PRNGKey(0), 20, tx)
    K = args.multi
    if K > 1:
        args.flat = True  # multi_step requires the flat-carry step
    step = make_train_step(erfnet, tx, DECODER_WEIGHTS, enc=False,
                           augment=True, compute_dtype=jnp.bfloat16,
                           flat=args.flat, multi_step=K)
    if args.flat:
        ts = step.flatten(ts)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(args.batch, 512, 1024, 3)
                         .astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 20, (args.batch, 512, 1024))
                         .astype(np.int32))
    if K > 1:  # K per-step batch tuples, as in the bench/trainer
        images = tuple(images for _ in range(K))
        labels = tuple(labels for _ in range(K))
    key = jax.random.PRNGKey(0)

    def last(loss):
        return float(loss if K == 1 else loss[-1])

    t0 = time.perf_counter()
    ts, loss = step(ts, images, labels, key)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s "
          f"loss={last(loss):.4f}", flush=True)
    for _ in range(3):
        ts, loss = step(ts, images, labels, key)
    last(loss)

    jax.profiler.start_trace(args.logdir)
    for _ in range(args.steps):
        ts, loss = step(ts, images, labels, key)
    last(loss)
    jax.profiler.stop_trace()

    parse_latest_trace(args.logdir, args.top)


if __name__ == "__main__":
    main()
