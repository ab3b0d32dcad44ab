"""One-experiment TPU train-step benchmark (batch 6, bf16, 512x1024).

Usage: python scripts/tpu_train_step_bench.py [--no-fused] [--iters N]
Prints ms/step and img/s.  Follows the tunnel policy: single experiment
per process, carry-chained timing, host sync every segment (CLAUDE.md).
"""

import argparse
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from erfnet_pytorch_tpu.utils.jax_cache import enable as _enable_cache
_enable_cache()

SEG = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-fused", action="store_true")
    ap.add_argument("--flat", action="store_true",
                    help="flat-carry params/optimizer (FlatState)")
    ap.add_argument("--multi", type=int, default=1,
                    help="optimizer steps per dispatch (lax.scan)")
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--batch", type=int, default=6)
    args = ap.parse_args()

    from erfnet_pytorch_tpu.ops.pallas.nb1d_train import set_fused_train
    set_fused_train(False if args.no_fused else True)

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
    if K > 1:  # K per-step batch tuples (shardings preserved under DP)
        images = tuple(images for _ in range(K))
        labels = tuple(labels for _ in range(K))

    def last(loss):
        return float(loss if K == 1 else loss[-1])

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    ts, loss = step(ts, images, labels, key)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s "
          f"loss={last(loss):.4f}", flush=True)

    # warm segment
    for _ in range(SEG):
        ts, loss = step(ts, images, labels, key)
    last(loss)
    t0 = time.perf_counter()
    done = 0
    while done < args.iters:
        for _ in range(SEG):
            ts, loss = step(ts, images, labels, key)
        last(loss)  # host sync bounds the queue
        done += SEG * K
    dt = (time.perf_counter() - t0) / done
    print(f"fused={not args.no_fused} batch={args.batch} multi={K} "
          f"{dt * 1000:.1f} ms/step  {args.batch / dt:.2f} img/s  "
          f"loss={last(loss):.4f}", flush=True)


if __name__ == "__main__":
    main()
