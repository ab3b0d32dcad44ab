"""One-experiment TPU streaming benchmark — BASELINE config 5 smoke.

Runs StreamingSegmenter (preds-only fast infer + on-device colorize) at
1024x2048, batch 2, carry-style loop with host sync per batch (the
consumer pulls uint8 outputs), and prints img/s.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--output", default="color",
                    choices=["color", "labelId", "trainId"])
    ap.add_argument("--device-only", action="store_true",
                    help="carry-chained device-side timing (no host pull "
                         "per batch — isolates compute from the tunnel)")
    args = ap.parse_args()

    from erfnet_pytorch_tpu.models import erfnet
    from erfnet_pytorch_tpu.streaming import StreamingSegmenter

    print("devices:", jax.devices(), flush=True)
    params, state = erfnet.init(jax.random.PRNGKey(0), 20)
    seg = StreamingSegmenter(params, state, dtype=jnp.bfloat16,
                             output=args.output)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(args.batch, args.height, args.width, 3)
                         .astype(np.float32))

    t0 = time.perf_counter()
    out = np.asarray(seg._step(images))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s "
          f"out {out.shape} {out.dtype}", flush=True)

    if args.device_only:
        # the shared carry-chain harness: serialize on-device via the data
        # dependency, sync the host once per SHORT SEGMENT — a per-
        # iteration float() costs a full tunnel RTT (measured ~30+ ms,
        # which dominated the device's ~15 ms/img and made round-1's
        # '48 ms/img device-side' a measurement artifact)
        from erfnet_pytorch_tpu.utils.timing import timed_chain

        # images is a jit ARGUMENT: closed-over arrays are serialized into
        # the HLO, and at 1024x2048 the remote-compile request blows the
        # relay's size limit past batch ~8 (batch 16 f32 input is 402 MB).
        @jax.jit
        def dstep(carry, images):
            out = seg._step(images + carry * 0)
            return (out.astype(jnp.int32).sum() % 1024).astype(jnp.float32)
        dt = timed_chain(lambda c: dstep(c, images), jnp.float32(0),
                         args.iters, seg=4)
        print(f"device-only {args.height}x{args.width} batch={args.batch} "
              f"{dt * 1000:.1f} ms/batch  {args.batch / dt:.2f} img/s",
              flush=True)
        return
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = np.asarray(seg._step(images))  # full host round-trip per batch
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{args.height}x{args.width} batch={args.batch} "
          f"{dt * 1000:.1f} ms/batch  {args.batch / dt:.2f} img/s "
          f"({args.output})", flush=True)


if __name__ == "__main__":
    main()
