"""Forward-time benchmark — the reference's ``eval/eval_forwardTime.py``
surface (SURVEY.md §2a row 17, §3.4): random input, warmup, synchronized
timing loop, mean ms / FPS.

TPU translation of the timing contract: ``cuda.synchronize``-bracketed
timing becomes the carry-chained harness shared with ``bench.py``
(utils/timing.py) — each iteration's input data-depends on the previous
result, so executions serialize on-device and the host syncs honestly even
through the TPU tunnel, and XLA cannot constant-fold the loop.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from ..inference import add_pallas_flag

from ..models import erfnet
from ..training.steps import make_infer_fn


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--num-classes", type=int, default=20)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--iterations", type=int, default=100)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--fp32", dest="bf16", action="store_false")
    p.add_argument("--state", help="optional weights (default: random init)")
    p.add_argument("--cpu", action="store_true",
                   help="run on host CPU (forces the cpu platform)")
    add_pallas_flag(p)
    from ..inference import add_int8_flags
    add_int8_flags(p)
    return p


def benchmark(params, batch_stats, *, batch_size, height, width,
              warmup, iterations, compute_dtype, use_pallas=False,
              q8_scales=None):
    from ..utils.timing import timed_chain

    if use_pallas:
        from ..inference import build_fast_infer
        fast = build_fast_infer(params, batch_stats,
                                dtype=compute_dtype or jnp.float32,
                                use_pallas=True, q8_scales=q8_scales)
        infer = lambda p, s, x: fast(x)
    else:
        infer = make_infer_fn(erfnet, compute_dtype=compute_dtype)
    x = jax.random.uniform(jax.random.PRNGKey(0),
                           (batch_size, height, width, 3))

    # x is a jit ARGUMENT, not a closure: closed-over device arrays are
    # serialized into the HLO, so the remote-compile request would grow
    # with --batch-size (the TPU relay rejects oversized payloads).
    @jax.jit
    def _step(carry, x):
        # the carry dependency defeats constant folding AND serializes
        # executions on-device (utils/timing.py timing contract)
        _logits, pred = infer(params, batch_stats, x + carry * 0.0)
        return (pred.sum() % 1024).astype(jnp.float32)

    step = lambda carry: _step(carry, x)

    # timed_chain runs one warm segment itself; honor larger --warmup.
    # Sync the carry to host every few dispatches: a flood of un-synced
    # dispatches can wedge this environment's TPU tunnel (CLAUDE.md), and
    # the carry chain only serializes on-device — it does not bound the
    # host-side queue.
    carry = jnp.float32(0)
    for i in range(max(warmup - timed_chain.WARM_SEGMENT, 0)):
        carry = step(carry)
        if i % 8 == 7:
            carry = jnp.float32(float(carry))
    return timed_chain(step, carry, iterations)


def main(argv=None):
    args = build_parser().parse_args(argv)
    if getattr(args, "cpu", False):
        # must run before any backend initialization; the axon TPU
        # plugin otherwise overrides JAX_PLATFORMS=cpu
        jax.config.update("jax_platforms", "cpu")
    from ..utils.jax_cache import enable as _enable_cache
    _enable_cache()
    from ..inference import resolve_use_pallas
    if args.state:
        from ..training.checkpoint import load_any_weights
        params, batch_stats = load_any_weights(args.state)
    else:
        params, batch_stats = erfnet.init(jax.random.PRNGKey(0),
                                          args.num_classes)
    from ..quantize import resolve_q8_scales
    q8 = resolve_q8_scales(
        args, params, batch_stats,
        [jax.random.uniform(jax.random.PRNGKey(0),
                            (args.batch_size, args.height, args.width, 3))])
    dt = benchmark(params, batch_stats, batch_size=args.batch_size,
                   height=args.height, width=args.width, warmup=args.warmup,
                   iterations=args.iterations,
                   compute_dtype=jnp.bfloat16 if args.bf16 else None,
                   use_pallas=resolve_use_pallas(args.pallas),
                   q8_scales=q8)
    per_img = dt / args.batch_size
    print(f"device: {jax.devices()[0].device_kind}, "
          f"input {args.batch_size}x{args.height}x{args.width}, "
          f"dtype {'bf16' if args.bf16 else 'f32'}")
    print(f"FORWARD: {per_img * 1000:.3f} ms/img  "
          f"({1.0 / per_img:.2f} FPS)")
    return per_img


if __name__ == "__main__":
    main()
