"""Carry-chained device timing harness.

The reference brackets its benchmark loop with ``cuda.synchronize``
(``eval/eval_forwardTime.py`` — SURVEY.md §2a row 17, §3.4).  The JAX
equivalent would be ``block_until_ready``, but this environment's TPU sits
behind a stdio tunnel where ``block_until_ready`` does not reliably wait —
so every timed function instead returns a small scalar that the NEXT
iteration's input depends on (carry chaining): executions serialize
on-device, dispatch overlaps with compute, and the carry is fetched to
host once per short segment, which both syncs honestly and bounds the
device queue (unsynced dispatch floods can wedge the tunnel).

This is the one timing methodology shared by ``bench.py``, the
``eval_forwardTime`` CLI, and the profiling scripts — the numbers they
print are directly comparable.
"""

from __future__ import annotations

import time

import numpy as np


def timed_chain(fn, carry0, n_iters: int, *, seg: int = 10) -> float:
    """Run ``carry = fn(carry)`` ``n_iters`` times in ``seg``-sized chained
    segments; return seconds per iteration.  ``WARM_SEGMENT`` warmup
    iterations (compile + steady state) run before the clock starts,
    independent of ``seg`` so callers can rely on the constant."""
    carry = carry0
    for _ in range(timed_chain.WARM_SEGMENT):
        carry = fn(carry)
    carry.block_until_ready()
    float(np.asarray(carry))  # true host sync (see module docstring)
    t0 = time.perf_counter()
    done = 0
    while done < n_iters:
        for _ in range(seg):
            carry = fn(carry)
        float(np.asarray(carry))  # per-segment host sync bounds the queue
        done += seg
    return (time.perf_counter() - t0) / done


# warmup iterations timed_chain always runs before the clock starts
# (regardless of seg) — callers granting a larger --warmup subtract this
timed_chain.WARM_SEGMENT = 10
