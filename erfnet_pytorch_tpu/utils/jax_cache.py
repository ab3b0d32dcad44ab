"""Persistent XLA compilation cache.

ERFNet graphs take 10-40 s to compile over this environment's TPU tunnel
(and heavy compile sessions can wedge it); the on-disk cache turns warm
process starts into ~1 s.  Called by bench.py, the CLIs and the driver
entry points before first device use.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/jax_comp")


def enable(cache_dir: str = _DEFAULT, min_compile_secs: float = 1.0):
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
