"""Persistent XLA compilation cache.

ERFNet graphs take 10-40 s to compile over this environment's TPU tunnel
(and heavy compile sessions can wedge it); the on-disk cache turns warm
process starts into ~1 s.  Called by bench.py, the CLIs and the driver
entry points before first device use.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/jax_comp")


def enable(cache_dir: str = _DEFAULT, min_compile_secs: float = 1.0,
           max_entry_bytes: int = 16 << 20):
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    # Prune oversized entries — but only when the TPU path is possible: a
    # cache HIT there ships the serialized executable through the stdio
    # tunnel, and large binaries (measured: 40 MB train-step) hang the
    # load for >9 min — slower than the cold compile, which only sends
    # HLO.  On forced-CPU (tests, --cpu CLIs) big entries load from local
    # disk and are exactly the compiles worth caching, so keep them.
    # (jax.config.jax_platforms is readable without initializing a
    # backend; tests/conftest.py and the CLIs set it to "cpu" first.)
    if jax.config.jax_platforms != "cpu":
        for name in os.listdir(cache_dir):
            p = os.path.join(cache_dir, name)
            try:
                if os.path.isfile(p) and os.path.getsize(p) > max_entry_bytes:
                    os.unlink(p)
            except OSError:
                pass
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
