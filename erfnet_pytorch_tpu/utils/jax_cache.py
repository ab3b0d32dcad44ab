"""Persistent XLA compilation cache.

ERFNet graphs take 10-40 s to compile over this environment's TPU tunnel
(and heavy compile sessions can wedge it); the on-disk cache turns warm
process starts into ~1 s.  Called by bench.py, the CLIs and the driver
entry points before first device use.
"""

from __future__ import annotations

import hashlib
import os

_DEFAULT = os.path.expanduser("~/.cache/jax_comp")


def _host_fingerprint() -> str:
    """Short hash of the CPU feature flags.  XLA:CPU caches AOT-compiled
    executables tuned to the compile machine's ISA extensions; loading one
    on a host with different features warns about potential SIGILL
    (observed across this project's session VMs).  Scoping the cache dir
    by fingerprint keeps warm-cache wins within a machine generation."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform
    return hashlib.sha1(platform.processor().encode()).hexdigest()[:8]


def enable(cache_dir: str = _DEFAULT, min_compile_secs: float = 1.0,
           max_entry_bytes: int = 16 << 20):
    import jax

    root = cache_dir
    cache_dir = os.path.join(cache_dir, _host_fingerprint())
    os.makedirs(cache_dir, exist_ok=True)
    # Entries written to the cache ROOT by pre-fingerprint versions are
    # unreachable now (we only read the subdir) — delete them instead of
    # orphaning them on disk forever.
    try:
        for name in os.listdir(root):
            p = os.path.join(root, name)
            if name.endswith("-cache") and os.path.isfile(p):
                os.unlink(p)
    except OSError:
        pass
    # Prune oversized entries — but only when the TPU path is possible: a
    # cache HIT there ships the serialized executable through the stdio
    # tunnel, and large binaries (measured: 40 MB train-step) hang the
    # load for >9 min — slower than the cold compile, which only sends
    # HLO.  On forced-CPU (tests, --cpu CLIs) big entries load from local
    # disk and are exactly the compiles worth caching, so keep them.
    # (jax.config.jax_platforms is readable without initializing a
    # backend; tests/conftest.py and the CLIs set it to "cpu" first.)
    # Gate on a POSITIVE accelerator signal — a non-cpu platform in the
    # list (the axon/TPU plugin prepends itself at import time).  On hosts
    # with no plugin the value is "" and the backend resolves to CPU, where
    # big entries load from local disk and are exactly the ones to keep.
    platforms = (jax.config.jax_platforms or "").split(",")
    if any(p and p != "cpu" for p in platforms):
        for name in os.listdir(cache_dir):
            if not name.endswith("-cache"):
                continue  # only XLA cache entries, never other files
            p = os.path.join(cache_dir, name)
            try:
                if os.path.isfile(p) and os.path.getsize(p) > max_entry_bytes:
                    os.unlink(p)
            except OSError:
                pass
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
