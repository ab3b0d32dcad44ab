"""Shared helpers for the TPU profiler scripts (tpu_profile_*.py)."""

import glob
import os
import subprocess
import sys


def repo_root_on_path():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if root not in sys.path:
        sys.path.insert(0, root)
    return root


def parse_latest_trace(logdir: str, top: int):
    """Find the newest xplane.pb under logdir and print the op aggregation
    via parse_xplane.py."""
    pbs = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                           recursive=True), key=os.path.getmtime)
    if not pbs:
        print("no xplane.pb produced", flush=True)
        return None
    print("trace:", pbs[-1], flush=True)
    subprocess.run([sys.executable,
                    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "parse_xplane.py"), pbs[-1], str(top)])
    return pbs[-1]
