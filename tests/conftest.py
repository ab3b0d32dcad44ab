"""Test configuration: force CPU with 8 virtual devices BEFORE jax import.

This mirrors SURVEY.md §4's "distributed without a cluster" strategy —
sharding/collective tests run on a fake 8-device host mesh; numerics are
fp32 CPU so torch-cpu parity tolerances are tight.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon TPU plugin in this image prepends itself to jax_platforms at
# registration, overriding the env var — force CPU after import too.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu" and len(jax.devices()) == 8

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
