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

# Persistent XLA compilation cache: model compiles dominate suite runtime
# (~10 min cold on this 1-core host); warm reruns drop to seconds.  Keys are
# HLO-content hashes, so code changes invalidate exactly what they change.
from erfnet_pytorch_tpu.utils.jax_cache import enable as _enable_cache  # noqa: E402
_enable_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
from PIL import Image  # noqa: E402


@pytest.fixture(scope="session")
def fake_cityscapes(tmp_path_factory):
    """Tiny synthetic Cityscapes tree: 2:1 frames, 2 cities x 3 images per
    split; deterministic content."""
    root = tmp_path_factory.mktemp("cityscapes")
    rng = np.random.RandomState(0)
    for subset in ("train", "val"):
        for city in ("aaa", "bbb"):
            img_dir = root / "leftImg8bit" / subset / city
            lab_dir = root / "gtFine" / subset / city
            img_dir.mkdir(parents=True)
            lab_dir.mkdir(parents=True)
            for i in range(3):
                stem = f"{city}_{i:06d}_000019"
                img = rng.randint(0, 255, (128, 256, 3), dtype=np.uint8)
                Image.fromarray(img).save(img_dir / f"{stem}_leftImg8bit.png")
                lab = rng.randint(0, 20, (128, 256), dtype=np.uint8)
                lab[0:8] = 255  # some void
                Image.fromarray(lab, mode="L").save(
                    lab_dir / f"{stem}_gtFine_labelTrainIds.png")
    return str(root)
