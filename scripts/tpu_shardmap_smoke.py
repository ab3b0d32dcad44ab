"""shard_map + Mosaic ON SILICON (round-2 verdict weak #3).

The 8-virtual-device CPU tests validate the fused DP step's *math* in
interpret mode, but on the real chip ``spmd.active()`` is None for a
1-device mesh, so whether Mosaic kernels lower and run INSIDE shard_map
on TPU had never been exercised.  This smoke force-registers a 1-device
``("data",)`` mesh (``spmd.set_mesh(..., force=True)``) so every
batch-grid Pallas kernel compiles THROUGH the shard_map wrapper in
compiled (Mosaic) mode, then checks numerical equality against the
unwrapped single-chip path.

Stages (ONE per process — tunnel policy):

  --stage train   fused train step through shard_map: loss equality vs
                  the unwrapped step (same seed/state), finite grads
  --stage infer   build_fast_infer through shard_map: preds equality

Results -> /tmp/shardmap_smoke.json (both stages accumulate).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = "/tmp/shardmap_smoke.json"


def _save(key, entry):
    r = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            r = json.load(f)
    r[key] = entry
    with open(RESULTS, "w") as f:
        json.dump(r, f, indent=1)
    print(json.dumps({key: entry}, indent=1))
    sys.exit(0 if entry["pass"] else 1)


def _mesh():
    import jax
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()[:1]), ("data",))


def stage_train():
    import jax
    import jax.numpy as jnp
    from erfnet_pytorch_tpu.utils.jax_cache import enable as en
    en()
    from erfnet_pytorch_tpu.models import erfnet
    from erfnet_pytorch_tpu.parallel import spmd
    from erfnet_pytorch_tpu.training import optim
    from erfnet_pytorch_tpu.training.steps import (create_train_state,
                                                   make_train_step)
    from erfnet_pytorch_tpu.ops.pallas.nb1d_train import fused_train
    from jax.flatten_util import ravel_pytree

    assert jax.default_backend() != "cpu", "this smoke needs the TPU"
    tx = optim.make_adam()
    ts0 = create_train_state(erfnet, jax.random.PRNGKey(0), 20, tx)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 128, 256, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 20, (2, 128, 256), np.int64)
                         .astype(np.int32))
    cw = [1.0 + 0.1 * i for i in range(20)]

    def one(forced):
        with spmd.pallas_mesh(_mesh() if forced else None, force=forced), \
                fused_train(True):
            step = make_train_step(erfnet, tx, cw, enc=False, augment=False,
                                   compute_dtype=jnp.bfloat16)
            ts, loss = step(ts0, images, labels, jax.random.PRNGKey(1))
            flat = ravel_pytree(ts.params)[0]
            return float(loss), np.asarray(flat)

    l_ref, p_ref = one(False)
    l_sm, p_sm = one(True)
    dmax = float(np.max(np.abs(p_sm - p_ref)))
    entry = {
        "loss_shardmap": l_sm, "loss_unwrapped": l_ref,
        "loss_equal": bool(abs(l_sm - l_ref) < 1e-5 * max(1.0, abs(l_ref))),
        "post_adam_param_max_abs_delta": dmax,
        # Adam amplifies fp-noise grads to O(lr)=5e-4 per element
        "pass": bool(abs(l_sm - l_ref) < 1e-5 * max(1.0, abs(l_ref))
                     and np.isfinite(l_sm) and dmax < 2.5e-3),
    }
    _save("train", entry)


def stage_infer():
    import jax
    import jax.numpy as jnp
    from erfnet_pytorch_tpu.utils.jax_cache import enable as en
    en()
    from erfnet_pytorch_tpu.models import erfnet
    from erfnet_pytorch_tpu.parallel import spmd
    from erfnet_pytorch_tpu.inference import build_fast_infer

    assert jax.default_backend() != "cpu", "this smoke needs the TPU"
    params, state = erfnet.init(jax.random.PRNGKey(0), 20)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 512, 1024, 3))

    def one(forced):
        with spmd.pallas_mesh(_mesh() if forced else None, force=forced):
            infer = build_fast_infer(params, state, dtype=jnp.bfloat16,
                                     use_pallas=True, preds_only=True)
            return np.asarray(infer(x))

    ref = one(False)
    got = one(True)
    agree = float((got == ref).mean())
    _save("infer", {"pred_agreement": agree, "pass": bool(agree == 1.0)})


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage", required=True, choices=["train", "infer"])
    args = ap.parse_args()
    {"train": stage_train, "infer": stage_infer}[args.stage]()


if __name__ == "__main__":
    main()
