"""On-chip validation of the w8a8 int8 NB1d path (compiled Mosaic, not
interpret mode — CLAUDE.md: interpret tests do not validate lowering).

Three stages, ONE per process (tunnel wedge policy):

  --stage calib    (CPU-forced) calibrate deterministic-init model scales
                   -> /tmp/q8_scales.json
  --stage kernels  (TPU) compile+run plain / packed / stack q8 kernels at
                   real shapes, compare vs the CPU f32 reference math
  --stage pipeline (TPU) full build_fast_infer with q8_scales vs the bf16
                   pipeline at 512x1024: preds agreement + timing-free
                   sanity
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def _cpu():
    import jax
    jax.config.update("jax_platforms", "cpu")
    return jax


def stage_calib():
    jax = _cpu()
    import jax.numpy as jnp
    from erfnet_pytorch_tpu.models import erfnet
    from erfnet_pytorch_tpu.quantize import (calibrate_q8_scales,
                                             save_q8_scales)
    params, state = erfnet.init(jax.random.PRNGKey(0), 20)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 512, 1024, 3),
                           jnp.float32)
    scales = calibrate_q8_scales(params, state, [x])
    save_q8_scales("/tmp/q8_scales.json", scales)
    print(f"calibrated {len(scales)} blocks -> /tmp/q8_scales.json")


def _rand_fused(key, C, scale=0.15):
    import jax
    import jax.numpy as jnp
    ks = jax.random.split(key, 8)
    mk = lambda k: jax.random.normal(k, (3, C, C), jnp.float32) * scale
    bk = lambda k: jax.random.normal(k, (C,), jnp.float32) * 0.05
    return {"w1": mk(ks[0]), "b1": bk(ks[1]),
            "w2": mk(ks[2]), "b2": bk(ks[3]),
            "w3": mk(ks[4]), "b3": bk(ks[5]),
            "w4": mk(ks[6]), "b4": bk(ks[7])}


def stage_kernels():
    import jax
    import jax.numpy as jnp
    from erfnet_pytorch_tpu.ops.pallas.nb1d_q8 import (
        prepare_nb1d_q8, nb1d_infer_q8, nb1d_infer_packed_q8,
        nb1d_stack_infer_q8, stack_nb1d_q8)
    from erfnet_pytorch_tpu.ops.packed import pack_nb1d_for_pallas
    from erfnet_pytorch_tpu.quantize import _block_acts

    cpu = jax.devices("cpu")[0]

    def ref_and_acts(x, fused, dil):
        with jax.default_device(cpu):
            a1, a2, a3, out = jax.vmap(
                lambda xi: _block_acts(xi, fused, dil))(
                    jnp.asarray(np.asarray(x), jnp.float32))
            f = lambda a: float(jnp.max(jnp.abs(a)))
            return np.asarray(out), {"in": f(x), "a1": f(a1),
                                     "a2": f(a2), "a3": f(a3)}

    def check(name, out, ref, tol=0.035):
        out = np.asarray(out, np.float32)
        rel = float(np.linalg.norm(out - ref) / np.linalg.norm(ref))
        status = "PASS" if rel < tol else "FAIL"
        print(f"{name}: rel={rel:.4f} {status}")
        return rel < tol

    ok = True
    key = jax.random.PRNGKey(0)
    with jax.default_device(cpu):
        fused = _rand_fused(key, 128)
        x = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(1),
                                          (2, 64, 128, 128), jnp.float32))
    ref, acts = ref_and_acts(x, fused, 2)
    q = jax.device_put(prepare_nb1d_q8(fused, acts))
    xd = jnp.asarray(np.asarray(x), jnp.bfloat16)
    ok &= check("plain d=2 (2,64,128,128) bf16",
                nb1d_infer_q8(xd, q, dilated=2), ref)

    # packed C=64 p=2 at the encoder stage-2 shape
    with jax.default_device(cpu):
        fused64 = _rand_fused(jax.random.PRNGKey(2), 64)
        x64 = jax.nn.relu(jax.random.normal(jax.random.PRNGKey(3),
                                            (2, 128, 256, 64), jnp.float32))
        wf32, s2, s4 = pack_nb1d_for_pallas(fused64, 2, 2,
                                            dtype=jnp.float32)
    ref64, acts64 = ref_and_acts(x64, fused64, 2)
    qp = jax.device_put(prepare_nb1d_q8(wf32, acts64))
    ok &= check("packed C=64 p=2 (2,128,256,64) bf16",
                nb1d_infer_packed_q8(jnp.asarray(np.asarray(x64),
                                                 jnp.bfloat16),
                                     qp, p=2, dilated=2, s2=s2, s4=s4),
                ref64)

    # 2-block stack (dils 2, 4) on the C=128 map
    with jax.default_device(cpu):
        fused_b = _rand_fused(jax.random.PRNGKey(4), 128)
    y0_ref, acts_b0 = ref_and_acts(x, fused, 2)
    ref2, acts_b1 = ref_and_acts(jnp.asarray(y0_ref), fused_b, 4)
    stacked, inv_ins = stack_nb1d_q8([prepare_nb1d_q8(fused, acts_b0),
                                      prepare_nb1d_q8(fused_b, acts_b1)])
    stacked = jax.device_put(stacked)
    ok &= check("stack dils=(2,4) (2,64,128,128) bf16",
                nb1d_stack_infer_q8(xd, stacked, dils=(2, 4),
                                    inv_ins=inv_ins),
                ref2, tol=0.05)
    print("ALL PASS" if ok else "SOME FAILED")
    sys.exit(0 if ok else 1)


def stage_pipeline():
    import jax
    import jax.numpy as jnp
    from erfnet_pytorch_tpu.models import erfnet
    from erfnet_pytorch_tpu.inference import build_fast_infer
    from erfnet_pytorch_tpu.quantize import load_q8_scales

    params, state = erfnet.init(jax.random.PRNGKey(0), 20)
    scales = load_q8_scales("/tmp/q8_scales.json")
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 512, 1024, 3),
                           jnp.float32)
    infer_b = build_fast_infer(params, state, dtype=jnp.bfloat16,
                               preds_only=True)
    pb = np.asarray(infer_b(x))
    print("bf16 preds hist head:", np.bincount(pb.ravel(),
                                               minlength=20)[:6])
    infer_q = build_fast_infer(params, state, dtype=jnp.bfloat16,
                               preds_only=True, q8_scales=scales)
    pq = np.asarray(infer_q(x))
    agree = float((pb == pq).mean())
    print(f"preds agreement bf16 vs int8: {agree:.4f}")
    print("PASS" if agree > 0.97 else "FAIL")
    sys.exit(0 if agree > 0.97 else 1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", required=True,
                    choices=["calib", "kernels", "pipeline"])
    a = ap.parse_args()
    {"calib": stage_calib, "kernels": stage_kernels,
     "pipeline": stage_pipeline}[a.stage]()
