"""Prove the fused ``.erfx`` serving bundle ON the TPU (round-2 verdict
weak #1): export a ``use_pallas=True`` bundle (Mosaic custom calls) on the
chip, re-load it in a FRESH process with no model-preparation pass, assert
prediction equality vs the live ``build_fast_infer`` pipeline, and record
the served dispatch latency next to the live path's.

Stages (ONE per process — tunnel wedge policy, CLAUDE.md):

  --stage export         (TPU) export the bundle + save live preds/latency
  --stage serve          (TPU, fresh process) load bundle -> preds equality
                         vs the export stage's live preds + served latency
  --stage wrongplatform  (CPU-forced) loading the TPU/Mosaic bundle on a
                         non-TPU runtime must fail with a CLEAR error —
                         the jax.export compatibility failure mode users
                         hit when jaxlib/platform don't match the exporter

Artifacts: /tmp/erfnet_r3.erfx (bundle), /tmp/erfx_prove.json (results).
Run all three in order; the JSON accumulates and the final stage prints
the combined verdict for BENCH/README.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUNDLE = "/tmp/erfnet_r3.erfx"
RESULTS = "/tmp/erfx_prove.json"
PREDS = "/tmp/erfx_prove_preds.npz"
B, H, W = 8, 512, 1024


def _load_results():
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            return json.load(f)
    return {}


def _save_results(r):
    with open(RESULTS, "w") as f:
        json.dump(r, f, indent=1)
    print(json.dumps(r, indent=1))


def _test_input():
    import jax
    return jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 3))


def _time_call(fn, x):
    """ms/img via the shared carry-chain harness (utils/timing.py)."""
    import jax
    import jax.numpy as jnp
    from erfnet_pytorch_tpu.utils.timing import timed_chain

    @jax.jit
    def step(carry, x):
        pred = fn(x + carry * 0.0)
        return (pred.sum() % 1024).astype(jnp.float32)

    dt = timed_chain(lambda c: step(c, x), jnp.float32(0), 30)
    return dt / B * 1e3


def stage_export():
    import jax
    import jax.numpy as jnp
    from erfnet_pytorch_tpu.utils.jax_cache import enable as en
    en()
    from erfnet_pytorch_tpu.models import erfnet
    from erfnet_pytorch_tpu.export import save_servable
    from erfnet_pytorch_tpu.inference import build_fast_infer

    assert jax.default_backend() != "cpu", "export stage needs the TPU"
    params, state = erfnet.init(jax.random.PRNGKey(0), 20)
    header = save_servable(BUNDLE, params, state, batch_sizes=(B,),
                           height=H, width=W, dtype=jnp.bfloat16,
                           use_pallas=True, preds_only=True)
    x = _test_input()
    live = build_fast_infer(params, state, dtype=jnp.bfloat16,
                            use_pallas=True, preds_only=True)
    preds = np.asarray(live(x))
    ms = _time_call(live, x)
    np.savez_compressed(PREDS, preds=preds.astype(np.uint8))
    r = _load_results()
    r["export"] = {
        "bundle": BUNDLE, "bytes": os.path.getsize(BUNDLE),
        "use_pallas": header["use_pallas"], "batch": B,
        "live_ms_per_img": round(ms, 3),
    }
    _save_results(r)


def stage_serve():
    import jax
    import jax.numpy as jnp
    from erfnet_pytorch_tpu.utils.jax_cache import enable as en
    en()
    # deliberately NO model/inference import: the serving host runs the
    # deserialized jax.export program only
    from erfnet_pytorch_tpu.export import load_servable

    assert jax.default_backend() != "cpu", "serve stage needs the TPU"
    sv = load_servable(BUNDLE)
    assert sv.header["use_pallas"], "bundle was not exported fused"
    x = _test_input()
    got = np.asarray(sv.call(x))
    want = np.load(PREDS)["preds"]
    agree = float((got == want).mean())
    ms = _time_call(lambda x: sv.call(x), x)
    r = _load_results()
    live_ms = r.get("export", {}).get("live_ms_per_img")
    r["serve"] = {
        "pred_agreement_vs_live": agree,
        "exact": bool(agree == 1.0),
        "served_ms_per_img": round(ms, 3),
        "live_ms_per_img": live_ms,
        "pass": bool(agree == 1.0),
    }
    _save_results(r)
    print(f"SERVE {'PASS' if r['serve']['pass'] else 'FAIL'}: "
          f"agreement {agree:.6f}, served {ms:.3f} ms/img "
          f"(live {live_ms} ms/img)")
    sys.exit(0 if r["serve"]["pass"] else 1)


def stage_wrongplatform():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from erfnet_pytorch_tpu.export import load_servable
    sv = load_servable(BUNDLE)
    x = np.zeros((B, H, W, 3), np.float32)
    try:
        sv.call(x)
    except Exception as e:  # noqa: BLE001 — the failure mode IS the test
        msg = f"{type(e).__name__}: {e}"
        # the error must name the platform/custom-call mismatch, not crash
        # opaquely inside XLA
        clear = any(s in msg.lower() for s in
                    ("platform", "tpu", "custom call", "custom_call",
                     "mosaic"))
        r = _load_results()
        r["wrongplatform"] = {"error": msg[:400], "clear": clear,
                              "pass": clear}
        _save_results(r)
        print(f"WRONGPLATFORM {'PASS' if clear else 'FAIL'} — {msg[:200]}")
        sys.exit(0 if clear else 1)
    print("WRONGPLATFORM FAIL: a Mosaic bundle executed on CPU?!")
    sys.exit(1)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage", required=True,
                    choices=["export", "serve", "wrongplatform"])
    args = ap.parse_args()
    {"export": stage_export, "serve": stage_serve,
     "wrongplatform": stage_wrongplatform}[args.stage]()


if __name__ == "__main__":
    main()
