"""A/B: merged-side-matmul W-convs for the packed NB1d tier (VERDICT r3
weak #3 / next-round task 3).

The C=64 (p=2) and C=16 (p=8) packed blocks run ~95 TFLOP/s effective vs
180 for the C=128 stack; the analysis says the packed tap matrices waste
~2x MACs on structural zeros.  The H-convs are at their density floor
(kron(I_p, W): slot-preserving K rows can only feed their slot's output
lanes, and any densifying lane shuffle is itself a matmul).  The W-convs
are NOT: their two side-tap matrices have disjoint nonzero K-row blocks
(slots 0..du-1 vs p-du..p-1), so one lane-iota select + ONE matmul
against (w0 + w2) replaces both side matmuls — 12 -> 10 MXU passes per
block, a 16.7% MAC cut (ops/pallas/nb1d.py:_taps_w thr>0).

This script times both forms per tier at the production shapes/dtype
(bf16, batch 32; 512x1024-input resolutions), parity-checks the merged
kernel compiled-mode in f32 against the unmerged one on the same chip,
and writes C64_AB_TPU.json.  Timing: K chained calls inside ONE jit
(single dispatches through this tunnel measure ~2.5 ms regardless of
kernel time — CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "C64_AB_TPU.json")


def main():
    import jax
    import jax.numpy as jnp
    from erfnet_pytorch_tpu.utils.jax_cache import enable as en
    en()
    from erfnet_pytorch_tpu.utils.timing import timed_chain
    from erfnet_pytorch_tpu.ops.pallas import nb1d as N
    from erfnet_pytorch_tpu.ops.packed import pack_nb1d_for_pallas

    assert jax.default_backend() != "cpu", "this A/B needs the TPU"
    rng = np.random.RandomState(0)
    B, K = 32, 12
    out = {"batch": B, "chain": K, "tiers": {}}
    for C, p, H, W in ((64, 2, 128, 256), (16, 8, 256, 512)):
        fused = {k: jnp.asarray(rng.randn(*s).astype(np.float32)) * 0.2
                 for k, s in {"w1": (3, C, C), "b1": (C,),
                              "w2": (3, C, C), "b2": (C,),
                              "w3": (3, C, C), "b3": (C,),
                              "w4": (3, C, C), "b4": (C,)}.items()}
        pw_f32, s2, s4 = pack_nb1d_for_pallas(fused, p, 1)
        pw = {k: v.astype(jnp.bfloat16) if v.ndim == 3 else v
              for k, v in pw_f32.items()}
        thrs = N._merge_thrs(p, C, 1)
        assert thrs == (C, C), thrs
        Xf = jnp.asarray(rng.rand(B, H, W // p, p * C).astype(np.float32))
        X = Xf.astype(jnp.bfloat16)

        def make_step(thr):
            @jax.jit
            def step(carry, X):
                x = X + carry.astype(X.dtype) * 0
                for _ in range(K):
                    x = N._nb1d_call(x, pw, shifts=(1, s2, 1, s4),
                                     interpret=False, thrs=thr)
                return (x.astype(jnp.float32).sum() % 1024)
            return step

        entry = {"shape": [B, H, W, C], "p": p}
        for name, thr in (("base", (0, 0)), ("merged", thrs)):
            step = make_step(thr)
            dt = timed_chain(lambda c: step(c, X), jnp.float32(0), 10)
            us_img_block = dt / K / B * 1e6
            entry[name + "_us_per_img_block"] = round(us_img_block, 2)
        entry["speedup"] = round(entry["base_us_per_img_block"]
                                 / entry["merged_us_per_img_block"], 3)

        # compiled-mode parity on the same chip, f32 (merged vs base is
        # the SAME arithmetic: disjoint-support add + zero-row products)
        y0 = np.asarray(N._nb1d_call(Xf, pw_f32, shifts=(1, s2, 1, s4),
                                     interpret=False, thrs=(0, 0)))
        y1 = np.asarray(N._nb1d_call(Xf, pw_f32, shifts=(1, s2, 1, s4),
                                     interpret=False, thrs=thrs))
        d = float(np.abs(y0 - y1).max())
        entry["compiled_parity_max_abs_diff_f32"] = d
        entry["parity_ok"] = bool(d < 1e-3)
        out["tiers"][f"C{C}_p{p}"] = entry
        print(json.dumps({f"C{C}_p{p}": entry}), flush=True)

    with open(RESULTS, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    ok = all(t["parity_ok"] for t in out["tiers"].values())
    print("RESULT", json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
