"""Compiled-mode on-chip parity sweep for every shipped Pallas kernel.

Interpret-mode tests do NOT validate Mosaic lowering (round-2 incident: an
interpret-green stats-downsampler kernel failed on-chip with an
"infer-vector-layout: unsupported shape cast").  This driver runs each
routed kernel variant — the targets of inference.py/_make_layer_fn,
training/steps.py and the packed train paths in models/erfnet.py —
COMPILED on the v5e against its XLA oracle, and writes a checked-in
manifest ``KERNELS_TPU.json`` (variant, shape, max|delta|, pass).

This is the kernel-level TPU equivalent of the reference's de-facto
validation, the ``eval/eval_iou.py`` end-to-end run (SURVEY.md §4).

Tunnel policy (CLAUDE.md): ONE minimal experiment per process.  The parent
invocation spawns one subprocess per case and merges results incrementally,
so a wedged case costs only its own timeout:

    python scripts/tpu_validate_kernels.py                  # full sweep
    python scripts/tpu_validate_kernels.py --only 'nb1d'    # subset
    python scripts/tpu_validate_kernels.py --one nb1d_infer_d16  # in-proc
    python scripts/tpu_validate_kernels.py --cpu            # harness
        self-test: interpret mode on CPU, manifest to /tmp (never the
        checked-in file — interpret results are not lowering evidence)

Numerics: kernel-level cases run f32 vs the f32 XLA oracle (tight
tolerances, mirroring the interpret-mode unit tests); the end-to-end
pipeline/train cases run the SHIPPED bf16 configs with argmax-agreement /
post-Adam-parameter bounds (tests/test_nb1d_train_kernel.py rationale:
pre-BN conv-bias grads are mathematically zero, Adam amplifies fp noise
to O(lr)).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MANIFEST = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "KERNELS_TPU.json")


# --------------------------------------------------------------------------
# result helpers
# --------------------------------------------------------------------------

# Compiled-on-TPU tolerance scale: v5e f32 matmuls run on the MXU with
# bf16-pass rounding (both in Mosaic kernels and in the XLA conv oracle),
# so kernel-vs-oracle deltas sit at ~1e-3 abs where CPU interpret mode is
# ~1e-5.  A semantic error (wrong tap/shift/fold) is O(0.1+); the manifest
# records the true max_abs either way.
_TOL_SCALE = 1.0


def _check(name, got, ref, *, rtol, atol):
    got = np.asarray(got, np.float64)
    ref = np.asarray(ref, np.float64)
    rtol, atol = rtol * _TOL_SCALE, atol * _TOL_SCALE
    max_abs = float(np.max(np.abs(got - ref))) if got.size else 0.0
    norm_rel = float(np.linalg.norm(got - ref)
                     / max(np.linalg.norm(ref), 1e-12))
    bound = atol + rtol * np.abs(ref)
    ok = bool(np.all(np.abs(got - ref) <= bound))
    if not ok and _TOL_SCALE > 1.0:
        # compiled-mode rounding fallback: MXU rounding noise scales with
        # activation magnitude and can exceed the elementwise bound where
        # |ref| is small (observed: upsampler 0.7-1% abs).  Rounding is
        # DIFFUSE; semantic errors are either global (norm_rel O(0.1+))
        # or localized-but-large (a wrong halo row: norm_rel ~6e-2; a
        # single wrong element: caught by the max_abs cap).
        ok = norm_rel < 1.5e-3 and max_abs < 0.05
    return {"check": name, "max_abs": max_abs, "norm_rel": norm_rel,
            "rtol": rtol, "atol": atol, "pass": ok}


def _truth_tiebreak(primary, got, ref, truth):
    """Settle a marginal compiled-mode failure against an f64 host truth.

    ``primary`` compared the kernel against an XLA oracle computed on the
    SAME device — on TPU both run their matmuls through the MXU's
    bf16-pass rounding, so their delta measures two different rounding
    paths, not kernel error.  The honest question is whether the kernel is
    any FURTHER from the exact f64 answer than XLA itself is: if
    norm_rel(kernel, truth) <= 1.5 * norm_rel(xla, truth) (and no single
    element blows up), the disagreement is rounding-equidistant noise and
    the case passes.  Both distances are recorded in the manifest."""
    got = np.asarray(got, np.float64)
    ref = np.asarray(ref, np.float64)
    truth = np.asarray(truth, np.float64)
    tn = max(float(np.linalg.norm(truth)), 1e-12)
    nr_k = float(np.linalg.norm(got - truth) / tn)
    nr_x = float(np.linalg.norm(ref - truth) / tn)
    ok = nr_k <= max(1.5 * nr_x, 1e-4) and \
        float(np.max(np.abs(got - truth))) < 0.05
    primary = dict(primary)
    primary.update({"pass": ok, "tiebreak": "f64-truth",
                    "norm_rel_kernel_vs_truth": nr_k,
                    "norm_rel_xla_vs_truth": nr_x})
    return primary


def _check_tree(name, got, ref, *, rtol, atol):
    import jax
    leaves_g, treedef = jax.tree_util.tree_flatten(got)
    leaves_r = treedef.flatten_up_to(ref)
    max_abs, ok = 0.0, True
    for g, r in zip(leaves_g, leaves_r):
        c = _check(name, g, r, rtol=rtol, atol=atol)
        max_abs = max(max_abs, c["max_abs"])
        ok = ok and c["pass"]
    return {"check": name, "max_abs": max_abs, "rtol": rtol, "atol": atol,
            "pass": ok, "leaves": len(leaves_g)}


def _agree(name, got, ref, *, min_agree):
    got, ref = np.asarray(got), np.asarray(ref)
    agree = float((got == ref).mean())
    return {"check": name, "agreement": agree, "min": min_agree,
            "pass": bool(agree >= min_agree)}


def _result(covers, shape, checks, **extra):
    return {"covers": covers, "shape": list(shape), "checks": checks,
            "pass": all(c["pass"] for c in checks), **extra}


def _rand_nb1d(c, seed=0):
    """Random NB1d params + non-trivial BN stats (test_pallas_nb1d._block)."""
    import jax
    from erfnet_pytorch_tpu.models.erfnet import init_non_bottleneck_1d
    params, _ = init_non_bottleneck_1d(jax.random.PRNGKey(seed), c)
    ks = jax.random.split(jax.random.PRNGKey(seed + 1), 4)
    state = {
        "bn1": {"mean": jax.random.normal(ks[0], (c,)) * 0.1,
                "var": jax.random.uniform(ks[1], (c,), minval=0.5,
                                          maxval=1.5)},
        "bn2": {"mean": jax.random.normal(ks[2], (c,)) * 0.1,
                "var": jax.random.uniform(ks[3], (c,), minval=0.5,
                                          maxval=1.5)},
    }
    return params, state


# --------------------------------------------------------------------------
# cases — each returns the manifest entry dict
# --------------------------------------------------------------------------

def _case_nb1d_infer(dil):
    def run(interpret):
        import jax, jax.numpy as jnp  # noqa: E401
        from erfnet_pytorch_tpu.models.erfnet import apply_non_bottleneck_1d
        from erfnet_pytorch_tpu.ops.pallas.nb1d import (fuse_nb1d_params,
                                                        nb1d_infer)
        shape = (2, 64, 128, 128)  # the shipped encoder dilated-block map
        params, state = _rand_nb1d(128)
        x = jax.random.normal(jax.random.PRNGKey(2), shape)
        ref, _ = apply_non_bottleneck_1d(params, state, x, dilated=dil,
                                         dropprob=0.0, train=False)
        fused = fuse_nb1d_params(params, state)
        got = jax.jit(lambda x: nb1d_infer(x, fused, dilated=dil,
                                           interpret=interpret))(x)
        return _result("inference.py nb1d_infer (plain C=128 whole-map)",
                       shape,
                       [_check("y", got, ref, rtol=2e-4, atol=2e-4)])
    return run


def case_nb1d_stack_infer(interpret):
    import jax, jax.numpy as jnp  # noqa: E401
    from erfnet_pytorch_tpu.models.erfnet import apply_non_bottleneck_1d
    from erfnet_pytorch_tpu.ops.pallas.nb1d import (fuse_nb1d_params,
                                                    nb1d_stack_infer,
                                                    stack_nb1d_params)
    shape = (2, 64, 128, 128)
    dils = [2, 4, 8, 16, 2, 4, 8, 16]  # the shipped 8-block encoder run
    blocks = [_rand_nb1d(128, seed=i) for i in range(len(dils))]
    x = jax.random.normal(jax.random.PRNGKey(3), shape)
    ref = x
    for (p, s), d in zip(blocks, dils):
        ref, _ = apply_non_bottleneck_1d(p, s, ref, dilated=d, dropprob=0.0,
                                         train=False)
    stacked = stack_nb1d_params([fuse_nb1d_params(p, s) for p, s in blocks])
    shifts = tuple((1, 1, d, d) for d in dils)
    got = jax.jit(lambda x: nb1d_stack_infer(x, stacked, shifts=shifts,
                                             interpret=interpret))(x)
    return _result("inference.py nb1d_stack_infer (C=128 8-block stack)",
                   shape, [_check("y", got, ref, rtol=2e-3, atol=2e-3)],
                   dils=dils)


def _case_nb1d_packed(p, shape):
    def run(interpret):
        import jax, jax.numpy as jnp  # noqa: E401
        from erfnet_pytorch_tpu.models.erfnet import apply_non_bottleneck_1d
        from erfnet_pytorch_tpu.ops.pallas.nb1d import (fuse_nb1d_params,
                                                        nb1d_infer_packed)
        from erfnet_pytorch_tpu.ops.packed import pack_nb1d_for_pallas
        c, d = shape[-1], 1
        params, state = _rand_nb1d(c)
        x = jax.random.normal(jax.random.PRNGKey(4), shape)
        ref, _ = apply_non_bottleneck_1d(params, state, x, dilated=d,
                                         dropprob=0.0, train=False)
        fused = fuse_nb1d_params(params, state)
        weights, s2, s4 = pack_nb1d_for_pallas(fused, p, d)
        got = jax.jit(lambda x: nb1d_infer_packed(
            x, weights, p=p, dilated=d, s2=s2, s4=s4,
            interpret=interpret))(x)
        return _result(f"inference.py nb1d_infer_packed (C={c}, p={p})",
                       shape, [_check("y", got, ref, rtol=3e-4, atol=3e-4)])
    return run


def case_nb1d_infer_blocked(interpret):
    import jax, jax.numpy as jnp  # noqa: E401
    from erfnet_pytorch_tpu.models.erfnet import apply_non_bottleneck_1d
    from erfnet_pytorch_tpu.ops.pallas.nb1d import (fuse_nb1d_params,
                                                    nb1d_infer_blocked)
    from erfnet_pytorch_tpu.inference import _MAX_MAP_ELEMS
    # a C=128 map past the whole-map VMEM budget -> the h-blocked halo
    # kernel (the big-map routing class for inputs beyond 1024x2048)
    shape, d = (1, 256, 512, 128), 16
    params, state = _rand_nb1d(128)
    x = jax.random.normal(jax.random.PRNGKey(5), shape)
    ref, _ = apply_non_bottleneck_1d(params, state, x, dilated=d,
                                     dropprob=0.0, train=False)
    fused = fuse_nb1d_params(params, state)
    got = jax.jit(lambda x: nb1d_infer_blocked(
        x, fused, dilated=d, max_elems=_MAX_MAP_ELEMS,
        interpret=interpret))(x)
    return _result("inference.py nb1d_infer_blocked (big-map C=128 halo)",
                   shape, [_check("y", got, ref, rtol=3e-4, atol=3e-4)])


def _case_nb1d_packed_blocked(p, shape, d):
    def run(interpret):
        import jax, jax.numpy as jnp  # noqa: E401
        from erfnet_pytorch_tpu.models.erfnet import apply_non_bottleneck_1d
        from erfnet_pytorch_tpu.ops.pallas.nb1d import (
            fuse_nb1d_params, nb1d_infer_packed_blocked)
        from erfnet_pytorch_tpu.ops.packed import pack_nb1d_for_pallas
        from erfnet_pytorch_tpu.inference import _MAX_MAP_ELEMS
        c = shape[-1]
        params, state = _rand_nb1d(c)
        x = jax.random.normal(jax.random.PRNGKey(6), shape)
        ref, _ = apply_non_bottleneck_1d(params, state, x, dilated=d,
                                         dropprob=0.0, train=False)
        fused = fuse_nb1d_params(params, state)
        weights, s2, s4 = pack_nb1d_for_pallas(fused, p, d)
        got = jax.jit(lambda x: nb1d_infer_packed_blocked(
            x, weights, p=p, dilated=d, s2=s2, s4=s4,
            max_elems=_MAX_MAP_ELEMS, interpret=interpret))(x)
        return _result(
            f"inference.py nb1d_infer_packed_blocked (streaming C={c}, "
            f"p={p})", shape,
            [_check("y", got, ref, rtol=3e-4, atol=3e-4)])
    return run


def case_nb1d_infer_chunked(interpret):
    import jax, jax.numpy as jnp  # noqa: E401
    from erfnet_pytorch_tpu.models.erfnet import apply_non_bottleneck_1d
    from erfnet_pytorch_tpu.ops.pallas.nb1d import (fuse_nb1d_params,
                                                    nb1d_infer_chunked)
    from erfnet_pytorch_tpu.inference import _MAX_MAP_ELEMS
    shape, d = (1, 256, 512, 128), 8
    params, state = _rand_nb1d(128)
    x = jax.random.normal(jax.random.PRNGKey(7), shape)
    ref, _ = apply_non_bottleneck_1d(params, state, x, dilated=d,
                                     dropprob=0.0, train=False)
    fused = fuse_nb1d_params(params, state)
    got = jax.jit(lambda x: nb1d_infer_chunked(
        x, fused, dilated=d, max_elems=_MAX_MAP_ELEMS,
        interpret=interpret))(x)
    return _result("inference.py nb1d_infer_chunked (fallback)", shape,
                   [_check("y", got, ref, rtol=3e-4, atol=3e-4)])


def case_nb1d_infer_packed_chunked(interpret):
    import jax, jax.numpy as jnp  # noqa: E401
    from erfnet_pytorch_tpu.models.erfnet import apply_non_bottleneck_1d
    from erfnet_pytorch_tpu.ops.pallas.nb1d import (
        fuse_nb1d_params, nb1d_infer_packed_chunked)
    from erfnet_pytorch_tpu.ops.packed import pack_nb1d_for_pallas
    from erfnet_pytorch_tpu.inference import _MAX_MAP_ELEMS
    shape, p, d = (1, 512, 1024, 16), 8, 1
    params, state = _rand_nb1d(16)
    x = jax.random.normal(jax.random.PRNGKey(8), shape)
    ref, _ = apply_non_bottleneck_1d(params, state, x, dilated=d,
                                     dropprob=0.0, train=False)
    fused = fuse_nb1d_params(params, state)
    weights, s2, s4 = pack_nb1d_for_pallas(fused, p, d)
    got = jax.jit(lambda x: nb1d_infer_packed_chunked(
        x, weights, p=p, dilated=d, s2=s2, s4=s4,
        max_elems=_MAX_MAP_ELEMS, interpret=interpret))(x)
    return _result("inference.py nb1d_infer_packed_chunked (fallback)",
                   shape, [_check("y", got, ref, rtol=3e-4, atol=3e-4)])


def _case_down_eval(pi, shape):
    def run(interpret):
        import jax, jax.numpy as jnp  # noqa: E401
        from erfnet_pytorch_tpu.models.erfnet import (BN_EPS,
                                                      init_downsampler,
                                                      apply_downsampler)
        from erfnet_pytorch_tpu.ops.pallas.downsampler import (
            downsampler_packed_eval)
        cin = shape[-1]
        cout = {3: 16, 16: 64, 64: 128}[cin]
        params, _ = init_downsampler(jax.random.PRNGKey(0), cin, cout)
        ks = jax.random.split(jax.random.PRNGKey(1), 2)
        state = {"bn": {"mean": jax.random.normal(ks[0], (cout,)) * 0.1,
                        "var": jax.random.uniform(ks[1], (cout,),
                                                  minval=0.5, maxval=1.5)}}
        x = jax.random.normal(jax.random.PRNGKey(2), shape)
        ref, _ = apply_downsampler(params, state, x, train=False)
        B, H, W, _ = shape
        X = x.reshape(B, H, W // pi, pi * cin)
        cc = cout - cin
        from erfnet_pytorch_tpu.inference import _MAX_MAP_ELEMS
        got = jax.jit(lambda X: downsampler_packed_eval(
            X, params["conv"]["w"], params["conv"]["b"],
            params["bn"]["scale"], params["bn"]["bias"],
            state["bn"]["mean"], state["bn"]["var"], pi=pi, eps=BN_EPS,
            max_elems=_MAX_MAP_ELEMS, interpret=interpret))(X)
        got = got.reshape(B, H // 2, W // 2, cout)
        return _result(
            f"inference.py _apply_down_packed_eval (pi={pi}, "
            f"{cin}->{cout})", shape,
            [_check("y", got, ref, rtol=3e-4, atol=3e-4)])
    return run


def case_downsampler_staug(interpret):
    """Aug-folded stem kernel (downsampler_packed_stats_aug) vs the
    XLA-translate + plain stats-stem pipeline, fwd values + dW/db grads —
    the compiled-mode twin of tests/test_aug_fold.py (the fold is
    documented bit-equal; on-chip both sides share rounding paths)."""
    import jax, jax.numpy as jnp  # noqa: E401
    from erfnet_pytorch_tpu.ops.augment import MAX_SHIFT, apply_shifts
    from erfnet_pytorch_tpu.ops.pallas.downsampler import (
        downsampler_packed_stats, downsampler_packed_stats_aug)

    pi, cin, cc = 32, 3, 13
    shape = (6, 128, 256, cin)
    B, H, W, _ = shape
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(*shape).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, cin, cc).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.randn(cc).astype(np.float32) * 0.1)
    shifts = jnp.asarray(
        rng.randint(-MAX_SHIFT, MAX_SHIFT + 1, (B, 2)).astype(np.float32))
    gy = jnp.asarray(rng.randn(B, H // 2, W // pi,
                               (pi // 2) * (cc + cin)).astype(np.float32))

    def f_aug(w, b, x):
        Xr = x.reshape(B, H, W // pi, pi * cin)
        y, s1, s2 = downsampler_packed_stats_aug(
            Xr, shifts, w, b, pi=pi, out_dtype=jnp.float32,
            interpret=interpret)
        return jnp.sum(y * gy) + jnp.sum(s1) + jnp.sum(s2), y

    def f_ref(w, b, x):
        xs = apply_shifts(x, shifts)
        y, s1, s2 = downsampler_packed_stats(
            xs.reshape(B, H, W // pi, pi * cin), w, b, pi=pi,
            interpret=interpret)
        return jnp.sum(y * gy) + jnp.sum(s1) + jnp.sum(s2), y

    ga, ya = jax.jit(jax.grad(f_aug, argnums=(0, 1), has_aux=True))(w, b, x)
    gr, yr = jax.jit(jax.grad(f_ref, argnums=(0, 1), has_aux=True))(w, b, x)
    return _result(
        "models/erfnet.py packed stem augment fold "
        "(downsampler_packed_stats_aug, pi=32)", shape,
        [_check("y", ya, yr, rtol=3e-4, atol=3e-4),
         _check_tree("dW/db", ga, gr, rtol=3e-4, atol=3e-4)])


def _case_ups_eval(pi, po, cin, cout, shape):
    def run(interpret):
        import jax, jax.numpy as jnp  # noqa: E401
        from erfnet_pytorch_tpu.models.erfnet import (BN_EPS, init_upsampler,
                                                      apply_upsampler)
        from erfnet_pytorch_tpu.ops.pallas.upsampler import (
            upsampler_packed_eval)
        params, _ = init_upsampler(jax.random.PRNGKey(0), cin, cout)
        ks = jax.random.split(jax.random.PRNGKey(1), 2)
        state = {"bn": {"mean": jax.random.normal(ks[0], (cout,)) * 0.1,
                        "var": jax.random.uniform(ks[1], (cout,),
                                                  minval=0.5, maxval=1.5)}}
        x = jax.random.normal(jax.random.PRNGKey(2), shape)
        ref, _ = apply_upsampler(params, state, x, train=False)
        B, H, W, _ = shape
        X = x.reshape(B, H, W // pi, pi * cin)
        from erfnet_pytorch_tpu.inference import _MAX_MAP_ELEMS
        got = jax.jit(lambda X: upsampler_packed_eval(
            X, params["conv"]["w"], params["conv"]["b"],
            params["bn"]["scale"], params["bn"]["bias"],
            state["bn"]["mean"], state["bn"]["var"], pi=pi, po=po,
            eps=BN_EPS, max_elems=_MAX_MAP_ELEMS, interpret=interpret))(X)
        got = got.reshape(B, 2 * H, 2 * W, cout)
        primary = _check("y", got, ref, rtol=3e-4, atol=3e-4)
        if not primary["pass"] and not interpret:
            truth = _ups_eval_truth_f64(x, params, state)
            primary = _truth_tiebreak(primary, got, ref, truth)
        return _result(
            f"inference.py _apply_ups_packed_eval (pi={pi}, po={po}, "
            f"{cin}->{cout})", shape, [primary])
    return run


def _ups_eval_truth_f64(x, params, state):
    """f64 host truth of apply_upsampler(train=False): torch-cpu
    conv_transpose2d (the repo's numerical oracle, tests/torch_oracle.py)
    + eval BN(eps=1e-3) + relu, all in float64."""
    import torch
    import torch.nn.functional as F
    from erfnet_pytorch_tpu.models.erfnet import BN_EPS
    xt = torch.from_numpy(np.asarray(x, np.float64)).permute(0, 3, 1, 2)
    # inverse of tests/torch_oracle.convT_w_to_jax: HWIO forward-conv
    # form -> torch ConvTranspose2d (I, O, kh, kw)
    wj = np.asarray(params["conv"]["w"], np.float64)
    wt = torch.from_numpy(wj[::-1, ::-1].transpose(2, 3, 0, 1).copy())
    bt = torch.from_numpy(np.asarray(params["conv"]["b"], np.float64))
    y = F.conv_transpose2d(xt, wt, bt, stride=2, padding=1,
                           output_padding=1)
    m = torch.from_numpy(np.asarray(state["bn"]["mean"], np.float64))
    v = torch.from_numpy(np.asarray(state["bn"]["var"], np.float64))
    sc = torch.from_numpy(np.asarray(params["bn"]["scale"], np.float64))
    bi = torch.from_numpy(np.asarray(params["bn"]["bias"], np.float64))
    y = (y - m[None, :, None, None]) / torch.sqrt(
        v[None, :, None, None] + BN_EPS) * sc[None, :, None, None] \
        + bi[None, :, None, None]
    return torch.relu(y).permute(0, 2, 3, 1).numpy()


def _head_parts(seed=0, n_classes=20):
    """Random 2x2-s2 ConvTranspose head in its matmul (K, 4*ncls) form."""
    import jax
    from erfnet_pytorch_tpu.ops.convt_mm import build_head_matmul
    ks = jax.random.split(jax.random.PRNGKey(seed), 2)
    w = jax.random.normal(ks[0], (2, 2, 16, n_classes)) * 0.2
    b = jax.random.normal(ks[1], (n_classes,)) * 0.1
    return build_head_matmul(w, b)


def case_head_argmax_G4(interpret):
    import jax, jax.numpy as jnp  # noqa: E401
    from erfnet_pytorch_tpu.ops.pallas.head_argmax import (
        head_argmax, depth_to_space_planes)
    from erfnet_pytorch_tpu.ops.convt_mm import apply_head_matmul
    B, H, Wd, K, ncls = 2, 256, 512, 16, 20
    W, b = _head_parts()
    y = jax.random.normal(jax.random.PRNGKey(2), (B, H, Wd, K))
    logits = apply_head_matmul(y, W, b)  # (B, 2H, 2W, ncls)
    ref = jnp.argmax(logits, axis=-1)
    idx = jax.jit(lambda f: head_argmax(f.reshape(-1, K), W, b, G=4,
                                        n_classes=ncls,
                                        interpret=interpret))(y)
    got = depth_to_space_planes(idx, B, H, Wd)
    return _result("inference.py head_argmax (G=4 canonical feats)",
                   (B, H, Wd, K), [_agree("preds", got, ref,
                                          min_agree=0.9995)])


def case_head_argmax_G32(interpret):
    import jax, jax.numpy as jnp  # noqa: E401
    from erfnet_pytorch_tpu.ops.pallas.head_argmax import (
        head_argmax, depth_to_space_planes_packed)
    from erfnet_pytorch_tpu.ops.convt_mm import (apply_head_matmul,
                                                 expand_head_matmul_packed)
    B, H, Wd, K, ncls, p = 2, 256, 512, 16, 20, 8
    W, b = _head_parts()
    y = jax.random.normal(jax.random.PRNGKey(2), (B, H, Wd, K))
    logits = apply_head_matmul(y, W, b)
    ref = jnp.argmax(logits, axis=-1)
    Wp, bp = expand_head_matmul_packed(W, b, p)
    yp = y.reshape(B, H, Wd // p, p * K)
    idx = jax.jit(lambda f: head_argmax(f.reshape(-1, p * K), Wp, bp,
                                        G=4 * p, n_classes=ncls,
                                        interpret=interpret))(yp)
    got = depth_to_space_planes_packed(idx, B, H, Wd // p, p)
    return _result("inference.py head_argmax (G=32 W-packed grouped head)",
                   (B, H, Wd, K), [_agree("preds", got, ref,
                                          min_agree=0.9995)])


def _case_head_loss(G):
    def run(interpret):
        import jax, jax.numpy as jnp  # noqa: E401
        from erfnet_pytorch_tpu.ops.pallas.head_loss import (
            make_head_loss, pack_labels_2x2, pack_labels_packed)
        from erfnet_pytorch_tpu.ops.convt_mm import (
            apply_head_matmul, expand_head_matmul_packed)
        from erfnet_pytorch_tpu.ops.loss import weighted_log_softmax_nll
        ncls = 20
        cw = jnp.asarray([1.0 + 0.1 * i for i in range(ncls - 1)] + [0.0])
        if G == 1:  # encoder stage: 1x1 head on C=128 feats
            B, H, Wd, K = 2, 64, 128, 128
            ks = jax.random.split(jax.random.PRNGKey(0), 2)
            W = jax.random.normal(ks[0], (K, ncls)) * 0.2
            b = jax.random.normal(ks[1], (ncls,)) * 0.1
            y = jax.random.normal(jax.random.PRNGKey(2), (B, H, Wd, K))
            labels = jax.random.randint(jax.random.PRNGKey(3), (B, H, Wd),
                                        0, ncls)
            logits = y @ W + b
            lab_packed = labels.reshape(-1, 1)
            feats2d = y.reshape(-1, K)
        else:
            B, H, Wd, K = 2, 128, 256, 16
            W, b = _head_parts()
            y = jax.random.normal(jax.random.PRNGKey(2), (B, H, Wd, K))
            labels = jax.random.randint(jax.random.PRNGKey(3),
                                        (B, 2 * H, 2 * Wd), 0, ncls)
            logits = apply_head_matmul(y, W, b)
            if G == 4:
                lab_packed = pack_labels_2x2(labels)
                feats2d = y.reshape(-1, K)
            else:  # G == 32: W-packed decoder feats
                p = 8
                W, b = expand_head_matmul_packed(W, b, p)
                lab_packed = pack_labels_packed(labels, p)
                feats2d = y.reshape(B, H, Wd // p, p * K).reshape(-1, p * K)
        ref = weighted_log_softmax_nll(logits, labels, cw)

        op = make_head_loss(cw, n_classes=ncls, G=G)

        def loss_fn(f2, W, b):
            num, den = op(f2, W, b, lab_packed)
            return num / jnp.maximum(den, 1e-12)

        def ref_fn(f2, W, b):  # XLA oracle (G=1/G=4 only)
            if G == 1:
                lg = (f2 @ W + b).reshape(B, H, Wd, ncls)
            else:
                lg = apply_head_matmul(f2.reshape(B, H, Wd, K),
                                       W.astype(f2.dtype), b)
            return weighted_log_softmax_nll(lg, labels, cw)

        loss, grads = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1, 2))
                              )(feats2d, W, b)
        checks = [_check("loss", loss, ref, rtol=1e-4, atol=1e-5)]
        if G != 32:  # the G=32 XLA re-expansion above is G=4's job
            ref_loss, ref_grads = jax.value_and_grad(
                ref_fn, argnums=(0, 1, 2))(feats2d, W, b)
            checks.append(_check_tree("grads", grads, ref_grads,
                                      rtol=3e-4, atol=1e-4))
        else:
            # grads check vs numeric directional derivative
            eps = 1e-3
            v = jax.random.normal(jax.random.PRNGKey(9), feats2d.shape)
            v = v / jnp.linalg.norm(v)
            fd = (loss_fn(feats2d + eps * v, W, b)
                  - loss_fn(feats2d - eps * v, W, b)) / (2 * eps)
            dd = jnp.vdot(grads[0], v)
            checks.append(_check("dir-deriv", dd, fd, rtol=5e-3, atol=1e-4))
        return _result(f"training/steps.py head_loss (G={G})",
                       (feats2d.shape), checks)
    return run


def _case_train_step(enc, shape=(2, 128, 256, 3), uint8=False,
                     require_routed=True):
    def run(interpret):
        import jax, jax.numpy as jnp  # noqa: E401
        from erfnet_pytorch_tpu.models import erfnet
        from erfnet_pytorch_tpu.training import optim
        from erfnet_pytorch_tpu.training.steps import (create_train_state,
                                                       make_train_step)
        from erfnet_pytorch_tpu.ops.pallas.nb1d_train import fused_train
        tx = optim.make_adam()
        ts0 = create_train_state(erfnet, jax.random.PRNGKey(0), 20, tx)
        rng = np.random.RandomState(0)
        # default shape routes the full packed train paths (stem pi=32
        # stats downsampler, packed C64 run, C128 epi pairs; decoder
        # packed upsampler stats)
        if uint8:  # raw loader frames: to_tensor normalizes in-step
            images = jnp.asarray(rng.randint(0, 256, shape, dtype=np.uint8))
        else:
            images = jnp.asarray(rng.rand(*shape).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 20, shape[:3], np.int64)
                             .astype(np.int32))

        def one(enabled):
            with fused_train(enabled):
                step = make_train_step(
                    erfnet, tx, [1.0 + i * 0.1 for i in range(20)], enc=enc,
                    augment=False)
                ts, loss = step(ts0, images, labels, jax.random.PRNGKey(1))
                return jax.tree.map(np.asarray, ts.params), float(loss)

        from erfnet_pytorch_tpu.models.erfnet import (_encoder_packed_ok,
                                                      _decoder_packed_ok)
        B, H, W = shape[:3]
        routed = bool(_encoder_packed_ok(shape)) and (
            enc or bool(_decoder_packed_ok((B, H // 8, W // 8, 128))))
        p_ref, l_ref = one(False)
        p_f, l_f = one(True)
        checks = [{"check": "kernels routed (not XLA fallback)",
                   "pass": routed if require_routed else True,
                   "routed": routed},
                  _check("loss", l_f, l_ref, rtol=1e-4, atol=1e-5),
                  # post-Adam params: fp-noise grads amplified to O(lr) —
                  # smoke bound (tests/test_nb1d_train_kernel.py:169)
                  _check_tree("post-adam params", p_f, p_ref,
                              rtol=5e-3, atol=2.5e-3)]
        return _result(
            "models/erfnet.py packed train path "
            + ("(encoder: stats downsampler pi=32/8/2, packed C64 run, "
               "C128 epi pairs, head_loss G=1)" if enc else
               "(full net: + decoder stats upsamplers, C128/C16 pairs, "
               "head_loss G=32)")
            + (" [raw-uint8 ingestion, smallest-shape routing]"
               if uint8 else ""),
            shape, checks)
    return run


def _case_infer_pipeline(shape, min_agree=0.995):
    def run(interpret):
        import jax, jax.numpy as jnp  # noqa: E401
        from erfnet_pytorch_tpu.models import erfnet
        from erfnet_pytorch_tpu.inference import build_fast_infer
        params, state = erfnet.init(jax.random.PRNGKey(0), 20)
        x = jax.random.uniform(jax.random.PRNGKey(1), shape)
        ref = build_fast_infer(params, state, dtype=jnp.bfloat16,
                               use_pallas=False, preds_only=True)(x)
        got = build_fast_infer(params, state, dtype=jnp.bfloat16,
                               use_pallas=True, preds_only=True,
                               interpret=interpret)(x)
        return _result(
            "inference.py build_fast_infer end-to-end routing "
            "(shipped bf16 config)", shape,
            [_agree("preds", got, ref, min_agree=min_agree)])
    return run


def case_eval_step_fused(interpret):
    import jax, jax.numpy as jnp  # noqa: E401
    from erfnet_pytorch_tpu.models import erfnet
    from erfnet_pytorch_tpu.training import optim
    from erfnet_pytorch_tpu.training.steps import (create_train_state,
                                                   make_eval_step)
    from erfnet_pytorch_tpu.ops.pallas.nb1d_train import fused_train
    tx = optim.make_adam()
    ts = create_train_state(erfnet, jax.random.PRNGKey(0), 20, tx)
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(2, 128, 256, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 20, (2, 128, 256), np.int64)
                         .astype(np.int32))
    cw = [1.0 + i * 0.1 for i in range(20)]

    def one(enabled):
        with fused_train(enabled):
            ev = make_eval_step(erfnet, cw, enc=False)
            loss, preds, labs = ev(ts, images, labels)
            return float(loss), np.asarray(preds)

    l_ref, p_ref = one(False)
    l_f, p_f = one(True)
    return _result("training/steps.py make_eval_step fused "
                   "(head_loss fwd + head_argmax G=4)", (2, 128, 256, 3),
                   [_check("loss", l_f, l_ref, rtol=1e-4, atol=1e-5),
                    _agree("preds", p_f, p_ref, min_agree=0.9995)])


def _q8_ref_and_acts(x, fused, dil):
    """f32 reference output + calibration absmaxes, on host CPU."""
    import jax, jax.numpy as jnp  # noqa: E401
    from erfnet_pytorch_tpu.quantize import _block_acts
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        a1, a2, a3, out = jax.vmap(
            lambda xi: _block_acts(xi, fused, dil))(
                jnp.asarray(np.asarray(x), jnp.float32))
        f = lambda a: float(jnp.max(jnp.abs(a)))  # noqa: E731
        return np.asarray(out), {"in": f(x), "a1": f(a1), "a2": f(a2),
                                 "a3": f(a3)}


def _rel_check(name, got, ref, tol):
    got = np.asarray(got, np.float32)
    rel = float(np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-12))
    return {"check": name, "norm_rel": rel, "tol": tol,
            "pass": bool(rel < tol)}


def case_q8_plain(interpret):
    import jax, jax.numpy as jnp  # noqa: E401
    from erfnet_pytorch_tpu.ops.pallas.nb1d import fuse_nb1d_params
    from erfnet_pytorch_tpu.ops.pallas.nb1d_q8 import (prepare_nb1d_q8,
                                                       nb1d_infer_q8)
    shape, d = (2, 64, 128, 128), 2
    params, state = _rand_nb1d(128)
    fused = fuse_nb1d_params(params, state)
    x = jax.random.normal(jax.random.PRNGKey(2), shape) * 0.5
    ref, acts = _q8_ref_and_acts(x, fused, d)
    payload = prepare_nb1d_q8(fused, acts)
    got = jax.jit(lambda x: nb1d_infer_q8(x, payload, dilated=d,
                                          interpret=interpret))(x)
    # int8 PTQ: norm-rel bound, same as scripts/tpu_q8_validate.py
    return _result("inference.py nb1d_infer_q8 (--int8 plain C=128)", shape,
                   [_rel_check("y", got, ref, 0.035)])


def case_q8_packed(interpret):
    import jax, jax.numpy as jnp  # noqa: E401
    from erfnet_pytorch_tpu.ops.pallas.nb1d import fuse_nb1d_params
    from erfnet_pytorch_tpu.ops.pallas.nb1d_q8 import (prepare_nb1d_q8,
                                                       nb1d_infer_packed_q8)
    from erfnet_pytorch_tpu.ops.packed import pack_nb1d_for_pallas
    shape, p, d = (2, 128, 256, 64), 2, 1
    params, state = _rand_nb1d(64)
    fused = fuse_nb1d_params(params, state)
    x = jax.random.normal(jax.random.PRNGKey(2), shape) * 0.5
    ref, acts = _q8_ref_and_acts(x, fused, d)
    wf32, s2, s4 = pack_nb1d_for_pallas(fused, p, d, dtype=jnp.float32)
    payload = prepare_nb1d_q8(wf32, acts)
    got = jax.jit(lambda x: nb1d_infer_packed_q8(
        x, payload, p=p, dilated=d, s2=s2, s4=s4, interpret=interpret))(x)
    return _result("inference.py nb1d_infer_packed_q8 (--int8 packed C=64)",
                   shape, [_rel_check("y", got, ref, 0.035)])


CASES = {
    "nb1d_infer_d2": _case_nb1d_infer(2),
    "nb1d_infer_d16": _case_nb1d_infer(16),
    "nb1d_stack_infer": case_nb1d_stack_infer,
    "nb1d_infer_packed_p2": _case_nb1d_packed(2, (2, 128, 256, 64)),
    "nb1d_infer_packed_p8": _case_nb1d_packed(8, (2, 256, 512, 16)),
    "nb1d_infer_blocked": case_nb1d_infer_blocked,
    "nb1d_infer_packed_blocked_p2": _case_nb1d_packed_blocked(
        2, (1, 256, 512, 64), 1),
    "nb1d_infer_packed_blocked_p8": _case_nb1d_packed_blocked(
        8, (1, 1024, 2048, 16), 1),
    "nb1d_infer_chunked": case_nb1d_infer_chunked,
    "nb1d_infer_packed_chunked": case_nb1d_infer_packed_chunked,
    "downsampler_eval_pi128": _case_down_eval(128, (1, 256, 512, 3)),
    "downsampler_eval_pi8": _case_down_eval(8, (1, 128, 256, 16)),
    "downsampler_eval_pi2": _case_down_eval(2, (1, 64, 128, 64)),
    "downsampler_staug": case_downsampler_staug,
    "upsampler_eval_128to64": _case_ups_eval(1, 2, 128, 64,
                                             (1, 64, 128, 128)),
    "upsampler_eval_64to16": _case_ups_eval(2, 8, 64, 16,
                                            (1, 128, 256, 64)),
    "head_argmax_G4": case_head_argmax_G4,
    "head_argmax_G32": case_head_argmax_G32,
    "head_loss_G1": _case_head_loss(1),
    "head_loss_G4": _case_head_loss(4),
    "head_loss_G32": _case_head_loss(32),
    "train_step_enc": _case_train_step(True),
    "train_step_full": _case_train_step(False),
    # smallest routable map + raw-uint8 frames (the shipped loader
    # default): pins the train-path Wb>=2 gates and the in-step ToTensor
    # compiled on-chip; some blocks legitimately fall back to XLA here,
    # so routing is recorded but not required
    "train_step_tiny_u8": _case_train_step(False, shape=(2, 64, 128, 3),
                                           uint8=True,
                                           require_routed=False),
    "eval_step_fused": case_eval_step_fused,
    "q8_plain": case_q8_plain,
    "q8_packed": case_q8_packed,
    "infer_pipeline_512": _case_infer_pipeline((2, 512, 1024, 3)),
    "infer_pipeline_1024x2048": _case_infer_pipeline((1, 1024, 2048, 3)),
    # W == stem packing factor -> Wb == 1 maps: the W-block shifts must
    # take the zeros-return guard (upsampler._bshift) instead of building
    # zero-size slices that Mosaic refuses to lower ("vector types must
    # have positive constant sizes" — seen live at eval --height 64)
    # 0.99: random-init logits at a 16k-px map are near-ties everywhere,
    # so bf16 rounding flips ~0.5% of argmaxes (measured 0.9948 on-chip);
    # the case exists to prove LOWERING + routing at this shape
    "infer_pipeline_64x128_wb1": _case_infer_pipeline((2, 64, 128, 3),
                                                      min_agree=0.99),
}

# interpret-mode emulation is minutes-to-hours at these map sizes on the
# 1-core host; the --cpu harness self-test skips them (the full test suite
# already covers the same kernels at small shapes in interpret mode)
CPU_SKIP = {
    "nb1d_infer_blocked", "nb1d_infer_packed_blocked_p2",
    "nb1d_infer_packed_blocked_p8", "nb1d_infer_chunked",
    "nb1d_infer_packed_chunked", "infer_pipeline_512",
    "infer_pipeline_1024x2048", "train_step_enc", "train_step_full",
    "train_step_tiny_u8",
}


# --------------------------------------------------------------------------
# driver
# --------------------------------------------------------------------------

def run_one(name, cpu):
    global _TOL_SCALE
    import jax
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from erfnet_pytorch_tpu.utils.jax_cache import enable as en
        en()
    interpret = cpu or jax.default_backend() == "cpu"
    if not interpret:
        _TOL_SCALE = 20.0
    t0 = time.time()
    entry = CASES[name](interpret)
    entry["mode"] = "interpret" if interpret else "compiled"
    entry["platform"] = jax.default_backend()
    entry["seconds"] = round(time.time() - t0, 1)
    return entry


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--one", help="run a single case in-process")
    ap.add_argument("--only", help="substring filter for the sweep")
    ap.add_argument("--force", action="store_true",
                    help="re-run cases already passing in the manifest")
    ap.add_argument("--cpu", action="store_true",
                    help="interpret-mode harness self-test on CPU")
    ap.add_argument("--manifest", default=None)
    ap.add_argument("--timeout", type=int, default=900,
                    help="per-case subprocess timeout (s)")
    args = ap.parse_args(argv)
    manifest = args.manifest or (
        "/tmp/KERNELS_CPU.json" if args.cpu else MANIFEST)

    if args.one:
        entry = run_one(args.one, args.cpu)
        print(json.dumps({args.one: entry}))
        return 0 if entry["pass"] else 1

    results = {}
    if os.path.exists(manifest):
        with open(manifest) as f:
            results = json.load(f).get("cases", {})
    names = [n for n in CASES if not args.only or args.only in n]
    if args.cpu:
        names = [n for n in names if n not in CPU_SKIP]
    for i, name in enumerate(names):
        prev = results.get(name)
        if prev and prev.get("pass") and not args.force \
                and prev.get("mode") == ("interpret" if args.cpu
                                         else "compiled"):
            print(f"[{i+1}/{len(names)}] {name}: cached PASS")
            continue
        print(f"[{i+1}/{len(names)}] {name} ...", flush=True)
        cmd = [sys.executable, os.path.abspath(__file__), "--one", name]
        if args.cpu:
            cmd.append("--cpu")
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=args.timeout,
                                  cwd=os.path.dirname(MANIFEST))
            line = proc.stdout.strip().splitlines()[-1] if proc.stdout \
                else ""
            entry = json.loads(line)[name] if line.startswith("{") else {
                "pass": False, "error": (proc.stderr or "no output")[-2000:]}
        except subprocess.TimeoutExpired:
            entry = {"pass": False, "error": f"timeout {args.timeout}s"}
        results[name] = entry
        status = "PASS" if entry.get("pass") else "FAIL"
        print(f"    {status} ({entry.get('seconds', '?')}s)")
        payload = {
            "description": "Compiled-mode Pallas kernel parity manifest "
                           "(scripts/tpu_validate_kernels.py)",
            "mode": "interpret" if args.cpu else "compiled",
            "updated": time.strftime("%Y-%m-%d %H:%M:%S"),
            "n_pass": sum(1 for e in results.values() if e.get("pass")),
            "n_cases": len(results),
            "cases": results,
        }
        with open(manifest, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        if not args.cpu:
            time.sleep(3)  # breathe between tunnel sessions
    n_fail = sum(1 for e in results.values() if not e.get("pass"))
    print(f"manifest -> {manifest}  ({len(results) - n_fail} pass / "
          f"{n_fail} fail)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
