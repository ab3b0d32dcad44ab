"""Multi-device fused Pallas kernels (parallel/spmd.py).

The reference's DataParallel contract (SURVEY.md §2b) is "same math,
bigger batch".  Round 1 hard-disabled the fused train/eval kernels on any
multi-device config; these tests pin the round-2 fix: every batch-grid
kernel runs through ``shard_map`` over the registered mesh's data axis and
the 8-way sharded fused step equals both the single-device fused step and
the XLA fallback math (interpret-mode kernels on the fake CPU mesh).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from erfnet_pytorch_tpu.models import erfnet
from erfnet_pytorch_tpu.parallel import spmd
from erfnet_pytorch_tpu.parallel.mesh import (make_mesh, replicate,
                                              shard_batch)
from erfnet_pytorch_tpu.ops.pallas.nb1d_train import (fused_pair,
                                                      fused_train,
                                                      pair_reference)
from erfnet_pytorch_tpu.training import optim
from erfnet_pytorch_tpu.training.steps import (create_train_state,
                                               make_train_step,
                                               make_eval_step)
from erfnet_pytorch_tpu.training.class_weights import DECODER_WEIGHTS


def _tiny_batch(b=16, h=32, w=64, seed=0):
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 20, (b, h, w)).astype(np.int32))
    return images, labels


def test_sharded_fused_pair_matches_reference():
    """Op level: shard_map'd fused_pair == jnp oracle, values and all five
    gradients (dx sharded; dW/db psum-reduced partials)."""
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    B, H, Wb, C = 8, 8, 16, 128
    x = jax.random.normal(ks[0], (B, H, Wb, C))
    wh = jax.random.normal(ks[1], (3, C, C)) * 0.05
    ww = jax.random.normal(ks[2], (3, C, C)) * 0.05
    bh = jax.random.normal(ks[3], (C,))
    bw = jax.random.normal(ks[4], (C,))
    mesh = make_mesh(8)
    with spmd.pallas_mesh(mesh):
        xs = shard_batch(mesh, x)
        f = lambda *a: fused_pair(*a, sh=2, sw=2, lead_relu=True)
        z, vjp_f = jax.vjp(f, xs, wh, bh, ww, bw)
    r = lambda *a: pair_reference(*a, sh=2, sw=2, lead_relu=True)
    z_ref, vjp_r = jax.vjp(r, x, wh, bh, ww, bw)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               rtol=1e-5, atol=1e-5)
    g = jax.random.normal(jax.random.PRNGKey(9), z.shape)
    with spmd.pallas_mesh(mesh):
        got = vjp_f(shard_batch(mesh, g))
    for gt, ref, name in zip(got, vjp_r(g), "x wh bh ww bw".split()):
        np.testing.assert_allclose(
            np.asarray(gt), np.asarray(ref), rtol=2e-4, atol=2e-4,
            err_msg=f"sharded grad mismatch for {name}")


def _run_full_step(images, labels, *, fused, mesh=None):
    tx = optim.make_adam(1e-3)
    ts = create_train_state(erfnet, jax.random.PRNGKey(0), 20, tx)
    with fused_train(fused), spmd.pallas_mesh(mesh):
        step = make_train_step(erfnet, tx, DECODER_WEIGHTS, enc=False,
                               augment=False)
        if mesh is not None:
            ts = replicate(mesh, ts)
            images = shard_batch(mesh, images)
            labels = shard_batch(mesh, labels)
        ts, loss = step(ts, images, labels, jax.random.PRNGKey(1))
        loss = float(jax.block_until_ready(loss))
    return ts, loss


def test_sharded_fused_step_matches_single_and_xla():
    """Full train step at fused-eligible shapes: 8-way sharded fused ==
    single-device fused == XLA fallback (loss, params, GLOBAL BN stats)."""
    images, labels = _tiny_batch()
    ts_xla, loss_xla = _run_full_step(images, labels, fused=False)
    ts_f1, loss_f1 = _run_full_step(images, labels, fused=True)
    ts_f8, loss_f8 = _run_full_step(images, labels, fused=True,
                                    mesh=make_mesh(8))

    assert abs(loss_f1 - loss_xla) < 1e-4
    assert abs(loss_f8 - loss_f1) < 1e-4
    for ts_got, tag in ((ts_f1, "fused-1dev"), (ts_f8, "fused-8dev")):
        for path in (("decoder", "output_conv", "w"),
                     ("encoder", "initial_block", "conv", "w")):
            a, b = ts_got.params, ts_xla.params
            for k in path:
                a, b = a[k], b[k]
            diff = np.abs(np.asarray(a) - np.asarray(b))
            # max bound 2*lr: an element whose gradient is f32-noise-level
            # gets a sign-flipped Adam step (update ~ lr*sign(g)) under
            # ANY reordered-but-valid accumulation; the tight mean bound
            # is what catches a real math difference
            assert diff.max() < 2.2e-3, \
                f"{tag} param mismatch at {'/'.join(path)}: {diff.max():.2e}"
            assert diff.mean() < 1e-4, \
                f"{tag} param drift at {'/'.join(path)}: {diff.mean():.2e}"
        # BN stats must be GLOBAL-batch statistics in every configuration
        for layer in (0, 7):
            a = ts_got.batch_stats["encoder"]["layers"][layer]
            b = ts_xla.batch_stats["encoder"]["layers"][layer]
            key = "bn" if "bn" in a else "bn1"
            np.testing.assert_allclose(
                np.asarray(a[key]["mean"]), np.asarray(b[key]["mean"]),
                rtol=1e-4, atol=1e-6,
                err_msg=f"{tag} BN stats diverge at encoder layer {layer}")


def test_mesh_keyed_jit_retraces_on_mesh_change():
    """A plain module-level @jax.jit reads the registered mesh at trace
    time only — same-shape calls after a set_mesh change would replay the
    stale executable.  mesh_keyed_jit keeps one jit cache per
    registration (regression for the packed-eval entry points)."""

    @spmd.mesh_keyed_jit(static_argnames=("k",))
    def f(x, *, k):
        return x * spmd.data_shards() * k

    x = jnp.float32(1)
    assert float(f(x, k=1)) == 1.0  # no mesh: data_shards() == 1
    with spmd.pallas_mesh(make_mesh(8)):
        assert float(f(x, k=1)) == 8.0  # retraced under the mesh
    assert float(f(x, k=1)) == 1.0  # and again once deregistered


def test_sharded_fused_eval_step_matches_xla():
    """Eval step (fused head+loss+argmax) under the 8-way mesh == XLA."""
    images, labels = _tiny_batch(seed=3)
    tx = optim.make_adam(1e-3)
    ts = create_train_state(erfnet, jax.random.PRNGKey(0), 20, tx)

    ev_xla = make_eval_step(erfnet, DECODER_WEIGHTS, enc=False)
    loss_ref, preds_ref, _ = ev_xla(ts, images, labels)

    mesh = make_mesh(8)
    with fused_train(True), spmd.pallas_mesh(mesh):
        ev = make_eval_step(erfnet, DECODER_WEIGHTS, enc=False)
        tsm = replicate(mesh, ts)
        loss, preds, _ = ev(tsm, shard_batch(mesh, images),
                            shard_batch(mesh, labels))
        loss = float(loss)
    assert abs(loss - float(loss_ref)) < 1e-4
    np.testing.assert_array_equal(np.asarray(preds), np.asarray(preds_ref))


def _zero_drop(specs):
    return [(k, (a[0], 0.0, a[2])) if k == "nb1d" else (k, a)
            for k, a in specs]


@pytest.mark.parametrize("fused", [True, False])
def test_dp_batch_padding_exact_with_valid_mask(monkeypatch, fused):
    """Reference recipe batch 6 padded to a mesh multiple of 8 with the
    `valid` mask == the UNPADDED batch-6 step exactly: same loss, same
    parameter update, same BN batch stats — on both the fused-Pallas and
    XLA paths, single-device and 8-way sharded.  (Dropout probabilities
    are zeroed for the comparison: RNG draws are shape-dependent, so a
    B=8 dropout stream can never bitwise-match a B=6 one — the masking
    under test is the BN-statistics / gradient exclusion.)"""
    from erfnet_pytorch_tpu.models import erfnet as E

    monkeypatch.setattr(E, "ENCODER_LAYER_SPECS",
                        _zero_drop(E.ENCODER_LAYER_SPECS))
    monkeypatch.setattr(E, "DECODER_LAYER_SPECS",
                        _zero_drop(E.DECODER_LAYER_SPECS))

    images6, labels6 = _tiny_batch(b=6)
    images8 = jnp.concatenate([images6, images6[5:6], images6[5:6]])
    labels8 = jnp.concatenate(
        [labels6, jnp.full((2,) + labels6.shape[1:], 255, labels6.dtype)])
    valid8 = jnp.asarray([1.0] * 6 + [0.0] * 2, jnp.float32)

    def run(images, labels, valid, mesh=None):
        tx = optim.make_adam(1e-3)
        ts = create_train_state(erfnet, jax.random.PRNGKey(0), 20, tx)
        with fused_train(fused), spmd.pallas_mesh(mesh):
            step = make_train_step(erfnet, tx, DECODER_WEIGHTS, enc=False,
                                   augment=False)
            if mesh is not None:
                ts = replicate(mesh, ts)
                images = shard_batch(mesh, images)
                labels = shard_batch(mesh, labels)
            ts, loss = step(ts, images, labels, jax.random.PRNGKey(1),
                            valid)
            loss = float(jax.block_until_ready(loss))
        return ts, loss

    ts_ref, loss_ref = run(images6, labels6, None)
    runs = [("padded-1dev", run(images8, labels8, valid8)),
            ("padded-8dev",
             run(images8, labels8, valid8, mesh=make_mesh(8)))]
    for tag, (ts_got, loss_got) in runs:
        # 1e-4 as in the sharded-equivalence test: the 8-way mesh's
        # per-shard partial sums + collective reassociate f32 reductions
        assert abs(loss_got - loss_ref) < 1e-4, \
            f"{tag}: loss {loss_got} vs {loss_ref}"
        for path in (("decoder", "output_conv", "w"),
                     ("encoder", "initial_block", "conv", "w"),
                     ("encoder", "layers", 7, "conv3x1_1", "w")):
            a, b = ts_got.params, ts_ref.params
            for k in path:
                a, b = a[k], b[k]
            diff = np.abs(np.asarray(a) - np.asarray(b))
            # the masking is exact in real arithmetic (the block-level
            # test below pins that at ~1e-5); through the full net the
            # 8-row masked f32 reduction tree differs from the 6-row one
            # by ulps that conditioning amplifies (documented ~7%
            # norm-rel between any two valid op orderings), and Adam
            # turns noise-level gradient elements into lr*sign steps —
            # same bound structure as the sharded-equivalence test
            assert diff.max() < 2.2e-3, \
                f"{tag}: padded params diverge at {path}: {diff.max():.2e}"
            assert diff.mean() < 1e-4, \
                f"{tag}: padded param drift at {path}: {diff.mean():.2e}"
        for layer in (0, 7):
            sa = ts_got.batch_stats["encoder"]["layers"][layer]
            sb = ts_ref.batch_stats["encoder"]["layers"][layer]
            key = "bn" if "bn" in sa else "bn1"
            np.testing.assert_allclose(
                np.asarray(sa[key]["mean"]), np.asarray(sb[key]["mean"]),
                rtol=1e-4, atol=1e-6,
                err_msg=f"{tag}: pad rows leaked into BN stats "
                        f"(encoder layer {layer})")
            np.testing.assert_allclose(
                np.asarray(sa[key]["var"]), np.asarray(sb[key]["var"]),
                rtol=1e-4, atol=1e-6,
                err_msg=f"{tag}: pad rows leaked into BN var "
                        f"(encoder layer {layer})")


@pytest.mark.parametrize("fused", [True, False])
def test_valid_mask_block_level_exact(fused):
    """Leak detector for the pad-row masking, at one NB1d block where
    conditioning can't amplify: every weight/BN gradient of the padded
    masked run must match the unpadded run to f32 reduction noise
    (~1e-5 norm-rel).  The two PRE-BN conv biases are excluded — their
    true gradient is mathematically zero (shift absorbed by the BN mean),
    so their f32 values are pure noise in ANY op ordering."""
    from erfnet_pytorch_tpu.models import erfnet as E

    p, _s = E.init_non_bottleneck_1d(jax.random.PRNGKey(0), 64)
    s = _s
    rng = np.random.RandomState(0)
    x6 = jnp.asarray(rng.randn(6, 16, 32, 64).astype(np.float32))
    x8 = jnp.concatenate([x6, x6[5:6], x6[5:6]])
    v8 = jnp.asarray([1.0] * 6 + [0.0] * 2, jnp.float32)

    def block(p, x, valid):
        y, ns = E.apply_non_bottleneck_1d(
            p, s, x, dilated=2, dropprob=0.0, train=True, rng=None,
            valid=valid)
        return y, ns

    with fused_train(fused):
        g6 = jax.jit(jax.grad(lambda p: jnp.sum(block(p, x6, None)[0]**2)))(p)
        g8 = jax.jit(jax.grad(
            lambda p: jnp.sum(block(p, x8, v8)[0][:6]**2)))(p)
        (y6, ns6) = jax.jit(lambda p: block(p, x6, None))(p)
        (y8, ns8) = jax.jit(lambda p: block(p, x8, v8))(p)
    # valid rows of the padded output == unpadded output (stats masked;
    # a handful of elements sit at relu boundaries where ulp-level stat
    # reassociation flips them — hence the 1e-4 atol)
    np.testing.assert_allclose(np.asarray(y8[:6]), np.asarray(y6),
                               rtol=1e-4, atol=1e-4)
    for bn in ("bn1", "bn2"):
        np.testing.assert_allclose(
            np.asarray(ns8[bn]["mean"]), np.asarray(ns6[bn]["mean"]),
            rtol=1e-5, atol=1e-7, err_msg=f"pad rows leaked into {bn}")
    zero_grad_biases = {("conv1x3_1", "b"), ("conv1x3_2", "b")}
    for name in g6:
        for leaf in g6[name]:
            if (name, leaf) in zero_grad_biases:
                continue
            a, b = np.asarray(g6[name][leaf]), np.asarray(g8[name][leaf])
            nr = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-30)
            assert nr < 5e-5, \
                f"fused={fused}: pad rows leak into grad {name}/{leaf}: " \
                f"norm-rel {nr:.2e}"


def test_forced_1way_mesh_engages_shardmap():
    """spmd.set_mesh(force=True): a 1-way mesh engages the shard_map
    wrappers (normally an identity) — the on-silicon smoke's mechanism
    (scripts/tpu_shardmap_smoke.py).  Math must be unchanged."""
    from jax.sharding import Mesh

    mesh1 = Mesh(np.array(jax.devices()[:1]), ("data",))
    assert spmd.active() == (None, None)
    with spmd.pallas_mesh(mesh1):
        assert spmd.active() == (None, None)  # 1-way: identity by default
    with spmd.pallas_mesh(mesh1, force=True):
        assert spmd.active()[0] is mesh1
        assert spmd.data_shards() == 1
        x = jnp.arange(8.0).reshape(2, 4)
        wrapped = spmd.shard_batch_call(lambda a: a * 2.0, [True])
        np.testing.assert_allclose(np.asarray(wrapped(x)), np.asarray(x) * 2)
    assert spmd.active() == (None, None)  # context restored


def test_sharded_fast_infer_matches_single():
    """The fused INFERENCE pipeline under the 8-way mesh: build_fast_infer
    (stacked/packed NB1d kernels + packed stem + fused head+argmax) on
    sharded batches must reproduce the single-device preds bit-for-bit,
    actually route through the Pallas kernels (not silently fall back to
    XLA), and feed IouEval to the same confusion matrix.  This is the
    reference's DataParallel-wrapped eval contract (eval/eval_iou.py wraps
    the model in DataParallel exactly like training — SURVEY.md §3.2)."""
    from erfnet_pytorch_tpu import inference as inf
    from erfnet_pytorch_tpu.inference import build_fast_infer
    from erfnet_pytorch_tpu.metrics.iou import IouEval

    params, state = erfnet.init(jax.random.PRNGKey(0), 20)
    rng = np.random.RandomState(7)
    images = jnp.asarray(rng.rand(8, 64, 256, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 20, (8, 64, 256)).astype(np.int32))

    # routing probes: count calls into the fused kernel entry points the
    # pipeline is expected to use at this shape
    calls = {"stack": 0, "packed": 0}
    real_stack, real_packed = inf.nb1d_stack_infer, inf.nb1d_infer_packed

    def probe_stack(*a, **kw):
        calls["stack"] += 1
        return real_stack(*a, **kw)

    def probe_packed(*a, **kw):
        calls["packed"] += 1
        return real_packed(*a, **kw)

    inf.nb1d_stack_infer = probe_stack
    inf.nb1d_infer_packed = probe_packed
    try:
        preds_xla = build_fast_infer(params, state, dtype=jnp.float32,
                                     use_pallas=False,
                                     preds_only=True)(images)
        infer1 = build_fast_infer(params, state, dtype=jnp.float32,
                                  use_pallas=True, interpret=True,
                                  preds_only=True)
        preds1 = jax.block_until_ready(infer1(images))
        calls_1dev = dict(calls)
        assert calls_1dev["stack"] >= 1, calls_1dev

        mesh = make_mesh(8)
        calls.update(stack=0, packed=0)
        with spmd.pallas_mesh(mesh):
            infer8 = build_fast_infer(params, state, dtype=jnp.float32,
                                      use_pallas=True, interpret=True,
                                      preds_only=True)
            preds8 = jax.block_until_ready(
                infer8(shard_batch(mesh, images)))
        assert calls["stack"] >= calls_1dev["stack"], (calls, calls_1dev)
        assert calls["packed"] >= calls_1dev["packed"], (calls, calls_1dev)
    finally:
        inf.nb1d_stack_infer = real_stack
        inf.nb1d_infer_packed = real_packed

    # per-image kernels: sharding the batch must not change a single pixel
    np.testing.assert_array_equal(np.asarray(preds8), np.asarray(preds1))
    agree = (np.asarray(preds1) == np.asarray(preds_xla)).mean()
    assert agree > 0.999, agree

    # the eval loop's metric accumulation (iouEval.addBatch — SURVEY.md
    # §2a row 10) over sharded preds/labels == single-device
    ev1, ev8 = IouEval(20), IouEval(20)
    ev1.add_batch(preds1, labels)
    with mesh:
        ev8.add_batch(preds8, shard_batch(mesh, labels))
    np.testing.assert_allclose(np.asarray(ev8.cm), np.asarray(ev1.cm),
                               rtol=0, atol=0)
    miou1, _ = ev1.get_iou()
    miou8, _ = ev8.get_iou()
    assert miou1 == miou8


def test_sharded_2d_dcn_mesh_matches_single():
    """Multi-host growth: a (dcn=2, data=4) mesh — the TPU-pod pattern
    where the outer axis crosses hosts over DCN — must reproduce the
    single-device fused math exactly like the 1-D 8-way mesh does.
    Batches shard over BOTH axes (P(("dcn","data"))); grad/BN psums
    become two-level collectives."""
    from erfnet_pytorch_tpu.parallel.mesh import (make_mesh_2d, batch_axes,
                                                  pad_to_for_mesh)

    images, labels = _tiny_batch()
    mesh2 = make_mesh_2d(2, 4)
    assert batch_axes(mesh2) == ("dcn", "data")
    assert pad_to_for_mesh(mesh2) == 8
    with spmd.pallas_mesh(mesh2):
        assert spmd.data_shards() == 8

    ts_1, loss_1 = _run_full_step(images, labels, fused=True)
    ts_2, loss_2 = _run_full_step(images, labels, fused=True, mesh=mesh2)
    assert abs(loss_2 - loss_1) < 1e-4
    for path in (("decoder", "output_conv", "w"),
                 ("encoder", "initial_block", "conv", "w")):
        a, b = ts_2.params, ts_1.params
        for k in path:
            a, b = a[k], b[k]
        diff = np.abs(np.asarray(a) - np.asarray(b))
        assert diff.max() < 2.2e-3, f"2d-mesh param mismatch: {diff.max():.2e}"
        assert diff.mean() < 1e-4, f"2d-mesh param drift: {diff.mean():.2e}"
    # BN stats stay GLOBAL-batch statistics across both mesh axes
    a = ts_2.batch_stats["encoder"]["layers"][0]
    b = ts_1.batch_stats["encoder"]["layers"][0]
    key = "bn" if "bn" in a else "bn1"
    np.testing.assert_allclose(np.asarray(a[key]["mean"]),
                               np.asarray(b[key]["mean"]),
                               rtol=1e-4, atol=1e-6)
