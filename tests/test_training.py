"""Training stack: optimizer parity vs torch Adam, poly LR, train-step loss
decrease, checkpoint round-trip, 8-device sharded step equivalence."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from erfnet_pytorch_tpu.models import erfnet
from erfnet_pytorch_tpu.training import optim
from erfnet_pytorch_tpu.training.steps import (create_train_state,
                                               make_train_step,
                                               make_eval_step, TrainState)
from erfnet_pytorch_tpu.training.checkpoint import (
    CheckpointManager, load_checkpoint_file, restore_opt_state, save_weights,
    load_weights, load_any_weights)
from erfnet_pytorch_tpu.training.class_weights import (ENCODER_WEIGHTS,
                                                       DECODER_WEIGHTS)
from erfnet_pytorch_tpu.parallel.mesh import (make_mesh, batch_sharding,
                                              replicate, shard_batch)


def test_poly_lr_matches_torch_lambdalr():
    base, epochs = 5e-4, 150
    lin = torch.nn.Linear(2, 2)
    opt = torch.optim.Adam(lin.parameters(), lr=base)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lr_lambda=lambda e: (1 - e / epochs) ** 0.9)
    for epoch in range(5):
        torch_lr = opt.param_groups[0]["lr"]
        ours = optim.poly_lr(base, epoch, epochs)
        assert abs(torch_lr - ours) < 1e-12
        opt.step()
        sched.step()


def test_adam_update_matches_torch():
    """One coupled-wd Adam step on identical params/grads."""
    rng = np.random.RandomState(0)
    p0 = rng.randn(4, 3).astype(np.float32)
    g0 = rng.randn(4, 3).astype(np.float32)

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    topt = torch.optim.Adam([tp], lr=5e-4, betas=(0.9, 0.999), eps=1e-8,
                            weight_decay=1e-4)
    tp.grad = torch.from_numpy(g0.copy())
    topt.step()
    tp.grad = torch.from_numpy(g0.copy())
    topt.step()

    tx = optim.make_adam(5e-4, 1e-4)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for _ in range(2):
        updates, state = tx.update({"w": jnp.asarray(g0)}, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]),
                               tp.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_set_learning_rate():
    tx = optim.make_adam(5e-4)
    state = tx.init({"w": jnp.zeros(3)})
    state = optim.set_learning_rate(state, 1e-3)
    assert abs(optim.get_learning_rate(state) - 1e-3) < 1e-9  # f32 rounding


def _tiny_batch(b=4, h=32, w=64, seed=0):
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 20, (b, h, w)).astype(np.int32))
    return images, labels


@pytest.mark.parametrize("enc", [True, False])
def test_train_step_decreases_loss(enc):
    tx = optim.make_adam(5e-3)
    ts = create_train_state(erfnet, jax.random.PRNGKey(0), 20, tx)
    step = make_train_step(erfnet, tx, ENCODER_WEIGHTS if enc
                           else DECODER_WEIGHTS, enc=enc, augment=False)
    images, labels = _tiny_batch()
    losses = []
    for i in range(8):
        ts, loss = step(ts, images, labels, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert int(ts.step) == 8
    assert np.isfinite(losses).all()


def test_train_step_uint8_images_match_f32():
    """Raw uint8 loader frames (image_dtype='uint8') through the train and
    eval steps match the f32 pipeline.  NOT bit-equal: XLA lowers the
    on-device /255 as reciprocal-multiply (<=1 ulp from numpy's true
    division, measured), and the extra convert shifts fusion boundaries —
    Adam amplifies both into the usual ±lr-scale param walk (CLAUDE.md
    conditioning note), so everything gets the flat-vs-tree test's
    tolerance structure."""
    rng = np.random.RandomState(3)
    u8 = rng.randint(0, 256, (4, 32, 64, 3), dtype=np.uint8)
    labels = jnp.asarray(rng.randint(0, 20, (4, 32, 64)).astype(np.int32))
    imgs_u8 = jnp.asarray(u8)
    imgs_f32 = jnp.asarray(u8.astype(np.float32) / 255.0)

    def run(images):
        tx = optim.make_adam(5e-3)
        ts = create_train_state(erfnet, jax.random.PRNGKey(0), 20, tx)
        step = make_train_step(erfnet, tx, DECODER_WEIGHTS, enc=False,
                               augment=True)
        losses = []
        for i in range(2):
            ts, loss = step(ts, images, labels, jax.random.PRNGKey(i))
            losses.append(float(loss))
        ev = make_eval_step(erfnet, DECODER_WEIGHTS, enc=False)
        el, preds, tgts = ev(ts, images, labels)
        return losses, ts, float(el), np.asarray(preds)

    l8, ts8, e8, p8 = run(imgs_u8)
    lf, tsf, ef, pf = run(imgs_f32)
    assert abs(l8[0] - lf[0]) < 1e-5 * lf[0]   # forward: <=1-ulp inputs
    assert abs(l8[1] - lf[1]) < 1e-2           # post-step: op-order noise
    assert abs(e8 - ef) < 1e-2
    # preds come from post-step (±lr-walked) params on random-init
    # near-uniform logits: ~5% of argmaxes flip (measured 0.944); the
    # params bound below is the real equivalence guard
    assert (p8 == pf).mean() > 0.9
    # noise ceiling: 2 steps x 2*lr (early Adam updates are ~±lr*sign and
    # a near-zero grad can flip sign both steps; measured max 0.0200);
    # a real ingestion bug would scramble params by O(1)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b),
                                                atol=4.2 * 5e-3),
        ts8.params, tsf.params)
    worst_mean = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).mean()),
        ts8.params, tsf.params)))
    assert worst_mean < 5e-3  # noise is sparse; bias would be dense


def test_flat_train_step_matches_tree_step():
    """flat=True (raveled params/moments carry) must be bit-compatible math
    with the per-leaf tree step: same losses, same params after N steps."""
    def run(flat):
        tx = optim.make_adam(5e-3)
        ts = create_train_state(erfnet, jax.random.PRNGKey(0), 20, tx)
        step = make_train_step(erfnet, tx, DECODER_WEIGHTS, enc=False,
                               augment=True, flat=flat)
        state = step.flatten(ts) if flat else ts
        images, labels = _tiny_batch()
        losses = []
        for i in range(3):
            state, loss = step(state, images, labels, jax.random.PRNGKey(7))
            losses.append(float(loss))
        if flat:
            state = step.unflatten(state)
        return losses, state

    losses_t, ts_t = run(False)
    losses_f, ts_f = run(True)
    # The two modes are the same math but different compiled programs, and
    # Adam's early updates are ~±lr*sign(grad): f32 fusion-order noise on
    # near-zero grads flips an element by 2*lr.  Guaranteed-equal surface:
    # the first two losses (empirically bit-identical) and params within a
    # few lr (a leaf-order bug would scramble params by O(1)).
    np.testing.assert_allclose(losses_t[:2], losses_f[:2], rtol=1e-6)
    assert abs(losses_t[2] - losses_f[2]) < 1e-2
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=3 * 5e-3),
        ts_t.params, ts_f.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-2),
        ts_t.batch_stats, ts_f.batch_stats)
    assert int(ts_f.step) == 3


def test_multi_step_matches_sequential():
    """multi_step=2 (one UNROLLED dispatch) == two sequential flat steps:
    same losses, same final params (the rng folds the on-device step
    counter, so the random streams line up)."""
    tx = optim.make_adam(5e-3)
    images, labels = _tiny_batch()
    key = jax.random.PRNGKey(7)

    ts = create_train_state(erfnet, jax.random.PRNGKey(0), 20, tx)
    s1 = make_train_step(erfnet, tx, DECODER_WEIGHTS, enc=False,
                         augment=True, flat=True)
    f1 = s1.flatten(ts)
    losses_seq = []
    for _ in range(2):
        f1, loss = s1(f1, images, labels, key)
        losses_seq.append(float(loss))

    ts2 = create_train_state(erfnet, jax.random.PRNGKey(0), 20, tx)
    s2 = make_train_step(erfnet, tx, DECODER_WEIGHTS, enc=False,
                         augment=True, flat=True, multi_step=2)
    f2 = s2.flatten(ts2)
    f2, losses = s2(f2, (images, images), (labels, labels), key)
    np.testing.assert_allclose(np.asarray(losses), losses_seq, rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-5),
        s1.unflatten(f1).params, s2.unflatten(f2).params)
    assert int(f2.step) == 2


def test_flat_state_opt_roundtrip():
    """flatten/unflatten preserve Adam moments + injected hyperparams."""
    tx = optim.make_adam(5e-4)
    ts = create_train_state(erfnet, jax.random.PRNGKey(0), 20, tx)
    step = make_train_step(erfnet, tx, DECODER_WEIGHTS, enc=False, flat=True)
    fts = step.flatten(ts)
    fts = fts._replace(opt_state=optim.set_learning_rate(fts.opt_state,
                                                         1e-3))
    ts2 = step.unflatten(fts)
    assert abs(optim.get_learning_rate(ts2.opt_state) - 1e-3) < 1e-9
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        ts.params, ts2.params)


@pytest.mark.parametrize("enc", [False, True])
def test_eval_step_fused_matches_xla(enc):
    """Fused eval (head_loss fwd + head_argmax on pre-head feats) == the
    XLA logits path: same loss, same predictions."""
    from erfnet_pytorch_tpu.ops.pallas.nb1d_train import fused_train

    tx = optim.make_adam()
    ts = create_train_state(erfnet, jax.random.PRNGKey(0), 20, tx)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 32, 128, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 21, (2, 32, 128)).astype(np.int32))
    labels = jnp.where(labels == 20, 255, labels)

    with fused_train(False):
        l0, p0, t0 = make_eval_step(erfnet, DECODER_WEIGHTS,
                                    enc=enc)(ts, images, labels)
    with fused_train(True):
        l1, p1, t1 = make_eval_step(erfnet, DECODER_WEIGHTS,
                                    enc=enc)(ts, images, labels)
    np.testing.assert_allclose(float(l1), float(l0), rtol=5e-3)
    agree = (np.asarray(p1) == np.asarray(p0)).mean()
    assert agree > 0.999, agree
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))


def test_eval_step_shapes():
    tx = optim.make_adam()
    ts = create_train_state(erfnet, jax.random.PRNGKey(0), 20, tx)
    es = make_eval_step(erfnet, DECODER_WEIGHTS, enc=False)
    images, labels = _tiny_batch()
    loss, preds, tgts = es(ts, images, labels)
    assert preds.shape == tgts.shape == (4, 32, 64)
    assert np.isfinite(float(loss))


def test_checkpoint_roundtrip(tmp_path):
    tx = optim.make_adam()
    ts = create_train_state(erfnet, jax.random.PRNGKey(0), 20, tx)
    step = make_train_step(erfnet, tx, DECODER_WEIGHTS, enc=False,
                           augment=False)
    images, labels = _tiny_batch()
    ts, _ = step(ts, images, labels, jax.random.PRNGKey(0))

    mgr = CheckpointManager(str(tmp_path), enc=False)
    mgr.save_epoch(epoch=3, params=ts.params, batch_stats=ts.batch_stats,
                   opt_state=ts.opt_state, best_acc=0.5, is_best=True,
                   epochs_save=1, step=int(ts.step))
    assert (tmp_path / "checkpoint.pth.tar").exists()
    assert (tmp_path / "model_best.pth").exists()
    assert (tmp_path / "model.pth").exists()
    assert (tmp_path / "model-003.pth").exists()

    payload = load_checkpoint_file(str(tmp_path / "checkpoint.pth.tar"))
    assert payload["epoch"] == 3 and payload["best_acc"] == 0.5

    # params round-trip exactly
    flat0, _ = jax.tree_util.tree_flatten(ts.params)
    flat1, _ = jax.tree_util.tree_flatten(payload["params"])
    for a, b in zip(flat0, flat1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # opt_state restores into the typed optax structure and keeps training
    fresh = create_train_state(erfnet, jax.random.PRNGKey(0), 20, tx)
    restored_opt = restore_opt_state(fresh.opt_state, payload["opt_state"])
    # step counter persists too: the train step folds it into the RNG key
    ts2 = TrainState(payload["params"], payload["batch_stats"], restored_opt,
                     jnp.asarray(payload["step"], jnp.int32))
    ts2b, _ = step(ts2, images, labels, jax.random.PRNGKey(1))
    ts1b, _ = step(ts, images, labels, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        np.asarray(ts1b.params["encoder"]["initial_block"]["conv"]["w"]),
        np.asarray(ts2b.params["encoder"]["initial_block"]["conv"]["w"]),
        rtol=1e-6, atol=1e-7)

    # weights-only artifacts load through load_any_weights
    p, s = load_any_weights(str(tmp_path / "model_best.pth"))
    assert "encoder" in p and "decoder" in p


def test_sharded_step_matches_single_device():
    """DataParallel contract: the 8-way sharded step computes the same math
    as single-device on the same global batch (grads/BN psum via jit)."""
    tx = optim.make_adam(1e-3)
    ts0 = create_train_state(erfnet, jax.random.PRNGKey(0), 20, tx)
    step = make_train_step(erfnet, tx, DECODER_WEIGHTS, enc=False,
                           augment=False)
    images, labels = _tiny_batch(b=8)

    # single device
    ts1, loss1 = step(ts0, images, labels, jax.random.PRNGKey(0))

    # 8-device mesh
    mesh = make_mesh(8)
    tsm = replicate(mesh, ts0)
    im = shard_batch(mesh, images)
    lm = shard_batch(mesh, labels)
    ts2, loss2 = step(tsm, im, lm, jax.random.PRNGKey(0))

    # f32 reduction order differs between 1-way and 8-way collectives
    assert abs(float(loss1) - float(loss2)) < 1e-4
    np.testing.assert_allclose(
        np.asarray(ts1.params["decoder"]["output_conv"]["w"]),
        np.asarray(ts2.params["decoder"]["output_conv"]["w"]),
        rtol=1e-4, atol=1e-6)
    # BN batch stats must be GLOBAL-batch stats (cross-replica)
    np.testing.assert_allclose(
        np.asarray(ts1.batch_stats["encoder"]["initial_block"]["bn"]["mean"]),
        np.asarray(ts2.batch_stats["encoder"]["initial_block"]["bn"]["mean"]),
        rtol=1e-5, atol=1e-7)


def test_spatial_sharded_inference_matches_single_device():
    """CP-analog: H-axis sharded inference == unsharded on the 8-dev mesh."""
    from erfnet_pytorch_tpu.parallel.spatial import make_spatial_infer
    from erfnet_pytorch_tpu.models import erfnet as _erfnet

    params, state = _erfnet.init(jax.random.PRNGKey(0), 20)
    # H = 128 -> 8 devices x 16 rows; /8 stride keeps 2 rows per device
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 128, 256, 3))
    ref, _ = _erfnet.apply(params, state, x, train=False)
    mesh = make_mesh(8)
    infer = make_spatial_infer(params, state, mesh)
    logits, pred = infer(jax.device_put(x))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)
    assert pred.shape == (1, 128, 256)


@pytest.mark.slow
def test_spatial_sharded_inference_1024x2048():
    """CP-analog at the REAL streaming shape: an 8-way H-shard of a
    1024-row frame leaves 16 rows/device at 1/8 resolution, so the d=16
    dilated blocks' 17-row halos force MULTI-HOP exchanges — the regime
    the 128-row smoke above never reaches (see parallel/spatial.py's
    scope note for the receptive-field arithmetic)."""
    from erfnet_pytorch_tpu.parallel.spatial import make_spatial_infer
    from erfnet_pytorch_tpu.models import erfnet as _erfnet

    params, state = _erfnet.init(jax.random.PRNGKey(0), 20)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 1024, 2048, 3))
    ref, _ = _erfnet.apply(params, state, x, train=False)
    ref_pred = np.argmax(np.asarray(ref), -1)
    mesh = make_mesh(8)
    infer = make_spatial_infer(params, state, mesh)
    logits, pred = infer(jax.device_put(x))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)
    agree = (np.asarray(pred) == ref_pred).mean()
    assert agree > 0.9999, agree


def test_partial_load_semantics():
    """load_my_state_dict contract: matching paths/shapes copied, the rest
    kept, tolerant of missing subtrees."""
    from erfnet_pytorch_tpu.training.checkpoint import partial_load
    t = {"a": jnp.zeros((2, 2)), "b": {"c": jnp.zeros(3)},
         "extra": jnp.zeros(1)}
    s = {"a": jnp.ones((2, 2)), "b": {"c": jnp.ones(4)}}  # c shape mismatch
    merged, loaded, skipped = partial_load(t, s)
    np.testing.assert_array_equal(np.asarray(merged["a"]), np.ones((2, 2)))
    np.testing.assert_array_equal(np.asarray(merged["b"]["c"]), np.zeros(3))
    assert "a" in loaded and "b.c" in skipped and "extra" in skipped


def test_fused_paths_engaged_at_benchmark_shapes():
    """Eligibility gates must hold at the canonical benchmark shapes —
    a refactor that silently drops these to the XLA fallback would tank
    throughput without failing any numerics test."""
    from erfnet_pytorch_tpu.models.erfnet import (_encoder_packed_ok,
                                                  _decoder_packed_ok)
    from erfnet_pytorch_tpu.ops.pallas.nb1d_train import pair_supported
    from erfnet_pytorch_tpu.ops.pallas.head_loss import head_loss_supported
    from erfnet_pytorch_tpu.ops.pallas.head_argmax import (
        head_argmax_supported)
    from erfnet_pytorch_tpu.inference import _eligible, _MAX_MAP_ELEMS
    from erfnet_pytorch_tpu.ops.pallas.nb1d import nb1d_chunk_supported

    # training at batch 6, 512x1024 (the recipe)
    assert _encoder_packed_ok((6, 512, 1024, 3))
    assert _decoder_packed_ok((6, 64, 128, 128))
    assert pair_supported((6, 128, 128, 128))
    assert head_loss_supported(6 * 256 * 64, 128, 32, 20)  # packed head
    # inference at batch 8/16/32, 512x1024 (B=32 is the headline bench —
    # the measured v5e throughput sweet spot with the W-packed head)
    for b in (8, 16, 32):
        # the W-packed grouped head+argmax (G=4p on 128 lanes) must
        # engage — it removed the batch-scaling (M, 16) lane relayout
        assert head_argmax_supported(b * 256 * 64, 128, 32, 20)
        assert head_argmax_supported(b * 256 * 512, 16, 4, 20)
        assert _eligible((b, 64, 128, 128), 1)   # dilated C128 blocks
        assert _eligible((b, 128, 256, 64), 2)   # C64 stages
        assert _eligible((b, 256, 512, 16), 8)   # C16 decoder stages
    # streaming 1024x2048: big-map stages must take the single-call
    # h-blocked halo kernel (chunked multi-call is the deeper fallback)
    from erfnet_pytorch_tpu.ops.pallas.nb1d import nb1d_blocked_supported
    assert nb1d_blocked_supported((1, 512, 1024, 16), 8, 1, _MAX_MAP_ELEMS)
    assert nb1d_blocked_supported((1, 256, 512, 64), 2, 1, _MAX_MAP_ELEMS)
    assert nb1d_blocked_supported((1, 128, 256, 128), 1, 16, _MAX_MAP_ELEMS)
    assert nb1d_chunk_supported((1, 512, 1024, 16), 8, 1, _MAX_MAP_ELEMS)
    assert nb1d_chunk_supported((1, 256, 512, 64), 2, 1, _MAX_MAP_ELEMS)
    # BASELINE config 2: ImageNet variant at 224x224, batch 32 — the
    # packed/fused train blocks must engage at its stage shapes
    assert pair_supported((32, 56, 28, 128))    # C64 stage, W-packed p=2
    assert pair_supported((32, 28, 28, 128))    # dilated C128 stage

    # the packed-tier side-merge (round 4: 1.16x/1.13x per block on-chip,
    # C64_AB_TPU.json) must stay routed: both the inference and train
    # thresholds derive from the one rule owner (ops/packed.py)
    from erfnet_pytorch_tpu.ops.pallas.nb1d import _merge_thrs
    from erfnet_pytorch_tpu.ops.packed import _merge_thrw
    from erfnet_pytorch_tpu.ops.pallas import nb1d_train as T
    assert _merge_thrs(2, 64, 1) == (64, 64)    # C64 tier, both W-convs
    assert _merge_thrs(8, 16, 1) == (16, 16)    # C16 tier
    assert _merge_thrs(1, 128, 16) == (0, 0)    # unpacked C128: no merge
    assert _merge_thrw(2, 64, 2) == 0           # dilation crossing p/2
    assert T.FWD_SIDE_MERGE and T.BWD_SIDE_MERGE  # train merge shipped on
