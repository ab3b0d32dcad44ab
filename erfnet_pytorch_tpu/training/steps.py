"""Jitted train / eval steps for the segmentation recipe.

One compiled function owns the whole hot path (SURVEY.md §3.1 hot loop):
on-device co-transform augmentation -> forward (train-mode BN) -> weighted
NLL -> backward -> Adam update -> (optional) argmax for train IoU.  Under a
data-sharded mesh the same function is the multi-chip step: batch-axis
reductions (loss mean, grads via AD of the mean, BN batch stats) become ICI
collectives inserted by XLA.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..ops.argmax import fast_argmax
from ..ops.loss import weighted_log_softmax_nll
from ..ops.augment import co_transform, co_transform_shifts
from ..data.transforms import to_tensor


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


class FlatState(NamedTuple):
    """Train-loop carry with params raveled into ONE flat f32 vector.

    Rationale (CLAUDE.md perf notes): the chip charges ~20-30 us of fixed
    overhead per XLA op, and per-leaf Adam over ERFNet's 228 param tensors
    is ~230+ small kernels.  Carrying the params flat makes the optimizer
    ~4 vector ops total (grads: one concat via ravel_pytree; update: fused
    elementwise on the 2M-element vector), while the unravel slices at step
    start fuse into the weight preprocessing (bf16 casts / tap stacking)
    the forward already does.  Tree<->flat conversion happens once per
    epoch boundary (checkpoint/eval), not per step.
    """
    flat_params: jnp.ndarray
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(model, rng, num_classes, optimizer, encoder=None):
    if encoder is not None:
        params, batch_stats = model.init(rng, num_classes, encoder=encoder)
    else:
        params, batch_stats = model.init(rng, num_classes)
    opt_state = optimizer.init(params)
    return TrainState(params, batch_stats, opt_state,
                      jnp.zeros((), jnp.int32))


def make_train_step(model, optimizer, class_weights, *, enc: bool,
                    augment: bool = True, compute_dtype=None,
                    with_pred: bool = False, flat: bool = False,
                    multi_step: int = 1):
    """Returns step(ts, images, labels, rng) -> (ts, loss[, preds, labels]).

    images: (B, H, W, 3) float in [0,1], or raw uint8 (the loader's
    image_dtype='uint8' form — normalized on-device to within 1 ulp of
    the f32 values, see data.transforms.to_tensor); labels: (B, H, W)
    int32 raw-void (255); augmentation + relabel + (enc) x8 label
    downsample happen inside.

    When the fused Pallas train kernels are enabled and train-IoU preds are
    not requested, the prediction head + weighted NLL run as one fused
    kernel on pre-head features (full-resolution logits never touch HBM —
    ops/pallas/head_loss.py).

    flat=True: the step carries a :class:`FlatState` (params + Adam moments
    raveled into single vectors) so the optimizer is a handful of fused
    vector ops instead of ~230 per-leaf kernels.  Convert with the attached
    ``step.flatten(ts) -> FlatState`` / ``step.unflatten(fts) -> TrainState``
    (``flatten`` must be called once before the first step).

    multi_step=K (flat mode, no preds): ONE dispatch runs K optimizer
    steps UNROLLED over K per-step batches passed as tuples
    (``step(fts, (im1..imK), (lb1..lbK), rng) -> (fts, losses (K,))``),
    amortizing the fixed per-dispatch overhead (~2.5 ms host RTT on this
    chip) and letting XLA schedule across steps.  Tuples, not stacked
    arrays, so per-batch shardings are preserved under a DP mesh.  The
    RNG folds the on-device step counter, so the random stream matches K
    separate dispatches.  Measured: 30.0 -> 28.0 (in-kernel BN stats) ->
    25.0 ms/step at K=2 on v5e (a lax.scan formulation measured 39.1 —
    scan's carry handling costs more than the dispatch it amortizes).
    """
    import inspect

    assert multi_step == 1 or flat, "multi_step > 1 requires flat=True"
    cw = jnp.asarray(class_weights)
    ncls = int(cw.shape[0])
    head_op = None
    if (not with_pred
            and "skip_head" in inspect.signature(model.apply).parameters):
        from ..ops.pallas.head_loss import make_head_loss
        head_op = make_head_loss(cw, n_classes=ncls, G=1 if enc else 4)

    def fused_head_loss(params, feats, labels):
        from ..ops.pallas.head_loss import (pack_labels_2x2,
                                            pack_labels_packed,
                                            head_loss_supported,
                                            make_head_loss)
        K = feats.shape[-1]
        if enc:
            w = params["encoder"]["output_conv"]
            num, den = head_op(feats.reshape(-1, K), w["w"][0, 0],
                               w["b"].astype(jnp.float32),
                               labels.reshape(-1, 1))
        else:
            from ..ops.convt_mm import (build_head_matmul,
                                        expand_head_matmul_packed)
            w = params["decoder"]["output_conv"]
            Wm, bm = build_head_matmul(w["w"], w["b"])
            if K == 128:
                # W-packed decoder feats (B, H, W/8, 8*16): run the head
                # +loss in the packed 128-lane layout — the native (M, 16)
                # view is lane-padded 8x and cost ~1 ms/step in relayouts
                B, H4, Wb, _ = feats.shape
                p = K // 16
                Mp = B * H4 * Wb
                if head_loss_supported(Mp, K, 4 * p, ncls):
                    op = make_head_loss(cw, n_classes=ncls, G=4 * p)
                    Wp, bp = expand_head_matmul_packed(Wm, bm, p)
                    num, den = op(feats.reshape(Mp, K), Wp, bp,
                                  pack_labels_packed(labels, p))
                    return num / jnp.maximum(den, 1e-12)
                feats = feats.reshape(B, H4, Wb * p, 16)
                K = 16
            num, den = head_op(feats.reshape(-1, K), Wm, bm,
                               pack_labels_2x2(labels))
        return num / jnp.maximum(den, 1e-12)

    def freeze_unused(updates):
        """Reference parity: in full-net (stage-2) training the encoder's
        1x1 prediction head never receives gradients — torch's Adam skips
        ``grad is None`` params entirely, so the reference neither updates
        NOR weight-decays it (train/main.py stage 2).  optax's
        add_decayed_weights would otherwise decay it to zero."""
        if enc or "encoder" not in updates \
                or "output_conv" not in updates["encoder"]:
            return updates
        head = jax.tree_util.tree_map(jnp.zeros_like,
                                      updates["encoder"]["output_conv"])
        return {**updates,
                "encoder": {**updates["encoder"], "output_conv": head}}

    # models that support exact DP-pad masking of BN batch statistics
    # take a `valid` kwarg (erfnet.apply); pass it through only then
    model_takes_valid = "valid" in inspect.signature(
        model.apply).parameters
    # models that can fold the per-sample image translate into their stem
    # kernel take `aug_shift` (erfnet.apply); with it the step uses
    # co_transform_shifts — flip + label aug in XLA, image translate and
    # compute-dtype cast inside the first downsampler kernel (bit-equal)
    model_takes_aug = augment and "aug_shift" in inspect.signature(
        model.apply).parameters

    def transform(rng, images, labels):
        # raw uint8 loader frames (data/loader.py image_dtype='uint8', 4x
        # less H2D) normalize here to EXACTLY the f32 pipeline's values
        # (u8/255 is exact in f32); float inputs pass through untouched
        images = to_tensor(images)
        if model_takes_aug:
            return co_transform_shifts(rng, images, labels, enc=enc)
        images, labels = co_transform(rng, images, labels, enc=enc,
                                      augment=augment)
        return images, labels, None

    def loss_fn(params, batch_stats, images, labels, rng, valid=None,
                aug_shift=None):
        from ..ops.pallas.head_loss import head_loss_supported
        from ..ops.pallas.nb1d_train import fused_train_enabled
        B = images.shape[0]
        vkw = {"valid": valid} if model_takes_valid else {}
        if aug_shift is not None:
            vkw["aug_shift"] = aug_shift
        fh, fw = images.shape[1] // (8 if enc else 1), \
            images.shape[2] // (8 if enc else 1)
        use_fused = (head_op is not None and fused_train_enabled()
                     and head_loss_supported(
                         B * (fh // (1 if enc else 2))
                         * (fw // (1 if enc else 2)),
                         128 if enc else 16, 1 if enc else 4, ncls))
        if use_fused:
            feats, new_stats = model.apply(
                params, batch_stats, images, train=True,
                rng=jax.random.fold_in(rng, 1), only_encode=enc,
                compute_dtype=compute_dtype, skip_head=True,
                keep_packed_feats=not enc, **vkw)
            return fused_head_loss(params, feats, labels), (new_stats, None)
        logits, new_stats = model.apply(
            params, batch_stats, images, train=True,
            rng=jax.random.fold_in(rng, 1), only_encode=enc,
            compute_dtype=compute_dtype, **vkw)
        loss = weighted_log_softmax_nll(logits, labels, cw)
        return loss, (new_stats, logits)

    if not flat:
        @jax.jit
        def step(ts: TrainState, images, labels, rng, valid=None):
            # fold the step counter in ON DEVICE: callers pass one constant
            # base key (a host-side per-step fold_in costs a dispatch RTT)
            rng = jax.random.fold_in(rng, ts.step)
            images, labels, shifts = transform(jax.random.fold_in(rng, 0),
                                               images, labels)
            (loss, (new_stats, logits)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(ts.params, ts.batch_stats, images,
                                       labels, rng, valid, shifts)
            updates, opt_state = optimizer.update(grads, ts.opt_state,
                                                  ts.params)
            params = optax.apply_updates(ts.params, freeze_unused(updates))
            new_ts = TrainState(params, new_stats, opt_state, ts.step + 1)
            if with_pred:
                return new_ts, loss, fast_argmax(logits), labels
            return new_ts, loss

        return step

    # ---- flat-carry mode ----
    from jax.flatten_util import ravel_pytree

    cell: Dict[str, Any] = {}

    def flatten(ts: TrainState) -> FlatState:
        flat_params, unravel = ravel_pytree(ts.params)
        pdef = jax.tree_util.tree_structure(ts.params)

        def is_ptree(x):
            return jax.tree_util.tree_structure(x) == pdef

        opt_state = jax.tree_util.tree_map(
            lambda x: ravel_pytree(x)[0] if is_ptree(x) else x,
            ts.opt_state, is_leaf=is_ptree)
        cell["unravel"] = unravel
        # record WHICH opt-state leaves were raveled so unflatten is an
        # exact inverse (a size heuristic would mis-fire on any future
        # optax component storing a coincidentally param-count-long vector)
        cell["raveled"] = jax.tree_util.tree_map(is_ptree, ts.opt_state,
                                                 is_leaf=is_ptree)
        # flat view of freeze_unused: 0.0 over the unused encoder head
        ones = jax.tree_util.tree_map(jnp.ones_like, ts.params)
        masked = freeze_unused(ones)
        cell["mask"] = (None if masked is ones
                        else ravel_pytree(masked)[0])
        return FlatState(flat_params, ts.batch_stats, opt_state, ts.step)

    def unflatten(fts: FlatState) -> TrainState:
        unravel = cell["unravel"]
        opt_state = jax.tree_util.tree_map(
            lambda x, r: unravel(x) if r else x,
            fts.opt_state, cell["raveled"])
        return TrainState(unravel(fts.flat_params), fts.batch_stats,
                          opt_state, fts.step)

    def flat_body(fts: FlatState, images, labels, rng, valid=None):
        unravel = cell["unravel"]  # trace-time constant (set by flatten())
        rng = jax.random.fold_in(rng, fts.step)
        images, labels, shifts = transform(jax.random.fold_in(rng, 0),
                                           images, labels)
        params = unravel(fts.flat_params)
        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, fts.batch_stats, images, labels,
                                   rng, valid, shifts)
        flat_grads = ravel_pytree(grads)[0]  # one concat (same leaf order)
        updates, opt_state = optimizer.update(flat_grads, fts.opt_state,
                                              fts.flat_params)
        if cell["mask"] is not None:
            updates = updates * cell["mask"]
        flat_params = optax.apply_updates(fts.flat_params, updates)
        new_fts = FlatState(flat_params, new_stats, opt_state, fts.step + 1)
        if with_pred:
            return new_fts, loss, fast_argmax(logits), labels
        return new_fts, loss

    # donate the carry: params/moments/BN stats alias into the step's
    # outputs, letting XLA update in place instead of copying (callers
    # always rebind the returned state, never reuse the argument)
    if multi_step > 1:
        assert not with_pred, "multi_step is for the no-pred hot loop"

        # UNROLLED, not lax.scan: scan's carry handling (no donation into
        # the loop body, worse cross-iteration async scheduling) measured
        # 39.1 ms/step at K=4 vs 30.0 eager on this chip; the unrolled
        # body keeps in-place updates and lets XLA schedule across steps,
        # so one dispatch amortizes the fixed per-dispatch overhead.
        # Compile time scales ~K-fold — keep K small.
        @functools.partial(jax.jit, donate_argnums=(0,))
        def flat_step(fts: FlatState, images, labels, rng, valid=None):
            losses = []
            for i, (im, lb) in enumerate(zip(images, labels)):
                fts, loss = flat_body(fts, im, lb, rng,
                                      None if valid is None else valid[i])
                losses.append(loss)
            return fts, jnp.stack(losses)
    else:
        flat_step = jax.jit(flat_body, donate_argnums=(0,))

    class _FlatStep:
        """Callable step carrying the tree<->flat converters.

        valid: optional (B,) 0/1 mask (tuple of masks at multi_step>1)
        excluding DP batch-pad rows from the BN statistics — pass it
        consistently (always or never) per step instance to avoid a
        second compile."""

        def __call__(self, fts, images, labels, rng, valid=None):
            return flat_step(fts, images, labels, rng, valid)

    fs = _FlatStep()
    # attached on the instance: a class body can't close over function locals
    fs.flatten = flatten
    fs.unflatten = unflatten
    return fs


def make_eval_step(model, class_weights, *, enc: bool, compute_dtype=None):
    """Returns eval_step(ts, images, labels) -> (loss, preds, labels):
    eval-mode BN, no augmentation, labels relabeled (and enc-downsampled).

    On an accelerator the head + loss + argmax run as fused kernels on the
    pre-head features (ops/pallas/head_loss.py fwd + head_argmax.py) —
    materializing full-resolution logits and arg-maxing their lane-padded
    layout measured ~15 ms/batch in the XLA form."""
    import inspect

    cw = jnp.asarray(class_weights)
    ncls = int(cw.shape[0])
    has_skip = "skip_head" in inspect.signature(model.apply).parameters

    @jax.jit
    def eval_step(ts: TrainState, images, labels):
        from ..ops.pallas.head_loss import (make_head_loss,
                                            head_loss_supported,
                                            pack_labels_2x2)
        from ..ops.pallas.head_argmax import (head_argmax,
                                              head_argmax_supported,
                                              depth_to_space_planes)
        from ..ops.pallas.nb1d_train import fused_train_enabled
        images, labels = co_transform(jax.random.PRNGKey(0),
                                      to_tensor(images), labels,
                                      enc=enc, augment=False)
        G = 1 if enc else 4
        M = labels.size if enc else labels.size // 4
        use_fused = (has_skip and fused_train_enabled()
                     and head_loss_supported(M, 128 if enc else 16, G, ncls)
                     and head_argmax_supported(M, 128 if enc else 16, G,
                                               ncls))
        if use_fused:
            feats, _ = model.apply(ts.params, ts.batch_stats, images,
                                   train=False, only_encode=enc,
                                   compute_dtype=compute_dtype,
                                   skip_head=True)
            if enc:
                w = ts.params["encoder"]["output_conv"]
                Wm, bm = w["w"][0, 0], w["b"].astype(jnp.float32)
                lab_packed = labels.reshape(-1, 1)
            else:
                from ..ops.convt_mm import build_head_matmul
                w = ts.params["decoder"]["output_conv"]
                Wm, bm = build_head_matmul(w["w"], w["b"])
                lab_packed = pack_labels_2x2(labels)
            f2 = feats.reshape(-1, feats.shape[-1])
            num, den = make_head_loss(cw, n_classes=ncls, G=G)(
                f2, Wm, bm, lab_packed)
            loss = num / jnp.maximum(den, 1e-12)
            idx = head_argmax(f2, Wm, bm, G=G, n_classes=ncls)
            if enc:
                preds = idx.reshape(labels.shape)
            else:
                fB, fH, fW, _ = feats.shape
                preds = depth_to_space_planes(idx, fB, fH, fW)
            return loss, preds, labels
        logits, _ = model.apply(ts.params, ts.batch_stats, images,
                                train=False, only_encode=enc,
                                compute_dtype=compute_dtype)
        loss = weighted_log_softmax_nll(logits, labels, cw)
        return loss, fast_argmax(logits), labels

    return eval_step


def make_infer_fn(model, *, compute_dtype=None, encoder_layer_fn=None):
    """Pure inference: images -> (logits, argmax). Used by the eval CLIs and
    the forward-time benchmark."""

    @jax.jit
    def infer(params, batch_stats, images):
        logits, _ = model.apply(params, batch_stats, to_tensor(images),
                                train=False, compute_dtype=compute_dtype,
                                encoder_layer_fn=encoder_layer_fn)
        return logits, fast_argmax(logits)

    return infer
