"""Multi-host DP data path: host-sharded loaders + the (dcn, data) mesh.

SURVEY.md §5 (distributed-backend row) plumbs a DCN axis for multi-host
growth; round 4 gives it a real data path: each host decodes only its
contiguous block of the global batch (``DataLoader(process_index=...)``),
and ``mesh.shard_batch`` assembles global arrays via
``jax.make_array_from_process_local_data`` on real pods.  These tests
simulate a 2-host pod inside one process: the per-host loader blocks must
reassemble bit-for-bit into the single-host batches, and a fused train
step fed through ``mesh.global_batch_from_locals`` on the (dcn=2, data=4)
mesh must reproduce the same step on unsharded input.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from erfnet_pytorch_tpu.data.cityscapes import CityscapesDataset
from erfnet_pytorch_tpu.data.loader import DataLoader
from erfnet_pytorch_tpu.models import erfnet
from erfnet_pytorch_tpu.parallel import spmd
from erfnet_pytorch_tpu.parallel.mesh import (make_mesh_2d,
                                              global_batch_from_locals,
                                              replicate, shard_batch)
from erfnet_pytorch_tpu.training import optim
from erfnet_pytorch_tpu.training.steps import (create_train_state,
                                               make_train_step)
from erfnet_pytorch_tpu.training.class_weights import DECODER_WEIGHTS
from erfnet_pytorch_tpu.ops.pallas.nb1d_train import fused_train


def _loaders(root, *, pc=2, **kw):
    """One single-host loader + pc simulated host loaders, same stream."""
    args = dict(batch_size=6, shuffle=True, seed=3, pad_to=8,
                num_workers=2, **kw)
    ds = CityscapesDataset(root, "train", height=64)
    glob = DataLoader(ds, **args)
    hosts = [DataLoader(ds, process_index=h, process_count=pc, **args)
             for h in range(pc)]
    return glob, hosts


def test_host_sharded_loader_blocks_reassemble(fake_cityscapes):
    """Per-host loader blocks concatenate BIT-EQUAL to the single-host
    padded global batch: same shuffle stream, same pad rows (last valid
    image, VOID labels), global n_valid, partitioned rels."""
    glob, hosts = _loaders(fake_cityscapes)
    for (gi, gl, gr, gn), *locs in zip(glob, *hosts):
        im = np.concatenate([np.asarray(l[0]) for l in locs])
        lb = np.concatenate([np.asarray(l[1]) for l in locs])
        np.testing.assert_array_equal(im, np.asarray(gi))
        np.testing.assert_array_equal(lb, np.asarray(gl))
        assert [l[3] for l in locs] == [gn] * len(locs)  # global n_valid
        assert sum((l[2] for l in locs), []) == gr       # rels partition
        assert im.shape[0] == 8 and gn == 6
        # pad rows: host 1's tail must be voided labels
        assert (lb[gn:] == 255).all()


def test_host_sharded_loader_epochs_stay_aligned(fake_cityscapes):
    """Second epoch (fresh shuffle stream) stays host-aligned too."""
    glob, hosts = _loaders(fake_cityscapes)
    for _ in range(2):
        for (gi, _gl, _gr, _gn), *locs in zip(glob, *hosts):
            im = np.concatenate([np.asarray(l[0]) for l in locs])
            np.testing.assert_array_equal(im, np.asarray(gi))


def test_host_sharded_loader_requires_even_split(fake_cityscapes):
    ds = CityscapesDataset(fake_cityscapes, "train", height=64)
    with pytest.raises(ValueError, match="process_count"):
        DataLoader(ds, 6, process_index=0, process_count=2)
    # an odd padded-batch target cannot split across 2 hosts
    dl = DataLoader(ds, 5, pad_to=5, drop_last=True, process_index=0,
                    process_count=2)
    with pytest.raises(ValueError, match="split across"):
        next(iter(dl))


def test_multihost_2d_mesh_step_matches_unsharded(fake_cityscapes):
    """The fused train step on the (dcn=2, data=4) mesh, fed host-local
    loader blocks assembled via global_batch_from_locals (the exact
    placement jax.make_array_from_process_local_data performs on a real
    2-host pod), reproduces the unsharded single-device step."""
    glob, hosts = _loaders(fake_cityscapes)
    (gi, gl, _gr, gn) = next(iter(glob))
    locs = [next(iter(h)) for h in hosts]
    valid = (np.arange(np.asarray(gi).shape[0]) < gn).astype(np.float32)

    def run(images, labels, vmask, mesh=None):
        tx = optim.make_adam(1e-3)
        ts = create_train_state(erfnet, jax.random.PRNGKey(0), 20, tx)
        with fused_train(True), spmd.pallas_mesh(mesh):
            step = make_train_step(erfnet, tx, DECODER_WEIGHTS, enc=False,
                                   augment=False)
            if mesh is not None:
                ts = replicate(mesh, ts)
                vmask = shard_batch(mesh, vmask)
            ts, loss = step(ts, images, labels, jax.random.PRNGKey(1),
                            vmask)
            return ts, float(jax.block_until_ready(loss))

    ts_ref, loss_ref = run(jnp.asarray(np.asarray(gi)),
                           jnp.asarray(np.asarray(gl)), valid)

    mesh2 = make_mesh_2d(2, 4)
    im_g, lb_g = global_batch_from_locals(
        mesh2, [(np.asarray(l[0]), np.asarray(l[1])) for l in locs])
    assert im_g.shape[0] == 8 and lb_g.shape[0] == 8
    ts_got, loss_got = run(im_g, lb_g, valid, mesh=mesh2)

    assert abs(loss_got - loss_ref) < 1e-4, (loss_got, loss_ref)
    for path in (("decoder", "output_conv", "w"),
                 ("encoder", "initial_block", "conv", "w")):
        a, b = ts_got.params, ts_ref.params
        for k in path:
            a, b = a[k], b[k]
        diff = np.abs(np.asarray(a) - np.asarray(b))
        # bounds as in tests/test_spmd_fused.py: reassociated f32
        # reductions + Adam's lr*sign amplification of noise-level grads
        assert diff.max() < 2.2e-3, f"{path}: {diff.max():.2e}"
        assert diff.mean() < 1e-4, f"{path}: {diff.mean():.2e}"


@pytest.mark.slow
def test_real_two_process_distributed_step(fake_cityscapes, tmp_path):
    """The REAL multi-host branch, executed by two actual jax.distributed
    processes (VERDICT r4 #1) — not the single-process twin: each worker
    (scripts/multihost_worker.py, 4 virtual CPU devices, gloo
    collectives) builds a defaulted-process DataLoader whose producer
    runs jax.make_array_from_process_local_data (data/loader.py), shards
    its valid-mask block through mesh.shard_batch's multi-process path,
    and runs one (dcn=2, data=4) train step with cross-process grad/BN
    reductions.  Asserts: both hosts return the identical loss and
    bit-identical updated params, and the loss matches this process's
    single-device unsharded step on the same batch."""
    import json
    import os
    import socket
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    outs = [str(tmp_path / f"host{i}.json") for i in range(2)]
    # worker output goes to FILES, not pipes: a worker blocked on a full
    # un-drained pipe inside a gloo collective would deadlock its peer
    logf = [open(tmp_path / f"host{i}.log", "w+") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(repo, "scripts", "multihost_worker.py"),
         "--root", fake_cityscapes, "--port", str(port), "--pid", str(i),
         "--out", outs[i]],
        env=env, cwd=repo, stdout=logf[i], stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    try:
        for p in procs:
            p.wait(timeout=900)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    logs = []
    for f in logf:
        f.seek(0)
        logs.append(f.read())
        f.close()
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    res = []
    for o in outs:
        with open(o) as f:
            res.append(json.load(f))

    r0, r1 = sorted(res, key=lambda r: r["pid"])
    assert r0["process_count"] == r1["process_count"] == 2
    assert r0["global_devices"] == r1["global_devices"] == 8
    assert r0["n_valid"] == r1["n_valid"] == 6
    # host 0 decodes rows 0..3, host 1 rows 4..5 + 2 pad-source copies
    assert r0["local_rels"] == 4 and r1["local_rels"] == 2
    # replicated results agree across hosts bit-for-bit
    assert r0["loss"] == r1["loss"]
    assert r0["digest_head"] == r1["digest_head"]
    assert r0["digest_stem"] == r1["digest_stem"]

    # single-process unsharded reference on the same global batch
    ds = CityscapesDataset(fake_cityscapes, "train", height=64)
    dl = DataLoader(ds, 6, shuffle=True, seed=3, pad_to=8, num_workers=2)
    images, labels, _rels, n_valid = next(iter(dl))
    assert int(n_valid) == 6
    tx = optim.make_adam(1e-3)
    ts = create_train_state(erfnet, jax.random.PRNGKey(0), 20, tx)
    step = make_train_step(erfnet, tx, DECODER_WEIGHTS, enc=False,
                           augment=False)
    valid = jnp.asarray(
        (np.arange(8) < int(n_valid)).astype(np.float32))
    _ts, loss_ref = step(ts, jnp.asarray(images), jnp.asarray(labels),
                         jax.random.PRNGKey(1), valid)
    assert abs(r0["loss"] - float(loss_ref)) < 1e-4, \
        (r0["loss"], float(loss_ref))
