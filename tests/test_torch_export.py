"""Torch-direction weight export (utils/torch_import.py export half).

The reference consumes torch state_dicts everywhere (eval_iou.py /
train/main.py load_my_state_dict, the stage-2 --pretrainedEncoder .tar —
SURVEY.md §2a rows 11/12/19); exporting our pytrees in its exact key
layout makes the mIoU parity gate bidirectional: the reference's own
eval can run on weights trained here.  Tests pin (a) import(export(x))
bit-equality, (b) strict torch load_state_dict acceptance, (c) the torch
oracle forward on exported weights matching ours."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from erfnet_pytorch_tpu.models import erfnet, erfnet_imagenet
from erfnet_pytorch_tpu.utils import torch_import

import torch_oracle as oracle


def _trees_bit_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert len(la) == len(lb)
    for (pa, va), (pb, vb) in zip(la, lb):
        assert pa == pb
        assert np.array_equal(np.asarray(va), np.asarray(vb)), pa


def test_net_export_import_roundtrip_bit_equal():
    params, state = erfnet.init(jax.random.PRNGKey(0), 20)
    sd = torch_import.net_to_state_dict(params, state)
    params2, state2 = torch_import.net_from_state_dict(sd)
    _trees_bit_equal(params, params2)
    _trees_bit_equal(state, state2)


def test_exported_net_strict_torch_load_and_forward(tmp_path):
    params, state = erfnet.init(jax.random.PRNGKey(1), 20)
    path = tmp_path / "model_best.pth"
    torch_import.save_torch_net(path, params, state)

    tmodel = oracle.Net(20)
    missing_unexpected = tmodel.load_state_dict(
        torch.load(path, map_location="cpu", weights_only=False),
        strict=True)
    assert not missing_unexpected.missing_keys
    assert not missing_unexpected.unexpected_keys
    tmodel.eval()

    x = np.random.RandomState(3).rand(2, 3, 64, 128).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    got, _ = erfnet.apply(params, state,
                          jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)
    assert (got.argmax(1) == ref.argmax(1)).mean() > 0.999


def test_exported_net_module_prefix_reimports(tmp_path):
    """module_prefix=True mimics a DataParallel save; our importer strips
    it (the reference's load_my_state_dict tolerance)."""
    params, state = erfnet.init(jax.random.PRNGKey(2), 20)
    path = tmp_path / "checkpoint.pth"
    torch_import.save_torch_net(path, params, state, module_prefix=True)
    raw = torch.load(path, map_location="cpu", weights_only=False)
    assert all(k.startswith("module.") for k in raw)
    params2, state2 = torch_import.net_from_state_dict(
        torch_import.load_torch_state_dict(path))
    _trees_bit_equal(params, params2)
    _trees_bit_equal(state, state2)


def test_imagenet_tar_container_and_handoff(tmp_path):
    """save_torch_encoder_tar writes the imagenet save_checkpoint container
    ({epoch, arch, state_dict(module.*), best_prec1, optimizer}) and our
    stage-2 handoff loader recovers the encoder bit-equal."""
    params, state = erfnet_imagenet.init(jax.random.PRNGKey(4), 100)
    path = tmp_path / "erfnet_encoder.pth.tar"
    torch_import.save_torch_encoder_tar(path, params, state, epoch=7,
                                        best_prec1=41.5)
    obj = torch.load(path, map_location="cpu", weights_only=False)
    assert obj["epoch"] == 7 and obj["best_prec1"] == 41.5
    assert "optimizer" in obj and obj["arch"] == "erfnet_imagenet"
    assert all(k.startswith("module.") for k in obj["state_dict"])

    ep, es = torch_import.load_pretrained_encoder(path)
    _trees_bit_equal(params["features"]["encoder"], ep)
    _trees_bit_equal(state["features"]["encoder"], es)

    # strict torch load + oracle forward on the exported weights
    tmodel = oracle.ERFNetImageNet(100)
    sd = {k[len("module."):]: v for k, v in obj["state_dict"].items()}
    res = tmodel.load_state_dict(sd, strict=True)
    assert not res.missing_keys and not res.unexpected_keys
    tmodel.eval()
    x = np.random.RandomState(5).rand(2, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    got, _ = erfnet_imagenet.apply(
        params, state, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-3)
