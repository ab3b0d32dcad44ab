"""Import shim: torch ``.pth`` / ``.pth.tar`` checkpoints -> our pytrees.

The reference ships ``trained_models/erfnet_pretrained.pth`` (full model) and
``erfnet_encoder_pretrained.pth.tar`` (ImageNet encoder) and its loaders
tolerate ``module.`` DataParallel prefixes and missing keys
(``load_my_state_dict`` in train/main.py and eval/eval_iou.py — SURVEY.md
§2a rows 12, 14).  This shim reproduces that tolerance while converting:

  * Conv2d weight (O, I, kh, kw)         -> HWIO (kh, kw, I, O)
  * ConvTranspose2d weight (I, O, kh, kw)-> forward-conv HWIO: spatial flip,
                                            then (kh, kw, I, O)
  * BatchNorm weight/bias                -> scale/bias params
  * BatchNorm running_mean/var           -> batch_stats state
  * Linear weight (O, I)                 -> (I, O)

torch-cpu is only imported lazily — the framework itself never depends on it.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp

from ..models.erfnet import ENCODER_LAYER_SPECS, DECODER_LAYER_SPECS
from ..models.erfnet_imagenet import IMAGENET_ENCODER_LAYER_SPECS


def load_torch_state_dict(path) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into {name: np.ndarray}, unwrapping
    {'state_dict': ...} containers and stripping 'module.' prefixes."""
    import torch  # lazy; CPU build

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


def state_dict_from_module(module) -> Dict[str, np.ndarray]:
    """Test helper: torch nn.Module -> {name: np.ndarray}.

    COPIES each tensor: ``.numpy()`` alone returns a view of the live
    torch storage, and ``jnp.asarray`` on CPU is zero-copy — without the
    copy, jax arrays alias the module's parameters/BN buffers, and a torch
    forward/optimizer step mutates them WHILE asynchronously-dispatched
    jax computations still read them (observed: doubled BN running stats,
    nondeterministic losses in side-by-side parity tests)."""
    return {k: v.detach().cpu().numpy().copy()
            for k, v in module.state_dict().items()}


# ---------------------------------------------------------------------------
# name-keyed conversion
# ---------------------------------------------------------------------------

def _conv(sd, prefix):
    p = {"w": jnp.asarray(sd[prefix + ".weight"].transpose(2, 3, 1, 0))}
    if prefix + ".bias" in sd:
        p["b"] = jnp.asarray(sd[prefix + ".bias"])
    return p


def _convT(sd, prefix):
    w = sd[prefix + ".weight"][:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
    p = {"w": jnp.asarray(np.ascontiguousarray(w))}
    if prefix + ".bias" in sd:
        p["b"] = jnp.asarray(sd[prefix + ".bias"])
    return p


def _bn(sd, prefix):
    params = {"scale": jnp.asarray(sd[prefix + ".weight"]),
              "bias": jnp.asarray(sd[prefix + ".bias"])}
    state = {"mean": jnp.asarray(sd[prefix + ".running_mean"]),
             "var": jnp.asarray(sd[prefix + ".running_var"])}
    return params, state


def _down(sd, prefix):
    bnp, bns = _bn(sd, prefix + ".bn")
    return ({"conv": _conv(sd, prefix + ".conv"), "bn": bnp}, {"bn": bns})


def _nb1d(sd, prefix):
    bn1p, bn1s = _bn(sd, prefix + ".bn1")
    bn2p, bn2s = _bn(sd, prefix + ".bn2")
    p = {"conv3x1_1": _conv(sd, prefix + ".conv3x1_1"),
         "conv1x3_1": _conv(sd, prefix + ".conv1x3_1"),
         "conv3x1_2": _conv(sd, prefix + ".conv3x1_2"),
         "conv1x3_2": _conv(sd, prefix + ".conv1x3_2"),
         "bn1": bn1p, "bn2": bn2p}
    return p, {"bn1": bn1s, "bn2": bn2s}


def _up(sd, prefix):
    bnp, bns = _bn(sd, prefix + ".bn")
    return ({"conv": _convT(sd, prefix + ".conv"), "bn": bnp}, {"bn": bns})


def _layers(sd, prefix, specs):
    params, state = [], []
    for i, (kind, _args) in enumerate(specs):
        fn = {"down": _down, "nb1d": _nb1d, "up": _up}[kind]
        p, s = fn(sd, f"{prefix}.{i}")
        params.append(p)
        state.append(s)
    return params, state


def encoder_from_state_dict(sd, prefix="encoder",
                            specs=ENCODER_LAYER_SPECS,
                            with_head=True) -> Tuple[dict, dict]:
    ip, is_ = _down(sd, prefix + ".initial_block")
    lp, ls = _layers(sd, prefix + ".layers", specs)
    params = {"initial_block": ip, "layers": lp}
    if with_head and prefix + ".output_conv.weight" in sd:
        params["output_conv"] = _conv(sd, prefix + ".output_conv")
    return params, {"initial_block": is_, "layers": ls}


def net_from_state_dict(sd) -> Tuple[dict, dict]:
    """Full segmentation Net (erfnet_pretrained.pth layout)."""
    ep, es = encoder_from_state_dict(sd, "encoder")
    dp, dstate = _layers(sd, "decoder.layers", DECODER_LAYER_SPECS)
    decoder = {"layers": dp, "output_conv": _convT(sd, "decoder.output_conv")}
    return ({"encoder": ep, "decoder": decoder},
            {"encoder": es, "decoder": {"layers": dstate}})


def imagenet_from_state_dict(sd) -> Tuple[dict, dict]:
    """ImageNet classifier (erfnet_encoder_pretrained.pth.tar layout):
    features.encoder.* + classifier.*  (Linear weight (O,I) -> (I,O))."""
    ep, es = encoder_from_state_dict(sd, "features.encoder",
                                     IMAGENET_ENCODER_LAYER_SPECS,
                                     with_head=False)
    lin_w = None
    for key in ("classifier.weight", "classifier.linear.weight"):
        if key in sd:
            lin_w = key
    params = {"features": {"encoder": ep}}
    if lin_w is not None:
        base = lin_w.rsplit(".weight", 1)[0]
        params["classifier"] = {"linear": {
            "w": jnp.asarray(sd[base + ".weight"].transpose(1, 0)),
            "b": jnp.asarray(sd[base + ".bias"]),
        }}
    return params, {"features": {"encoder": es}}


def load_net(path):
    """erfnet_pretrained.pth -> (params, batch_stats)."""
    return net_from_state_dict(load_torch_state_dict(path))


def load_pretrained_encoder(path):
    """erfnet_encoder_pretrained.pth.tar -> encoder (params, batch_stats)
    ready to pass to models.erfnet.init(key, C, encoder=...) — reproduces
    the reference's ``.features.encoder`` handoff path."""
    p, s = imagenet_from_state_dict(load_torch_state_dict(path))
    return p["features"]["encoder"], s["features"]["encoder"]


# ---------------------------------------------------------------------------
# torch-direction EXPORT (the exact inverse mapping)
#
# The reference's eval scripts load torch state_dicts
# (eval/eval_iou.py:load_my_state_dict, train/main.py stage-2 handoff —
# SURVEY.md §2a rows 11/12/14/19).  Exporting OUR pytrees in the
# reference's key layout makes the parity gate bidirectional: the moment
# a dataset/checkpoint mount appears, the reference's own eval can be
# run on weights trained by this framework.
# ---------------------------------------------------------------------------

def _conv_to(out, prefix, p):
    out[prefix + ".weight"] = np.ascontiguousarray(
        np.asarray(p["w"]).transpose(3, 2, 0, 1))      # HWIO -> (O, I, kh, kw)
    if "b" in p:
        out[prefix + ".bias"] = np.asarray(p["b"])


def _convT_to(out, prefix, p):
    # inverse of _convT: HWIO (flipped) -> (I, O, kh, kw), unflip spatial
    w = np.asarray(p["w"]).transpose(2, 3, 0, 1)[:, :, ::-1, ::-1]
    out[prefix + ".weight"] = np.ascontiguousarray(w)
    if "b" in p:
        out[prefix + ".bias"] = np.asarray(p["b"])


def _bn_to(out, prefix, params, state):
    out[prefix + ".weight"] = np.asarray(params["scale"])
    out[prefix + ".bias"] = np.asarray(params["bias"])
    out[prefix + ".running_mean"] = np.asarray(state["mean"])
    out[prefix + ".running_var"] = np.asarray(state["var"])
    # torch BN buffers include num_batches_tracked; the reference's
    # name-tolerant loaders ignore it, strict torch load_state_dict needs it
    out[prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)


def _down_to(out, prefix, p, s):
    _conv_to(out, prefix + ".conv", p["conv"])
    _bn_to(out, prefix + ".bn", p["bn"], s["bn"])


def _nb1d_to(out, prefix, p, s):
    for name in ("conv3x1_1", "conv1x3_1", "conv3x1_2", "conv1x3_2"):
        _conv_to(out, f"{prefix}.{name}", p[name])
    _bn_to(out, prefix + ".bn1", p["bn1"], s["bn1"])
    _bn_to(out, prefix + ".bn2", p["bn2"], s["bn2"])


def _up_to(out, prefix, p, s):
    _convT_to(out, prefix + ".conv", p["conv"])
    _bn_to(out, prefix + ".bn", p["bn"], s["bn"])


def _layers_to(out, prefix, specs, params, state):
    for i, (kind, _args) in enumerate(specs):
        fn = {"down": _down_to, "nb1d": _nb1d_to, "up": _up_to}[kind]
        fn(out, f"{prefix}.{i}", params[i], state[i])


def encoder_to_state_dict(params, state, prefix="encoder",
                          specs=ENCODER_LAYER_SPECS,
                          out=None) -> Dict[str, np.ndarray]:
    out = {} if out is None else out
    _down_to(out, prefix + ".initial_block", params["initial_block"],
             state["initial_block"])
    _layers_to(out, prefix + ".layers", specs, params["layers"],
               state["layers"])
    if "output_conv" in params:
        _conv_to(out, prefix + ".output_conv", params["output_conv"])
    return out


def net_to_state_dict(params, state) -> Dict[str, np.ndarray]:
    """Full segmentation Net pytrees -> the erfnet_pretrained.pth flat
    key layout (inverse of net_from_state_dict)."""
    out = encoder_to_state_dict(params["encoder"], state["encoder"])
    _layers_to(out, "decoder.layers", DECODER_LAYER_SPECS,
               params["decoder"]["layers"], state["decoder"]["layers"])
    _convT_to(out, "decoder.output_conv", params["decoder"]["output_conv"])
    return out


def imagenet_to_state_dict(params, state) -> Dict[str, np.ndarray]:
    """ImageNet classifier pytrees -> features.encoder.* + classifier.*
    (inverse of imagenet_from_state_dict)."""
    out = encoder_to_state_dict(params["features"]["encoder"],
                                state["features"]["encoder"],
                                prefix="features.encoder",
                                specs=IMAGENET_ENCODER_LAYER_SPECS)
    if "classifier" in params:
        lin = params["classifier"]["linear"]
        out["classifier.weight"] = np.ascontiguousarray(
            np.asarray(lin["w"]).transpose(1, 0))      # (I, O) -> (O, I)
        out["classifier.bias"] = np.asarray(lin["b"])
    return out


def _to_torch_sd(sd: Dict[str, np.ndarray], module_prefix: bool):
    import torch  # lazy; CPU build

    pre = "module." if module_prefix else ""
    # copy: np views of jax buffers are non-writable; torch tensors that
    # alias them would warn (and could not be mutated by a torch optimizer)
    return {pre + k: torch.from_numpy(np.array(v))
            for k, v in sd.items()}


def save_torch_net(path, params, state, *, module_prefix: bool = False):
    """torch.save OUR segmentation pytrees as a bare state_dict — the
    reference's model_best.pth / model.pth artifact shape (torch.save of
    ``model.state_dict()``; ``module_prefix=True`` mimics saving under
    DataParallel).  Loadable by eval/eval_iou.py's load_my_state_dict."""
    import torch

    torch.save(_to_torch_sd(net_to_state_dict(params, state),
                            module_prefix), path)


def save_torch_encoder_tar(path, params, state, *, epoch: int = 0,
                           best_prec1: float = 0.0,
                           arch: str = "erfnet_imagenet"):
    """torch.save OUR ImageNet-classifier pytrees in the
    erfnet_encoder_pretrained.pth.tar container layout
    (imagenet/main.py:save_checkpoint — SURVEY.md §2a row 18:
    ``{epoch, arch, state_dict, best_prec1, optimizer}`` with the
    DataParallel ``module.`` prefix on every key), consumable by the
    reference's stage-2 ``--pretrainedEncoder`` path and by our own
    load_pretrained_encoder."""
    import torch

    torch.save({
        "epoch": int(epoch),
        "arch": arch,
        "state_dict": _to_torch_sd(imagenet_to_state_dict(params, state),
                                   module_prefix=True),
        "best_prec1": float(best_prec1),
        "optimizer": {},
    }, path)
