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
