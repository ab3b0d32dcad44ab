"""Checkpoint / resume with the reference's file-name and stage semantics
(train/main.py:save_checkpoint + resume block — SURVEY.md §2a row 11, §5):

  * every epoch   -> ``checkpoint.pth.tar`` (or ``checkpoint_enc.pth.tar``)
  * best so far   -> ``model_best.pth`` (+ ``model_best_enc.pth.tar``)
                     and a ``best.txt`` breadcrumb
  * optional      -> ``model-{epoch:03}.pth`` every ``--epochs-save``
  * payload: {epoch, arch, params, batch_stats, opt_state, best_acc}

The payload is a flax-msgpack pytree (not a torch pickle) — TPU-native
checkpointing with the reference's *semantics*.  Shipped torch ``.pth``
files import through utils/torch_import.py instead.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint_file(path: str, *, epoch: int, arch: str, params,
                         batch_stats, opt_state, best_acc: float,
                         step: int = 0):
    payload = {
        "epoch": epoch,
        "step": int(step),
        "arch": arch,
        "params": _to_host(params),
        "batch_stats": _to_host(batch_stats),
        # optax states are typed containers; store their state-dict form
        "opt_state": _to_host(serialization.to_state_dict(opt_state)),
        "best_acc": float(best_acc),
    }
    data = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint_file(path: str) -> Dict[str, Any]:
    """Returns the raw payload dict. ``opt_state`` comes back as nested
    dicts/lists; use ``restore_opt_state`` to rebuild the optax structure."""
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_opt_state(template, restored):
    """Rebuild a typed optax state from its msgpack dict form using a
    freshly-initialized state as the structure template."""
    return serialization.from_state_dict(template, restored)


def save_weights(path: str, params, batch_stats):
    """Reference's per-epoch ``model.pth``-style weights-only save."""
    payload = {"params": _to_host(params), "batch_stats": _to_host(batch_stats)}
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def load_weights(path: str):
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return payload["params"], payload["batch_stats"]


def load_any_weights(path: str):
    """Weights loader for eval CLIs: native msgpack or torch .pth/.pth.tar
    (auto-detected), returning (params, batch_stats) of the full Net."""
    with open(path, "rb") as f:
        head = f.read(2)
    if head == b"PK" or path.endswith((".pth", ".pth.tar")):
        try:
            from ..utils import torch_import
            sd = torch_import.load_torch_state_dict(path)
            if any(k.startswith("features.") for k in sd):
                return torch_import.imagenet_from_state_dict(sd)
            return torch_import.net_from_state_dict(sd)
        except Exception:
            pass  # fall through to msgpack
    payload = load_checkpoint_file(path)
    return payload["params"], payload["batch_stats"]


def partial_load(target, source, *, path=""):
    """Reference ``load_my_state_dict`` semantics (train/main.py,
    eval/eval_iou.py): copy every leaf whose path exists in both trees with
    a matching shape; keep the target's value otherwise. Returns
    (merged_tree, loaded_paths, skipped_paths)."""
    loaded, skipped = [], []

    def rec(t, s, p):
        if isinstance(t, dict) and isinstance(s, dict):
            out = {}
            for k, v in t.items():
                if k in s:
                    out[k] = rec(v, s[k], f"{p}.{k}" if p else k)
                else:
                    skipped.append(f"{p}.{k}" if p else k)
                    out[k] = v
            return out
        if isinstance(t, (list, tuple)) and isinstance(s, (list, tuple)):
            out = []
            for i, v in enumerate(t):
                if i < len(s):
                    out.append(rec(v, s[i], f"{p}[{i}]"))
                else:
                    skipped.append(f"{p}[{i}]")
                    out.append(v)
            return type(t)(out) if isinstance(t, tuple) else out
        ts = getattr(t, "shape", None)
        ss = getattr(s, "shape", None)
        if ts == ss:
            loaded.append(p)
            return s
        skipped.append(p)
        return t

    merged = rec(target, source, path)
    return merged, loaded, skipped


class CheckpointManager:
    """Stage-aware manager reproducing the reference's save-dir contract."""

    def __init__(self, savedir: str, enc: bool, arch: str = "Net"):
        self.savedir = savedir
        self.enc = enc
        self.arch = arch
        os.makedirs(savedir, exist_ok=True)
        suffix = "_enc" if enc else ""
        self.checkpoint_path = os.path.join(
            savedir, f"checkpoint{suffix}.pth.tar")
        self.best_path = os.path.join(
            savedir, "model_best_enc.pth.tar" if enc else "model_best.pth")
        self.latest_weights_path = os.path.join(
            savedir, "model_encoder.pth" if enc else "model.pth")

    def save_epoch(self, *, epoch: int, params, batch_stats, opt_state,
                   best_acc: float, is_best: bool,
                   epochs_save: int = 0, step: int = 0):
        save_checkpoint_file(self.checkpoint_path, epoch=epoch,
                             arch=self.arch, params=params,
                             batch_stats=batch_stats, opt_state=opt_state,
                             best_acc=best_acc, step=step)
        save_weights(self.latest_weights_path, params, batch_stats)
        if epochs_save > 0 and epoch % epochs_save == 0:
            save_weights(os.path.join(self.savedir,
                                      f"model-{epoch:03}.pth"),
                         params, batch_stats)
        if is_best:
            save_weights(self.best_path, params, batch_stats)

    def write_best(self, epoch: int, val_iou: float):
        fname = "best_enc.txt" if self.enc else "best.txt"
        with open(os.path.join(self.savedir, fname), "w") as f:
            f.write(f"Best epoch is {epoch}, with Val-IoU= {val_iou:.4f}")

    def resume(self):
        if not os.path.exists(self.checkpoint_path):
            raise FileNotFoundError(
                f"no checkpoint found at {self.checkpoint_path!r}")
        return load_checkpoint_file(self.checkpoint_path)
