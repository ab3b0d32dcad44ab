"""On-chip sustained-training soak (VERDICT r3 next-round task 5).

Everything on silicon before round 4 was single-step or short bench
segments; this drives the REAL trainer (training/trainer.py:train_stage,
fused kernels, checkpoints, automated_log) for 150 optimizer steps on the
v5e, kills it mid-run, resumes, and asserts (a) the loss decreases and
(b) the resumed run's final parameters are BIT-EQUAL to the
uninterrupted run's (possible because resume restores the step-counter
RNG stream and the trainer pins the loader shuffle stream to the
training epoch).

Stages (ONE per process — tunnel policy; run in order):
  --stage full     25 epochs x 6 batches uninterrupted; records the
                   final-parameter digest + loss curve
  --stage killed   same config, killed at the start of epoch 13
                   (checkpoint for epoch 12 on disk)
  --stage resumed  --resume from the killed savedir; digest must equal
                   the full run's.  Writes SOAK_TPU.json.

Synthetic data: labels are quantized pixel intensity, so the net has
real signal to fit and the loss curve must fall.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# fixture scale: small maps, 150 steps, IoU on
DEFAULTS = dict(height=64, epochs=25, kill_at=13, data="/tmp/soak_data",
                result=os.path.join(_REPO, "SOAK_TPU.json"),
                state="/tmp/soak_state.json", size=(128, 256),
                savedir_full="/tmp/soak_full",
                savedir_killed="/tmp/soak_killed")

# --recipe (VERDICT r4 #5): the ACTUAL recipe shape — 512x1024 batch 6 —
# for ~48 optimizer steps with the same kill/resume bit-equality proof.
# 8 epochs x 6 steps; kill at epoch 5.  iou_val off to keep the process
# to the two essential compiles (train + val-loss step) under tunnel
# policy; the fixture soak covers the IoU path.
RECIPE = dict(height=512, epochs=8, kill_at=5, data="/tmp/soak_data_recipe",
              result=os.path.join(_REPO, "SOAK_RECIPE_TPU.json"),
              state="/tmp/soak_state_recipe.json", size=(512, 1024),
              savedir_full="/tmp/soak_full_recipe",
              savedir_killed="/tmp/soak_killed_recipe")
_MODE = {"recipe": False}


def _p(name):
    return (RECIPE if _MODE["recipe"] else DEFAULTS)[name]


def make_data(root=None, n_train=36, n_val=12):
    from PIL import Image
    if root is None:
        root = _p("data")
    h, w = _p("size")
    if os.path.exists(os.path.join(root, ".done")):
        return root
    rng = np.random.RandomState(7)
    for subset, n in (("train", n_train), ("val", n_val)):
        img_dir = os.path.join(root, "leftImg8bit", subset, "soak")
        lab_dir = os.path.join(root, "gtFine", subset, "soak")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(lab_dir, exist_ok=True)
        for i in range(n):
            stem = f"soak_{i:06d}_000019"
            img = rng.randint(0, 255, (h, w, 3), np.uint8)
            # learnable structure: labels follow smoothed intensity bands
            gray = img.mean(-1)
            lab = np.clip(gray / 255.0 * 19.0, 0, 18).astype(np.uint8)
            lab[:4] = 255  # some void rows like real gtFine
            Image.fromarray(img).save(
                os.path.join(img_dir, stem + "_leftImg8bit.png"))
            Image.fromarray(lab, mode="L").save(
                os.path.join(lab_dir, stem + "_gtFine_labelTrainIds.png"))
    open(os.path.join(root, ".done"), "w").write("ok")
    return root


def _digest(ts):
    from jax.flatten_util import ravel_pytree
    flat = np.asarray(ravel_pytree(ts.params)[0], np.float32)
    stats = np.asarray(ravel_pytree(ts.batch_stats)[0], np.float32)
    return (hashlib.sha256(flat.tobytes()).hexdigest()[:16],
            hashlib.sha256(stats.tobytes()).hexdigest()[:16])


def _losses(savedir):
    rows = []
    with open(os.path.join(savedir, "automated_log.txt")) as f:
        for ln in f.read().splitlines()[1:]:
            cols = [c for c in ln.split("\t") if c]
            rows.append((float(cols[1]), float(cols[2])))
    return rows


def _cfg(savedir, log_fn=print):
    import jax
    from erfnet_pytorch_tpu.training.trainer import TrainConfig
    from erfnet_pytorch_tpu.parallel.mesh import make_mesh
    import jax.numpy as jnp
    return TrainConfig(
        datadir=make_data(), savedir=savedir, height=_p("height"),
        num_epochs=_p("epochs"),
        batch_size=6, num_workers=2, steps_loss=0,
        iou_val=not _MODE["recipe"],
        seed=0, compute_dtype=jnp.bfloat16,
        mesh=make_mesh(1, jax.devices()[:1]), log_fn=log_fn)


def _load_state():
    st = _p("state")
    return json.load(open(st)) if os.path.exists(st) else {}


def _save_state(d):
    s = _load_state()
    s.update(d)
    json.dump(s, open(_p("state"), "w"), indent=1)


def stage_full():
    import jax
    from erfnet_pytorch_tpu.utils.jax_cache import enable as en
    en()
    assert jax.default_backend() != "cpu", "the soak runs on the TPU"
    from erfnet_pytorch_tpu.training.trainer import train_stage
    import time
    t0 = time.time()
    ts = train_stage(_cfg(_p("savedir_full")), enc=False)
    wall = time.time() - t0
    dg = _digest(ts)
    rows = _losses(_p("savedir_full"))
    first3 = float(np.mean([r[0] for r in rows[:3]]))
    last3 = float(np.mean([r[0] for r in rows[-3:]]))
    entry = {
        "shape": f"512x1024 batch 6" if _MODE["recipe"]
                 else "64x128 batch 6",
        "steps": _p("epochs") * 6, "wall_s": round(wall, 1),
        "train_loss_first3_mean": round(first3, 4),
        "train_loss_last3_mean": round(last3, 4),
        "val_loss_first": rows[0][1], "val_loss_last": rows[-1][1],
        "loss_decreased": bool(last3 < first3 - (0.2 if not _MODE["recipe"]
                                                 else 0.05)),
        "digest_params": dg[0], "digest_stats": dg[1],
    }
    _save_state({"full": entry})
    print(json.dumps(entry, indent=1))
    assert entry["loss_decreased"], entry


def stage_killed():
    import jax
    from erfnet_pytorch_tpu.utils.jax_cache import enable as en
    en()
    assert jax.default_backend() != "cpu"
    from erfnet_pytorch_tpu.training.trainer import train_stage

    class Kill(Exception):
        pass

    def killer(msg):
        if f"EPOCH {_p('kill_at')} " in msg and "TRAINING" in msg:
            raise Kill

    try:
        train_stage(_cfg(_p("savedir_killed"), log_fn=killer), enc=False)
        raise AssertionError("killer never fired")
    except Kill:
        pass
    _save_state({"killed": {"killed_at_epoch": _p("kill_at")}})
    print(json.dumps({"killed_at_epoch": _p("kill_at")}))


def stage_resumed():
    import jax
    from erfnet_pytorch_tpu.utils.jax_cache import enable as en
    en()
    assert jax.default_backend() != "cpu"
    from erfnet_pytorch_tpu.training.trainer import train_stage
    cfg = _cfg(_p("savedir_killed"))
    cfg.resume = True
    ts = train_stage(cfg, enc=False)
    dg = _digest(ts)
    s = _load_state()
    equal = (dg[0] == s["full"]["digest_params"]
             and dg[1] == s["full"]["digest_stats"])
    out = {
        "device": str(jax.devices()[0].device_kind),
        "full": s["full"],
        "killed_at_epoch": s["killed"]["killed_at_epoch"],
        "resumed_digest_params": dg[0], "resumed_digest_stats": dg[1],
        "resume_bit_equal": bool(equal),
        "pass": bool(equal and s["full"]["loss_decreased"]),
    }
    with open(_p("result"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out, indent=1))
    sys.exit(0 if out["pass"] else 1)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--stage", required=True,
                    choices=["full", "killed", "resumed"])
    ap.add_argument("--recipe", action="store_true",
                    help="512x1024 batch-6 recipe shape (~48 steps, "
                         "SOAK_RECIPE_TPU.json)")
    args = ap.parse_args()
    _MODE["recipe"] = bool(args.recipe)
    {"full": stage_full, "killed": stage_killed,
     "resumed": stage_resumed}[args.stage]()


if __name__ == "__main__":
    main()
