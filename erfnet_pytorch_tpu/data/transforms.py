"""Label / color transforms — parity with {train,eval}/transform.py
(SURVEY.md §2a row 5) plus the server-submission inverse remap
(eval/eval_cityscapes_server.py, row 16).

TPU-native: Colorize and the trainId->labelId remap are device-side gathers
(jnp.take), so streaming inference keeps argmax + colorization on-chip and
only transfers uint8 images to host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# 20-entry Cityscapes trainId palette (19 classes + void=black), as
# hardcoded in eval/transform.py:Colorize.
CITYSCAPES_PALETTE = np.array([
    (128, 64, 128), (244, 35, 232), (70, 70, 70), (102, 102, 156),
    (190, 153, 153), (153, 153, 153), (250, 170, 30), (220, 220, 0),
    (107, 142, 35), (152, 251, 152), (70, 130, 180), (220, 20, 60),
    (255, 0, 0), (0, 0, 142), (0, 0, 70), (0, 60, 100),
    (0, 80, 100), (0, 0, 230), (119, 11, 32), (0, 0, 0),
], dtype=np.uint8)

# Per-class names as printed by eval/eval_iou.py.
CLASS_NAMES = [
    "Road", "sidewalk", "building", "wall", "fence", "pole",
    "traffic light", "traffic sign", "vegetation", "terrain", "sky",
    "person", "rider", "car", "truck", "bus", "train", "motorcycle",
    "cyclist",
]

# eval_cityscapes_server.py: chained Relabel trainId -> Cityscapes labelId
# (18->33, 17->32, ..., 0->7; void 19->0).
TRAINID_TO_LABELID = np.array(
    [7, 8, 11, 12, 13, 17, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 31,
     32, 33, 0], dtype=np.uint8)


def relabel(label, olabel, nlabel):
    """Relabel(olabel, nlabel): pointwise value replacement."""
    return jnp.where(label == olabel, jnp.asarray(nlabel, label.dtype), label)


def to_tensor(images):
    """ToTensor's value contract for frames already in HWC layout: uint8
    -> [0,1] float32 (u8/255; XLA lowers the divide as reciprocal-multiply,
    <=1 ulp from numpy's true division — beneath every downstream
    tolerance); float inputs pass through.  Under jit the cast+scale fuses
    into the consumer's first conv, which is what makes shipping raw uint8
    host->device (4x less traffic; data/loader.py image_dtype='uint8')
    free on the device side."""
    images = jnp.asarray(images)
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) / 255.0
    return images


def to_label(img_u8):
    """ToLabel: uint8 label image -> int32 class map (drops channel dim)."""
    a = jnp.asarray(img_u8)
    if a.ndim == 3 and a.shape[-1] == 1:
        a = a[..., 0]
    return a.astype(jnp.int32)


def _onehot_lookup(pred, table):
    """Gather-free table lookup: per-pixel gathers lower to scalar loads on
    the TPU VPU (see ops/argmax.py); a one-hot comparison + tiny matmul
    vectorizes fully.  pred (...,) int, table (K, D) or (K,)."""
    t = jnp.asarray(table)
    squeeze = t.ndim == 1
    if squeeze:
        t = t[:, None]
    k = t.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, pred.shape + (k,),
                                    pred.ndim)
    onehot = (iota == pred.astype(jnp.int32)[..., None]).astype(jnp.float32)
    out = jnp.dot(onehot.reshape(-1, k), t.astype(jnp.float32),
                  preferred_element_type=jnp.float32)
    out = out.reshape(pred.shape + (t.shape[1],)).astype(table.dtype)
    return out[..., 0] if squeeze else out


def colorize(pred, palette=None):
    """Per-pixel palette lookup on device. pred (..., H, W) int -> uint8 RGB
    (..., H, W, 3)."""
    pal = CITYSCAPES_PALETTE if palette is None else palette
    return _onehot_lookup(pred, jnp.asarray(pal))


def train_id_to_label_id(pred):
    """Device-side inverse remap for Cityscapes test-server submission."""
    return _onehot_lookup(pred, jnp.asarray(TRAINID_TO_LABELID))
