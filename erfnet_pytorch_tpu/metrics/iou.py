"""Per-class IoU with the reference's ``iouEval`` semantics
({train,eval}/iouEval.py — SURVEY.md §2a row 10).

Contract reproduced:
  * ``iouEval(nClasses, ignoreIndex=19)`` — pixels whose *ground truth* is
    the ignore class contribute to neither tp, fp nor fn (in particular they
    are not false positives for the predicted class).
  * ``getIoU() -> (mean, per_class)`` with iou = tp / (tp + fp + fn + 1e-15),
    mean over all non-ignored classes (absent classes count as 0).
  * ANSI-colored IoU printing (``getColorEntry`` thresholds).

TPU-native design: accumulation is a single (C, C) confusion matrix built
with a one-hot matmul — an MXU-friendly jitted reduction rather than the
reference's per-class one-hot tensors.  The matrix stays on device across
batches; only getIoU() transfers 400 floats to host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("num_classes",), donate_argnums=(0,))
def confusion_matrix_update(cm, preds, labels, *, num_classes=20):
    """cm[g, p] += count(gt==g & pred==p).  preds/labels: int (B, H, W)."""
    g = labels.reshape(-1).astype(jnp.int32)
    p = preds.reshape(-1).astype(jnp.int32)
    onehot_g = jax.nn.one_hot(g, num_classes, dtype=jnp.float32)
    onehot_p = jax.nn.one_hot(p, num_classes, dtype=jnp.float32)
    return cm + jnp.dot(onehot_g.T, onehot_p,
                        preferred_element_type=jnp.float32)


def iou_from_confusion(cm, ignore_index=19):
    """(mean_iou, per_class_iou) over classes != ignore_index.

    fp for class c excludes pixels whose gt is the ignore class (reference
    fpmult = x_onehot * (1 - y_onehot - ignores))."""
    cm = np.asarray(cm, dtype=np.float64)
    n = cm.shape[0]
    keep = np.arange(n) != ignore_index
    tp = np.diag(cm)
    fn = cm.sum(axis=1) - tp                   # gt row minus diagonal
    fp = cm[keep].sum(axis=0) - tp             # pred col (ignore-gt excluded)
    iou = tp / (tp + fp + fn + 1e-15)
    per_class = iou[keep]
    return float(per_class.mean()), per_class


class IouEval:
    """Drop-in behavioural equivalent of the reference's iouEval class."""

    def __init__(self, n_classes=20, ignore_index=19):
        self.n_classes = n_classes
        self.ignore_index = ignore_index if n_classes > 1 else -1
        self.reset()

    def reset(self):
        self.cm = jnp.zeros((self.n_classes, self.n_classes), jnp.float32)

    def add_batch(self, preds, labels):
        self.cm = confusion_matrix_update(self.cm, preds, labels,
                                          num_classes=self.n_classes)

    # reference method name
    addBatch = add_batch

    def get_iou(self):
        return iou_from_confusion(self.cm, self.ignore_index)

    getIoU = get_iou


# --------------------------------------------------------------------------
# ANSI colored printing (reference iouEval.py:colors / getColorEntry)
# --------------------------------------------------------------------------

class colors:
    RED = "\033[31;1m"
    GREEN = "\033[32;1m"
    YELLOW = "\033[33;1m"
    BLUE = "\033[34;1m"
    MAGENTA = "\033[35;1m"
    CYAN = "\033[36;1m"
    BOLD = "\033[1m"
    UNDERLINE = "\033[4m"
    ENDC = "\033[0m"


def get_color_entry(val):
    if not isinstance(val, float):
        return colors.ENDC
    if val < .20:
        return colors.RED
    elif val < .40:
        return colors.YELLOW
    elif val < .60:
        return colors.BLUE
    elif val < .80:
        return colors.CYAN
    return colors.GREEN


getColorEntry = get_color_entry
