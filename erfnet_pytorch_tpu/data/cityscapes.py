"""Cityscapes dataset — directory-walking reader with the reference's
layout conventions ({train,eval}/dataset.py — SURVEY.md §2a rows 3-4):

    {datadir}/leftImg8bit/{subset}/{city}/*_leftImg8bit.png
    {datadir}/gtFine/{subset}/{city}/*_gtFine_labelTrainIds.png

Host-side work is intentionally minimal (the TPU-native split): PNG decode +
PIL resize only; flip/translate augmentation and the 255->19 relabel run
on-device inside the jitted train step (ops/augment.py).

Resize parity: eval resizes with PIL BILINEAR (image) / NEAREST (label) at
(height, 2*height), exactly like the reference's torchvision
``Resize(h, BILINEAR)`` on 2:1 Cityscapes frames — PIL-level identical, which
keeps the mIoU-parity budget (SURVEY.md §7 hard parts) intact.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image

EXTENSIONS = (".jpg", ".png")


def is_image(filename: str) -> bool:
    return filename.lower().endswith(EXTENSIONS)


def image_basename(filename: str) -> str:
    return os.path.basename(os.path.splitext(filename)[0])


def load_image(path: str) -> Image.Image:
    return Image.open(path)


class CityscapesDataset:
    """Indexable (image, label, relpath) source.

    Returns numpy arrays: image (H, W, 3) float32 in [0, 1] (ToTensor
    semantics), label (H, W) int32 with raw 255 void (relabel happens
    on-device), and the leftImg8bit-relative path (for eval output naming).
    """

    def __init__(self, root: str, subset: str = "train",
                 height: Optional[int] = 512,
                 target_height: Optional[int] = None,
                 size: Optional[Tuple[int, int]] = None,
                 image_dtype: str = "float32"):
        """``size=(h, w)``: resize to EXACTLY (h, w) — the reference eval
        pipeline's unconditional ``Resize((512, 1024))``
        (eval/eval_iou.py:≈30).  ``height`` alone keeps the input aspect
        ratio (identical on 2:1 Cityscapes frames, different on anything
        else).

        ``image_dtype='uint8'``: yield the raw PIL-rounded resize output
        instead of the /255 float (same values scaled — the reference's
        ToTensor divides the same uint8 image); 4x less host->device
        traffic, normalized on-device by the consumer (StreamingSegmenter
        and the train/eval steps do this under jit — see
        data.transforms.to_tensor for the <=1-ulp caveat)."""
        if image_dtype not in ("float32", "uint8"):
            raise ValueError(f"unsupported image_dtype: {image_dtype!r}")
        self.image_dtype = image_dtype
        self.root = root
        self.subset = subset
        self.height = size[0] if size is not None else height
        self.size = size
        self.target_height = target_height if target_height is not None \
            else self.height
        self.images_root = os.path.join(root, "leftImg8bit", subset)
        self.labels_root = os.path.join(root, "gtFine", subset)
        if not os.path.isdir(self.images_root):
            raise FileNotFoundError(
                f"no leftImg8bit/{subset} under {root!r} — expected the "
                "Cityscapes layout (see cityscapesScripts for "
                "_labelTrainIds generation)")
        self.filenames: List[str] = []
        for dirpath, _dirs, files in sorted(os.walk(self.images_root)):
            for f in sorted(files):
                if is_image(f):
                    rel = os.path.relpath(os.path.join(dirpath, f),
                                          self.images_root)
                    self.filenames.append(rel)

    def __len__(self):
        return len(self.filenames)

    @property
    def native_size(self):
        """(h, w) for the native C++ loader (Cityscapes frames are 2:1)."""
        if self.size is not None:
            return self.size
        if self.height is None:
            return None
        return (self.height, self.height * 2)

    def sample_paths(self, idx: int):
        """(image_path, label_path_or_None) for the native loader."""
        rel = self.filenames[int(idx)]
        lp = self.label_path(rel)
        return (os.path.join(self.images_root, rel),
                lp if os.path.exists(lp) else None)

    def label_path(self, rel: str) -> str:
        return os.path.join(
            self.labels_root,
            rel.replace("_leftImg8bit.png", "_gtFine_labelTrainIds.png")
               .replace("_leftImg8bit.jpg", "_gtFine_labelTrainIds.png"))

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray, str]:
        rel = self.filenames[idx]
        with load_image(os.path.join(self.images_root, rel)) as img:
            image = img.convert("RGB")
            if self.size is not None:
                image = image.resize((self.size[1], self.size[0]),
                                     Image.BILINEAR)
            elif self.height is not None:
                w = image.width * self.height // image.height
                image = image.resize((w, self.height), Image.BILINEAR)
            if self.image_dtype == "uint8":
                image_np = np.asarray(image, dtype=np.uint8)
            else:
                image_np = np.asarray(image, dtype=np.float32) / 255.0

        lp = self.label_path(rel)
        if os.path.exists(lp):
            with load_image(lp) as lab:
                label = lab.convert("L")
                if self.size is not None and self.target_height == self.size[0]:
                    label = label.resize((self.size[1], self.size[0]),
                                         Image.NEAREST)
                elif self.target_height is not None:
                    w = label.width * self.target_height // label.height
                    label = label.resize((w, self.target_height),
                                         Image.NEAREST)
                label_np = np.asarray(label, dtype=np.int32)
        else:
            label_np = np.full(image_np.shape[:2], 255, dtype=np.int32)
        return image_np, label_np, rel

def image_path_city(root, name):
    """Reference train/dataset.py helper (API parity)."""
    return os.path.join(root, name)
