"""VOC12 dataset — parity with the reference's ``train/dataset.py:VOC12``
(SURVEY.md §2a row 3): flat ``images/`` (.jpg) + ``labels/`` (.png palette)
directories keyed by shared basenames.

Returns the same (image, label, relpath) triple as CityscapesDataset so the
prefetching DataLoader and the jitted co-transform work unchanged.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
from PIL import Image

from .cityscapes import is_image, image_basename


def image_path(root: str, basename: str, extension: str) -> str:
    return os.path.join(root, f"{basename}{extension}")


class VOC12Dataset:
    def __init__(self, root: str, *, height: Optional[int] = None,
                 target_height: Optional[int] = None,
                 image_dtype: str = "float32"):
        """``image_dtype='uint8'``: raw PIL frames (4x less host->device
        traffic, normalized on-device by the train/eval steps — see
        data.transforms.to_tensor)."""
        if image_dtype not in ("float32", "uint8"):
            raise ValueError(f"unsupported image_dtype: {image_dtype!r}")
        self.image_dtype = image_dtype
        self.images_root = os.path.join(root, "images")
        self.labels_root = os.path.join(root, "labels")
        if not os.path.isdir(self.labels_root):
            raise FileNotFoundError(
                f"no labels/ under {root!r} — expected VOC12 layout "
                "(images/*.jpg + labels/*.png)")
        self.height = height
        self.target_height = (target_height if target_height is not None
                              else height)
        self.filenames = sorted(
            image_basename(f) for f in os.listdir(self.labels_root)
            if is_image(f))

    def __len__(self):
        return len(self.filenames)

    def __getitem__(self, idx: int):
        name = self.filenames[int(idx)]
        with Image.open(image_path(self.images_root, name, ".jpg")) as img:
            image = img.convert("RGB")
            if self.height is not None:
                w = image.width * self.height // image.height
                image = image.resize((w, self.height), Image.BILINEAR)
            if self.image_dtype == "uint8":
                image_np = np.asarray(image, dtype=np.uint8)
            else:
                image_np = np.asarray(image, dtype=np.float32) / 255.0
        with Image.open(image_path(self.labels_root, name, ".png")) as lab:
            label = lab.convert("P")
            if self.target_height is not None:
                w = label.width * self.target_height // label.height
                label = label.resize((w, self.target_height), Image.NEAREST)
            label_np = np.asarray(label, dtype=np.int32)
        return image_np, label_np, name + ".jpg"
