"""ImageFolder-style classification dataset + the torchvision-equivalent
train/val transforms used by the reference's ``imagenet/main.py``
(SURVEY.md §2a row 18, §3.5):

  train: RandomResizedCrop(224) + RandomHorizontalFlip + normalize
  val:   Resize(256) + CenterCrop(224) + normalize

Layout: ``root/{split}/{class_name}/*.{jpg,png,jpeg}``; classes are sorted
subdir names (torchvision ImageFolder contract).  Host-side PIL transforms
run in the loader's thread pool; normalization happens on device inside the
jitted step (mean/std below are the torchvision ImageNet constants).
"""

from __future__ import annotations

import math
import os
import random
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def random_resized_crop(img: Image.Image, size: int = 224,
                        scale=(0.08, 1.0), ratio=(3 / 4, 4 / 3),
                        rng: Optional[random.Random] = None) -> Image.Image:
    """torchvision RandomResizedCrop semantics (10 attempts then center
    fallback)."""
    rng = rng or random
    w, h = img.size
    area = w * h
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
        ar = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * ar)))
        ch = int(round(math.sqrt(target_area / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            x = rng.randint(0, w - cw)
            y = rng.randint(0, h - ch)
            return img.resize((size, size), Image.BILINEAR,
                              box=(x, y, x + cw, y + ch))
    # fallback: center crop of the largest valid in-ratio box
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    x, y = (w - cw) // 2, (h - ch) // 2
    return img.resize((size, size), Image.BILINEAR,
                      box=(x, y, x + cw, y + ch))


def resize_center_crop(img: Image.Image, resize: int = 256,
                       crop: int = 224) -> Image.Image:
    w, h = img.size
    if w <= h:
        nw, nh = resize, int(round(h * resize / w))
    else:
        nw, nh = int(round(w * resize / h)), resize
    img = img.resize((nw, nh), Image.BILINEAR)
    x, y = (nw - crop) // 2, (nh - crop) // 2
    return img.crop((x, y, x + crop, y + crop))


class ImageFolderDataset:
    """Returns (image (224,224,3) float32 [0,1] un-normalized, class int32,
    relpath) — compatible with data.loader.DataLoader (labels are scalars)."""

    def __init__(self, root: str, split: str = "train", *, train: bool = True,
                 size: int = 224, seed: int = 0,
                 image_dtype: str = "float32"):
        """``image_dtype='uint8'``: yield the raw PIL crop — 4x less
        host->device traffic; the consumer's normalize() divides on-device
        (u8/255, <=1 ulp of numpy's — see data.transforms.to_tensor).
        The ImageNet CLI opts in (cli/imagenet_main.py)."""
        if image_dtype not in ("float32", "uint8"):
            raise ValueError(f"unsupported image_dtype: {image_dtype!r}")
        self.image_dtype = image_dtype
        self.root = os.path.join(root, split)
        self.train = train
        self.size = size
        self.seed = seed
        if not os.path.isdir(self.root):
            raise FileNotFoundError(f"no {split!r} split under {root!r}")
        self.classes = sorted(d for d in os.listdir(self.root)
                              if os.path.isdir(os.path.join(self.root, d)))
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        self.samples: List[Tuple[str, int]] = []
        for c in self.classes:
            cdir = os.path.join(self.root, c)
            for f in sorted(os.listdir(cdir)):
                if f.lower().endswith(_EXTS):
                    self.samples.append((os.path.join(c, f),
                                         self.class_to_idx[c]))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int):
        idx = int(idx)  # numpy ints break random.Random seeding
        rel, cls = self.samples[idx]
        with Image.open(os.path.join(self.root, rel)) as img:
            img = img.convert("RGB")
            if self.train:
                rng = random.Random((self.seed * 1_000_003) ^ idx ^
                                    random.getrandbits(30))
                img = random_resized_crop(img, self.size, rng=rng)
                if rng.random() < 0.5:
                    img = img.transpose(Image.FLIP_LEFT_RIGHT)
            else:
                img = resize_center_crop(img, crop=self.size)
            if self.image_dtype == "uint8":
                arr = np.asarray(img, dtype=np.uint8)
            else:
                arr = np.asarray(img, dtype=np.float32) / 255.0
        return arr, np.int32(cls), rel
