#!/usr/bin/env python
"""Measure the reference pipeline's host-side throughput ceiling.

VERDICT round-1 item 6: `bench.py` divided by an *estimated* 2,000 img/s.
This script replaces the estimate with a measurement taken on THIS machine:
it rebuilds the reference's data path — PIL augmentation inside a
`torch.utils.data.DataLoader(num_workers=4)` (reference
utils/data_utils.py:113-121, utils/augmentations.py:113-144) — and times one
epoch of two-view batch production for the reference SimCLR train transform
(configs/simclr.yaml): ColorJitter(.4,.4,.4,.1)@p=.8, RandomGrayscale(.2),
RandomResizedCrop(32, scale=(.2,1)), RandomHorizontalFlip, ToTensor,
Normalize.

The number it prints is an UPPER BOUND on the reference's end-to-end train
throughput on this host: the reference's GPU step cannot consume images
faster than its DataLoader produces them, and this measurement excludes the
H2D copies and the forward/backward entirely. `bench.py` reads the result
from BASELINE_MEASURED.json so `vs_baseline` is grounded in a measurement,
not an estimate.

torchvision is not installed here, so the four torchvision ops are
re-implemented with PIL primitives following torchvision's own PIL backend
semantics (ImageEnhance for brightness/contrast/saturation, HSV shift for
hue, the 10-attempt log-uniform area sampler for RandomResizedCrop).
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

import numpy as np
import torch
from PIL import Image, ImageEnhance


# ---------------------------------------------------------------------------
# torchvision-PIL-backend re-implementations (only what simclr.yaml needs)
# ---------------------------------------------------------------------------
class ColorJitter:
    """transforms.ColorJitter(0.4, 0.4, 0.4, 0.1), PIL backend: random order
    of brightness/contrast/saturation/hue, each factor ~ U[max(0,1-v), 1+v]
    (hue ~ U[-v, v])."""

    def __init__(self, brightness, contrast, saturation, hue):
        self.b, self.c, self.s, self.h = brightness, contrast, saturation, hue

    @staticmethod
    def _hue(img, factor):
        h, s, v = img.convert("HSV").split()
        arr = np.array(h, np.uint8)
        arr = (arr.astype(np.int16) + int(factor * 255)) % 256
        h = Image.fromarray(arr.astype(np.uint8), "L")
        return Image.merge("HSV", (h, s, v)).convert("RGB")

    def __call__(self, img):
        ops = list(range(4))
        random.shuffle(ops)
        for op in ops:
            if op == 0:
                f = random.uniform(max(0, 1 - self.b), 1 + self.b)
                img = ImageEnhance.Brightness(img).enhance(f)
            elif op == 1:
                f = random.uniform(max(0, 1 - self.c), 1 + self.c)
                img = ImageEnhance.Contrast(img).enhance(f)
            elif op == 2:
                f = random.uniform(max(0, 1 - self.s), 1 + self.s)
                img = ImageEnhance.Color(img).enhance(f)
            else:
                img = self._hue(img, random.uniform(-self.h, self.h))
        return img


class RandomResizedCrop:
    """transforms.RandomResizedCrop(32, scale=(0.2, 1.0)): 10 attempts at a
    (scale, log-ratio)-sampled box, center-crop fallback, bilinear resize."""

    def __init__(self, size, scale, ratio=(3 / 4, 4 / 3)):
        self.size, self.scale, self.ratio = tuple(size), scale, ratio

    def __call__(self, img):
        w, h = img.size
        area = w * h
        for _ in range(10):
            target = area * random.uniform(*self.scale)
            ar = float(np.exp(random.uniform(np.log(self.ratio[0]),
                                             np.log(self.ratio[1]))))
            cw = int(round((target * ar) ** 0.5))
            ch = int(round((target / ar) ** 0.5))
            if 0 < cw <= w and 0 < ch <= h:
                x = random.randint(0, w - cw)
                y = random.randint(0, h - ch)
                return img.resize(self.size, Image.BILINEAR,
                                  box=(x, y, x + cw, y + ch))
        # fallback: central crop at the clamped aspect ratio
        in_ratio = w / h
        if in_ratio < self.ratio[0]:
            cw, ch = w, int(round(w / self.ratio[0]))
        elif in_ratio > self.ratio[1]:
            cw, ch = int(round(h * self.ratio[1])), h
        else:
            cw, ch = w, h
        x, y = (w - cw) // 2, (h - ch) // 2
        return img.resize(self.size, Image.BILINEAR,
                          box=(x, y, x + cw, y + ch))


MEAN = np.array([0.4914, 0.4822, 0.4465], np.float32)
STD = np.array([0.2470, 0.2435, 0.2616], np.float32)


def train_view(img: Image.Image, jitter, rrc) -> torch.Tensor:
    if random.random() < 0.8:            # RandomApply(ColorJitter, p=0.8)
        img = jitter(img)
    if random.random() < 0.2:            # RandomGrayscale(p=0.2)
        img = img.convert("L").convert("RGB")
    img = rrc(img)
    if random.random() < 0.5:            # RandomHorizontalFlip
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    arr = np.asarray(img, np.float32) / 255.0   # ToTensor
    arr = (arr - MEAN) / STD                    # Normalize
    return torch.from_numpy(arr.transpose(2, 0, 1).copy())


def base_view(img: Image.Image) -> torch.Tensor:
    arr = np.asarray(img, np.float32) / 255.0
    arr = (arr - MEAN) / STD
    return torch.from_numpy(arr.transpose(2, 0, 1).copy())


class DoubleAugmentedDataset(torch.utils.data.Dataset):
    """Mirrors reference utils/data_utils.py:56-73: returns the base image
    plus two independently augmented views, the label and the index."""

    def __init__(self, images: np.ndarray, labels: np.ndarray):
        self.images, self.labels = images, labels
        self.jitter = ColorJitter(0.4, 0.4, 0.4, 0.1)
        self.rrc = RandomResizedCrop((32, 32), (0.2, 1.0))

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        img = Image.fromarray(self.images[i])
        return {"index": i,
                "img": base_view(img),
                "aug_1": train_view(img, self.jitter, self.rrc),
                "aug_2": train_view(img, self.jitter, self.rrc),
                "label": int(self.labels[i])}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, size=(n, 32, 32, 3), dtype=np.uint8)
    labels = rng.randint(0, 10, size=n).astype(np.int64)

    loader = torch.utils.data.DataLoader(
        DoubleAugmentedDataset(images, labels),
        batch_size=512, shuffle=True, num_workers=4)  # data_utils.py:119

    # warm the workers on a few batches, then time a full epoch
    it = iter(loader)
    for _ in range(4):
        next(it)
    t0 = time.perf_counter()
    count = 0
    for batch in loader:
        count += batch["img"].shape[0]
    dt = time.perf_counter() - t0
    ips = count / dt

    result = {
        "metric": "reference_host_pipeline_images_per_sec",
        "value": round(ips, 1),
        "unit": "images/sec",
        "detail": ("PIL two-view SimCLR augmentation in a 4-worker "
                   "DataLoader (reference data path, this machine); "
                   "upper bound on reference train throughput"),
        "n_images": count,
        "wall_s": round(dt, 2),
        "cpu_count": os.cpu_count(),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "BASELINE_MEASURED.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
