"""Reference-faithful PyTorch BYOL on shapes100 — the decisive collapse
arbiter (VERDICT round-2 item 1 follow-through).

Our BYOL collapses to chance-level class KNN on shapes100 under the shipped
CIFAR recipe (diag runs A-D, VALIDATION.md) while SimCLR reaches ~0.99.
Before calling that a framework bug, this script reruns the EXACT reference
recipe in torch — torchvision transforms (the reference's own augmentation
implementation, augmentations.py:113-126), the reference MLP heads
(byol.py:24-34), MSELoss on L2-normalized outputs (byol.py:89,126-130),
separate target init (byol.py:70-71), per-step EMA — on the same shapes100
arrays, with a small CNN both frameworks share (ssv_tpu.models.tiny).

If torch BYOL also flatlines at chance: the collapse is a property of
(BYOL recipe x this data), not of the TPU port. If torch learns: framework
bug — bisect.

CPU-only, small subset; run niced next to TPU jobs.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def knn20(fvecs, labels):
    x = fvecs / np.maximum(np.linalg.norm(fvecs, axis=1, keepdims=True), 1e-12)
    s = x @ x.T
    np.fill_diagonal(s, -np.inf)
    nn = np.argsort(-s, axis=1)[:, :20]
    return float((labels[nn] == labels[:, None]).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-train", type=int, default=5000)
    ap.add_argument("--n-test", type=int, default=1000)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--lr", type=float, default=0.2)
    ap.add_argument("--proj-dim", type=int, default=32)
    ap.add_argument("--tau", type=float, default=0.996)
    ap.add_argument("--dataset", default="shapes100")
    args = ap.parse_args()

    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    from PIL import Image, ImageEnhance, ImageOps

    from ssv_tpu.data.datasets import load_dataset

    torch.manual_seed(0)
    ds = load_dataset(args.dataset, root=None,
                      synthetic_sizes=(args.n_train, args.n_test))
    mean = np.array([0.4914, 0.4822, 0.4465], np.float32)
    std = np.array([0.2470, 0.2435, 0.2616], np.float32)
    aug_rng = np.random.RandomState(1)

    # torchvision is not in this image: the train transform is re-created
    # with PIL primitives (the same primitives torchvision wraps), matching
    # the reference pipeline's semantics: RandomApply(ColorJitter(.4,.4,.4,.1),
    # p=.8) -> RandomGrayscale(.2) -> RandomResizedCrop(32, (0.2,1)) ->
    # RandomHorizontalFlip -> ToTensor -> Normalize.
    def color_jitter(img, r):
        img = ImageEnhance.Brightness(img).enhance(r.uniform(0.6, 1.4))
        img = ImageEnhance.Contrast(img).enhance(r.uniform(0.6, 1.4))
        img = ImageEnhance.Color(img).enhance(r.uniform(0.6, 1.4))
        h, s, v = img.convert("HSV").split()
        shift = int(r.uniform(-0.1, 0.1) * 255)
        h = h.point(lambda px: (px + shift) % 256)
        return Image.merge("HSV", (h, s, v)).convert("RGB")

    def rrc(img, r):
        w, h = img.size
        area = w * h
        for _ in range(10):
            a = r.uniform(0.2, 1.0) * area
            logr = r.uniform(math.log(3 / 4), math.log(4 / 3))
            cw = int(round(math.sqrt(a * math.exp(logr))))
            ch = int(round(math.sqrt(a / math.exp(logr))))
            if 0 < cw <= w and 0 < ch <= h:
                x0 = r.randint(0, w - cw + 1)
                y0 = r.randint(0, h - ch + 1)
                box = (x0, y0, x0 + cw, y0 + ch)
                return img.resize((32, 32), Image.BILINEAR, box=box)
        return img.resize((32, 32), Image.BILINEAR)

    def to_tensor(img):
        x = (np.asarray(img, np.float32) / 255.0 - mean) / std
        return torch.from_numpy(x.transpose(2, 0, 1))

    def train_t(img):
        r = aug_rng
        if r.rand() < 0.8:
            img = color_jitter(img, r)
        if r.rand() < 0.2:
            img = ImageOps.grayscale(img).convert("RGB")
        img = rrc(img, r)
        if r.rand() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        return to_tensor(img)

    test_t = to_tensor

    class Enc(nn.Module):
        """Mirror of ssv_tpu.models.tiny.TinyEncoder (conv32/s2-bn-relu-
        conv64/s2-bn-relu-gap)."""

        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv2d(3, 32, 3, stride=2, padding=1)
            self.b1 = nn.BatchNorm2d(32, momentum=0.1)
            self.c2 = nn.Conv2d(32, 64, 3, stride=2, padding=1)
            self.b2 = nn.BatchNorm2d(64, momentum=0.1)

        def forward(self, x):
            x = F.relu(self.b1(self.c1(x)))
            x = F.relu(self.b2(self.c2(x)))
            return x.mean(dim=(2, 3))

    def mlp(i, o):
        # reference BYOL MLP: fc-bn-relu-fc (byol.py:24-34)
        return nn.Sequential(nn.Linear(i, i), nn.BatchNorm1d(i),
                             nn.ReLU(inplace=True), nn.Linear(i, o))

    p = args.proj_dim

    class Online(nn.Module):
        def __init__(self):
            super().__init__()
            self.enc, self.proj, self.pred = Enc(), mlp(64, p), mlp(p, p)

        def forward(self, x):
            return F.normalize(self.pred(self.proj(self.enc(x))), dim=-1)

    class Target(nn.Module):
        def __init__(self):
            super().__init__()
            self.enc, self.proj = Enc(), mlp(64, p)

        def forward(self, x):
            return F.normalize(self.proj(self.enc(x)), dim=-1)

    online, target = Online(), Target()  # separate inits (byol.py:70-71)
    for q in target.parameters():
        q.requires_grad_(False)
    opt = torch.optim.SGD(online.parameters(), lr=args.lr, momentum=0.9,
                          nesterov=True, weight_decay=1e-4)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=args.epochs)
    mse = nn.MSELoss()

    imgs = [Image.fromarray(a) for a in ds.train.images]
    n = len(imgs)
    steps = n // args.batch

    def ema_pairs():
        # EMA over the shared (enc, proj) substructure
        return zip(list(target.enc.parameters()) + list(target.proj.parameters()),
                   list(online.enc.parameters()) + list(online.proj.parameters()))

    def ema_buf_pairs():
        return zip(list(target.enc.buffers()) + list(target.proj.buffers()),
                   list(online.enc.buffers()) + list(online.proj.buffers()))

    rng = np.random.RandomState(0)
    for epoch in range(1, args.epochs + 1):
        online.train(); target.train()
        perm = rng.permutation(n)
        tot = 0.0
        for s in range(steps):
            idx = perm[s * args.batch:(s + 1) * args.batch]
            v1 = torch.stack([train_t(imgs[i]) for i in idx])
            v2 = torch.stack([train_t(imgs[i]) for i in idx])
            o1, o2 = online(v1), online(v2)
            with torch.no_grad():
                t1, t2 = target(v1), target(v2)
            loss = mse(o1, t2) + mse(o2, t1)
            opt.zero_grad(); loss.backward(); opt.step()
            with torch.no_grad():
                for tq, oq in ema_pairs():
                    tq.mul_(args.tau).add_(oq, alpha=1 - args.tau)
                for tb, ob in ema_buf_pairs():
                    if tb.dtype.is_floating_point:
                        tb.mul_(args.tau).add_(ob, alpha=1 - args.tau)
            tot += float(loss)
        sched.step()

        if epoch % 5 == 0 or epoch == args.epochs:
            online.eval()
            with torch.no_grad():
                te = torch.stack([test_t(Image.fromarray(a))
                                  for a in ds.test.images])
                full, backbone = [], []
                for lo in range(0, len(te), 256):
                    xb = te[lo:lo + 256]
                    full.append(online(xb).numpy())
                    backbone.append(online.enc(xb).numpy())
            k_full = knn20(np.concatenate(full), ds.test.labels)
            k_enc = knn20(np.concatenate(backbone), ds.test.labels)
            print(json.dumps({"epoch": epoch, "loss": round(tot / steps, 4),
                              "knn": round(k_full, 4),
                              "knn_backbone": round(k_enc, 4)}), flush=True)


if __name__ == "__main__":
    main()
