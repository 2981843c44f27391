"""The on-device input pipeline.

Replaces the reference's `torch.utils.data.DataLoader(num_workers=4)` + PIL
stack (data_utils.py:99-131) with a design built for TPU:

  * the raw uint8 dataset is device-put ONCE (CIFAR-10 train: 150 MB — a
    rounding error in HBM) and kept replicated across the mesh;
  * a "batch" is just a vector of indices — the jitted train step gathers the
    uint8 rows and runs the full augmentation pipeline on device, so the only
    per-step host<->device traffic is a few KB of indices;
  * epoch shuffling is `jax.random.permutation` on device.

Batch dicts reproduce the reference's dataset wrappers exactly
(data_utils.py:35-92): `double` -> {index, img, aug_1, aug_2, label};
`pseudolabel` -> {idx, img, aug, label}; `multicrop` -> {img, global_1,
global_2, local_1, local_2, label}.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .augment import build_batch_transform, build_transform
from .multicrop import MultiCrop
from .datasets import Dataset, load_dataset


class DataPipeline:
    def __init__(self, data_cfg: dict, batch_size: int | None = None,
                 allow_synthetic: bool = True,
                 synthetic_sizes: tuple[int, int] | None = None):
        cfg = dict(data_cfg)
        self.batch_size = int(batch_size or cfg["batch_size"])
        self.dataset: Dataset = load_dataset(
            cfg["dataset_name"], cfg.get("root", "data"),
            allow_synthetic=allow_synthetic, synthetic_sizes=synthetic_sizes)
        self.num_classes = self.dataset.num_classes

        # transform configs; `transforms` for two-view algos (train/test keys
        # or aug/std keys for pseudo-label algos), `multicrop_config` for DINO.
        self.transforms_cfg = cfg.get("transforms")
        self.multicrop_cfg = cfg.get("multicrop_config")

        self._train_images = jnp.asarray(self.dataset.train.images)
        self._train_labels = jnp.asarray(self.dataset.train.labels)
        self._test_images = jnp.asarray(self.dataset.test.images)
        self._test_labels = jnp.asarray(self.dataset.test.labels)

    # ------------------------------------------------------------------
    @property
    def n_train(self) -> int:
        return int(self._train_images.shape[0])

    @property
    def n_test(self) -> int:
        return int(self._test_images.shape[0])

    @property
    def steps_per_epoch(self) -> int:
        # Static shapes require a fixed batch; the reference's DataLoader
        # keeps the final partial batch (drop_last=False) — we drop it.
        return self.n_train // self.batch_size

    def arrays(self, split: str = "train"):
        if split == "train":
            return self._train_images, self._train_labels
        return self._test_images, self._test_labels

    def epoch_indices(self, key, steps: int | None = None) -> jnp.ndarray:
        """(steps, batch) random permutation of train indices, on device."""
        steps = steps or self.steps_per_epoch
        perm = jax.random.permutation(key, self.n_train)
        return perm[: steps * self.batch_size].reshape(steps, self.batch_size)

    # ------------------------------------------------------------------
    # batch builders — pure functions meant to be traced inside train steps
    # ------------------------------------------------------------------
    def make_batch_fn(self, kind: str) -> Callable:
        """Returns fn(images_u8, labels, idx, key) -> batch dict."""
        if kind == "double":
            t = dict(self.transforms_cfg)
            # train views go through the batch compiler (fuses the leading
            # color ops into a Pallas kernel on TPU); the deterministic test
            # view stays on the per-example path.
            train_t = build_batch_transform(t["train"])
            test_t = build_transform(t["test"])

            def fn(images, labels, idx, key):
                raw = jnp.take(images, idx, axis=0)
                lbl = jnp.take(labels, idx, axis=0)
                n = idx.shape[0]
                k_img, k1, k2 = jax.random.split(key, 3)
                batch = {
                    "index": idx,
                    "img": jax.vmap(test_t)(jax.random.split(k_img, n), raw),
                    "aug_1": train_t(jax.random.split(k1, n), raw),
                    "aug_2": train_t(jax.random.split(k2, n), raw),
                    "label": lbl,
                }
                return batch
            return fn

        if kind == "pseudolabel":
            t = dict(self.transforms_cfg)
            aug_t = build_batch_transform(t["aug"])
            std_t = build_transform(t["std"])

            def fn(images, labels, idx, key):
                raw = jnp.take(images, idx, axis=0)
                lbl = jnp.take(labels, idx, axis=0)
                n = idx.shape[0]
                k_img, k_aug = jax.random.split(key)
                return {
                    "idx": idx,
                    "img": jax.vmap(std_t)(jax.random.split(k_img, n), raw),
                    "aug": aug_t(jax.random.split(k_aug, n), raw),
                    "label": lbl,
                }
            return fn

        if kind == "multicrop":
            mc = MultiCrop(self.multicrop_cfg)
            test_t = build_transform(self.multicrop_cfg["test_transforms"])

            def fn(images, labels, idx, key):
                raw = jnp.take(images, idx, axis=0)
                lbl = jnp.take(labels, idx, axis=0)
                n = idx.shape[0]
                k_img, k_mc = jax.random.split(key)
                views = mc.batch_call(jax.random.split(k_mc, n), raw)
                return {
                    "img": jax.vmap(test_t)(jax.random.split(k_img, n), raw),
                    "label": lbl,
                    **views,
                }
            return fn

        raise ValueError(f"Unknown batch kind {kind!r}")

    def make_eval_transform(self) -> Callable:
        """The deterministic test-time transform (center crop + normalize)."""
        if self.transforms_cfg is not None:
            t = dict(self.transforms_cfg)
            cfg = t.get("test", t.get("std"))
        else:
            cfg = self.multicrop_cfg["test_transforms"]
        return build_transform(cfg)

    def eval_batches(self, split: str = "test", batch_size: int | None = None):
        """Host-side iterator of (idx_array,) covering a split, padded to a
        full final batch (pad rows repeat index 0; callers mask by count)."""
        bs = batch_size or self.batch_size
        n = self.n_train if split == "train" else self.n_test
        idx = np.arange(n)
        n_pad = (-n) % bs
        if n_pad:
            idx = np.concatenate([idx, np.zeros(n_pad, np.int64)])
        for s in range(0, len(idx), bs):
            yield jnp.asarray(idx[s:s + bs]), min(bs, n - s)
