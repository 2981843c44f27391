"""Multi-crop view generation for DINO (and any multi-view objective).

Parity with reference `MultiCrop` (augmentations.py:147-173): the base
augmentation pipeline runs twice (aug_1, aug_2), then each augmented image is
cropped `num_global` times at `global_size` with scale (s, 1.0) and
`num_local` times at `local_size` with scale (0.08, s), bicubic resampling.

On TPU all crops of all examples are generated inside the jitted train step
as a vmapped stack — (B, V, h, w, 3) with static V — and the encoder runs on
the flattened (B*V) batch, exactly how the reference flattens views
(dino.py:143-150) but with zero host involvement.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .augment import build_batch_transform, build_transform, random_resized_crop


class MultiCrop:
    def __init__(self, config: dict):
        cfg = dict(config)
        self.num_local = int(cfg.get("num_local_views", 6))
        self.num_global = int(cfg.get("num_global_views", 2))
        scale = float(cfg.get("scale_threshold", 0.3))
        self.global_size = tuple(cfg["global_size"])
        self.local_size = tuple(cfg["local_size"])
        self._global_crop = partial(random_resized_crop, size=self.global_size,
                                    scale=(scale, 1.0), method="cubic")
        self._local_crop = partial(random_resized_crop, size=self.local_size,
                                   scale=(0.08, scale), method="cubic")
        self.base_transform = build_transform(cfg["train_transforms"])
        self.base_batch_transform = build_batch_transform(cfg["train_transforms"])

    def _crops(self, fn, k, image, n):
        ks = jax.random.split(k, n)
        return jnp.stack([fn(ks[i], image) for i in range(n)], axis=0)

    def batch_call(self, keys, imgs):
        """Batch-level view generation: the base augmentation runs through
        the batch compiler (fused Pallas photometric head on TPU); crops are
        vmapped per example. Key discipline matches `__call__` exactly."""
        sub = jax.vmap(lambda k: jax.random.split(k, 6))(keys)  # (B, 6, 2)
        aug_1 = self.base_batch_transform(sub[:, 0], imgs)
        aug_2 = self.base_batch_transform(sub[:, 1], imgs)

        def views(kg1, kg2, kl1, kl2, a1, a2):
            return {
                "global_1": self._crops(self._global_crop, kg1, a1, self.num_global),
                "global_2": self._crops(self._global_crop, kg2, a2, self.num_global),
                "local_1": self._crops(self._local_crop, kl1, a1, self.num_local),
                "local_2": self._crops(self._local_crop, kl2, a2, self.num_local),
            }

        return jax.vmap(views)(sub[:, 2], sub[:, 3], sub[:, 4], sub[:, 5],
                               aug_1, aug_2)

    def __call__(self, key, img):
        """Per-example: returns dict of stacked views
        {global_1: (Vg,h,w,3), global_2, local_1: (Vl,h,w,3), local_2}."""
        k1, k2, kg1, kg2, kl1, kl2 = jax.random.split(key, 6)
        aug_1 = self.base_transform(k1, img)
        aug_2 = self.base_transform(k2, img)
        return {
            "global_1": self._crops(self._global_crop, kg1, aug_1, self.num_global),
            "global_2": self._crops(self._global_crop, kg2, aug_2, self.num_global),
            "local_1": self._crops(self._local_crop, kl1, aug_1, self.num_local),
            "local_2": self._crops(self._local_crop, kl2, aug_2, self.num_local),
        }
