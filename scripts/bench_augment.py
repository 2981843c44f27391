"""Measure the augmentation pipeline's share of the train step on the real
chip (VERDICT round-1 item 8: is fusing the geometric tail worth it?).

At batch 512 (the headline bench shape), times each stage in isolation,
scanned 100x inside one jitted program so dispatch overhead is amortized and
timing is honest (the fetched scalar depends on every step):

  * full SimCLR train step (augment 2 views + fwd/bwd + update)
  * two-view batch transform, Pallas photometric head ON and OFF
  * photometric head alone (color_jitter + random_gray)
  * geometric tail alone (random_resized_crop + flip + normalize)

The decision rule: if the geometric tail is a small share of the full step,
a fused Pallas gather kernel cannot move the headline (Amdahl), and item 8
closes with this measurement recorded in VALIDATION.md.

Usage: python scripts/bench_augment.py [batch]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SCAN = int(os.environ.get("BA_SCAN", "100"))


def timed(fn, *args):
    """Median-of-3 of a jitted scanned program; returns seconds/iteration."""
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        # fetch a scalar that depends on the result (relay-honest timing)
        float(jax.numpy.sum(out[0] if isinstance(out, tuple) else out))
        times.append(time.perf_counter() - t0)
    return sorted(times)[1] / SCAN


def main():
    batch = 512
    for a in sys.argv[1:]:
        if a.isdigit():
            batch = int(a)
    import jax
    if "--cpu" in sys.argv:  # smoke-test path; sitecustomize overrides env
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ssv_tpu.data.augment import build_batch_transform
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from helpers import train_t

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 256, (batch, 32, 32, 3), dtype=np.uint8))

    cfg_full = train_t()
    cfg_photo = {k: cfg_full[k] for k in ("color_jitter", "random_gray")}
    cfg_geo = {k: cfg_full[k] for k in
               ("random_resized_crop", "random_flip", "to_tensor", "normalize")}

    def scanned(t):
        def run(key, imgs):
            def body(c, k):
                ks = jax.random.split(k, imgs.shape[0])
                return c, jnp.sum(t(ks, imgs))
            _, sums = jax.lax.scan(body, 0, jax.random.split(key, SCAN))
            return sums
        return jax.jit(run)

    results = {"batch": batch}
    interp = "--cpu" in sys.argv  # Pallas on CPU only runs interpreted
    variants = {
        "two_view_pallas": build_batch_transform(cfg_full, use_pallas=True,
                                                 interpret=interp),
        "two_view_xla": build_batch_transform(cfg_full, use_pallas=False),
        "photometric_pallas": build_batch_transform(cfg_photo, use_pallas=True,
                                                    interpret=interp),
        "photometric_xla": build_batch_transform(cfg_photo, use_pallas=False),
        "geometric_tail": build_batch_transform(cfg_geo, use_pallas=False),
    }
    key = jax.random.PRNGKey(0)
    for name, t in variants.items():
        dt = timed(scanned(t), key, imgs)
        results[name + "_us"] = round(dt * 1e6, 1)
        print(f"{name:24s} {dt*1e6:8.1f} us/batch "
              f"({batch/dt:,.0f} img/s)", flush=True)

    # full train step for the share computation (same model as bench.py)
    from __graft_entry__ import _mini_simclr
    algo, transforms = _mini_simclr(batch_size=batch, n_train=batch * 4)
    images = jnp.asarray(rng.randint(0, 256, (batch * 4, 32, 32, 3),
                                     dtype=np.uint8))
    state = algo.init_state(jax.random.PRNGKey(0))
    # shipped default is the XLA path (Pallas is opt-in, VALIDATION.md);
    # the Amdahl share numbers must reflect the default behavior
    two_view = variants["two_view_xla"]

    def step_scan(state, key):
        def body(st, k):
            k1, k2, ka = jax.random.split(k, 3)
            idx = jnp.arange(batch, dtype=jnp.int32)
            raw = jnp.take(images, idx, axis=0)
            batch_dict = {
                "index": idx,
                "img": raw.astype(jnp.float32) / 255.0,
                "aug_1": two_view(jax.random.split(k1, batch), raw),
                "aug_2": two_view(jax.random.split(k2, batch), raw),
                "label": jnp.zeros((batch,), jnp.int32),
            }
            st, m = algo.train_step(st, batch_dict, ka)
            return st, m["loss"]
        return jax.lax.scan(body, state, jax.random.split(key, SCAN))

    jstep = jax.jit(step_scan)
    st, losses = jstep(state, key)
    float(losses[-1])
    t0 = time.perf_counter()
    st, losses = jstep(state, key)
    float(losses[-1])
    step_us = (time.perf_counter() - t0) / SCAN * 1e6
    results["full_step_us"] = round(step_us, 1)
    two_aug_us = 2 * results["two_view_xla_us"]
    results["aug_share_of_step"] = round(two_aug_us / step_us, 4)
    results["aug_share_of_step_pallas"] = round(
        2 * results["two_view_pallas_us"] / step_us, 4)
    results["geo_tail_share_of_step"] = round(
        2 * results["geometric_tail_us"] / step_us, 4)
    print(f"full step: {step_us:.1f} us | 2-view aug share "
          f"{results['aug_share_of_step']:.1%} | geometric tail share "
          f"{results['geo_tail_share_of_step']:.1%}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
