"""Headline benchmark: SSL pretrain throughput (images/sec/chip).

Workload: SimCLR ResNet-18, CIFAR-10 shapes, global batch 512, the full
production train step — on-device two-view augmentation pipeline (color
jitter / grayscale / random-resized-crop / flip / normalize), bf16 ResNet
forward+backward, NT-Xent over the global batch, SGD+momentum update —
executed exactly how `Trainer` runs it: a `lax.scan` over steps inside one
jitted program (one host dispatch per epoch). Timing is forced honest by
fetching the final loss, which depends on the whole step chain.

Baseline: the reference publishes no throughput numbers (SURVEY.md §6).
BASELINE.json's target is >=10x the reference pipeline's rate. The
reference's train loop is gated by its host-side data path (PIL augmentation
in 4 DataLoader workers + per-step H2D, models/simclr.py); we MEASURE that
path's throughput ceiling on this machine with
scripts/measure_host_baseline.py and read the result from
BASELINE_MEASURED.json (falling back to the round-1 2,000 img/s estimate of
a V100-class reference setup if the measurement has not been run).

Also reports MFU: XLA's own cost analysis of the compiled epoch program
gives exact FLOPs; divided by wall time and the v5e's 197 bf16-TFLOP/s peak.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import time

BASELINE_IMG_PER_SEC = 2000.0  # estimate; overridden by BASELINE_MEASURED.json
V5E_PEAK_FLOPS = 197e12        # bf16 peak of one v5e chip
# batch-scaling study (VALIDATION.md): the headline stays at 512 (reference
# parity); SSV_BENCH_BATCH overrides for the 1024/2048 scaling rows
BATCH = int(os.environ.get("SSV_BENCH_BATCH", 512))
SCAN_STEPS = 100


def _measured_baseline() -> tuple[float, str, float | None]:
    """Denominator for vs_baseline. We take the CONSERVATIVE max of the
    V100-class estimate and the measured same-host reference-pipeline
    ceiling: this box has 1 CPU, so its measured 549 img/s PIL pipeline
    would *inflate* vs_baseline ~4x if used alone. Both numbers are
    reported so the claim is auditable."""
    p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BASELINE_MEASURED.json")
    measured = None
    try:
        with open(p) as f:
            measured = float(json.load(f)["value"])
    except (OSError, KeyError, ValueError):
        pass
    if measured is not None and measured > BASELINE_IMG_PER_SEC:
        return measured, "measured reference host pipeline (this machine)", measured
    return (BASELINE_IMG_PER_SEC,
            "estimated V100-class reference pipeline (conservative: exceeds "
            "the measured same-host ceiling)", measured)


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

    # exact per-step FLOPs from XLA's cost model of the compiled train step
    # (augmentation + fwd/bwd + optimizer); the epoch program is SCAN_STEPS
    # identical steps, so flops/epoch = SCAN_STEPS * flops/step
    step_flops = None
    try:
        cost = (jax.jit(train_step)
                .lower(state, images, idx_mat_for(0)[0], jax.random.PRNGKey(0))
                .compile().cost_analysis())
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        step_flops = float(cost["flops"])
    except Exception:
        pass

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
    baseline, baseline_src, measured = _measured_baseline()
    out = {
        "metric": "ssl_pretrain_images_per_sec_per_chip",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / baseline, 2),
        "baseline_img_per_sec": baseline,
        "baseline_source": baseline_src,
        "batch": BATCH,
    }
    if measured is not None:
        out["measured_host_pipeline_img_per_sec"] = measured
    if step_flops is not None:
        tflops = step_flops * SCAN_STEPS / dt / n_chips / 1e12
        out["model_tflops_per_sec_per_chip"] = round(tflops, 2)
        out["mfu"] = round(tflops * 1e12 / V5E_PEAK_FLOPS, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
