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

Relay-outage resilience (VERDICT r3 item 2): the measurement runs in a
subprocess; backend-init failures matching the axon-relay outage signatures
(UNAVAILABLE / "Unable to initialize backend" — the 2026-08-17 incident,
CLAUDE.md triage notes) are retried with generous backoff (default
60+120+300+600+900 s, covering the observed ~30-45 min wedge window). On
final failure the script still prints ONE structured JSON line
({"error": "relay_unavailable", ...}) instead of a raw traceback, so the
driver's BENCH capture always parses. Knobs (all env):
  SSV_BENCH_RETRY_SCHEDULE  comma-separated backoff seconds
  SSV_BENCH_FAIL_COUNTER    path to a file holding N: the next N inner
                            attempts fail with a fake UNAVAILABLE (kill-test
                            of the retry path; see tests/test_bench_retry.py)
  SSV_BENCH_CPU=1           force the CPU backend (tests)
  SSV_BENCH_STEPS / SSV_BENCH_NTRAIN / SSV_BENCH_BATCH  size overrides
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_IMG_PER_SEC = 2000.0  # estimate; overridden by BASELINE_MEASURED.json
V5E_PEAK_FLOPS = 197e12        # bf16 peak of one v5e chip
# batch-scaling study (VALIDATION.md): the headline stays at 512 (reference
# parity); SSV_BENCH_BATCH overrides for the 1024/2048 scaling rows
BATCH = int(os.environ.get("SSV_BENCH_BATCH", 512))
SCAN_STEPS = int(os.environ.get("SSV_BENCH_STEPS", 100))
N_TRAIN = int(os.environ.get("SSV_BENCH_NTRAIN", 8192))

# backend-init failure signatures that mean "relay outage, worth waiting out"
# (observed 2026-08-17: RuntimeError: Unable to initialize backend 'tpu':
# UNAVAILABLE: ...; probes holding no chip claim while stuck in init)
RETRYABLE_SIGNATURES = (
    "UNAVAILABLE",
    "Unable to initialize backend",
    "DEADLINE_EXCEEDED",
    "failed to connect",
)


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


def _retry_schedule() -> list[float]:
    raw = os.environ.get("SSV_BENCH_RETRY_SCHEDULE", "60,120,300,600,900")
    return [float(x) for x in raw.split(",") if x.strip()]


def _extract_json_line(stdout: str) -> str | None:
    """Last parseable JSON object line in the inner process's stdout."""
    found = None
    for ln in stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{") and ln.endswith("}"):
            try:
                json.loads(ln)
                found = ln
            except ValueError:
                pass
    return found


def run_with_retry(cmd: list[str], schedule: list[float] | None = None,
                   env: dict | None = None) -> int:
    """Run `cmd` (which prints one JSON result line on success), retrying
    relay-outage init failures with backoff. Always prints exactly one JSON
    line to stdout; non-JSON inner stdout and all inner stderr are relayed
    to stderr. Returns the exit code for the caller."""
    schedule = _retry_schedule() if schedule is None else schedule
    run_env = dict(os.environ if env is None else env)
    attempts = 0
    last_err, retryable = "", False
    for i in range(len(schedule) + 1):
        attempts += 1
        proc = subprocess.run(cmd, env=run_env, capture_output=True, text=True)
        json_line = _extract_json_line(proc.stdout)
        for ln in proc.stdout.splitlines():
            if ln.strip() != json_line:
                sys.stderr.write(ln + "\n")
        sys.stderr.write(proc.stderr)
        if proc.returncode == 0 and json_line:
            out = json.loads(json_line)
            if attempts > 1:
                out["attempts"] = attempts
            print(json.dumps(out))
            return 0
        blob = proc.stderr + proc.stdout
        err_lines = [ln for ln in proc.stderr.splitlines() if ln.strip()]
        last_err = err_lines[-1] if err_lines else f"rc={proc.returncode}"
        retryable = any(s in blob for s in RETRYABLE_SIGNATURES)
        if not retryable or i == len(schedule):
            break
        sys.stderr.write(f"[bench] backend-init failure (attempt {attempts}); "
                         f"retrying in {schedule[i]:.0f}s — relay outages "
                         f"recover in ~30-45 min (CLAUDE.md)\n")
        sys.stderr.flush()
        time.sleep(schedule[i])
    print(json.dumps({
        "metric": "ssl_pretrain_images_per_sec_per_chip",
        "value": None, "unit": "images/sec/chip", "vs_baseline": None,
        "error": "relay_unavailable" if retryable else "bench_failed",
        "attempts": attempts, "last_error": last_err[-500:],
    }))
    return 1


def _maybe_fake_outage():
    """Kill-test hook: SSV_BENCH_FAIL_COUNTER=<file holding N> makes the
    next N inner attempts die with the real outage signature, exercising
    the classify/backoff/relay path without touching the TPU."""
    path = os.environ.get("SSV_BENCH_FAIL_COUNTER")
    if not path:
        return
    try:
        n = int(open(path).read().strip() or 0)
    except (OSError, ValueError):
        n = 0
    if n > 0:
        with open(path, "w") as f:
            f.write(str(n - 1))
        raise RuntimeError(
            "FAKE OUTAGE: Unable to initialize backend 'tpu': UNAVAILABLE: "
            "injected by SSV_BENCH_FAIL_COUNTER")


def main():
    _maybe_fake_outage()
    import jax

    if os.environ.get("SSV_BENCH_CPU"):
        # the axon sitecustomize force-overrides JAX_PLATFORMS at interpreter
        # start, so CPU mode must be requested in-process
        jax.config.update("jax_platforms", "cpu")

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

    n_train = N_TRAIN
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
        # the measured baseline is a batch-512 pipeline: the ratio is only
        # apples-to-apples at the headline batch (advisor r3)
        "vs_baseline": round(ips / baseline, 2) if BATCH == 512 else None,
        "baseline_img_per_sec": baseline,
        "baseline_source": baseline_src,
        "baseline_batch": 512,
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
    if os.environ.get("SSV_BENCH_INNER"):
        main()
    else:
        sys.exit(run_with_retry(
            [sys.executable, os.path.abspath(__file__)],
            env=dict(os.environ, SSV_BENCH_INNER="1")))
