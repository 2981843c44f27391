"""Run every algorithm for a few epochs on the real TPU and record a
validation table (VALIDATION.md): per-algorithm loss trajectory, KNN
accuracy, and steady-state throughput. Uses the synthetic dataset (no CIFAR
on disk in this environment) — the point is that all 11 production train
loops compile, run at speed, and learn on real hardware.

Also the per-algorithm throughput regression guard (VERDICT round-1 item 6):
every row is compared against BENCH_FLOORS.json; any algorithm below
0.8x its recorded floor fails the sweep (exit 1). Run with --update-floors
to raise the floors to the new measurements.

Usage: python scripts/tpu_sweep.py [epochs] [--update-floors]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLOORS_PATH = os.path.join(REPO, "BENCH_FLOORS.json")
VALIDATION = os.path.join(REPO, "VALIDATION.md")
MARKER = "<!-- sweep-table-end -->"
FLOOR_RATIO = 0.8

# (row name, algo, arch, batch, config overrides)
SWEEP = [
    ("simclr", "simclr", "resnet18", 256, {}),
    ("moco", "moco", "resnet18", 256, {}),
    ("byol", "byol", "resnet18", 256, {}),
    ("simsiam", "simsiam", "resnet18", 256, {}),
    ("relic", "relic", "resnet18", 256, {}),
    ("relic+fuse", "relic", "resnet18", 256, {"fuse_views": True}),
    ("barlow", "barlow", "resnet18", 256, {}),
    ("swav", "swav", "resnet18", 256, {}),
    ("pirl", "pirl", "resnet18", 256, {}),
    ("deep_cluster", "deep_cluster", "resnet18", 256, {}),
    ("sela", "sela", "resnet18", 250, {}),
    ("dino", "dino", "vit", 32, {}),  # fuse_views auto-on for ViT (exact)
]


def main():
    epochs = 3
    update_floors = "--update-floors" in sys.argv
    sweep = SWEEP
    for i, a in enumerate(sys.argv[1:], 1):
        if a.isdigit():
            epochs = int(a)
        elif a == "--only":
            names = set(sys.argv[i + 1].split(","))
            sweep = [s for s in SWEEP if s[0] in names]
    import jax
    if "--cpu" in sys.argv:  # smoke-test path; sitecustomize overrides env
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from helpers import mini_config
    from ssv_tpu.train import Trainer

    results = []
    for name, algo, arch, bs, overrides in sweep:
        t0 = time.time()
        try:
            cfg = mini_config(algo, epochs=epochs, batch_size=bs)
            cfg["eval_every"] = epochs
            if algo == "deep_cluster":
                cfg["kmeans"] = {"n_iters": 50, "n_redo": 3}
            if algo == "sela":
                cfg["self_label_iters"] = 20
            cfg.update(overrides)
            d = f"/tmp/sweep_{name.replace('+', '_')}"
            os.makedirs(d, exist_ok=True)
            with open(f"{d}/cfg.yaml", "w") as f:
                yaml.dump(cfg, f, sort_keys=False)
            os.chdir(d)
            args = {"config": f"{d}/cfg.yaml", "algo": algo, "arch": arch,
                    "task": "train", "output": "run", "load": None}
            tr = Trainer(args, synthetic_sizes=(10240, 2048))
            images, labels = tr._train_arrays
            state = tr.algorithm.pre_train(tr.state, tr)
            losses, ips = [], []
            for e in range(1, epochs + 1):
                state = tr.algorithm.pre_epoch(state, tr, e)
                idx_mat = tr.pipeline.epoch_indices(jax.random.PRNGKey(e))
                te = time.time()
                state, metrics = tr._epoch_fn(state, images, labels, idx_mat,
                                              jax.random.PRNGKey(100 + e))
                state = tr._post_epoch_fn(state, jnp.asarray(e))
                loss = float(np.asarray(metrics["loss"]).mean())
                dt = time.time() - te
                losses.append(round(loss, 4))
                ips.append(idx_mat.size / dt)
            tr.state = state
            knn = tr.knn_validate()
            results.append({
                "algo": name, "arch": arch, "batch": bs,
                "losses": losses, "knn": round(knn, 4),
                "img_per_sec": round(max(ips)),
                "wall_s": round(time.time() - t0),
            })
            print(f"[{name}] losses={losses} knn={knn:.4f} "
                  f"ips={max(ips):,.0f} ({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:  # record failures, keep sweeping
            results.append({"algo": name, "error": f"{type(e).__name__}: {e}"})
            print(f"[{name}] FAILED {type(e).__name__}: {e}", flush=True)

    if "--no-write" in sys.argv:  # smoke runs: no floors/VALIDATION update
        print(json.dumps(results), flush=True)
        return

    # ---- throughput floors (regression guard) ----
    floors = {}
    if os.path.exists(FLOORS_PATH):
        with open(FLOORS_PATH) as f:
            floors = json.load(f)
    regressions = []
    for r in results:
        if "error" in r:
            regressions.append(f"{r['algo']}: {r['error']}")
            continue
        floor = floors.get(r["algo"])
        if floor and r["img_per_sec"] < FLOOR_RATIO * floor:
            regressions.append(
                f"{r['algo']}: {r['img_per_sec']:,} img/s < "
                f"{FLOOR_RATIO:.0%} of floor {floor:,}")
    if update_floors:
        for r in results:
            if "error" not in r:
                floors[r["algo"]] = r["img_per_sec"]
        with open(FLOORS_PATH, "w") as f:
            json.dump(floors, f, indent=1, sort_keys=True)
        print(f"WROTE {FLOORS_PATH}", flush=True)

    # ---- VALIDATION.md: regenerate the table, preserve manual sections ----
    manual = ""
    if os.path.exists(VALIDATION):
        prev = open(VALIDATION).read()
        if MARKER in prev:
            manual = prev.split(MARKER, 1)[1]
    with open(VALIDATION, "w") as f:
        f.write("# VALIDATION — all-algorithm TPU sweep\n\n")
        f.write(f"Real v5e chip, synthetic CIFAR-shaped data (10,240 train / "
                f"2,048 test; no CIFAR on disk, zero egress), {epochs} epochs "
                "each through the production Trainer path (on-device "
                "augmentation, scan-per-epoch). KNN = 20-NN label agreement "
                "on the test split. img/s = best steady-state epoch. "
                "`+fuse` rows set `fuse_views: true` (per-view forwards "
                "concatenated into one MXU-sized forward); dino-ViT fuses "
                "by default (exact for LayerNorm towers).\n\n")
        f.write("| algorithm | arch | batch | per-epoch loss | KNN | img/s/chip |\n")
        f.write("|---|---|---|---|---|---|\n")
        for r in results:
            if "error" in r:
                f.write(f"| {r['algo']} | — | — | ERROR: {r['error']} | — | — |\n")
            else:
                f.write(f"| {r['algo']} | {r['arch']} | {r['batch']} | "
                        f"{' → '.join(str(x) for x in r['losses'])} | "
                        f"{r['knn']} | {r['img_per_sec']:,} |\n")
        f.write("\nThroughput floors: BENCH_FLOORS.json; the sweep fails if "
                f"any algorithm drops below {FLOOR_RATIO:.0%} of its floor.\n")
        f.write("\nGenerated by scripts/tpu_sweep.py.\n")
        f.write(f"\n{MARKER}\n")
        f.write(manual if manual.strip() else "")
    print("WROTE", VALIDATION, flush=True)
    print(json.dumps(results), flush=True)

    if regressions and not update_floors:
        print("THROUGHPUT REGRESSIONS:\n  " + "\n  ".join(regressions),
              flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
