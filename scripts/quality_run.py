"""Quality runs on the real TPU: full-size shipped configs, many epochs,
periodic KNN eval, final linear probe. Used for

  * the PIRL soak (VERDICT round-1 item 5), and
  * the non-saturating synth100 ranking (VERDICT item 1b): with no CIFAR
    reachable (zero egress), synth100's phase-randomized shared-texture
    classes are the hardest learnable benchmark available — chance KNN is
    0.01 and raw-pixel similarity carries no class signal, so algorithm
    ordering is meaningful, unlike the saturating easy synthetic set.

Drives the SHIPPED configs/<algo>.yaml (reference hyperparameters: proj_dim
128, the reference train transforms, sgd/adamw settings), overriding only
epochs / eval cadence / dataset.

Usage:
  python scripts/quality_run.py --algos pirl --epochs 50 --tag pirl-soak
  python scripts/quality_run.py --algos byol,simclr,relic,moco,barlow,swav \
      --epochs 40 --dataset synth100 --tag synth100-rank

Appends a result table to VALIDATION.md (below the sweep marker, so it
survives sweep regenerations) and prints one JSON line per run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VALIDATION = os.path.join(REPO, "VALIDATION.md")

ARCH = {"dino": "vit"}  # default resnet18 otherwise


def _set_dotted(cfg: dict, key: str, value):
    """Apply `a.b.c=value` into nested dicts (creates intermediate dicts)."""
    parts = key.split(".")
    d = cfg
    for i, p in enumerate(parts[:-1]):
        if p in d and not isinstance(d[p], dict):
            raise ValueError(
                f"--set {key}: {'.'.join(parts[:i + 1])} is a scalar "
                f"({d[p]!r}), cannot descend into it")
        d = d.setdefault(p, {})
    d[parts[-1]] = value


# algorithms with a projector/predictor asymmetry, where the full-path
# metric (reference semantics: predictor/head output) can be noisy while
# the backbone representation is fine — their quality rows always carry
# the raw-backbone KNN column (VERDICT r3 item 5: SimSiam's shapes100
# full-path KNN swung 0.70->0.18->0.29 while its backbone sat at 0.95)
PROBE_DEFAULT = {"byol", "simsiam", "dino"}


def run_one(algo: str, epochs: int, dataset: str, eval_every: int,
            sizes: tuple[int, int], batch: int | None, overrides: dict,
            probe_encoder: bool = False, arch: str | None = None,
            resume: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ssv_tpu.train import Trainer

    with open(os.path.join(REPO, "configs", f"{algo}.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["epochs"] = epochs
    cfg["eval_every"] = eval_every
    cfg["data"]["dataset_name"] = dataset
    cfg["wandb"] = {"project": None}
    if batch:
        cfg["data"]["batch_size"] = batch
    for k, v in overrides.items():
        _set_dotted(cfg, k, v)

    d = f"/tmp/quality_{algo}_{dataset}"
    os.makedirs(d, exist_ok=True)
    with open(f"{d}/cfg.yaml", "w") as f:
        yaml.dump(cfg, f, sort_keys=False)
    os.chdir(d)
    args = {"config": f"{d}/cfg.yaml", "algo": algo,
            "arch": arch or ARCH.get(algo, "resnet18"), "task": "train",
            "output": "run", "load": None}

    t0 = time.time()
    tr = Trainer(args, synthetic_sizes=sizes)
    ds = tr.pipeline.dataset
    resolved = ds.name + (" → synthetic fallback" if ds.synthetic
                          and ds.name not in ("synth100", "shapes100") else "")
    resolved += f" ({len(ds.train.images):,} train / {len(ds.test.images):,} test)"
    print(f"[{algo}] dataset resolved: {resolved}", flush=True)
    images, labels = tr._train_arrays
    # Relay-truncation insurance (the 2026-08-17 hang killed a 1000-epoch
    # DINO run at epoch 700 with nothing to resume): full TrainState is
    # checkpointed at every eval epoch; --resume picks up from `latest`.
    start_epoch = 1
    if resume:
        try:
            tr.load_checkpoint(tr.output_dir)
            state = tr.state
            start_epoch = tr.start_epoch
            print(f"[{algo}] resumed from {tr.output_dir} at epoch "
                  f"{start_epoch}", flush=True)
        except FileNotFoundError:
            state = tr.algorithm.pre_train(tr.state, tr)
    else:
        state = tr.algorithm.pre_train(tr.state, tr)
    knn_curve, ips_hist, ent_curve, backbone_curve = [], [], [], []
    teacher_curve = []  # DINO mechanism probe (VERDICT r4 weak #1)
    nan_at = None
    # decide the backbone probe ONCE (advisor r3): default-on for the
    # asymmetric-head family, and only if the algorithm overrides the hook
    from ssv_tpu.train.base import Algorithm
    probe = ((probe_encoder or algo in PROBE_DEFAULT)
             and type(tr.algorithm).embed_backbone
             is not Algorithm.embed_backbone)

    def track_entropy(st):
        """Pseudo-label distribution entropy (VERDICT round-2 item 2): for
        SeLA/DeepCluster, loss -> 0 with collapsed labels is the failure
        mode per-epoch entropy >= 0.5*log K rules out."""
        if "pseudo_labels" not in getattr(st, "extra", {}):
            return
        counts = np.bincount(np.asarray(st.extra["pseudo_labels"]))
        p = counts[counts > 0] / counts.sum()
        ent_curve.append(round(float(-(p * np.log(p)).sum()), 3))

    for e in range(start_epoch, epochs + 1):
        state = tr.algorithm.pre_epoch(state, tr, e)
        track_entropy(state)
        tr.rng, k_perm, k_epoch = jax.random.split(tr.rng, 3)
        idx_mat = tr._shard_idx_mat(tr.pipeline.epoch_indices(k_perm))
        te = time.time()
        state, metrics = tr._epoch_fn(state, images, labels, idx_mat, k_epoch)
        state = tr._post_epoch_fn(state, jnp.asarray(e))
        loss = float(np.asarray(metrics["loss"]).mean())
        ips_hist.append(idx_mat.size / (time.time() - te))
        if not np.isfinite(loss):
            # terminal: params are NaN/inf — every later epoch is garbage
            # (measured: shapes100-dino-step-ema-1000ep NaN'd between ep
            # 200-300 and spent 700 epochs at chance). Record and stop.
            tr.state = state
            knn = tr.knn_validate()
            knn_curve.append((e, round(knn, 4)))
            nan_at = e
            print(f"[{algo}/{dataset}] epoch {e}: loss={loss} — NaN state "
                  f"is terminal, aborting (knn={knn:.4f})", flush=True)
            break
        if e % eval_every == 0 or e == epochs:
            tr.state = state
            tr.save_checkpoint("latest", epoch=e)
            knn = tr.knn_validate()
            knn_curve.append((e, round(knn, 4)))
            msg = (f"[{algo}/{dataset}] epoch {e}/{epochs} loss={loss:.4f} "
                   f"knn={knn:.4f} ips={ips_hist[-1]:,.0f}")
            if probe:
                from ssv_tpu.evals.knn import compute_neighbor_accuracy
                fv, gt = tr.features_for(
                    state, "test",
                    feature_fn=lambda st, x: tr.algorithm.embed_backbone(st, x))
                bk = compute_neighbor_accuracy(fv, gt, k=20)
                backbone_curve.append((e, round(bk, 4)))
                msg += f" knn_backbone={bk:.4f}"
            if hasattr(tr.algorithm, "teacher_stats"):
                # teacher-output distribution health: is the teacher's
                # effective target sample-dependent at all? (mi == 0 iff
                # sample-independent — the absorbing uniform point)
                t_out, _ = tr.features_for(
                    state, "test",
                    feature_fn=lambda st, x: tr.algorithm.embed_teacher(st, x))
                ts = tr.algorithm.teacher_stats(state, t_out)
                teacher_curve.append(
                    (e, round(ts["mi"], 5), f"{ts['prob_std']:.2e}",
                     round(ts["raw_std"], 4), round(ts["ent_frac"], 4)))
                msg += (f" t_mi={ts['mi']:.5f} t_pstd={ts['prob_std']:.2e}"
                        f" t_rawstd={ts['raw_std']:.4f}"
                        f" t_entfrac={ts['ent_frac']:.4f}")
            print(msg, flush=True)
    tr.state = state
    linear = tr.perform_linear_eval()
    extra_fields = {}
    if backbone_curve:
        extra_fields["knn_backbone_curve"] = backbone_curve
        extra_fields["best_knn_backbone"] = max(k for _, k in backbone_curve)
    if teacher_curve:
        extra_fields["teacher_probe_curve"] = teacher_curve
    if ent_curve:
        K = getattr(tr.algorithm, "num_clusters",
                    getattr(tr.algorithm, "num_classes", None))
        extra_fields.update({
            "pseudo_entropy_min": min(ent_curve),
            "pseudo_entropy_last": ent_curve[-1],
            "half_log_K": round(0.5 * float(np.log(K)), 3) if K else None,
        })
    if start_epoch > 1:
        extra_fields["resumed_at"] = start_epoch
    if nan_at is not None:
        extra_fields["nan_at"] = nan_at
    return {
        **extra_fields,
        "algo": algo, "dataset": dataset, "resolved_dataset": resolved,
        "epochs": epochs,
        "batch": cfg["data"]["batch_size"],
        "knn_curve": knn_curve,
        "best_knn": max(k for _, k in knn_curve),
        "final_knn": knn_curve[-1][1],
        "linear": round(float(linear), 4),
        "img_per_sec": round(max(ips_hist)),
        "wall_s": round(time.time() - t0),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--algos", required=True)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--dataset", default="cifar10",
                    help="cifar10 (synthetic fallback), synth100 "
                         "(phase-randomized textures: contrastive ranking) or "
                         "shapes100 (augmentation-invariant layouts: the "
                         "BYOL-family benchmark)")
    ap.add_argument("--eval-every", type=int, default=0,
                    help="0 = epochs//5")
    ap.add_argument("--n-train", type=int, default=50000)
    ap.add_argument("--n-test", type=int, default=10000)
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--tag", required=True)
    ap.add_argument("--set", action="append", default=[],
                    help="config override key=yaml_value; dotted keys descend "
                         "(data.transforms.train.random_resized_crop.scale=[0.5,1])")
    ap.add_argument("--arch", default=None,
                    help="override backbone (default: vit for dino, else resnet18)")
    ap.add_argument("--probe-encoder", action="store_true",
                    help="also report raw-backbone-feature KNN at eval epochs "
                         "(separates head collapse from representation "
                         "collapse); default-on for byol/simsiam/dino")
    ap.add_argument("--cpu", action="store_true",
                    help="debug on CPU (axon sitecustomize overrides "
                         "JAX_PLATFORMS, so this must be set in-process)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the run dir's `latest` checkpoint "
                         "(saved at every eval epoch) after a relay hang")
    ap.add_argument("--no-write", action="store_true",
                    help="skip the VALIDATION.md append (smoke tests)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    eval_every = args.eval_every or max(1, args.epochs // 5)
    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        overrides[k] = yaml.safe_load(v)

    # The VALIDATION table is appended INCREMENTALLY — header lazily at the
    # first finished algorithm, one row per algorithm as it completes —
    # because a multi-algo run can die mid-way (the axon relay hang of
    # 2026-08-17 truncated a run after hours) and the finished rows must
    # survive. Markdown table rows stand alone, so a truncated section is
    # still a valid table.
    header_written = False

    def append_row(r):
        nonlocal header_written
        if args.no_write:
            return
        with open(VALIDATION, "a") as f:
            if not header_written:
                resolved = r.get(
                    "resolved_dataset",
                    f"{args.dataset} ({args.n_train:,} train / {args.n_test:,} test)")
                import jax
                hw = ("Real v5e chip" if jax.default_backend() != "cpu"
                      else "CPU (relay-outage fallback — NOT TPU timing)")
                f.write(f"\n## Quality run: {args.tag}\n\n")
                f.write(f"{hw}, dataset `{resolved}`, "
                        f"{args.epochs} epochs, shipped full-size configs"
                        + (f", overrides {overrides}" if overrides else "") + ".\n\n")
                f.write("| algorithm | batch | KNN curve (epoch: acc) | best KNN | "
                        "backbone KNN (best) | linear | img/s/chip | wall |\n"
                        "|---|---|---|---|---|---|---|---|\n")
                header_written = True
            if "error" in r:
                f.write(f"| {r['algo']} | — | ERROR: {r['error']} | — | — | — | — | — |\n")
            else:
                curve = " ".join(f"{e}:{k}" for e, k in r["knn_curve"])
                if r.get("resumed_at"):
                    curve = f"(resumed @{r['resumed_at']}) " + curve
                if r.get("nan_at"):
                    curve += (f" — **loss NaN by epoch {r['nan_at']}, "
                              f"aborted (terminal state)**")
                bk = r.get("best_knn_backbone")
                f.write(f"| {r['algo']} | {r['batch']} | {curve} | "
                        f"{r['best_knn']} | {bk if bk is not None else '—'} | "
                        f"{r['linear']} | "
                        f"{r['img_per_sec']:,} | {r['wall_s']}s |\n")

    results = []
    for algo in args.algos.split(","):
        try:
            r = run_one(algo, args.epochs, args.dataset, eval_every,
                        (args.n_train, args.n_test), args.batch or None,
                        overrides, probe_encoder=args.probe_encoder,
                        arch=args.arch, resume=args.resume)
        except Exception as e:
            r = {"algo": algo, "error": f"{type(e).__name__}: {e}"}
        results.append(r)
        print(json.dumps(r), flush=True)
        append_row(r)

    if args.no_write or not header_written:
        return
    with open(VALIDATION, "a") as f:
        notes = [f"{r['algo']}: pseudo-label entropy min {r['pseudo_entropy_min']} "
                 f"/ last {r['pseudo_entropy_last']} (collapse bar 0.5·log K = "
                 f"{r['half_log_K']})"
                 for r in results if r.get("pseudo_entropy_min") is not None]
        if notes:
            f.write("\n" + "; ".join(notes) + ".\n")
        for r in results:
            if r.get("teacher_probe_curve"):
                rows = "; ".join(
                    f"ep{e}: mi={mi} prob_std={ps} raw_std={rs} ent_frac={ef}"
                    for e, mi, ps, rs, ef in r["teacher_probe_curve"])
                f.write(f"\n{r['algo']} teacher-output probe (test split; "
                        f"mi = H(mean p) − mean H(p), 0 iff the teacher is "
                        f"sample-independent): {rows}.\n")
        f.write("\nGenerated by scripts/quality_run.py.\n")
    print("WROTE", VALIDATION, flush=True)


if __name__ == "__main__":
    main()
