"""The ONE generic trainer.

Implements, once, the ~120-line scaffold every reference trainer duplicates
(SURVEY.md §2b): experiment init · train loop · KNN validation every
`eval_every` epochs · best-checkpoint saving · feature building · linear
eval — but TPU-shaped:

  * a whole epoch is ONE jitted `lax.scan` over (steps, batch)-shaped index
    matrices: augmentation, forward/backward, optimizer, EMA/queue updates
    all fuse into a single XLA program; the host sees one dispatch per epoch;
  * the global batch is sharded over the `data` axis of a
    `jax.sharding.Mesh`; params/state are replicated; XLA inserts gradient
    psums and the cross-batch collectives (sync-BN means, Sinkhorn column
    sums, NT-Xent global negatives) automatically because the step is jitted
    over globally-sharded arrays;
  * checkpoints are full-state Orbax saves (params, optimizer, EMA twins,
    queues/banks/centers, step) — true resume, unlike the reference's
    params-only best-model dumps (simclr.py:64-66, SURVEY §5).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..core.experiment import initialize_experiment
from ..data.pipeline import DataPipeline
from ..evals import compute_neighbor_accuracy, linear_evaluation
from ..parallel.mesh import batch_sharding, get_mesh, replicated
from ..utils.logging import get_wandb, progress_bar
from .base import DataInfo, TrainState
from .checkpoint import restore_state, save_state
from .registry import build_algorithm


class Trainer:
    def __init__(self, args: dict, overrides: dict | None = None,
                 allow_synthetic: bool = True,
                 synthetic_sizes: tuple[int, int] | None = None,
                 make_dirs: bool = True, seed: int = 420,
                 use_mesh: bool | None = None):
        self.args = dict(args)
        algo_name, arch = args["algo"], args["arch"]
        output_root = os.path.join("outputs", algo_name, arch)
        config, self.output_dir, self.logger = initialize_experiment(
            self.args, output_root, seed=seed, make_dirs=make_dirs)
        cfg = config.raw()
        if overrides:
            from ..core.config import _merge
            cfg = _merge(cfg, overrides)
        self.config = cfg

        self.wandb = get_wandb()
        self.run = self.wandb.init(
            project=(cfg.get("wandb") or {}).get("project"),
            output_dir=self.output_dir if make_dirs else None)

        self.pipeline = DataPipeline(cfg["data"], allow_synthetic=allow_synthetic,
                                     synthetic_sizes=synthetic_sizes)
        data_info = DataInfo(
            num_classes=self.pipeline.num_classes,
            n_train=self.pipeline.n_train,
            batch_size=self.pipeline.batch_size,
            steps_per_epoch=self.pipeline.steps_per_epoch,
        )
        self.data_info = data_info
        self.algorithm = build_algorithm(algo_name, cfg, arch, data_info)
        self.epochs = int(cfg["epochs"])
        self.eval_every = int(cfg.get("eval_every", 10))

        # Mesh shardings only pay off (and only change program semantics)
        # with >1 device; on a single chip explicit NamedSharding placement
        # is pure overhead, so default to plain placement there.
        if use_mesh is None:
            use_mesh = jax.device_count() > 1
        self.mesh = get_mesh() if use_mesh else None
        self.rng = jax.random.PRNGKey(seed)
        self.rng, init_rng = jax.random.split(self.rng)
        self.state: TrainState = self.algorithm.init_state(init_rng)

        # dataset arrays: replicated across the mesh; batches shard on axis 0
        self._train_arrays = self.pipeline.arrays("train")
        self._test_arrays = self.pipeline.arrays("test")
        if self.mesh is not None:
            rep = replicated(self.mesh)
            self._train_arrays = tuple(jax.device_put(a, rep) for a in self._train_arrays)
            self._test_arrays = tuple(jax.device_put(a, rep) for a in self._test_arrays)
            self.state = jax.device_put(self.state, rep)
        self._batch_sharding = batch_sharding(self.mesh) if self.mesh else None

        self._compile()
        self.best_metric = 0.0
        self.start_epoch = 1

        if self.args.get("load"):
            self.load_checkpoint(self.args["load"])

    # ------------------------------------------------------------------
    def _compile(self):
        algo = self.algorithm
        batch_fn = self.pipeline.make_batch_fn(algo.batch_kind)

        if self.config.get("per_device_bn") and self.mesh is not None:
            # shard_map path: per-device BN statistics, explicit collectives
            step_fn = algo.make_per_device_step(batch_fn, self.mesh)
        else:
            def step_fn(state, images, labels, idx, key):
                k_data, k_algo = jax.random.split(key)
                batch = batch_fn(images, labels, idx, k_data)
                return algo.train_step(state, batch, k_algo)

        def epoch_fn(state, images, labels, idx_mat, key):
            keys = jax.random.split(key, idx_mat.shape[0])

            def body(st, inp):
                idx, k = inp
                st, metrics = step_fn(st, images, labels, idx, k)
                return st, metrics  # full per-step metric dict

            return jax.lax.scan(body, state, (idx_mat, keys))

        self._step_fn = jax.jit(step_fn, donate_argnums=(0,))
        self._epoch_fn = jax.jit(epoch_fn, donate_argnums=(0,))
        self._post_epoch_fn = jax.jit(algo.post_epoch)

        eval_t = self.pipeline.make_eval_transform()

        def embed_batch(state, images, idx, feature_fn=None):
            raw = jnp.take(images, idx, axis=0)
            keys = jax.random.split(jax.random.PRNGKey(0), idx.shape[0])
            x = jax.vmap(eval_t)(keys, raw)
            return (feature_fn or algo.embed)(state, x)

        self._embed_batch = jax.jit(lambda s, im, ix: embed_batch(s, im, ix))
        self._embed_cache: dict = {}

    def _shard_idx(self, idx):
        if self._batch_sharding is not None:
            return jax.device_put(idx, self._batch_sharding)
        return idx

    def _shard_idx_mat(self, idx_mat):
        """(steps, batch) epoch index matrix: shard the batch axis so each
        data-parallel replica gathers/augments only its slice."""
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            return jax.device_put(idx_mat, NamedSharding(self.mesh, P(None, "data")))
        return idx_mat

    # ------------------------------------------------------------------
    # feature extraction (the reference's build_features, SURVEY §2b)
    # ------------------------------------------------------------------
    def features_for(self, state, split: str = "train",
                     feature_fn: Callable | None = None,
                     progress_desc: str | None = None):
        """Returns (fvecs, labels) as numpy, per-algorithm embed semantics."""
        images, labels = (self._train_arrays if split == "train"
                          else self._test_arrays)
        if feature_fn is None:
            fn = self._embed_batch
        else:
            # keyed by def-site, not just __qualname__: two distinct lambdas
            # share the qualname `<locals>.<lambda>` and must NOT collide,
            # while per-epoch recreations of the SAME source lambda must
            # still hit the cache (no re-jit every eval epoch)
            code = getattr(feature_fn, "__code__", None)
            key_ = ("feat", getattr(feature_fn, "__qualname__", repr(feature_fn)),
                    getattr(code, "co_filename", None),
                    getattr(code, "co_firstlineno", None))
            if key_ not in self._embed_cache:
                eval_t = self.pipeline.make_eval_transform()

                def embed_batch(state, images, idx):
                    raw = jnp.take(images, idx, axis=0)
                    ks = jax.random.split(jax.random.PRNGKey(0), idx.shape[0])
                    x = jax.vmap(eval_t)(ks, raw)
                    return feature_fn(state, x)

                self._embed_cache[key_] = jax.jit(embed_batch)
            fn = self._embed_cache[key_]

        chunks, gts = [], []
        batches = list(self.pipeline.eval_batches(split))
        for i, (idx, count) in enumerate(batches):
            z = fn(state, images, self._shard_idx(idx))
            chunks.append(np.asarray(z[:count]))
            gts.append(np.asarray(jnp.take(labels, idx[:count], axis=0)))
            if progress_desc:
                progress_bar(progress=(i + 1) / len(batches),
                             desc=progress_desc)
        return np.concatenate(chunks, 0), np.concatenate(gts, 0)

    def map_train(self, state, fn: Callable):
        """Apply fn(state, images)->pytree over the train split in order;
        returns concatenated numpy leaves (used by DeepCluster)."""
        images, _ = self._train_arrays
        key_ = ("map", getattr(fn, "__qualname__", repr(fn)))
        if key_ not in self._embed_cache:
            eval_t = self.pipeline.make_eval_transform()

            def batch(state, images, idx):
                raw = jnp.take(images, idx, axis=0)
                ks = jax.random.split(jax.random.PRNGKey(0), idx.shape[0])
                return fn(state, jax.vmap(eval_t)(ks, raw))

            self._embed_cache[key_] = jax.jit(batch)
        jfn = self._embed_cache[key_]
        outs = []
        for idx, count in self.pipeline.eval_batches("train"):
            vals = jfn(state, images, self._shard_idx(idx))
            outs.append(jax.tree_util.tree_map(lambda v: np.asarray(v[:count]),
                                               vals))
        treedef = jax.tree_util.tree_structure(outs[0])
        leaves = [jax.tree_util.tree_leaves(o) for o in outs]
        cat = [np.concatenate(parts, 0) for parts in zip(*leaves)]
        return jax.tree_util.tree_unflatten(treedef, cat)

    def stream_train(self, state, fn: Callable):
        """Yield (fn(state, images_batch), idx, count) over the train split
        in deterministic order (used by SeLA's self-labelling)."""
        images, _ = self._train_arrays
        key_ = ("stream", getattr(fn, "__qualname__", repr(fn)))
        if key_ not in self._embed_cache:
            eval_t = self.pipeline.make_eval_transform()

            def batch(state, images, idx):
                raw = jnp.take(images, idx, axis=0)
                ks = jax.random.split(jax.random.PRNGKey(0), idx.shape[0])
                return fn(state, jax.vmap(eval_t)(ks, raw))

            self._embed_cache[key_] = jax.jit(batch)
        jfn = self._embed_cache[key_]
        for idx, count in self.pipeline.eval_batches("train"):
            yield jfn(state, images, self._shard_idx(idx)), idx, count

    # ------------------------------------------------------------------
    # the reference API surface (duck-typed across all 11 trainers)
    # ------------------------------------------------------------------
    def build_features(self, split: str = "train"):
        return self.features_for(self.state, split,
                                 progress_desc=f"Building {split} features")

    def knn_validate(self) -> float:
        fvecs, gt = self.features_for(self.state, "test")
        return compute_neighbor_accuracy(fvecs, gt, k=20)

    def perform_linear_eval(self) -> float:
        train_vecs, train_gt = self.features_for(self.state, "train")
        test_vecs, test_gt = self.features_for(self.state, "test")
        acc = linear_evaluation(
            config=self.config.get("linear_eval", {}),
            train_data={"fvecs": train_vecs, "labels": train_gt},
            test_data={"fvecs": test_vecs, "labels": test_gt},
            num_classes=self.pipeline.num_classes)
        self.logger.write(f"Test linear eval accuracy: {acc:.4f}", mode="info")
        return acc

    def save_checkpoint(self, name: str = "best_model", epoch: int | None = None):
        path = os.path.join(self.output_dir, name)
        save_state(path, self.state)
        meta = {"best_metric": self.best_metric,
                "start_epoch": (epoch + 1) if epoch is not None else self.start_epoch}
        with open(os.path.join(self.output_dir, f"{name}.meta.json"), "w") as f:
            json.dump(meta, f)

    def load_checkpoint(self, ckpt_dir: str, name: str | None = None):
        """Restores full TrainState, with task-dependent preference:

        * `train` resume -> rolling `latest` first (exact resume of the full
          state incl. optimizer/banks), falling back to `best_model`;
        * inference tasks (`linear_eval`, `get_features`) -> `best_model`
          first — the reference semantics: its only saved checkpoint is the
          best-KNN one, which is what main.py:54-70 loads for those tasks —
          falling back to `latest`.

        Unlike the reference, whose load path checks a never-created file
        and cannot resume at all (simclr.py:69, SURVEY §2b/§5)."""
        if name:
            candidates = [name]
        elif self.args.get("task") == "train":
            candidates = ["latest", "best_model"]
        else:
            candidates = ["best_model", "latest"]
        for cand in candidates:
            path = os.path.join(ckpt_dir, cand)
            if os.path.exists(path):
                self.state = restore_state(path, self.state)
                if self.mesh is not None:
                    self.state = jax.device_put(self.state, replicated(self.mesh))
                meta_path = os.path.join(ckpt_dir, f"{cand}.meta.json")
                if os.path.exists(meta_path):
                    with open(meta_path) as f:
                        meta = json.load(f)
                    self.best_metric = meta.get("best_metric", 0.0)
                    self.start_epoch = meta.get("start_epoch", 1)
                self.logger.print(f"Loaded checkpoint from {path}", mode="info")
                return
        raise FileNotFoundError(f"No checkpoint under {ckpt_dir} ({candidates})")

    def _run_epoch_stepwise(self, state, images, labels, idx_mat, key, epoch):
        steps = idx_mat.shape[0]
        keys = jax.random.split(key, steps)
        collected: dict[str, list] = {}
        desc = f"[TRAIN] Epoch {epoch:4d}/{self.epochs:4d}"
        for s in range(steps):
            state, metrics = self._step_fn(state, images, labels,
                                           idx_mat[s], keys[s])
            for k, v in metrics.items():
                collected.setdefault(k, []).append(float(v))
            progress_bar(progress=(s + 1) / steps, desc=desc,
                         status=f"[loss] {collected['loss'][-1]:.4f}")
        print()
        return state, {k: jnp.asarray(v) for k, v in collected.items()}

    # ------------------------------------------------------------------
    def train(self):
        self.logger.print("Beginning training.", mode="info")
        images, labels = self._train_arrays
        if self.start_epoch == 1:
            state = self.algorithm.pre_train(self.state, self)
        else:
            # resumed: banks/state came from the checkpoint — don't re-init
            state = self.state

        # Observability: SSV_TPU_PROFILE_DIR captures a jax.profiler trace of
        # one steady-state epoch (the second, after compilation) for
        # inspection in XProf/TensorBoard (SURVEY §5: the reference has no
        # profiling at all).
        profile_dir = os.environ.get("SSV_TPU_PROFILE_DIR")
        # second epoch of THIS run = first steady-state (post-compile) epoch;
        # pin it now — self.start_epoch advances inside the loop (resume
        # bookkeeping), which would otherwise push the target out of reach
        profile_epoch = self.start_epoch + 1

        for epoch in range(self.start_epoch, self.epochs + 1):
            state = self.algorithm.pre_epoch(state, self, epoch)

            self.rng, k_perm, k_epoch = jax.random.split(self.rng, 3)
            idx_mat = self._shard_idx_mat(self.pipeline.epoch_indices(k_perm))
            profiling = profile_dir and epoch == profile_epoch
            if profiling:
                jax.profiler.start_trace(profile_dir)
            t0 = time.perf_counter()
            if self.config.get("jit_epoch", True):
                state, metrics = self._epoch_fn(state, images, labels, idx_mat,
                                                k_epoch)
            else:
                # step mode: one dispatch per step with a live progress bar —
                # the reference's UX (simclr.py:146-152), for debugging
                state, metrics = self._run_epoch_stepwise(
                    state, images, labels, idx_mat, k_epoch, epoch)
            state = self._post_epoch_fn(state, jnp.asarray(epoch))
            self.state = state  # keep the resumable snapshot current
            self.start_epoch = epoch + 1
            means = {k: float(np.asarray(v).mean()) for k, v in metrics.items()}
            dt = time.perf_counter() - t0
            if profiling:
                jax.profiler.stop_trace()
                self.logger.print(f"Profiler trace written to {profile_dir}",
                                  mode="info")

            ips = idx_mat.size / dt
            msg = (f"Epoch {epoch:4d}/{self.epochs:4d} "
                   + " ".join(f"[{k}] {v:.4f}" for k, v in means.items())
                   + f" [img/s] {ips:,.0f}")
            self.logger.write(msg, mode="train")
            self.wandb.log({"Train loss": means.get("loss", 0.0),
                            "images_per_sec": ips, "Epoch": epoch,
                            **{k: v for k, v in means.items() if k != "loss"}})

            if epoch % self.eval_every == 0:
                self.state = state
                knn_acc = self.knn_validate()
                self.logger.record(
                    f"Epoch {epoch:4d}/{self.epochs:4d} [accuracy] {knn_acc:.4f}",
                    mode="val")
                self.wandb.log({"KNN accuracy": knn_acc, "Epoch": epoch})
                if knn_acc > self.best_metric:
                    self.best_metric = knn_acc
                    self.save_checkpoint("best_model", epoch=epoch)
                # rolling resume point (full state incl. optimizer/banks)
                self.save_checkpoint("latest", epoch=epoch)

        self.state = state
        self.logger.print("Completed training. Beginning linear evaluation.",
                          mode="info")
        return self.perform_linear_eval()

    def train_safe(self):
        """train() with failure containment: on interrupt or error the full
        TrainState is flushed to `<output_dir>/latest` so the run resumes
        exactly (`--load <output_dir>`). The reference loses everything but
        the last best-KNN params on a crash (SURVEY §5)."""
        try:
            return self.train()
        except (KeyboardInterrupt, Exception):
            try:
                self.save_checkpoint("latest")
                self.logger.print(
                    f"Interrupted — state saved to {self.output_dir}/latest",
                    mode="error")
            except Exception:
                pass
            raise
