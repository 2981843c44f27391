"""Trainer-side abstractions.

The reference implements eleven structurally-identical trainer classes by
copy-paste (SURVEY.md §2b — the ~120-line scaffold repeated in every
models/*.py). Here that scaffold exists ONCE (train/trainer.py) and each
algorithm is a small object with three pure functions:

    init_state(rng)                  -> TrainState
    train_step(state, batch, key)    -> (TrainState, metrics)   [jit/scan-safe]
    embed(state, images)             -> features                [jit-safe]

plus optional hooks (`post_epoch` for per-epoch EMA/temperature updates,
`pre_train` for bank initialization, `pre_epoch` for pseudo-label rounds).
All mutable training state — including EMA twins, queues, centers, Sinkhorn
scalers and pseudo-labels — lives in `TrainState.extra`, so checkpointing is
one pytree save and the whole step stays inside one compiled program.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

import flax
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray          # () int32, global step
    params: Any                # trainable params
    batch_stats: Any           # BN running stats of the trainable net
    opt_state: Any
    extra: Any                 # algorithm-specific state pytree (dict)


@dataclass
class DataInfo:
    num_classes: int
    n_train: int
    batch_size: int
    steps_per_epoch: int
    image_size: int = 32


def init_module(rng, module, *sample_inputs, **kwargs):
    variables = module.init(rng, *sample_inputs, train=True, **kwargs)
    return variables.get("params", {}), variables.get("batch_stats", {})


def apply_train(module, params, batch_stats, *inputs, **kwargs):
    """Forward in train mode; returns (out, new_batch_stats)."""
    out, updates = module.apply(
        {"params": params, "batch_stats": batch_stats}, *inputs, train=True,
        mutable=["batch_stats"], **kwargs)
    return out, updates["batch_stats"]


def apply_eval(module, params, batch_stats, *inputs, **kwargs):
    return module.apply({"params": params, "batch_stats": batch_stats},
                        *inputs, train=False, **kwargs)


class Algorithm:
    """Base class; subclasses live in train/algorithms/."""

    name: str = "base"
    batch_kind: str = "double"

    def __init__(self, config, arch: str, data: DataInfo):
        self.config = config
        self.arch = arch
        self.data = data
        self.epochs = int(config["epochs"])
        self.total_steps = self.epochs * data.steps_per_epoch
        # `compute_dtype: float32` switches every encoder/head matmul off
        # bf16 — bf16 gradients are reduction-order-dependent, so exact
        # sharded-vs-single equivalence (tests/test_sharding.py) and any
        # bitwise-repro debugging need the f32 mode. Default (None) keeps
        # the bf16 MXU path.
        self.compute_dtype = config.get("compute_dtype")

    def encoder_cfg(self) -> dict:
        """Encoder config block with `compute_dtype` folded in."""
        cfg = dict(self.config.get("encoder") or {})
        if self.compute_dtype:
            cfg.setdefault("dtype", self.compute_dtype)
        return cfg

    @property
    def head_dtype(self):
        import jax.numpy as jnp
        return jnp.dtype(self.compute_dtype) if self.compute_dtype else jnp.bfloat16

    # -- required -----------------------------------------------------
    def init_state(self, rng) -> TrainState:
        raise NotImplementedError

    def train_step(self, state: TrainState, batch: dict, key, axis=None):
        """One optimizer step. `axis=None` is the ordinary jit-sharded
        (sync-BN) path; `axis="data"` runs device-locally inside shard_map
        with explicit collectives (parallel/per_device.py contract)."""
        raise NotImplementedError

    def embed(self, state: TrainState, images):
        """Features used for KNN validation / linear eval / get_features —
        per-algorithm semantics of the reference's build_features."""
        raise NotImplementedError

    def embed_backbone(self, state: TrainState, images):
        """Raw encoder features (before any projection/prediction head), or
        None if the algorithm has no separate backbone. Diagnostic surface:
        separates representation collapse (backbone dead) from head collapse
        (backbone fine, projector/predictor degenerate) — the distinction
        that matters when a negative-free method flatlines."""
        return None

    # -- optional hooks ------------------------------------------------
    def post_epoch(self, state: TrainState, epoch) -> TrainState:
        """Jitted per-epoch state update (e.g. DINO's per-epoch teacher EMA)."""
        return state

    def pre_train(self, state: TrainState, trainer) -> TrainState:
        """One-time setup needing data access (e.g. bank initialization)."""
        return state

    def pre_epoch(self, state: TrainState, trainer, epoch: int) -> TrainState:
        """Host-level per-epoch work (e.g. K-means pseudo-labelling)."""
        return state

    def make_per_device_step(self, batch_fn, mesh):
        """shard_map step with per-device BN stats (config `per_device_bn`).
        Generic for every algorithm: train_step is axis-aware — see
        parallel/per_device.py for the collective contract."""
        from ..parallel.per_device import make_per_device_step
        return make_per_device_step(self, batch_fn, mesh)

    # -- shared helpers -------------------------------------------------
    def lr_fn(self) -> Callable:
        from ..utils.schedules import lr_schedule
        return lr_schedule(dict(self.config["optimizer"]),
                           dict(self.config.get("scheduler", {}) or {}),
                           epochs=self.epochs,
                           steps_per_epoch=self.data.steps_per_epoch)

    def make_tx(self, lr_fn=None, weight_decay_fn=None, grad_clip=None):
        from .optim import get_optimizer
        return get_optimizer(dict(self.config["optimizer"]),
                             lr_fn or self.lr_fn(),
                             weight_decay_fn=weight_decay_fn,
                             grad_clip=grad_clip)

    def epoch_of(self, step):
        return step // self.data.steps_per_epoch

    def grad_step(self, state: TrainState, loss_fn, axis=None,
                  loss_scope: str = "local", update_mask=None):
        """value_and_grad + optimizer update. `loss_fn(params) -> (loss, aux)`
        where aux carries at least the updated batch_stats.

        `update_mask(updates) -> updates` runs on the OPTIMIZER updates (not
        the raw grads) so a masked subtree is truly frozen — zeroing grads
        alone would still let adamw's decoupled weight decay move it (DINO's
        first-epoch last-layer freeze sets torch grads to None, which skips
        the whole update).

        Under shard_map (`axis` set) gradients are reduced across replicas
        with the collective matching how the loss was built:
          * loss_scope="global" — loss computed identically on every replica
            from all_gather-ed embeddings: replica grads are additive shares
            through the gather transpose -> psum;
          * loss_scope="local" — loss is a device-local per-sample mean:
            the global loss is the replica pmean -> pmean of grads.
        """
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        if axis is not None:
            from jax import lax
            red = lax.psum if loss_scope == "global" else lax.pmean
            grads = jax.tree_util.tree_map(lambda g: red(g, axis), grads)
            loss = lax.pmean(loss, axis)
        import optax
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        if update_mask is not None:
            updates = update_mask(updates)
        params = optax.apply_updates(state.params, updates)
        return params, opt_state, loss, aux

    def sample_image(self, size: int | None = None):
        s = size or self.data.image_size
        return jnp.zeros((2, s, s, 3), jnp.float32)
