"""SeLA (reference models/sela.py): 10 linear cluster heads of 128 clusters
over the backbone; pseudo-labels from Sinkhorn-style alternating scaling of
log_softmax^lambda with persistent alpha/beta scalers; CE summed over heads;
"best head" = argmin per-head loss; re-labelling at quadratically spaced
epochs (sela.py:70,201-202).

The heads run as one batched einsum (models/heads.py ClusterHeads) instead
of a Python loop; self-labelling streams the train set through a jitted
per-batch kernel threading (alpha, beta) exactly like the reference's
persistent buffers (sela.py:73-74)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...models.heads import ClusterHeads
from ...models.registry import build_encoder
from ...objectives import sela_self_label, softmax_cross_entropy
from ...parallel.per_device import pmean_tree
from ..base import Algorithm, DataInfo, TrainState, apply_eval, apply_train, init_module


class SelaNet(nn.Module):
    encoder: nn.Module
    num_clusters: int
    num_heads: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = self.encoder(x, train=train)
        logits = ClusterHeads(self.num_heads, self.num_clusters,
                              name="cluster_heads")(f)
        return f, logits            # logits: (heads, batch, clusters)


class SeLA(Algorithm):
    name = "sela"
    batch_kind = "pseudolabel"

    def __init__(self, config, arch: str, data: DataInfo):
        super().__init__(config, arch, data)
        self.num_clusters = int(config["num_clusters"])
        self.num_heads = int(config["num_cluster_heads"])
        self.lmbda = float(config["lambda"])
        self.sl_iters = int(config["self_label_iters"])
        # "sinkhorn" (default) is the SeLA paper's actual optimal-transport
        # labelling: uniform-marginal Sinkhorn over softmax scores, argmax
        # per sample — guaranteed non-degenerate marginals. "reference"
        # reproduces sela.py:146-166 (log_softmax^lambda with randn
        # alpha/beta), which is collapse-prone by construction (loss -> 0
        # with all-one-cluster labels; VALIDATION.md) and is therefore kept
        # behind the flag rather than as the default.
        self.sl_mode = str(config.get("self_label_mode", "sinkhorn"))
        encoder, dim = build_encoder(arch, self.encoder_cfg())
        self.model = SelaNet(encoder=encoder, num_clusters=self.num_clusters,
                             num_heads=self.num_heads)
        # quadratically-spaced re-labelling epochs (sela.py:70)
        n = self.sl_iters
        self.sl_epochs = {int(self.epochs * (i / (n - 1)) ** 2)
                          for i in range(1, n - 1)}
        self.tx = self.make_tx()

    def init_state(self, rng) -> TrainState:
        k_m, k_a, k_b = jax.random.split(rng, 3)
        params, bstats = init_module(k_m, self.model, self.sample_image())
        extra = {
            "alpha": jax.random.normal(k_a, (self.num_clusters, 1)),
            "beta": jax.random.normal(k_b, (self.data.batch_size, 1)),
            "pseudo_labels": jnp.zeros((self.data.n_train,), jnp.int32),
            "best_head": jnp.zeros((), jnp.int32),
        }
        return TrainState(jnp.zeros((), jnp.int32), params, bstats,
                          self.tx.init(params), extra)

    # ------------------------------------------------------------------
    def _self_label(self, state, trainer):
        """One self-labelling sweep over the train set (sela.py:146-166)."""
        def logits_fn(st, images):
            _, logits = apply_eval(self.model, st.params, st.batch_stats, images)
            # best_head is read from the (traced) state so the jit-cached
            # sweep kernel never bakes in a stale head index
            return jnp.take(logits, st.extra["best_head"], axis=0)  # (B, K)

        alpha, beta = state.extra["alpha"], state.extra["beta"]
        pseudo = np.zeros((self.data.n_train,), np.int32)

        if self.sl_mode == "sinkhorn":
            from ...objectives import sinkhorn_codes

            sl = jax.jit(lambda logits: jnp.argmax(
                sinkhorn_codes(logits, eps=1.0 / max(self.lmbda, 1e-6),
                               n_iters=min(self.sl_iters, 30)), axis=-1))
            for logits_np, idx, count in trainer.stream_train(state, logits_fn):
                labels = sl(jnp.asarray(logits_np))
                pseudo[np.asarray(idx)[:count]] = np.asarray(labels)[:count]
        else:
            sl = jax.jit(lambda logits, a, b: sela_self_label(
                logits, a, b, lmbda=self.lmbda, n_iters=self.sl_iters))
            for logits_np, idx, count in trainer.stream_train(state, logits_fn):
                labels, alpha, beta = sl(jnp.asarray(logits_np), alpha, beta)
                pseudo[np.asarray(idx)[:count]] = np.asarray(labels)[:count]

        extra = {**state.extra, "alpha": alpha, "beta": beta,
                 "pseudo_labels": jnp.asarray(pseudo)}
        return state.replace(extra=extra)

    def pre_train(self, state, trainer):
        return self._self_label(state, trainer)

    def pre_epoch(self, state, trainer, epoch: int):
        if epoch in self.sl_epochs:
            return self._self_label(state, trainer)
        return state

    # ------------------------------------------------------------------
    def train_step(self, state, batch, key, axis=None):
        labels = state.extra["pseudo_labels"][batch["idx"]]

        def loss_fn(params):
            (_, logits), bs = apply_train(self.model, params, state.batch_stats,
                                          batch["aug"])
            per_head = jax.vmap(lambda lg: softmax_cross_entropy(lg, labels))(logits)
            return jnp.sum(per_head), (bs, per_head)

        params, opt_state, loss, (bstats, per_head) = self.grad_step(
            state, loss_fn, axis=axis, loss_scope="local")
        # best_head must be chosen from the GLOBAL per-head losses so every
        # replica agrees (sela.py:132-144 semantics)
        per_head = pmean_tree(per_head, axis)
        extra = {**state.extra, "best_head": jnp.argmin(per_head).astype(jnp.int32)}
        new = state.replace(step=state.step + 1, params=params,
                            batch_stats=pmean_tree(bstats, axis),
                            opt_state=opt_state, extra=extra)
        return new, {"loss": loss}

    def embed(self, state, images):
        f, _ = apply_eval(self.model, state.params, state.batch_stats, images)
        return f
