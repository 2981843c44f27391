"""DeepCluster (reference models/deep_cluster.py): per-epoch K-means over
the encoder's normalized train-set features, Hungarian-matched to the
classifier head's current predictions, then cross-entropy training on the
resulting pseudo-labels.

Replaces faiss.Kmeans (deep_cluster.py:111-114) with the vmapped on-device
Lloyd solver in ops/kmeans.py. Divergence (documented): the reference's
pseudo-label dataloader construction cannot run as written
(`get_pseudolabel_dataloaders(images, final_labels, batch_size)` mismatches
the factory signature, deep_cluster.py:118 — SURVEY §2) and would have
trained on un-augmented images; we train on the augmented view (aug_1),
which is the DeepCluster recipe the code was aiming at.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...evals.hungarian import hungarian_match
from ...models.heads import l2_normalize
from ...models.registry import build_encoder
from ...objectives import softmax_cross_entropy
from ...ops.kmeans import kmeans
from ...parallel.per_device import pmean_tree
from ..base import Algorithm, DataInfo, TrainState, apply_eval, apply_train, init_module


class DCNet(nn.Module):
    encoder: nn.Module
    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = l2_normalize(self.encoder(x, train=train))
        logits = nn.Dense(self.num_classes, name="clf_head")(f)
        return f, logits


class DeepCluster(Algorithm):
    name = "deep_cluster"
    batch_kind = "double"

    def __init__(self, config, arch: str, data: DataInfo):
        super().__init__(config, arch, data)
        self.num_classes = int(config.get("num_classes", data.num_classes))
        encoder, dim = build_encoder(arch, self.encoder_cfg())
        self.model = DCNet(encoder=encoder, num_classes=self.num_classes)
        km = dict(config.get("kmeans", {}) or {})
        self.kmeans_iters = int(km.get("n_iters", 300))
        self.kmeans_redo = int(km.get("n_redo", 10))
        self.tx = self.make_tx()

    def init_state(self, rng) -> TrainState:
        params, bstats = init_module(rng, self.model, self.sample_image())
        extra = {"pseudo_labels": jnp.zeros((self.data.n_train,), jnp.int32)}
        return TrainState(jnp.zeros((), jnp.int32), params, bstats,
                          self.tx.init(params), extra)

    def _features_and_preds(self, state, images):
        f, logits = apply_eval(self.model, state.params, state.batch_stats, images)
        return f, jnp.argmax(logits, axis=-1)

    def pre_epoch(self, state, trainer, epoch: int):
        """generate_pseudolabels (deep_cluster.py:100-118): features over the
        (deterministically transformed) train set -> K-means -> Hungarian
        match of cluster ids to current head predictions."""
        feats, preds = trainer.map_train(state, self._features_and_preds)
        _, clusters, _ = kmeans(jax.random.PRNGKey(int(epoch)), jnp.asarray(feats),
                                k=self.num_classes, n_iters=self.kmeans_iters,
                                n_redo=self.kmeans_redo)
        cls_map = hungarian_match(jax.device_get(clusters), preds,
                                  self.num_classes, self.num_classes)
        import numpy as np
        lut = np.zeros((self.num_classes,), np.int32)
        for c, t in cls_map.items():
            lut[c] = t
        pseudo = jnp.asarray(lut)[clusters]
        return state.replace(extra={"pseudo_labels": pseudo})

    def train_step(self, state, batch, key, axis=None):
        labels = state.extra["pseudo_labels"][batch["index"]]

        def loss_fn(params):
            (_, logits), bs = apply_train(self.model, params, state.batch_stats,
                                          batch["aug_1"])
            return softmax_cross_entropy(logits, labels), bs

        params, opt_state, loss, bstats = self.grad_step(
            state, loss_fn, axis=axis, loss_scope="local")
        new = state.replace(step=state.step + 1, params=params,
                            batch_stats=pmean_tree(bstats, axis),
                            opt_state=opt_state, extra=state.extra)
        return new, {"loss": loss}

    def embed(self, state, images):
        f, _ = apply_eval(self.model, state.params, state.batch_stats, images)
        return f
