"""SwAV (reference models/swav.py): encoder + fc-bn-gelu-fc-bn projector
(L2-normalized), 3000 trainable L2-normalized prototypes, Sinkhorn-Knopp
code assignment and swapped-prediction loss; a 3000-row feature bank of past
embeddings fattens the assignment problem for small batches (swav.py:57-79),
initialized from a full pass over the train set (swav.py:97,131-135)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...models.heads import Prototypes, swav_projection
from ...models.registry import build_encoder
from ...objectives import swav_loss
from ...parallel.per_device import pgather, pmean_tree
from ...state.banks import RingBuffer, ring_push
from ..base import Algorithm, DataInfo, TrainState, apply_eval, init_module
from .common import Tower, forward_views


class SwAV(Algorithm):
    name = "swav"
    batch_kind = "double"

    def __init__(self, config, arch: str, data: DataInfo):
        super().__init__(config, arch, data)
        self.proj_dim = int(config["proj_dim"])
        encoder, dim = build_encoder(arch, self.encoder_cfg())
        self.model = Tower(encoder=encoder,
                           proj=swav_projection(int(config["hidden_dim"]),
                                                self.proj_dim,
                                                dtype=self.head_dtype))
        self.prototypes = Prototypes(int(config["prototype_size"]), self.proj_dim)
        self.bank_size = int(config["feature_bank_size"])
        self.loss_cfg = dict(config.get("loss_fn", {}) or {})
        self.fuse = bool(config.get("fuse_views", False))
        self.tx = self.make_tx()

    def init_state(self, rng) -> TrainState:
        k_m, k_p = jax.random.split(rng)
        m_params, bstats = init_module(k_m, self.model, self.sample_image())
        p_params = self.prototypes.init(k_p)["params"]
        params = {"model": m_params, "prototypes": p_params}
        extra = {"bank": RingBuffer(jnp.zeros((self.bank_size, self.proj_dim),
                                              jnp.float32), jnp.zeros((), jnp.int32))}
        return TrainState(jnp.zeros((), jnp.int32), params, bstats,
                          self.tx.init(params), extra)

    def pre_train(self, state, trainer):
        # fill the bank with train-set features (reference swav.py:131-135
        # takes the last bank_size rows of a full build_features pass)
        fvecs, _ = trainer.features_for(state, split="train")
        rows = jnp.asarray(fvecs[-self.bank_size:])
        return state.replace(extra={"bank": ring_push(state.extra["bank"], rows)})

    def train_step(self, state, batch, key, axis=None):
        bank = state.extra["bank"]

        def loss_fn(params):
            (z1, z2), bs = forward_views(self.model, params["model"],
                                         state.batch_stats,
                                         [batch["aug_1"], batch["aug_2"]],
                                         self.fuse)
            # Sinkhorn's row/column marginals span the GLOBAL batch (+ bank)
            z1g, z2g = pgather(z1, axis), pgather(z2, axis)
            protos = self.prototypes.apply({"params": params["prototypes"]})
            loss = swav_loss(z1g, z2g, protos, bank_features=bank.data,
                             **self.loss_cfg)
            return loss, (bs, z1g, z2g)

        params, opt_state, loss, (bstats, z1g, z2g) = self.grad_step(
            state, loss_fn, axis=axis, loss_scope="global")
        new_bank = ring_push(bank, jax.lax.stop_gradient(
            jnp.concatenate([z1g, z2g], axis=0)))
        new = state.replace(step=state.step + 1, params=params,
                            batch_stats=pmean_tree(bstats, axis),
                            opt_state=opt_state, extra={"bank": new_bank})
        return new, {"loss": loss}

    def embed(self, state, images):
        # model output is L2-normalized by the head (swav.py:36-41)
        return apply_eval(self.model, state.params["model"], state.batch_stats,
                          images)
