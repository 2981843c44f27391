"""SimCLR (reference models/simclr.py): shared encoder + 2-layer BN
projection head over two augmented views, NT-Xent loss."""

from __future__ import annotations

import jax.numpy as jnp

from ...models.heads import l2_normalize, simclr_projection
from ...models.registry import build_encoder
from ...objectives import nt_xent
from ...parallel.per_device import pgather, pmean_tree
from ..base import Algorithm, DataInfo, TrainState, apply_eval, apply_train, init_module
from .common import Tower


class SimCLR(Algorithm):
    name = "simclr"
    batch_kind = "double"

    def __init__(self, config, arch: str, data: DataInfo):
        super().__init__(config, arch, data)
        encoder, dim = build_encoder(arch, self.encoder_cfg())
        self.model = Tower(encoder=encoder,
                           proj=simclr_projection(dim, int(config["proj_dim"]),
                                                  dtype=self.head_dtype))
        self.loss_cfg = dict(config.get("loss_fn", {}) or {})
        # fuse_views=true runs both views through ONE forward of a 2N batch
        # (the SimCLR paper's actual formulation; halves kernel launches and
        # doubles the MXU batch). Default false = the reference's two
        # sequential forwards with per-view BN statistics.
        self.fuse = bool(config.get("fuse_views", False))
        self.tx = self.make_tx()

    def init_state(self, rng) -> TrainState:
        params, bstats = init_module(rng, self.model, self.sample_image())
        return TrainState(jnp.zeros((), jnp.int32), params, bstats,
                          self.tx.init(params), {})

    def train_step(self, state, batch, key, axis=None):
        def loss_fn(params):
            if self.fuse:
                zb, bs = apply_train(self.model, params, state.batch_stats,
                                     jnp.concatenate([batch["aug_1"],
                                                      batch["aug_2"]], 0))
                z1, z2 = jnp.split(zb, 2, axis=0)
            else:
                z1, bs = apply_train(self.model, params, state.batch_stats,
                                     batch["aug_1"])
                z2, bs = apply_train(self.model, params, bs, batch["aug_2"])
            # negatives are the GLOBAL batch even under per-device BN
            return nt_xent(pgather(z1, axis), pgather(z2, axis),
                           **self.loss_cfg), bs

        params, opt_state, loss, bstats = self.grad_step(
            state, loss_fn, axis=axis, loss_scope="global")
        new = state.replace(step=state.step + 1, params=params,
                            batch_stats=pmean_tree(bstats, axis),
                            opt_state=opt_state)
        return new, {"loss": loss}

    def embed(self, state, images):
        z = apply_eval(self.model, state.params, state.batch_stats, images)
        return l2_normalize(z)
