"""Barlow Twins (reference models/barlow.py): 3-layer projector with
L2-normalized output, cross-correlation loss (proj_dim 4096 per config)."""

from __future__ import annotations

import jax.numpy as jnp

from ...models.heads import barlow_projection, l2_normalize
from ...models.registry import build_encoder
from ...objectives import barlow_twins
from ...parallel.per_device import pgather, pmean_tree
from ..base import Algorithm, DataInfo, TrainState, apply_eval, init_module
from .common import Tower, forward_views


class BarlowTwins(Algorithm):
    name = "barlow"
    batch_kind = "double"

    def __init__(self, config, arch: str, data: DataInfo):
        super().__init__(config, arch, data)
        encoder, dim = build_encoder(arch, self.encoder_cfg())
        self.model = Tower(encoder=encoder,
                           proj=barlow_projection(int(config["proj_dim"]),
                                                  dtype=self.head_dtype))
        self.loss_cfg = dict(config.get("loss_fn", {}) or {})
        self.fuse = bool(config.get("fuse_views", False))
        self.tx = self.make_tx()

    def init_state(self, rng) -> TrainState:
        params, bstats = init_module(rng, self.model, self.sample_image())
        return TrainState(jnp.zeros((), jnp.int32), params, bstats,
                          self.tx.init(params), {})

    def train_step(self, state, batch, key, axis=None):
        def loss_fn(params):
            (z1, z2), bs = forward_views(self.model, params, state.batch_stats,
                                         [batch["aug_1"], batch["aug_2"]],
                                         self.fuse)
            # cross-correlation standardizes over the GLOBAL batch
            return barlow_twins(pgather(z1, axis), pgather(z2, axis),
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
