"""MoCo (reference models/moco.py): query/key encoders (key = EMA of query,
initialized as a copy, moco.py:72-74), InfoNCE against an on-device ring
queue of past normalized keys (queue_size 1000, configs/moco.yaml:7).

The reference's CPU-resident queue with per-row Python writes and a per-step
`.to(device)` (moco.py:31-36,117) becomes a RingBuffer pytree in HBM updated
by one scatter inside the jitted step."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...models.heads import LinearHead, l2_normalize
from ...models.registry import build_encoder
from ...objectives import moco_nce
from ...parallel.per_device import pgather, pmean_tree
from ...state.banks import RingBuffer, ring_push
from ...state.ema import ema_update
from ..base import Algorithm, DataInfo, TrainState, apply_eval, apply_train, init_module
from .common import Tower


class MoCo(Algorithm):
    name = "moco"
    batch_kind = "double"

    def __init__(self, config, arch: str, data: DataInfo):
        super().__init__(config, arch, data)
        self.proj_dim = int(config["proj_dim"])
        encoder, dim = build_encoder(arch, self.encoder_cfg())
        self.model = Tower(encoder=encoder,
                           proj=LinearHead(self.proj_dim, pre_relu=True,
                                           dtype=self.head_dtype))
        self.queue_size = int(config["queue_size"])
        self.m = float(config.get("momentum", 0.999))
        self.loss_cfg = dict(config.get("loss_fn", {}) or {})
        self.tx = self.make_tx()

    def init_state(self, rng) -> TrainState:
        params, bstats = init_module(rng, self.model, self.sample_image())
        extra = {
            # key encoder starts as an exact copy (moco.py:72)
            "key_params": jax.tree_util.tree_map(jnp.copy, params),
            "key_batch_stats": jax.tree_util.tree_map(jnp.copy, bstats),
            "queue": RingBuffer(jnp.zeros((self.queue_size, self.proj_dim),
                                          jnp.float32), jnp.zeros((), jnp.int32)),
        }
        return TrainState(jnp.zeros((), jnp.int32), params, bstats,
                          self.tx.init(params), extra)

    def train_step(self, state, batch, key, axis=None):
        keys_out, k_bs = apply_train(self.model, state.extra["key_params"],
                                     state.extra["key_batch_stats"], batch["aug_2"])
        keys_out = jax.lax.stop_gradient(keys_out)

        def loss_fn(params):
            q, bs = apply_train(self.model, params, state.batch_stats, batch["aug_1"])
            # positives are per-sample dots, negatives the replicated queue:
            # a device-local per-sample mean (loss_scope="local" below)
            loss = moco_nce(q, keys_out, state.extra["queue"].data, **self.loss_cfg)
            return loss, bs

        params, opt_state, loss, bstats = self.grad_step(
            state, loss_fn, axis=axis, loss_scope="local")
        key_params = ema_update(state.extra["key_params"], params, self.m)
        # queue must advance by the GLOBAL batch, replica-consistently
        queue = ring_push(state.extra["queue"],
                          l2_normalize(pgather(keys_out, axis)))
        new = state.replace(
            step=state.step + 1, params=params,
            batch_stats=pmean_tree(bstats, axis), opt_state=opt_state,
            extra={"key_params": key_params,
                   "key_batch_stats": pmean_tree(k_bs, axis),
                   "queue": queue})
        return new, {"loss": loss}

    def embed(self, state, images):
        z = apply_eval(self.model, state.params, state.batch_stats, images)
        return l2_normalize(z)
