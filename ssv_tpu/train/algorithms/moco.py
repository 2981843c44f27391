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
        encoder, dim = build_encoder(arch, config.get("encoder"))
        self.model = Tower(encoder=encoder,
                           proj=LinearHead(self.proj_dim, pre_relu=True))
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

    def train_step(self, state, batch, key):
        keys_out, k_bs = apply_train(self.model, state.extra["key_params"],
                                     state.extra["key_batch_stats"], batch["aug_2"])
        keys_out = jax.lax.stop_gradient(keys_out)

        def loss_fn(params):
            q, bs = apply_train(self.model, params, state.batch_stats, batch["aug_1"])
            loss = moco_nce(q, keys_out, state.extra["queue"].data, **self.loss_cfg)
            return loss, bs

        params, opt_state, loss, bstats = self.grad_step(state, loss_fn)
        key_params = ema_update(state.extra["key_params"], params, self.m)
        queue = ring_push(state.extra["queue"], l2_normalize(keys_out))
        new = state.replace(
            step=state.step + 1, params=params, batch_stats=bstats,
            opt_state=opt_state,
            extra={"key_params": key_params, "key_batch_stats": k_bs,
                   "queue": queue})
        return new, {"loss": loss}

    def embed(self, state, images):
        z = apply_eval(self.model, state.params, state.batch_stats, images)
        return l2_normalize(z)

    def make_per_device_step(self, batch_fn, mesh):
        """Per-device-BN shard_map step. The queue must stay replica-
        consistent, so local keys are all_gather-ed before the push; the
        positives are per-sample dot products (local by construction) and
        the negatives come from the replicated queue, so the local CE means
        pmean to the exact global loss."""
        import optax
        from jax import lax, shard_map
        from jax.sharding import PartitionSpec as P

        def local_step(state, images, labels, idx, key):
            key = jax.random.fold_in(key, lax.axis_index("data"))
            k_data, _ = jax.random.split(key)
            batch = batch_fn(images, labels, idx, k_data)

            keys_out, k_bs = apply_train(self.model, state.extra["key_params"],
                                         state.extra["key_batch_stats"],
                                         batch["aug_2"])
            keys_out = jax.lax.stop_gradient(keys_out)

            def loss_fn(params):
                q, bs = apply_train(self.model, params, state.batch_stats,
                                    batch["aug_1"])
                loss = moco_nce(q, keys_out, state.extra["queue"].data,
                                **self.loss_cfg)
                return loss, bs

            (loss, bstats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            grads = lax.psum(grads, "data")
            loss = lax.pmean(loss, "data")
            bstats = jax.tree_util.tree_map(lambda x: lax.pmean(x, "data"), bstats)
            k_bs = jax.tree_util.tree_map(lambda x: lax.pmean(x, "data"), k_bs)

            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            key_params = ema_update(state.extra["key_params"], params, self.m)
            keys_global = lax.all_gather(keys_out, "data", axis=0, tiled=True)
            queue = ring_push(state.extra["queue"], l2_normalize(keys_global))
            new = state.replace(
                step=state.step + 1, params=params, batch_stats=bstats,
                opt_state=opt_state,
                extra={"key_params": key_params, "key_batch_stats": k_bs,
                       "queue": queue})
            return new, {"loss": loss}

        return shard_map(
            local_step, mesh=mesh,
            in_specs=(P(), P(), P(), P("data"), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
