"""ReLIC (reference models/relic.py): BYOL-style online/target towers;
NT-Xent between online view and target of the other view, plus a KL
invariance penalty anchored on the online features of the *un-augmented*
image (relic.py:125-131)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...models.heads import byol_mlp
from ...models.registry import build_encoder
from ...objectives import relic_loss
from ...parallel.per_device import pgather, pmean_tree
from ...state.ema import ema_update
from ...utils.schedules import cosine_ramp
from ..base import Algorithm, DataInfo, TrainState, apply_eval, init_module
from .common import Tower, forward_views


class ReLIC(Algorithm):
    name = "relic"
    batch_kind = "double"

    def __init__(self, config, arch: str, data: DataInfo):
        super().__init__(config, arch, data)
        proj_dim = int(config["proj_dim"])
        encoder, dim = build_encoder(arch, self.encoder_cfg())
        encoder_t, _ = build_encoder(arch, self.encoder_cfg())
        dt = self.head_dtype
        self.online = Tower(encoder=encoder, proj=byol_mlp(dim, proj_dim, dt),
                            pred=byol_mlp(proj_dim, proj_dim, dt), norm_out=True)
        self.target = Tower(encoder=encoder_t, proj=byol_mlp(dim, proj_dim, dt),
                            norm_out=True)
        self.tau_lower = float(config.get("tau_lower", config.get("tau", 0.996)))
        self.tau_upper = float(config.get("tau_upper", 1.0))
        self.loss_cfg = dict(config.get("loss_fn", {}) or {})
        # fuse_views=true: target's 2 forwards -> 1, online's 3 forwards
        # (aug_1/aug_2/orig) -> 1 of a 3N batch — the hottest fix for
        # ReLIC's four-forwards-per-step cost (VERDICT r1 item 7)
        self.fuse = bool(config.get("fuse_views", False))
        self.tx = self.make_tx()

    def init_state(self, rng) -> TrainState:
        k_o, k_t = jax.random.split(rng)
        params, bstats = init_module(k_o, self.online, self.sample_image())
        t_params, t_bstats = init_module(k_t, self.target, self.sample_image())
        extra = {"target_params": t_params, "target_batch_stats": t_bstats}
        return TrainState(jnp.zeros((), jnp.int32), params, bstats,
                          self.tx.init(params), extra)

    def train_step(self, state, batch, key, axis=None):
        (t1, t2), t_bs = forward_views(
            self.target, state.extra["target_params"],
            state.extra["target_batch_stats"],
            [batch["aug_1"], batch["aug_2"]], self.fuse)
        # NT-Xent negatives AND the KL's batch-softmax rows span the GLOBAL
        # batch, so all five embeddings gather under per-device BN
        t1g = pgather(jax.lax.stop_gradient(t1), axis)
        t2g = pgather(jax.lax.stop_gradient(t2), axis)

        def loss_fn(params):
            (o1, o2, orig), bs = forward_views(
                self.online, params, state.batch_stats,
                [batch["aug_1"], batch["aug_2"], batch["img"]], self.fuse)
            o1g, o2g = pgather(o1, axis), pgather(o2, axis)
            origg = pgather(orig, axis)
            loss = (relic_loss(o1g, t2g, origg, **self.loss_cfg)
                    + relic_loss(o2g, t1g, origg, **self.loss_cfg))
            return loss, bs

        params, opt_state, loss, bstats = self.grad_step(
            state, loss_fn, axis=axis, loss_scope="global")
        tau = cosine_ramp(state.step, self.total_steps, self.tau_lower, self.tau_upper)
        online_sub = {"encoder": params["encoder"], "proj": params["proj"]}
        t_params = ema_update(state.extra["target_params"], online_sub, tau)
        new = state.replace(
            step=state.step + 1, params=params,
            batch_stats=pmean_tree(bstats, axis), opt_state=opt_state,
            extra={"target_params": t_params,
                   "target_batch_stats": pmean_tree(t_bs, axis)})
        return new, {"loss": loss}

    def embed(self, state, images):
        return apply_eval(self.online, state.params, state.batch_stats, images)
