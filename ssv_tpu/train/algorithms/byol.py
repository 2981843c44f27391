"""BYOL (reference models/byol.py): online encoder+proj+pred vs EMA target
encoder+proj, symmetric MSE on L2-normalized outputs.

Parity notes:
  * the loss is literally MSELoss on normalized embeddings (byol.py:89,
    126-130) — equal to 2-2cos up to the 1/D MSE scaling; preserved.
  * tau follows the cosine ramp tau_lower -> tau_upper over the *global*
    step (the published recipe). The reference resets its ramp every epoch
    (byol.py:77,192 — within-epoch step vs epochs*steps denominator), which
    pins tau ~= tau_lower; set tau_upper == tau_lower to reproduce that.
  * the target network is separately initialized (not copied), like
    byol.py:70-71.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...models.heads import byol_mlp
from ...models.registry import build_encoder
from ...objectives import byol_mse
from ...parallel.per_device import pmean_tree
from ...state.ema import ema_update
from ...utils.schedules import cosine_ramp
from ..base import Algorithm, DataInfo, TrainState, apply_eval, init_module
from .common import Tower, forward_views


class BYOL(Algorithm):
    name = "byol"
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
        self.fuse = bool(config.get("fuse_views", False))
        self.tx = self.make_tx()

    def init_state(self, rng) -> TrainState:
        k_o, k_t = jax.random.split(rng)
        params, bstats = init_module(k_o, self.online, self.sample_image())
        t_params, t_bstats = init_module(k_t, self.target, self.sample_image())
        extra = {"target_params": t_params, "target_batch_stats": t_bstats}
        return TrainState(jnp.zeros((), jnp.int32), params, bstats,
                          self.tx.init(params), extra)

    def _tau(self, step):
        return cosine_ramp(step, self.total_steps, self.tau_lower, self.tau_upper)

    def train_step(self, state, batch, key, axis=None):
        # target forward (no grad path; its own BN stats advance — per-device
        # under shard_map, exactly the torch-DDP semantics of byol.py:120-123)
        (t1, t2), t_bs = forward_views(
            self.target, state.extra["target_params"],
            state.extra["target_batch_stats"],
            [batch["aug_1"], batch["aug_2"]], self.fuse)

        def loss_fn(params):
            (o1, o2), bs = forward_views(self.online, params, state.batch_stats,
                                         [batch["aug_1"], batch["aug_2"]],
                                         self.fuse)
            return byol_mse(o1, o2, t1, t2), bs

        params, opt_state, loss, bstats = self.grad_step(
            state, loss_fn, axis=axis, loss_scope="local")

        tau = self._tau(state.step)
        online_sub = {"encoder": params["encoder"], "proj": params["proj"]}
        t_params = ema_update(state.extra["target_params"], online_sub, tau)
        new = state.replace(
            step=state.step + 1, params=params,
            batch_stats=pmean_tree(bstats, axis), opt_state=opt_state,
            extra={"target_params": t_params,
                   "target_batch_stats": pmean_tree(t_bs, axis)})
        return new, {"loss": loss, "tau": tau}

    def embed(self, state, images):
        # reference build_features uses the full online network (byol.py:103-118)
        return apply_eval(self.online, state.params, state.batch_stats, images)

    def embed_backbone(self, state, images):
        return apply_eval(self.online.encoder, state.params["encoder"],
                          state.batch_stats.get("encoder", {}), images)
