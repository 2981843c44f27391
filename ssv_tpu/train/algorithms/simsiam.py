"""SimSiam (reference models/simsiam.py): 3-layer projector + bottleneck
predictor, symmetric negative-cosine loss.

`target_mode` config:
  * "stopgrad" (default) — the paper's formulation: the target branch is the
    online projector output under stop_gradient. The reference instead keeps
    a *separate, frozen, never-updated* random target network
    (simsiam.py:87-88; no momentum_update in the file) — a major deviation
    from the paper that caps its accuracy; SURVEY.md §7 directs fixing this
    behind a flag with the corrected default.
  * "frozen" — faithful reference behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...models.heads import simsiam_predictor, simsiam_projector
from ...models.registry import build_encoder
from ...objectives import simsiam_neg_cosine
from ...parallel.per_device import pmean_tree
from ..base import Algorithm, DataInfo, TrainState, apply_eval, apply_train, init_module
from .common import Tower, forward_views


class SimSiam(Algorithm):
    name = "simsiam"
    batch_kind = "double"

    def __init__(self, config, arch: str, data: DataInfo):
        super().__init__(config, arch, data)
        proj_dim = int(config["proj_dim"])
        bottleneck = int(config.get("bottleneck_dim", 128))
        encoder, dim = build_encoder(arch, self.encoder_cfg())
        # projector input is encoder_dim; reference projector maps
        # encoder_dim -> proj_dim -> proj_dim -> proj_dim
        dt = self.head_dtype
        self.online = Tower(encoder=encoder,
                            proj=simsiam_projector(proj_dim, dtype=dt),
                            pred=simsiam_predictor(proj_dim, bottleneck,
                                                   dtype=dt),
                            norm_out=True)
        self.mode = str(config.get("target_mode", "stopgrad"))
        self.fuse = bool(config.get("fuse_views", False))
        if self.mode == "frozen":
            encoder_t, _ = build_encoder(arch, self.encoder_cfg())
            self.target = Tower(encoder=encoder_t,
                                proj=simsiam_projector(proj_dim, dtype=dt),
                                norm_out=True)
        self.tx = self.make_tx()

    def init_state(self, rng) -> TrainState:
        k_o, k_t = jax.random.split(rng)
        params, bstats = init_module(k_o, self.online, self.sample_image())
        extra = {}
        if self.mode == "frozen":
            t_params, t_bstats = init_module(k_t, self.target, self.sample_image())
            extra = {"target_params": t_params, "target_batch_stats": t_bstats}
        return TrainState(jnp.zeros((), jnp.int32), params, bstats,
                          self.tx.init(params), extra)

    def train_step(self, state, batch, key, axis=None):
        if self.mode == "frozen":
            (t1, t2), t_bs = forward_views(
                self.target, state.extra["target_params"],
                state.extra["target_batch_stats"],
                [batch["aug_1"], batch["aug_2"]], self.fuse)

            def loss_fn(params):
                (o1, o2), bs = forward_views(
                    self.online, params, state.batch_stats,
                    [batch["aug_1"], batch["aug_2"]], self.fuse)
                loss = 0.5 * (simsiam_neg_cosine(o1, t2) + simsiam_neg_cosine(o2, t1))
                return loss, bs

            params, opt_state, loss, bstats = self.grad_step(
                state, loss_fn, axis=axis, loss_scope="local")
            extra = {"target_params": state.extra["target_params"],
                     "target_batch_stats": pmean_tree(t_bs, axis)}
        else:
            def loss_fn(params):
                # ONE pass per view yields both branches: the target branch
                # (projector output, stop-grad in the loss) is an
                # intermediate of the predictor path — the reference's
                # 4-forward structure re-computes it (simsiam.py:122-132)
                if self.fuse:
                    (zb, ob), bs = apply_train(
                        self.online, params, state.batch_stats,
                        jnp.concatenate([batch["aug_1"], batch["aug_2"]], 0),
                        return_pair=True)
                    z1, z2 = jnp.split(zb, 2, axis=0)
                    o1, o2 = jnp.split(ob, 2, axis=0)
                else:
                    (z1, o1), bs = apply_train(self.online, params,
                                               state.batch_stats,
                                               batch["aug_1"], return_pair=True)
                    (z2, o2), bs = apply_train(self.online, params, bs,
                                               batch["aug_2"], return_pair=True)
                loss = 0.5 * (simsiam_neg_cosine(o1, z2) + simsiam_neg_cosine(o2, z1))
                return loss, bs

            params, opt_state, loss, bstats = self.grad_step(
                state, loss_fn, axis=axis, loss_scope="local")
            extra = state.extra

        new = state.replace(step=state.step + 1, params=params,
                            batch_stats=pmean_tree(bstats, axis),
                            opt_state=opt_state, extra=extra)
        return new, {"loss": loss}

    def embed(self, state, images):
        return apply_eval(self.online, state.params, state.batch_stats, images)

    def embed_backbone(self, state, images):
        return apply_eval(self.online.encoder, state.params["encoder"],
                          state.batch_stats.get("encoder", {}), images)
