"""DINO (reference models/dino.py): student/teacher towers (ViT or ResNet)
with 3-layer GELU + weight-normed heads; multi-crop (2 global + 6 local)
self-distillation with teacher centering.

Schedule parity (all pure functions of the global step here):
  * teacher temperature: linear warmup 0.04 -> 0.07 over 30 epochs
    (dino.py:113-120);
  * weight decay: cosine ramp 0.04 -> 0.4 per epoch (dino.py:122-127),
    wired into the optimizer as a scheduled coupled decay;
  * teacher EMA: per-EPOCH update with cosine lambda 0.996 -> 1.0
    (dino.py:129-134,227) — implemented in `post_epoch`, matching the
    reference's unusual per-epoch (not per-step) momentum teacher;
  * center: per-step EMA (momentum 0.9) of teacher outputs, randn init
    (dino.py:68,136-141);
  * per-element gradient clamp +-gradient_clip (dino.py:75-79).

Corrected-recipe switches (same policy as PIRL's corrected NCE, SeLA's
log-domain Sinkhorn and SimSiam's stop-grad default — learning-relevant
defects of the reference recipe stay available behind the faithful default):

  * ``teacher_update: epoch`` (faithful default) | ``step`` — the per-EPOCH
    teacher EMA is a reference quirk; the DINO paper updates the teacher
    every STEP with the cosine lambda over total steps. On hard data the
    per-epoch quirk makes the uniform centering fixed point absorbing
    (measured: VALIDATION.md, shapes100-dino-1000ep — loss pinned at
    2*ln(K) for 700 epochs); per-step EMA is the escape hatch.
  * ``center_init: randn`` (faithful, dino.py:68) | ``zeros`` — the paper
    registers a zero center buffer; randn init injects a spurious O(1)
    offset that the momentum-0.9 center EMA takes ~44 steps to forget.
  * ``freeze_last_layer: 0`` (faithful — the reference has no freeze) |
    N — the paper's cancel_gradients_last_layer: the weight-normed output
    layer is fully frozen for the first N epochs (paper uses 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...models.heads import DinoHead
from ...models.registry import build_encoder
from ...objectives import dino_loss
from ...parallel.per_device import pmean_tree
from ...state.ema import ema_update
from ...utils.schedules import cosine_ramp, dino_teacher_temp
from ..base import Algorithm, DataInfo, TrainState, apply_eval, init_module
from .common import Tower, forward_views


class DINO(Algorithm):
    name = "dino"
    batch_kind = "multicrop"

    def __init__(self, config, arch: str, data: DataInfo):
        super().__init__(config, arch, data)
        head_cfg = dict(config["proj_head"])
        self.proj_dim = int(head_cfg["proj_dim"])
        enc_s, dim = build_encoder(arch, self.encoder_cfg())
        enc_t, _ = build_encoder(arch, self.encoder_cfg())
        dt = self.head_dtype
        self.student = Tower(encoder=enc_s,
                             proj=DinoHead(int(head_cfg["hidden_dim"]),
                                           self.proj_dim, dtype=dt))
        self.teacher = Tower(encoder=enc_t,
                             proj=DinoHead(int(head_cfg["hidden_dim"]),
                                           self.proj_dim, dtype=dt))

        self.temp_student = float(config.get("student_temp", 0.1))
        self.temp_t_lower = float(config.get("teacher_temp_lower", 0.04))
        self.temp_t_upper = float(config.get("teacher_temp_upper", 0.07))
        self.temp_warmup_epochs = int(config.get("temp_warmup_epochs", 30))
        self.center_m = float(config.get("center_momentum", 0.9))
        self.lambda_lower = float(config.get("lambda_lower", 0.996))
        self.lambda_upper = float(config.get("lambda_upper", 1.0))
        self.wd_lower = float(config.get("weight_decay_lower", 0.04))
        self.wd_upper = float(config.get("weight_decay_upper", 0.4))
        self.teacher_update = str(config.get("teacher_update", "epoch"))
        if self.teacher_update not in ("epoch", "step"):
            raise ValueError(
                f"teacher_update must be 'epoch' (faithful) or 'step' (paper "
                f"recipe), got {self.teacher_update!r}")
        self.center_init = str(config.get("center_init", "randn"))
        if self.center_init not in ("randn", "zeros"):
            raise ValueError(
                f"center_init must be 'randn' (faithful) or 'zeros' (paper), "
                f"got {self.center_init!r}")
        # paper recipe (DINO utils.cancel_gradients_last_layer): the head's
        # weight-normed output layer is fully frozen for the first N epochs
        # so early gradients shape the backbone, not the prototype layer.
        # 0 (faithful default — the reference has no freeze) | N epochs.
        self.freeze_last_layer = int(config.get("freeze_last_layer", 0))

        mc = dict(config["data"]["multicrop_config"])
        self.global_size = tuple(mc["global_size"])
        self.local_size = tuple(mc["local_size"])
        # fuse_views=true: teacher 2 global forwards -> 1; student 2 global
        # + 2 local forwards -> 1 + 1. EXACT for ViT (LayerNorm only, no
        # cross-sample coupling); a documented BN-batch choice for ResNet.
        # Biggest win on the tiny local crops, which underfill the MXU.
        # Default: auto — on for the BN-free ViT tower (bit-equivalent, see
        # tests/test_fuse_views.py), off for conv/BN towers (reference
        # parity: dino.py:143-163 runs per-view forwards).
        fuse_cfg = config.get("fuse_views")
        self.fuse = (arch == "vit") if fuse_cfg is None else bool(fuse_cfg)

        spe = data.steps_per_epoch

        def wd_fn(step):
            return cosine_ramp(step // spe, self.epochs, self.wd_lower, self.wd_upper)

        self.tx = self.make_tx(weight_decay_fn=wd_fn,
                               grad_clip=config.get("gradient_clip"))

    def init_state(self, rng) -> TrainState:
        k_s, k_t, k_c = jax.random.split(rng, 3)
        g = jnp.zeros((2, *self.global_size, 3), jnp.float32)
        params, bstats = init_module(k_s, self.student, g)
        t_params, t_bstats = init_module(k_t, self.teacher, g)
        # local-size forward once so any size-dependent params exist (ViT
        # creates both pos tables unconditionally; ResNet has none).
        extra = {
            "teacher_params": t_params,
            "teacher_batch_stats": t_bstats,
            "center": (jnp.zeros((1, self.proj_dim))
                       if self.center_init == "zeros"
                       else jax.random.normal(k_c, (1, self.proj_dim))),
        }
        return TrainState(jnp.zeros((), jnp.int32), params, bstats,
                          self.tx.init(params), extra)

    def _flat(self, views):
        b, v = views.shape[:2]
        return views.reshape(b * v, *views.shape[2:]), b, v

    def train_step(self, state, batch, key, axis=None):
        g1, b, vg = self._flat(batch["global_1"])
        g2, _, _ = self._flat(batch["global_2"])
        l1, _, vl = self._flat(batch["local_1"])
        l2, _, _ = self._flat(batch["local_2"])

        epoch = state.step // self.data.steps_per_epoch
        temp_t = dino_teacher_temp(epoch, lower=self.temp_t_lower,
                                   upper=self.temp_t_upper,
                                   warmup_epochs=self.temp_warmup_epochs)

        # teacher on global views only (no grad; its BN stats advance)
        (t1, t2), t_bs = forward_views(
            self.teacher, state.extra["teacher_params"],
            state.extra["teacher_batch_stats"], [g1, g2], self.fuse)
        t1 = jax.lax.stop_gradient(t1).reshape(b, vg, -1)
        t2 = jax.lax.stop_gradient(t2).reshape(b, vg, -1)

        center = state.extra["center"]

        def loss_fn(params):
            (sg1, sg2), bs = forward_views(self.student, params,
                                           state.batch_stats, [g1, g2],
                                           self.fuse)
            (sl1, sl2), bs = forward_views(self.student, params, bs, [l1, l2],
                                           self.fuse)
            s1 = jnp.concatenate([sg1.reshape(b, vg, -1), sl1.reshape(b, vl, -1)], 1)
            s2 = jnp.concatenate([sg2.reshape(b, vg, -1), sl2.reshape(b, vl, -1)], 1)
            loss = (0.5 * dino_loss(t1, s2, self.temp_student, temp_t, center)
                    + 0.5 * dino_loss(t2, s1, self.temp_student, temp_t, center))
            return loss, bs

        update_mask = None
        if self.freeze_last_layer > 0:
            freeze_steps = self.freeze_last_layer * self.data.steps_per_epoch
            scale = jnp.where(state.step < freeze_steps, 0.0, 1.0)

            def update_mask(upd):
                fc = jax.tree_util.tree_map(lambda u: u * scale,
                                            upd["proj"]["fc_out"])
                return {**upd, "proj": {**upd["proj"], "fc_out": fc}}

        params, opt_state, loss, bstats = self.grad_step(
            state, loss_fn, axis=axis, loss_scope="local",
            update_mask=update_mask)

        # center EMA over all teacher global outputs (dino.py:136-141,164);
        # under per-device BN the batch mean is the replica pmean of equal-
        # size local means, keeping the center replica-consistent
        t_all = jnp.concatenate([t1.reshape(b * vg, -1), t2.reshape(b * vg, -1)], 0)
        t_mean = pmean_tree(jnp.mean(t_all, 0, keepdims=True), axis)
        center = self.center_m * center + (1 - self.center_m) * t_mean

        t_params = state.extra["teacher_params"]
        if self.teacher_update == "step":
            # paper recipe: per-step EMA of the freshly-updated student,
            # cosine lambda over the TOTAL step horizon
            lbd = cosine_ramp(state.step, self.total_steps,
                              self.lambda_lower, self.lambda_upper)
            t_params = ema_update(t_params, params, lbd)

        new = state.replace(
            step=state.step + 1, params=params,
            batch_stats=pmean_tree(bstats, axis), opt_state=opt_state,
            extra={"teacher_params": t_params,
                   "teacher_batch_stats": pmean_tree(t_bs, axis),
                   "center": center})
        return new, {"loss": loss}

    def post_epoch(self, state, epoch):
        """Per-epoch teacher EMA with cosine lambda (dino.py:129-134,227).
        No-op under ``teacher_update: step`` (EMA happens in train_step)."""
        if self.teacher_update == "step":
            return state
        lbd = cosine_ramp(epoch, self.epochs, self.lambda_lower, self.lambda_upper)
        t_params = ema_update(state.extra["teacher_params"], state.params, lbd)
        return state.replace(extra={**state.extra, "teacher_params": t_params})

    def embed(self, state, images):
        # reference build_features: student output, not re-normalized
        # (dino.py:184-193; the missing .cpu() there is a defect — SURVEY §2)
        return apply_eval(self.student, state.params, state.batch_stats, images)

    def embed_backbone(self, state, images):
        # raw student-encoder CLS features (pre-DinoHead) — the collapse
        # diagnostic surface, same semantics as BYOL/SimSiam's
        return apply_eval(self.student.encoder, state.params["encoder"],
                          state.batch_stats.get("encoder", {}), images)

    def embed_teacher(self, state, images):
        """Raw teacher-head outputs (pre-center, pre-softmax): the probe
        surface for the uniform-fixed-point diagnosis (VALIDATION.md,
        shapes100-dino-1000ep)."""
        return apply_eval(self.teacher, state.extra["teacher_params"],
                          state.extra["teacher_batch_stats"], images)

    def teacher_stats(self, state, outputs) -> dict:
        """Mechanism scalars over raw teacher outputs [N, K] (host array).

        Distinguishes "teacher variance truly pinned at zero" (absorbing
        uniform fixed point) from "pre-transition, variance small but
        alive" — the difference between BYOL's slow bootstrap (diag G) and
        a self-consistent collapse. Keyed on the teacher's EFFECTIVE
        distribution softmax((out - center) / temp_t), the exact target the
        student distills:

          * ``mi``        — H(mean_n p_n) - mean_n H(p_n): mutual information
                            between sample identity and teacher output;
                            exactly 0 iff the teacher is sample-independent.
          * ``prob_std``  — cross-sample std of the probabilities, mean
                            over the K dims.
          * ``raw_std``   — cross-sample std of the raw head outputs
                            (pre-center): separates "head emits constants"
                            from "centering+softmax washes variance out".
          * ``ent_frac``  — mean per-sample entropy / ln K (1.0 = uniform).
        """
        import numpy as np

        epoch = int(state.step) // self.data.steps_per_epoch
        temp = float(dino_teacher_temp(
            epoch, lower=self.temp_t_lower, upper=self.temp_t_upper,
            warmup_epochs=self.temp_warmup_epochs))
        out = np.asarray(outputs, np.float64)
        z = (out - np.asarray(state.extra["center"], np.float64)) / temp
        z -= z.max(1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(1, keepdims=True)
        eps = 1e-12
        ent = -(p * np.log(p + eps)).sum(1)
        pm = p.mean(0)
        ent_of_mean = float(-(pm * np.log(pm + eps)).sum())
        return {
            "mi": ent_of_mean - float(ent.mean()),
            "prob_std": float(p.std(0).mean()),
            "raw_std": float(out.std(0).mean()),
            "ent_frac": float(ent.mean() / np.log(p.shape[1])),
        }
