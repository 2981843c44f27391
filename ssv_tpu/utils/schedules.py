"""Schedules as pure, jittable functions of the global step.

The reference mutates optimizer/EMA hyperparameters imperatively from the
epoch loop (per-epoch linear warmup in every trainer's
`adjust_learning_rate`, e.g. simclr.py:77-84; BYOL's per-step tau ramp at
byol.py:116-118; DINO's per-epoch lambda/temp/wd updates at dino.py:113-134).
Here every schedule is a pure function `f(step) -> value` so the whole
training step — including hyperparameter updates — stays inside one compiled
XLA program and can be `lax.scan`-ed over an epoch.

Known deliberate divergence from the reference: BYOL/ReLIC drive their tau
ramp with the *within-epoch* step counter against `epochs * steps_per_epoch`
(byol.py:77,192), so tau effectively stays at tau_lower forever. We ramp by
the true global step (the published BYOL recipe); setting
``tau_upper == tau_lower`` in the config reproduces the reference's
effectively-constant behavior.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_ramp(step, total_steps, lower: float, upper: float):
    """upper - (upper-lower) * (cos(pi * step/total) + 1) / 2.

    Ramps from ``lower`` (step 0) to ``upper`` (step == total_steps). This is
    the exact ramp formula the reference uses for BYOL tau (byol.py:116-118),
    DINO teacher EMA lambda (dino.py:129-134) and DINO weight decay
    (dino.py:122-127).
    """
    frac = jnp.clip(step / jnp.maximum(total_steps, 1), 0.0, 1.0)
    return upper - (upper - lower) * (jnp.cos(jnp.pi * frac) + 1.0) / 2.0


def warmup_cosine(step, *, base_lr: float, total_steps: int, warmup_steps: int,
                  end_lr: float = 0.0):
    """Per-step linear warmup from ~0 to base_lr, then cosine decay to end_lr."""
    step = jnp.asarray(step, jnp.float32)
    warm = 1e-12 + (base_lr - 1e-12) * step / jnp.maximum(warmup_steps, 1)
    decay_steps = jnp.maximum(total_steps - warmup_steps, 1)
    frac = jnp.clip((step - warmup_steps) / decay_steps, 0.0, 1.0)
    cos = end_lr + (base_lr - end_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
    return jnp.where(step < warmup_steps, warm, cos)


def multistep(step, *, base_lr: float, milestones_steps, gamma: float):
    """lr = base_lr * gamma ** (#milestones passed). Milestones in steps."""
    step = jnp.asarray(step, jnp.float32)
    ms = jnp.asarray(milestones_steps, jnp.float32)
    n_passed = jnp.sum(step >= ms)
    return base_lr * gamma ** n_passed


def lr_schedule(optimizer_cfg: dict, scheduler_cfg: dict, *, epochs: int,
                steps_per_epoch: int):
    """Build an optax-compatible `lr(step)` from the reference YAML schema.

    Mirrors `get_scheduler` (reference train_utils.py:23-45) + the per-epoch
    warmup in each trainer, but expressed per-step: `cosine` = linear warmup
    over `warmup_epochs` then cosine decay; `multistep` = staircase decay at
    `milestones` (epochs) with factor `gamma`; anything else = constant.
    """
    base_lr = float(optimizer_cfg["lr"])
    name = (scheduler_cfg or {}).get("name", "none")
    total_steps = epochs * steps_per_epoch

    if name == "cosine":
        warmup_steps = int(scheduler_cfg.get("warmup_epochs", 0)) * steps_per_epoch

        def fn(step):
            return warmup_cosine(step, base_lr=base_lr, total_steps=total_steps,
                                 warmup_steps=warmup_steps)
        return fn

    if name == "multistep":
        ms = [int(m) * steps_per_epoch for m in scheduler_cfg["milestones"]]
        gamma = float(scheduler_cfg.get("gamma", 0.1))

        def fn(step):
            return multistep(step, base_lr=base_lr, milestones_steps=ms, gamma=gamma)
        return fn

    def fn(step):
        return jnp.full((), base_lr, jnp.float32)
    return fn


def dino_teacher_temp(epoch, *, lower: float, upper: float, warmup_epochs: int):
    """Linear teacher-temperature warmup (reference dino.py:113-120)."""
    epoch = jnp.asarray(epoch, jnp.float32)
    ramped = lower + (upper - lower) * epoch / jnp.maximum(warmup_epochs, 1)
    return jnp.where(epoch <= warmup_epochs, ramped, upper)


def dino_weight_decay(epoch, *, lower: float, upper: float, epochs: int):
    """Cosine weight-decay ramp lower -> upper (reference dino.py:122-127)."""
    return cosine_ramp(epoch, epochs, lower, upper)
