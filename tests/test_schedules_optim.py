"""Schedules and optimizer factory: values match the reference formulas."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from ssv_tpu.utils.schedules import (cosine_ramp, dino_teacher_temp,
                                     dino_weight_decay, lr_schedule,
                                     multistep, warmup_cosine)
from ssv_tpu.train.optim import get_optimizer


def test_cosine_ramp_formula():
    # reference byol.py:116-118: tau = up - (up-lo)(cos(pi s/S)+1)/2
    up, lo, S = 1.0, 0.996, 1000
    for s in (0, 100, 500, 1000):
        want = up - (up - lo) * (math.cos(math.pi * s / S) + 1) / 2
        assert float(cosine_ramp(s, S, lo, up)) == pytest.approx(want, abs=1e-7)
    assert float(cosine_ramp(0, S, lo, up)) == pytest.approx(lo)
    assert float(cosine_ramp(S, S, lo, up)) == pytest.approx(up)


def test_warmup_cosine():
    fn = lambda s: float(warmup_cosine(s, base_lr=2.0, total_steps=1000,
                                       warmup_steps=100))
    assert fn(0) == pytest.approx(1e-12, abs=1e-10)
    assert fn(50) == pytest.approx(1.0, rel=1e-3)
    assert fn(100) == pytest.approx(2.0, rel=1e-3)
    assert fn(1000) == pytest.approx(0.0, abs=1e-6)
    # monotone decreasing after warmup
    vals = [fn(s) for s in range(100, 1000, 100)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_multistep():
    fn = lambda s: float(multistep(s, base_lr=0.05,
                                   milestones_steps=[100, 250, 400], gamma=0.1))
    assert fn(50) == pytest.approx(0.05)
    assert fn(100) == pytest.approx(0.005)
    assert fn(300) == pytest.approx(0.0005)
    assert fn(450) == pytest.approx(0.00005)


def test_lr_schedule_from_config():
    fn = lr_schedule({"lr": 2.0}, {"name": "cosine", "warmup_epochs": 10},
                     epochs=100, steps_per_epoch=10)
    assert float(fn(100)) == pytest.approx(2.0, rel=1e-3)   # end of warmup
    assert float(fn(1000)) == pytest.approx(0.0, abs=1e-6)

    fn2 = lr_schedule({"lr": 0.05},
                      {"name": "multistep", "milestones": [10], "gamma": 0.1},
                      epochs=20, steps_per_epoch=5)
    assert float(fn2(49)) == pytest.approx(0.05)
    assert float(fn2(50)) == pytest.approx(0.005)


def test_dino_schedules():
    # dino.py:113-120 temp warmup; :122-127 wd ramp
    t = lambda e: float(dino_teacher_temp(e, lower=0.04, upper=0.07,
                                          warmup_epochs=30))
    assert t(0) == pytest.approx(0.04)
    assert t(15) == pytest.approx(0.055)
    assert t(30) == pytest.approx(0.07)
    assert t(100) == pytest.approx(0.07)

    wd = lambda e: float(dino_weight_decay(e, lower=0.04, upper=0.4, epochs=100))
    assert wd(0) == pytest.approx(0.04)
    assert wd(100) == pytest.approx(0.4)


def test_sgd_nesterov_and_weight_decay():
    """sgd path = coupled L2 + momentum 0.9 nesterov (train_utils.py:11-13)."""
    tx = get_optimizer({"name": "sgd", "lr": 0.1, "weight_decay": 0.01},
                       lambda s: 0.1)
    params = {"w": jnp.array([1.0, -2.0])}
    grads = {"w": jnp.array([0.5, 0.5])}
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    # torch nesterov: g' = g + wd*p; buf = g'; step = g' + 0.9*buf = 1.9*g'
    g_eff = np.array([0.5 + 0.01 * 1.0, 0.5 + 0.01 * -2.0])
    want = -0.1 * 1.9 * g_eff
    np.testing.assert_allclose(np.asarray(updates["w"]), want, rtol=1e-5)


def test_adamw_decoupled_decay_schedule():
    calls = []
    def wd_fn(step):
        calls.append(1)
        return 0.5
    tx = get_optimizer({"name": "adamw", "lr": 1.0, "epsilon": 1e-8},
                       lambda s: 1.0, weight_decay_fn=wd_fn)
    params = {"w": jnp.array([2.0])}
    grads = {"w": jnp.array([0.0])}
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    # zero grad -> update is pure decoupled decay: -lr * wd * p = -1.0
    np.testing.assert_allclose(np.asarray(updates["w"]), [-1.0], atol=1e-6)


def test_grad_clip_by_value():
    tx = get_optimizer({"name": "sgd", "lr": 1.0, "weight_decay": 0.0},
                       lambda s: 1.0, grad_clip=0.1)
    params = {"w": jnp.array([0.0])}
    grads = {"w": jnp.array([5.0])}
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    # clip to 0.1 then nesterov doubles-ish: 1.9 * 0.1
    np.testing.assert_allclose(np.asarray(updates["w"]), [-0.19], rtol=1e-5)
