"""Algorithm state-update semantics: EMA targets, MoCo queue writes, DINO
centering/per-epoch teacher EMA, SwAV bank push, PIRL bank EMA, SeLA
best-head/persistent scalers — checked through real train steps."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from helpers import make_trainer


def _leaves(tree):
    return jax.tree_util.tree_leaves(tree)


def _step(t, state=None, seed=0):
    images, labels = t._train_arrays
    idx = jnp.arange(t.pipeline.batch_size, dtype=jnp.int32)
    st = state if state is not None else jax.tree_util.tree_map(jnp.copy, t.state)
    return t._step_fn(st, images, labels, idx, jax.random.PRNGKey(seed))


def test_moco_queue_and_key_ema(tmp_path):
    t = make_trainer("moco", tmp_path)
    q0 = np.asarray(t.state.extra["queue"].data)
    kp0 = [np.asarray(x) for x in _leaves(t.state.extra["key_params"])]
    st, _ = _step(t)
    # queue advanced by one batch of unit-norm rows
    assert int(st.extra["queue"].ptr) == t.pipeline.batch_size
    rows = np.asarray(st.extra["queue"].data)[: t.pipeline.batch_size]
    np.testing.assert_allclose(np.linalg.norm(rows, axis=1), 1.0, rtol=1e-4)
    assert np.abs(np.asarray(st.extra["queue"].data) - q0).max() > 0
    # key params moved toward query params: t' = m t + (1-m) q
    m = t.algorithm.m
    for before, after, q in zip(kp0, _leaves(st.extra["key_params"]),
                                _leaves(st.params)):
        want = m * before + (1 - m) * np.asarray(q)
        np.testing.assert_allclose(np.asarray(after), want, rtol=1e-4, atol=1e-5)


def test_byol_target_ema_uses_tau_schedule(tmp_path):
    t = make_trainer("byol", tmp_path)
    algo = t.algorithm
    tau0 = float(algo._tau(jnp.int32(0)))
    assert tau0 == pytest.approx(algo.tau_lower)
    tp0 = {k: jax.tree_util.tree_map(np.asarray, v)
           for k, v in t.state.extra["target_params"].items()}
    st, metrics = _step(t)
    assert float(metrics["tau"]) == pytest.approx(tau0, abs=1e-6)
    for k in ("encoder", "proj"):
        for before, after, online in zip(
                _leaves(tp0[k]), _leaves(st.extra["target_params"][k]),
                _leaves(st.params[k])):
            want = tau0 * before + (1 - tau0) * np.asarray(online)
            np.testing.assert_allclose(np.asarray(after), want,
                                       rtol=1e-4, atol=1e-5)
    # predictor is NOT part of the target
    assert "pred" in st.params and "pred" not in st.extra["target_params"]


def test_dino_center_update_and_post_epoch_ema(tmp_path):
    t = make_trainer("dino", tmp_path, arch="vit", batch_size=8)
    c0 = np.asarray(t.state.extra["center"])
    st, _ = _step(t)
    c1 = np.asarray(st.extra["center"])
    assert np.abs(c1 - c0).max() > 0
    # teacher unchanged within the step (per-epoch EMA only)
    for a, b in zip(_leaves(t.state.extra["teacher_params"]),
                    _leaves(st.extra["teacher_params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # post_epoch: teacher <- lbd t + (1-lbd) s
    from ssv_tpu.utils.schedules import cosine_ramp
    epoch = 3
    lbd = float(cosine_ramp(epoch, t.algorithm.epochs,
                            t.algorithm.lambda_lower, t.algorithm.lambda_upper))
    st2 = t._post_epoch_fn(st, jnp.asarray(epoch))
    for before, after, s in zip(_leaves(st.extra["teacher_params"]),
                                _leaves(st2.extra["teacher_params"]),
                                _leaves(st.params)):
        want = lbd * np.asarray(before) + (1 - lbd) * np.asarray(s)
        np.testing.assert_allclose(np.asarray(after), want, rtol=1e-4, atol=1e-6)


def test_swav_bank_receives_batch_features(tmp_path):
    t = make_trainer("swav", tmp_path)
    st, _ = _step(t)
    bs = t.pipeline.batch_size
    assert int(st.extra["bank"].ptr) == 2 * bs % t.algorithm.bank_size
    rows = np.asarray(st.extra["bank"].data)[: 2 * bs]
    np.testing.assert_allclose(np.linalg.norm(rows, axis=1), 1.0, rtol=1e-3)


def test_pirl_bank_ema_on_batch_rows(tmp_path):
    t = make_trainer("pirl", tmp_path)
    state = t.algorithm.pre_train(t.state, t)
    bank0 = np.asarray(state.extra["bank"].data)
    # pre_train filled every row with unit-norm features
    np.testing.assert_allclose(np.linalg.norm(bank0, axis=1), 1.0, rtol=1e-3)
    st, _ = _step(t, state=state)
    bank1 = np.asarray(st.extra["bank"].data)
    bs = t.pipeline.batch_size
    changed = np.abs(bank1 - bank0).max(axis=1) > 1e-7
    assert changed[:bs].all()          # batch rows EMA-updated
    assert not changed[bs:].any()      # others untouched


def test_sela_best_head_and_scalers(tmp_path):
    t = make_trainer("sela", tmp_path)
    state = t.algorithm.pre_train(t.state, t)   # self-labelling sweep
    pl = np.asarray(state.extra["pseudo_labels"])
    assert pl.shape == (t.pipeline.n_train,)
    assert pl.min() >= 0 and pl.max() < t.algorithm.num_clusters
    a0 = np.asarray(state.extra["alpha"])
    assert np.isfinite(a0).all()
    st, _ = _step(t, state=state)
    assert 0 <= int(st.extra["best_head"]) < t.algorithm.num_heads


def test_simsiam_frozen_mode_keeps_target(tmp_path):
    t = make_trainer("simsiam", tmp_path)
    # default stopgrad mode has no target tree
    assert "target_params" not in t.state.extra

    import yaml
    from helpers import mini_config
    from ssv_tpu.train import Trainer
    cfg = mini_config("simsiam")
    cfg["target_mode"] = "frozen"
    p = tmp_path / "frozen.yaml"
    with open(p, "w") as f:
        yaml.dump(cfg, f)
    args = {"config": str(p), "algo": "simsiam", "arch": "tiny",
            "task": "train", "output": "fr", "load": None}
    t2 = Trainer(args, synthetic_sizes=(64, 32))
    tp0 = [np.asarray(x) for x in _leaves(t2.state.extra["target_params"])]
    st, _ = _step(t2)
    for before, after in zip(tp0, _leaves(st.extra["target_params"])):
        np.testing.assert_array_equal(before, np.asarray(after))


def test_embed_backbone_diagnostic_surface(tmp_path):
    """embed_backbone returns raw encoder features for the negative-free
    family (collapse diagnostics in quality runs) and None where no
    separate backbone semantic exists."""
    t = make_trainer("byol", tmp_path)
    x = jnp.zeros((4, 32, 32, 3), jnp.float32)
    f = t.algorithm.embed_backbone(t.state, x)
    assert f.shape == (4, 64)  # tiny encoder dim, pre-projection
    z = t.algorithm.embed(t.state, x)
    assert z.shape[-1] == 16   # full online path is proj_dim
    sub = tmp_path / "s"
    sub.mkdir()
    t2 = make_trainer("simclr", sub)
    assert t2.algorithm.embed_backbone(t2.state, x) is None
    sub2 = tmp_path / "d"
    sub2.mkdir()
    t3 = make_trainer("dino", sub2)
    f3 = t3.algorithm.embed_backbone(t3.state, x)
    assert f3 is not None and f3.shape[0] == 4
    assert f3.shape[-1] != t3.algorithm.proj_dim  # pre-head, not projector
