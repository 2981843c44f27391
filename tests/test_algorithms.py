"""Integration smoke tests: every algorithm trains 1 epoch end-to-end on a
tiny synthetic dataset (full pipeline: on-device augmentation -> encoder ->
loss -> optimizer -> state updates -> KNN eval -> linear probe), finite loss,
state advances, checkpoint round-trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from helpers import make_trainer

ALGOS = ["simclr", "moco", "byol", "simsiam", "relic", "barlow", "swav",
         "pirl", "deep_cluster", "sela"]


@pytest.mark.parametrize("algo", ALGOS)
def test_one_epoch(algo, tmp_path):
    t = make_trainer(algo, tmp_path)
    images, labels = t._train_arrays
    state = t.algorithm.pre_train(t.state, t)
    state = t.algorithm.pre_epoch(state, t, 1)
    idx_mat = t.pipeline.epoch_indices(jax.random.PRNGKey(1))
    state, metrics = t._epoch_fn(state, images, labels, idx_mat,
                                jax.random.PRNGKey(2))
    state = t._post_epoch_fn(state, jnp.asarray(1))
    losses = np.asarray(metrics["loss"])
    assert np.isfinite(losses).all(), losses
    assert int(state.step) == t.pipeline.steps_per_epoch
    t.state = state

    acc = t.knn_validate()
    assert 0.0 <= acc <= 1.0

    fvecs, gt = t.build_features("test")
    assert fvecs.shape[0] == t.pipeline.n_test
    assert np.isfinite(fvecs).all()


def test_simclr_resnet18_step(tmp_path):
    """One real-backbone integration check (the other algorithm tests use
    the tiny encoder to keep CPU compile times sane)."""
    t = make_trainer("simclr", tmp_path, arch="resnet18", n_train=32,
                     batch_size=8)
    images, labels = t._train_arrays
    idx = jnp.arange(8, dtype=jnp.int32)
    state, metrics = t._step_fn(t.state, images, labels, idx,
                                jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_dino_one_epoch(tmp_path):
    t = make_trainer("dino", tmp_path, arch="vit", batch_size=8)
    images, labels = t._train_arrays
    idx_mat = t.pipeline.epoch_indices(jax.random.PRNGKey(1))
    state, metrics = t._epoch_fn(t.state, images, labels, idx_mat,
                                jax.random.PRNGKey(2))
    state = t._post_epoch_fn(state, jnp.asarray(1))
    assert np.isfinite(np.asarray(metrics["loss"])).all()
    t.state = state
    acc = t.knn_validate()
    assert 0.0 <= acc <= 1.0


def test_dino_conv_backbone_step(tmp_path):
    """DINO with a conv backbone (the combination that crashes the reference,
    dino.py:57): the encoder-config filter makes it work here."""
    t = make_trainer("dino", tmp_path, arch="tiny", batch_size=8)
    images, labels = t._train_arrays
    idx = jnp.arange(8, dtype=jnp.int32)
    state, metrics = t._step_fn(t.state, images, labels, idx,
                                jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_dino_step_ema_algebra(tmp_path):
    """`teacher_update: step` (corrected recipe — the paper's per-step
    momentum teacher, vs the reference's per-EPOCH quirk at
    dino.py:129-134,227): after every train step the teacher must equal
    lambda(step) * teacher + (1 - lambda(step)) * new_student with the
    cosine lambda over the TOTAL step horizon, and post_epoch must be a
    no-op. Also pins `center_init: zeros`."""
    from ssv_tpu.utils.schedules import cosine_ramp

    t = make_trainer("dino", tmp_path, arch="tiny", batch_size=8,
                     cfg_extra={"teacher_update": "step",
                                "center_init": "zeros"})
    images, labels = t._train_arrays
    state = t.state
    np.testing.assert_array_equal(np.asarray(state.extra["center"]), 0.0)
    algo = t.algorithm
    for s in range(2):
        teacher_before = jax.tree_util.tree_map(
            np.asarray, state.extra["teacher_params"])  # copy: state is donated
        step_before = int(state.step)
        idx = jnp.arange(8, dtype=jnp.int32)
        state, _ = t._step_fn(state, images, labels, idx, jax.random.PRNGKey(s))
        lbd = float(cosine_ramp(step_before, algo.total_steps,
                                algo.lambda_lower, algo.lambda_upper))
        expect = jax.tree_util.tree_map(
            lambda tt, oo: lbd * tt + (1.0 - lbd) * np.asarray(oo),
            teacher_before, state.params)
        for a, b in zip(jax.tree_util.tree_leaves(expect),
                        jax.tree_util.tree_leaves(state.extra["teacher_params"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
    stepped = jax.tree_util.tree_map(np.asarray, state.extra["teacher_params"])
    after = t._post_epoch_fn(state, jnp.asarray(1))
    for a, b in zip(jax.tree_util.tree_leaves(stepped),
                    jax.tree_util.tree_leaves(after.extra["teacher_params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dino_epoch_mode_teacher_frozen_within_epoch(tmp_path):
    """Faithful default (`teacher_update: epoch`): train_step must NOT touch
    the teacher; only post_epoch applies the per-epoch EMA quirk."""
    t = make_trainer("dino", tmp_path, arch="tiny", batch_size=8, epochs=2)
    images, labels = t._train_arrays
    teacher_before = jax.tree_util.tree_map(
        np.asarray, t.state.extra["teacher_params"])
    state, _ = t._step_fn(t.state, images, labels,
                          jnp.arange(8, dtype=jnp.int32), jax.random.PRNGKey(0))
    for a, b in zip(jax.tree_util.tree_leaves(teacher_before),
                    jax.tree_util.tree_leaves(state.extra["teacher_params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    after = t._post_epoch_fn(state, jnp.asarray(1))
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree_util.tree_leaves(after.extra["teacher_params"]),
                             jax.tree_util.tree_leaves(state.extra["teacher_params"]))]
    assert max(diffs) > 0.0  # per-epoch EMA actually moved the teacher


def test_dino_teacher_probe_stats(tmp_path):
    """teacher_stats (the mechanism probe for the uniform-fixed-point
    diagnosis): mi must be ~0 for a sample-independent teacher, positive
    for sample-dependent outputs, and ent_frac == 1 when the effective
    distribution is exactly uniform (outputs == center)."""
    t = make_trainer("dino", tmp_path, arch="tiny", batch_size=8)
    algo, state = t.algorithm, t.state
    K = algo.proj_dim
    rng = np.random.default_rng(0)

    const = np.tile(rng.normal(size=(1, K)), (32, 1))
    s = algo.teacher_stats(state, const)
    assert abs(s["mi"]) < 1e-9
    assert s["prob_std"] < 1e-12 and s["raw_std"] < 1e-12

    varied = rng.normal(size=(32, K))
    s2 = algo.teacher_stats(state, varied)
    assert s2["mi"] > 0.01 and s2["prob_std"] > 0 and s2["raw_std"] > 0

    uniform = np.tile(np.asarray(state.extra["center"]), (16, 1))
    s3 = algo.teacher_stats(state, uniform)
    assert abs(s3["ent_frac"] - 1.0) < 1e-9 and abs(s3["mi"]) < 1e-9


def test_dino_freeze_last_layer(tmp_path):
    """`freeze_last_layer: 1` (paper's cancel_gradients_last_layer): the
    head's weight-normed fc_out must not move at all during epoch 1 —
    including adamw weight decay — while the rest of the student trains;
    from epoch 2 (step >= steps_per_epoch) it must move."""
    t = make_trainer("dino", tmp_path, arch="tiny", batch_size=8, epochs=2,
                     n_train=16, cfg_extra={"freeze_last_layer": 1})
    images, labels = t._train_arrays
    state = t.state
    spe = t.algorithm.data.steps_per_epoch
    fc0 = jax.tree_util.tree_map(np.asarray, state.params["proj"]["fc_out"])
    enc0 = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, state.params["encoder"]))
    for s in range(spe):  # all of epoch 1
        idx = jnp.arange(8, dtype=jnp.int32)
        state, _ = t._step_fn(state, images, labels, idx, jax.random.PRNGKey(s))
    for a, b in zip(jax.tree_util.tree_leaves(fc0),
                    jax.tree_util.tree_leaves(state.params["proj"]["fc_out"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    enc1 = jax.tree_util.tree_leaves(state.params["encoder"])
    assert max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
               for a, b in zip(enc0, enc1)) > 0  # backbone trained
    # epoch 2: the freeze lifts
    state, _ = t._step_fn(state, images, labels,
                          jnp.arange(8, dtype=jnp.int32), jax.random.PRNGKey(99))
    moved = max(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                for a, b in zip(jax.tree_util.tree_leaves(fc0),
                                jax.tree_util.tree_leaves(
                                    state.params["proj"]["fc_out"])))
    assert moved > 0


def test_dino_rejects_bad_recipe_flags(tmp_path):
    import pytest as _pytest
    with _pytest.raises(ValueError):
        make_trainer("dino", tmp_path, arch="tiny", batch_size=8,
                     cfg_extra={"teacher_update": "sometimes"})
    with _pytest.raises(ValueError):
        make_trainer("dino", tmp_path, arch="tiny", batch_size=8,
                     cfg_extra={"center_init": "ones"})


def test_checkpoint_roundtrip(tmp_path):
    t = make_trainer("simclr", tmp_path)
    images, labels = t._train_arrays
    idx_mat = t.pipeline.epoch_indices(jax.random.PRNGKey(1))
    t.state, _ = t._epoch_fn(t.state, images, labels, idx_mat,
                             jax.random.PRNGKey(2))
    t.best_metric = 0.5
    t.save_checkpoint()

    before = jax.tree_util.tree_leaves(t.state)
    t2 = make_trainer("simclr", tmp_path)
    t2.load_checkpoint(t.output_dir)
    after = jax.tree_util.tree_leaves(t2.state)
    assert t2.best_metric == 0.5
    for a, b in zip(before, after):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


@pytest.mark.parametrize("task,expect_step", [
    ("train", 1),          # resume -> rolling `latest` (exact full state)
    ("linear_eval", 0),    # inference -> `best_model` (reference semantics)
    ("get_features", 0),
])
def test_load_checkpoint_task_preference(task, expect_step, tmp_path):
    """VERDICT r3 item 4: with both checkpoints present, `train` must prefer
    `latest` while inference tasks prefer `best_model` — the reference loads
    the only checkpoint it ever writes, the best-KNN one (main.py:54-70)."""
    t = make_trainer("simclr", tmp_path)
    images, labels = t._train_arrays
    t.save_checkpoint("best_model")  # saved at step 0
    idx = jnp.arange(16, dtype=jnp.int32)
    t.state, _ = t._step_fn(t.state, images, labels, idx, jax.random.PRNGKey(0))
    t.save_checkpoint("latest")      # saved at step 1

    t2 = make_trainer("simclr", tmp_path)
    t2.args["task"] = task
    t2.load_checkpoint(t.output_dir)
    assert int(t2.state.step) == expect_step


def test_full_train_loop_on_mesh(tmp_path):
    """Trainer.train() end-to-end on the 8-device CPU mesh: exercises the
    sharded epoch index matrices, eval cadence, checkpoint save and the
    final linear probe in one pass."""
    t = make_trainer("simclr", tmp_path, epochs=2)
    assert t.mesh is not None  # conftest provides 8 devices
    acc = t.train()
    assert 0.0 <= acc <= 1.0
    assert int(t.state.step) == 2 * t.pipeline.steps_per_epoch
    import os
    assert os.path.exists(os.path.join(t.output_dir, "latest"))


def test_train_safe_saves_state_on_failure(tmp_path):
    import os

    t = make_trainer("simclr", tmp_path, epochs=2)

    def boom(*a, **k):
        raise RuntimeError("injected failure")

    t._epoch_fn = boom
    with pytest.raises(RuntimeError, match="injected"):
        t.train_safe()
    assert os.path.exists(os.path.join(t.output_dir, "latest"))
    # a fresh trainer resumes from the flushed state
    t2 = make_trainer("simclr", tmp_path)
    t2.load_checkpoint(t.output_dir)


def test_loss_decreases_simclr(tmp_path):
    t = make_trainer("simclr", tmp_path, epochs=5, n_train=128, batch_size=32)
    images, labels = t._train_arrays
    state = t.state
    first, last = None, None
    for e in range(5):
        idx_mat = t.pipeline.epoch_indices(jax.random.PRNGKey(e))
        state, metrics = t._epoch_fn(state, images, labels, idx_mat,
                                    jax.random.PRNGKey(100 + e))
        m = float(np.asarray(metrics["loss"]).mean())
        first = m if first is None else first
        last = m
    assert last < first
