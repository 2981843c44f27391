"""Per-device-BN shard_map path (parallel/per_device.py contract).

Covers: the gradient-reduction convention (psum for gathered-global losses,
pmean for local-mean losses — exact asserts against the sync step), one
per-device step for EVERY algorithm (finite loss, fully-replicated state),
and the replica-consistency of each algorithm's mutable extras (MoCo queue,
SwAV bank, PIRL bank, DINO center, SeLA best head)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
import yaml

from helpers import make_trainer, mini_config
from ssv_tpu.parallel.mesh import get_mesh
from ssv_tpu.train import Trainer
from ssv_tpu.train.base import Algorithm, TrainState

ALGOS = ["simclr", "moco", "byol", "simsiam", "dino", "pirl", "barlow",
         "relic", "deep_cluster", "swav", "sela"]


def pdbn_trainer(algo, tmp_path, epochs=1, batch_size=16):
    cfg = mini_config(algo, epochs=epochs, batch_size=batch_size)
    cfg["per_device_bn"] = True
    p = tmp_path / f"{algo}-pdbn.yaml"
    with open(p, "w") as f:
        yaml.dump(cfg, f)
    args = {"config": str(p), "algo": algo, "arch": "tiny", "task": "train",
            "output": "pdbn", "load": None}
    if algo == "dino":
        args["arch"] = "vit"
    return Trainer(args, synthetic_sizes=(64, 32), use_mesh=True)


# ---------------------------------------------------------------------------
# the gradient-reduction convention, pinned exactly
# ---------------------------------------------------------------------------

def _dummy_algo():
    algo = Algorithm.__new__(Algorithm)
    algo.tx = optax.sgd(1.0)
    return algo


def _state(algo):
    w0 = jnp.zeros(())
    return TrainState(jnp.zeros((), jnp.int32), w0, {}, algo.tx.init(w0), {})


def test_local_mean_loss_grads_pmean_matches_sync():
    """A per-sample-mean loss: the per-device gradient must pmean to the
    sync gradient (psum would scale the update by the replica count —
    the effective-LR bug this convention exists to prevent)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    algo = _dummy_algo()
    state = _state(algo)
    x = jnp.arange(16.0) + 1.0

    def loss_of(xs):
        return lambda w: (jnp.mean(w * xs + xs ** 2), {})

    p_sync, _, l_sync, _ = algo.grad_step(state, loss_of(x))

    mesh = get_mesh()

    def local(state, xs):
        p, _, l, _ = algo.grad_step(state, loss_of(xs), axis="data",
                                    loss_scope="local")
        return p, l

    p_pd, l_pd = shard_map(local, mesh=mesh, in_specs=(P(), P("data")),
                           out_specs=(P(), P()), check_vma=False)(state, x)
    np.testing.assert_allclose(np.asarray(p_pd), np.asarray(p_sync), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(l_pd), np.asarray(l_sync), rtol=1e-6)


def test_global_gathered_loss_grads_psum_matches_sync():
    """A loss computed from all_gather-ed data (identical on every replica):
    replica grads are additive shares, so psum reproduces the sync grad."""
    from jax import lax, shard_map
    from jax.sharding import PartitionSpec as P

    algo = _dummy_algo()
    state = _state(algo)
    x = jnp.arange(16.0) + 1.0

    def sync_loss(w):
        z = w * x
        return jnp.mean(z * jnp.sum(z)), {}   # couples all samples

    p_sync, _, l_sync, _ = algo.grad_step(state, sync_loss)

    mesh = get_mesh()

    def local(state, xs):
        def loss_fn(w):
            zg = lax.all_gather(w * xs, "data", axis=0, tiled=True)
            return jnp.mean(zg * jnp.sum(zg)), {}
        p, _, l, _ = algo.grad_step(state, loss_fn, axis="data",
                                    loss_scope="global")
        return p, l

    p_pd, l_pd = shard_map(local, mesh=mesh, in_specs=(P(), P("data")),
                           out_specs=(P(), P()), check_vma=False)(state, x)
    np.testing.assert_allclose(np.asarray(p_pd), np.asarray(p_sync), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(l_pd), np.asarray(l_sync), rtol=1e-6)


# ---------------------------------------------------------------------------
# every algorithm runs under per-device BN with replica-consistent state
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("algo", ALGOS)
def test_per_device_step_all_algorithms(algo, tmp_path):
    t = pdbn_trainer(algo, tmp_path)
    images, labels = t._train_arrays
    bs = t.data_info.batch_size
    idx = t._shard_idx(jnp.arange(bs, dtype=jnp.int32))
    state, metrics = t._step_fn(t.state, images, labels, idx,
                                jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"])), algo
    assert int(state.step) == 1
    # the whole TrainState must remain fully replicated (check_vma=False
    # means nothing verifies this for us — divergent replicas would corrupt
    # checkpoints silently)
    for leaf in jax.tree_util.tree_leaves(state):
        assert leaf.sharding.is_fully_replicated, algo

    if algo == "moco":
        assert int(state.extra["queue"].ptr) == bs
        rows = np.asarray(state.extra["queue"].data)[:bs]
        np.testing.assert_allclose(np.linalg.norm(rows, axis=1), 1.0, rtol=1e-3)
    if algo == "swav":
        # bank advanced by BOTH gathered views of the global batch
        assert int(state.extra["bank"].ptr) == (2 * bs) % state.extra["bank"].data.shape[0]
    if algo == "pirl":
        # the global batch's bank rows were EMA-written (nonzero now)
        rows = np.asarray(state.extra["bank"].data)[:bs]
        assert np.abs(rows).sum() > 0
    if algo == "dino":
        assert np.isfinite(np.asarray(state.extra["center"])).all()
    if algo == "sela":
        assert 0 <= int(state.extra["best_head"]) < 3


def test_per_device_stats_differ_from_sync(tmp_path):
    t_pd = pdbn_trainer("simclr", tmp_path, batch_size=16)
    t_sync = make_trainer("simclr", tmp_path, batch_size=16)

    images, labels = t_pd._train_arrays
    idx = jnp.arange(16, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)

    s_pd, _ = t_pd._step_fn(t_pd.state, images, labels, t_pd._shard_idx(idx), key)
    s_sync, _ = t_sync._step_fn(t_sync.state, images, labels, idx, key)

    # the pmean of per-device (2-example) batch means != global 16-example
    # mean for the same key stream only because augmentation keys fold in the
    # axis index — stats must differ but stay finite and the same shape
    a = np.concatenate([np.asarray(x).ravel() for x in
                        jax.tree_util.tree_leaves(s_pd.batch_stats)])
    b = np.concatenate([np.asarray(x).ravel() for x in
                        jax.tree_util.tree_leaves(s_sync.batch_stats)])
    assert a.shape == b.shape and np.isfinite(a).all()
    assert np.abs(a - b).max() > 1e-6


def test_per_device_bn_full_epoch(tmp_path):
    t = pdbn_trainer("byol", tmp_path, epochs=1)
    images, labels = t._train_arrays
    idx_mat = t._shard_idx_mat(t.pipeline.epoch_indices(jax.random.PRNGKey(1)))
    state, metrics = t._epoch_fn(t.state, images, labels, idx_mat,
                                 jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(metrics["loss"])).all()
    # target tower advanced every step and stayed replicated
    for leaf in jax.tree_util.tree_leaves(state.extra["target_params"]):
        assert leaf.sharding.is_fully_replicated
