"""Distributed tests on the 8-virtual-device CPU mesh (SURVEY §4).

Checks that the data-parallel execution model is *numerically identical* to
single-device execution: jit over globally-sharded batches must produce the
same loss, same gradients (via psum), same BN statistics (global batch), and
the same Sinkhorn codes (column sums span the global batch)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ssv_tpu.objectives import nt_xent, sinkhorn_codes
from ssv_tpu.parallel.mesh import get_mesh, batch_sharding, replicated


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 CPU devices"
    return get_mesh(8)


def test_mesh_shape(mesh):
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (8, 1)


def test_nt_xent_sharded_matches_single(mesh):
    rs = np.random.RandomState(0)
    zi = jnp.array(rs.randn(32, 16), jnp.float32)
    zj = jnp.array(rs.randn(32, 16), jnp.float32)
    want = float(nt_xent(zi, zj, temperature=0.5, normalize=True))

    sh = batch_sharding(mesh)
    zi_s, zj_s = jax.device_put(zi, sh), jax.device_put(zj, sh)
    got = float(jax.jit(lambda a, b: nt_xent(a, b, temperature=0.5,
                                             normalize=True))(zi_s, zj_s))
    assert got == pytest.approx(want, rel=1e-5)


def test_sinkhorn_sharded_matches_single(mesh):
    rs = np.random.RandomState(1)
    scores = jnp.array(rs.randn(64, 12), jnp.float32)
    want = np.asarray(sinkhorn_codes(scores))
    got = np.asarray(jax.jit(sinkhorn_codes)(
        jax.device_put(scores, batch_sharding(mesh))))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_train_step_sharded_matches_single(mesh, tmp_path):
    """Full SimCLR train step: sharded global batch vs single-device batch.
    Loss must match closely; params match within bf16 reduction-order noise
    (exact f32 parity is asserted separately in test_f32_grads_exact)."""
    import sys
    sys.path.insert(0, str(tmp_path.parent))
    from helpers import make_trainer

    t = make_trainer("simclr", tmp_path, batch_size=16)
    images, labels = t._train_arrays
    idx = jnp.arange(16, dtype=jnp.int32)
    key = jax.random.PRNGKey(3)

    state0 = jax.tree_util.tree_map(jnp.copy, t.state)
    s_single, m_single = t._step_fn(state0, images, labels, idx, key)

    rep = replicated(mesh)
    sh = batch_sharding(mesh)
    state1 = jax.device_put(jax.tree_util.tree_map(jnp.copy, t.state), rep)
    images_r = jax.device_put(images, rep)
    labels_r = jax.device_put(labels, rep)
    idx_s = jax.device_put(idx, sh)
    s_shard, m_shard = t._step_fn(state1, images_r, labels_r, idx_s, key)

    assert float(m_shard["loss"]) == pytest.approx(float(m_single["loss"]), rel=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s_single.params),
                    jax.tree_util.tree_leaves(s_shard.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.2, atol=0.1)


def test_f32_grads_exact_under_sharding(mesh):
    """In f32, per-shard reductions + psum must reproduce single-device
    gradients to float tolerance (the bf16 path differs only by rounding)."""
    from ssv_tpu.models.tiny import TinyEncoder

    enc = TinyEncoder(dtype=jnp.float32)
    x = jnp.array(np.random.RandomState(0).randn(16, 32, 32, 3), jnp.float32)
    v = enc.init(jax.random.PRNGKey(0), x)

    def loss(params, bstats, x):
        out, _ = enc.apply({"params": params, "batch_stats": bstats}, x,
                           mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    g = jax.jit(jax.grad(loss))
    g1 = g(v["params"], v["batch_stats"], x)
    g2 = g(jax.device_put(v["params"], replicated(mesh)),
           jax.device_put(v["batch_stats"], replicated(mesh)),
           jax.device_put(x, batch_sharding(mesh)))
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_batchnorm_is_global_under_sharding(mesh):
    """BN batch stats computed under jit over a sharded batch equal the
    global-batch statistics (free sync-BN)."""
    from flax import linen as nn

    bn = nn.BatchNorm(use_running_average=False, momentum=0.9)
    rs = np.random.RandomState(2)
    x = jnp.array(rs.randn(64, 8), jnp.float32) * 3 + 1
    variables = bn.init(jax.random.PRNGKey(0), x)

    def apply(v, x):
        out, upd = bn.apply(v, x, mutable=["batch_stats"])
        return upd["batch_stats"]["mean"]

    want = np.asarray(apply(variables, x))
    got = np.asarray(jax.jit(apply)(
        jax.device_put(variables, replicated(mesh)),
        jax.device_put(x, batch_sharding(mesh))))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_dryrun_multichip_entry():
    import sys
    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip, entry

    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 128)
    dryrun_multichip(8)


def test_eval_path_sharded_under_mesh(tmp_path, mesh):
    """VERDICT r3 item 3: the Trainer's eval work (features_for / map_train /
    stream_train — KNN feature building, linear-probe dumps, bank init,
    DeepCluster's full-dataset forward) must run over `data`-sharded index
    batches under a mesh, not replicated, and must produce features
    identical to the unsharded path."""
    import sys
    sys.path.insert(0, str(tmp_path.parent))
    from helpers import make_trainer

    f32 = {"compute_dtype": "float32",
           "encoder": {"reduce_bottom_conv": True, "dtype": "float32"}}

    def build(use_mesh, sub):
        d = tmp_path / sub
        d.mkdir()
        return make_trainer("simclr", d, batch_size=16, n_train=96, n_test=48,
                            cfg_extra=f32, use_mesh=use_mesh)

    t1 = build(False, "single")
    t8 = build(True, "sharded")

    # the eval program's index inputs must carry P("data")
    seen = []
    orig = t8._embed_batch

    def spy(state, images, idx):
        seen.append(idx.sharding)
        return orig(state, images, idx)

    t8._embed_batch = spy
    fv1, gt1 = t1.features_for(t1.state, "test")
    fv8, gt8 = t8.features_for(t8.state, "test")
    assert seen and all(s.spec == P("data") for s in seen), seen
    np.testing.assert_allclose(fv8, fv1, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(gt8, gt1)

    # map_train (DeepCluster's per-epoch full-dataset forward)
    emb1 = t1.map_train(t1.state, t1.algorithm.embed)
    emb8 = t8.map_train(t8.state, t8.algorithm.embed)
    np.testing.assert_allclose(emb8, emb1, rtol=1e-5, atol=1e-6)

    # stream_train (SeLA's self-labelling pass): yielded batches must match
    # and the jitted program must have consumed sharded indices
    for (z1, i1, c1), (z8, i8, c8) in zip(
            t1.stream_train(t1.state, t1.algorithm.embed),
            t8.stream_train(t8.state, t8.algorithm.embed)):
        assert c1 == c8
        np.testing.assert_allclose(np.asarray(z8), np.asarray(z1),
                                   rtol=1e-5, atol=1e-6)
    assert t8._shard_idx(jnp.arange(16, dtype=jnp.int32)).sharding.spec == \
        P("data")


@pytest.mark.parametrize("algo", ["moco", "swav"])
def test_long_horizon_sharded_equivalence(algo, tmp_path, mesh):
    """VERDICT round-2 item 6: multi-EPOCH curve equivalence, not just one
    step. f32 (`compute_dtype`), same seed: a 10-epoch run on the 8-device
    mesh must reproduce the single-device loss curve to float tolerance and
    the identical final KNN. Covers the stateful (moco ring queue) and
    banked (swav feature bank + full-pass init) families — the class of bug
    single-step tests miss (key-folding drift, stats diverging across scan
    iterations, bank index skew)."""
    import sys
    sys.path.insert(0, str(tmp_path.parent))
    from helpers import make_trainer

    epochs = 10
    f32 = {"compute_dtype": "float32",
           "encoder": {"reduce_bottom_conv": True, "dtype": "float32"}}

    def run(use_mesh, sub):
        d = tmp_path / sub
        d.mkdir()
        t = make_trainer(algo, d, epochs=epochs, batch_size=16, n_train=96,
                         n_test=48, cfg_extra=f32, use_mesh=use_mesh)
        state = t.algorithm.pre_train(t.state, t)
        losses = []
        for e in range(1, epochs + 1):
            state = t.algorithm.pre_epoch(state, t, e)
            t.rng, k_perm, k_epoch = jax.random.split(t.rng, 3)
            idx_mat = t._shard_idx_mat(t.pipeline.epoch_indices(k_perm))
            state, metrics = t._epoch_fn(state, *t._train_arrays, idx_mat,
                                         k_epoch)
            state = t._post_epoch_fn(state, jnp.asarray(e))
            losses.append(float(np.asarray(metrics["loss"]).mean()))
        t.state = state
        return losses, t.knn_validate()

    losses_1, knn_1 = run(False, "single")
    losses_8, knn_8 = run(True, "sharded")
    np.testing.assert_allclose(losses_8, losses_1, rtol=1e-4, atol=1e-5)
    assert knn_8 == pytest.approx(knn_1, abs=1e-6), (knn_8, knn_1)
