"""Tests for on-device KNN, K-means, Hungarian matching, linear probe,
and memory-bank state."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssv_tpu.ops import knn_label_agreement, kmeans
from ssv_tpu.evals import compute_neighbor_accuracy, hungarian_match, linear_evaluation
from ssv_tpu.state.banks import (
    ring_init, ring_push, sample_bank_init, sample_bank_set,
    sample_bank_update, sample_negatives, SampleBank)
from ssv_tpu.state.ema import ema_update

rs = np.random.RandomState(1)


def knn_oracle(f, labels, k):
    """Brute-force: faiss IndexFlatIP semantics (eval_utils.py:13-21)."""
    f = f / np.linalg.norm(f, axis=1, keepdims=True)
    sims = f @ f.T
    np.fill_diagonal(sims, -np.inf)
    nbrs = np.argsort(-sims, axis=1)[:, :k]
    return np.mean(labels[nbrs] == labels[:, None])


def test_knn_matches_bruteforce():
    f = rs.randn(300, 16).astype(np.float32)
    labels = rs.randint(0, 10, 300)
    want = knn_oracle(f, labels, 20)
    got = compute_neighbor_accuracy(f, labels, k=20)
    assert got == pytest.approx(want, abs=1e-6)


def test_knn_separable_clusters():
    # two tight clusters -> 100% neighbor agreement
    a = rs.randn(50, 8) * 0.01 + np.array([10.0] + [0.0] * 7)
    b = rs.randn(50, 8) * 0.01 + np.array([0.0] * 7 + [10.0])
    f = np.concatenate([a, b]).astype(np.float32)
    labels = np.array([0] * 50 + [1] * 50)
    assert compute_neighbor_accuracy(f, labels, k=20) == pytest.approx(1.0)


def test_kmeans_recovers_clusters():
    centers = np.array([[5, 0], [-5, 0], [0, 5]], np.float32)
    x = np.concatenate([c + 0.1 * rs.randn(100, 2) for c in centers]).astype(np.float32)
    labels = np.repeat(np.arange(3), 100)
    _, assign, inertia = kmeans(jax.random.PRNGKey(0), jnp.array(x), k=3,
                                n_iters=20, n_redo=4)
    assign = np.asarray(assign)
    # cluster ids are arbitrary: check purity via hungarian
    m = hungarian_match(assign, labels, 3, 3)
    mapped = np.array([m[a] for a in assign])
    assert (mapped == labels).mean() > 0.99
    assert float(inertia) < 10.0


def test_hungarian_identity_and_permuted():
    targets = np.repeat(np.arange(4), 25)
    perm = np.array([2, 3, 0, 1])
    pred = perm[targets]
    m = hungarian_match(pred, targets, 4, 4)
    for cls in range(4):
        assert m[perm[cls]] == cls


def test_hungarian_numpy_fallback_matches_scipy():
    from ssv_tpu.evals.hungarian import _hungarian_numpy
    from scipy.optimize import linear_sum_assignment
    for _ in range(5):
        cost = rs.rand(8, 8)
        r1, c1 = linear_sum_assignment(cost)
        r2, c2 = _hungarian_numpy(cost)
        assert cost[r1, c1].sum() == pytest.approx(cost[r2, c2].sum(), abs=1e-9)


def test_linear_probe_learns_separable():
    n, d = 512, 16
    y = rs.randint(0, 4, n)
    w_true = rs.randn(4, d)
    x = w_true[y] + 0.05 * rs.randn(n, d)
    acc = linear_evaluation({"epochs": 20, "batch_size": 64, "lr": 0.5},
                            {"fvecs": x[:400], "labels": y[:400]},
                            {"fvecs": x[400:], "labels": y[400:]}, num_classes=4)
    assert acc > 0.95


def test_ring_buffer_wraps():
    buf = ring_init(5, 2)
    buf = ring_push(buf, jnp.ones((3, 2)))
    buf = ring_push(buf, 2 * jnp.ones((3, 2)))  # wraps by 1
    data = np.asarray(buf.data)
    np.testing.assert_allclose(data[3:5], 2.0)   # rows 3,4 from second push
    np.testing.assert_allclose(data[0], 2.0)     # wrapped row
    np.testing.assert_allclose(data[1:3], 1.0)
    assert int(buf.ptr) == 1


def test_sample_bank_ema_and_negatives():
    bank = sample_bank_init(100, 4)
    idx = jnp.array([3, 7])
    v = jnp.array(rs.randn(2, 4), jnp.float32)
    bank = sample_bank_set(bank, idx, v)
    vn = np.asarray(v) / np.linalg.norm(v, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(bank.data)[np.array([3, 7])], vn, rtol=1e-5)

    v2 = jnp.array(rs.randn(2, 4), jnp.float32)
    bank2 = sample_bank_update(bank, idx, v2, momentum=0.5)
    v2n = np.asarray(v2) / np.linalg.norm(v2, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(bank2.data)[np.array([3, 7])],
                               0.5 * vn + 0.5 * v2n, rtol=1e-5)

    # negatives exclude the batch indices
    marked = SampleBank(jnp.arange(100, dtype=jnp.float32)[:, None].repeat(4, 1))
    negs = sample_negatives(jax.random.PRNGKey(0), marked, idx, 50)
    ids = set(np.asarray(negs)[:, 0].astype(int).tolist())
    assert 3 not in ids and 7 not in ids
    assert len(ids) == 50  # without replacement


def test_ema_update():
    t = {"a": jnp.ones((3,)), "b": jnp.zeros((2,))}
    o = {"a": jnp.zeros((3,)), "b": jnp.ones((2,))}
    out = ema_update(t, o, 0.9)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.9)
    np.testing.assert_allclose(np.asarray(out["b"]), 0.1)
