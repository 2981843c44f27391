"""On-device K-means (Lloyd) with multi-restart.

Replaces faiss.Kmeans(d, k, niter=300, nredo=10) in DeepCluster
(reference deep_cluster.py:111-114) with a pure-JAX implementation: the
assignment step is one (N, d) x (d, K) matmul per iteration (MXU), the
update step one segment-sum scatter; restarts are vmapped so all `nredo`
runs execute as a single batched program, best inertia wins — the natural
TPU shape for this workload instead of faiss's host-side C++ loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _assign(x, centroids):
    """argmin_k ||x - c_k||^2 via the expanded form (x.x is constant)."""
    dots = jnp.dot(x, centroids.T, preferred_element_type=jnp.float32)
    c2 = jnp.sum(centroids ** 2, axis=1)
    dist = c2[None, :] - 2.0 * dots
    assign = jnp.argmin(dist, axis=1)
    min_dist = jnp.min(dist, axis=1) + jnp.sum(x ** 2, axis=1)
    return assign, min_dist


def _lloyd(x, init_centroids, n_iters: int):
    k = init_centroids.shape[0]

    def body(centroids, _):
        assign, _ = _assign(x, centroids)
        one_hot = jax.nn.one_hot(assign, k, dtype=x.dtype)          # (N, K)
        counts = jnp.sum(one_hot, axis=0)                           # (K,)
        sums = jnp.dot(one_hot.T, x, preferred_element_type=jnp.float32)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        # empty clusters keep their previous centroid (faiss re-seeds; at
        # k=10 / N=50k empties are vanishingly rare — documented divergence)
        new = jnp.where((counts > 0)[:, None], new, centroids)
        return new, None

    centroids, _ = jax.lax.scan(body, init_centroids, None, length=n_iters)
    assign, dist = _assign(x, centroids)
    return centroids, assign, jnp.sum(dist)


@partial(jax.jit, static_argnames=("k", "n_iters", "n_redo"))
def kmeans(key, x, k: int, n_iters: int = 300, n_redo: int = 10):
    """Returns (centroids (k,d), assignments (N,), inertia scalar) of the
    best of `n_redo` random-subset initializations (faiss's default init)."""
    n = x.shape[0]

    def one_run(rk):
        idx = jax.random.choice(rk, n, shape=(k,), replace=False)
        return _lloyd(x, x[idx], n_iters)

    keys = jax.random.split(key, n_redo)
    cents, assigns, inertias = jax.vmap(one_run)(keys)
    best = jnp.argmin(inertias)
    return cents[best], assigns[best], inertias[best]
