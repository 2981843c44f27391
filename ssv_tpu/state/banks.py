"""Memory banks as on-device pytree state.

The reference holds its banks as CPU torch tensors mutated by Python loops —
MoCo's queue writes one row at a time (moco.py:31-36), SwAV's FeatureBank the
same (swav.py:70-75), and PIRL's negative sampling is an O(N) Python loop
over `randperm(50000)` *per step* (pirl.py:44-46, the hottest spot in the
whole reference). Here every bank is a fixed-shape JAX array living in HBM,
updated with one `dynamic_update_slice` (ring buffers) or one scatter
(per-sample banks), and PIRL's negative sampling is an O(N log K)-ish on-
device top-k over masked random scores — exact sampling without replacement,
excluding the batch, with zero host involvement.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RingBuffer(NamedTuple):
    """Fixed-size FIFO of feature rows + write pointer (both on device)."""
    data: jnp.ndarray   # (size, dim)
    ptr: jnp.ndarray    # () int32


def ring_init(size: int, dim: int, dtype=jnp.float32) -> RingBuffer:
    return RingBuffer(jnp.zeros((size, dim), dtype), jnp.zeros((), jnp.int32))


def ring_push(buf: RingBuffer, rows: jnp.ndarray) -> RingBuffer:
    """Append a batch of rows, wrapping. Batch may exceed or straddle the
    end; implemented as a scatter on (ptr + arange) % size — one XLA op."""
    n = rows.shape[0]
    size = buf.data.shape[0]
    idx = (buf.ptr + jnp.arange(n)) % size
    data = buf.data.at[idx].set(rows.astype(buf.data.dtype))
    return RingBuffer(data, (buf.ptr + n) % size)


class SampleBank(NamedTuple):
    """Per-sample EMA bank (PIRL, pirl.py:22-46): one row per dataset item."""
    data: jnp.ndarray   # (n_samples, dim)


def sample_bank_init(n_samples: int, dim: int) -> SampleBank:
    # reference zero-init + normalize => zero rows (0/||0|| guarded to 0)
    return SampleBank(jnp.zeros((n_samples, dim), jnp.float32))


def _l2(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def sample_bank_set(bank: SampleBank, indices, vectors) -> SampleBank:
    return SampleBank(bank.data.at[indices].set(_l2(vectors)))


def sample_bank_update(bank: SampleBank, indices, vectors, momentum: float) -> SampleBank:
    """bank[i] <- m * bank[i] + (1-m) * normalize(v) (pirl.py:37-41)."""
    new = momentum * bank.data[indices] + (1.0 - momentum) * _l2(vectors)
    return SampleBank(bank.data.at[indices].set(new))


def sample_negatives(key, bank: SampleBank, exclude_idx, num_negatives: int):
    """Uniform sample of `num_negatives` bank rows excluding `exclude_idx`,
    without replacement: random scores per row, -inf on excluded rows,
    top-k. Equivalent in distribution to the reference's
    randperm-then-filter (pirl.py:44-46) at a tiny fraction of the cost."""
    n = bank.data.shape[0]
    scores = jax.random.uniform(key, (n,))
    scores = scores.at[exclude_idx].set(-jnp.inf)
    _, idx = jax.lax.top_k(scores, num_negatives)
    return bank.data[idx]
