"""KNN validation — thin wrapper keeping the reference's name and signature
(`compute_neighbor_accuracy(fvecs, targets, k=20)`, eval_utils.py:13-21)
over the on-device kernel in ops/knn.py."""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.knn import knn_label_agreement


def compute_neighbor_accuracy(fvecs, targets, k: int = 20) -> float:
    return float(knn_label_agreement(jnp.asarray(fvecs), jnp.asarray(targets), k=k))
