"""Device mesh and sharding layout.

The reference is strictly single-device (no torch.distributed anywhere; the
device is chosen per-tensor at common.py:124-127). This module is therefore
green-field TPU design: a 1-D data-parallel mesh over ICI by default, with
every global batch sharded along ``data`` and parameters/banks replicated.
XLA inserts the cross-replica psums (gradients, sync-BN batch stats,
Sinkhorn column sums) automatically because the train step is jitted over the
global, sharded arrays — no hand-written collectives needed on this path.

A second ``model`` axis is reserved for tensor-sharding wide projector /
prototype matrices (SwAV's 3000-proto table, Barlow's 4096-d projector); it
defaults to size 1.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@lru_cache(maxsize=None)
def get_mesh(n_devices: int | None = None, model_parallel: int = 1) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, f"{n} devices not divisible by model={model_parallel}"
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis split across data-parallel replicas."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of batch arrays with the leading axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
