"""Per-device-BatchNorm execution path via shard_map.

The default execution model jits over globally-sharded arrays, which makes
every batch statistic global (sync-BN). SSL quality folklore sometimes
prefers per-replica BN statistics (the torch-DDP default the reference would
have had if it were distributed) — SURVEY §7 asks for this as a config
choice, and it matters most for the EMA-tower family (BYOL/DINO), where the
target network's statistics shape the learning signal.

Contract (supported by ALL algorithms): every `Algorithm.train_step` takes
an optional `axis` name. With `axis=None` (the jit-sharded sync path) the
helpers below are identity functions and the step is the ordinary
single-program step. Inside `shard_map` (`axis="data"`) the step becomes a
device-local program where:

  * the model forward sees only the device-local batch (per-device BN);
  * `pgather(x, axis)` all_gathers embeddings when the loss or a state
    update needs the GLOBAL batch (contrastive negatives, Sinkhorn columns,
    queue pushes, per-sample bank scatters);
  * `pmean_tree(t, axis)` replica-means the stored BN running statistics so
    saved state stays replica-consistent (documented divergence from
    torch-DDP's rank-0 stats);
  * `Algorithm.grad_step(..., axis, loss_scope)` reduces gradients with the
    collective matching the loss's construction:
      - loss_scope="global": the loss was computed identically on every
        replica from gathered embeddings, so each replica's gradient is its
        additive share through the all_gather transpose -> `psum`;
      - loss_scope="local": the loss is a device-local per-sample MEAN, the
        global loss is the pmean of replica losses -> `pmean` of gradients.
    (Using psum for a local-mean loss would scale gradients by the replica
    count — an effective-LR bug this explicit convention prevents.)
  * each replica folds its axis index into the augmentation PRNG key, so
    view sampling stays independent across shards.

Enabled with `per_device_bn: true` in any algorithm config.
"""

from __future__ import annotations

import jax
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P


def pgather(x, axis):
    """all_gather over the data axis (identity outside shard_map)."""
    if axis is None:
        return x
    return lax.all_gather(x, axis, axis=0, tiled=True)


def pmean_tree(tree, axis):
    """Replica-mean every leaf (identity outside shard_map)."""
    if axis is None:
        return tree
    return jax.tree_util.tree_map(lambda v: lax.pmean(v, axis), tree)


def make_per_device_step(algo, batch_fn, mesh):
    """Build the shard_map step: state/params replicated, batch index slice
    sharded over `data`, algorithm body run device-locally with explicit
    collectives (see module docstring)."""

    def local_step(state, images, labels, idx, key):
        # identical key per replica -> decorrelate with the axis index
        key = jax.random.fold_in(key, lax.axis_index("data"))
        k_data, k_algo = jax.random.split(key)
        batch = batch_fn(images, labels, idx, k_data)
        return algo.train_step(state, batch, k_algo, axis="data")

    return shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
