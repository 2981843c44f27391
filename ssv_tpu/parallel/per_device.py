"""Per-device-BatchNorm execution path via shard_map.

The default execution model jits over globally-sharded arrays, which makes
every batch statistic global (sync-BN). SSL quality folklore sometimes
prefers per-replica BN statistics (the torch-DDP default the reference would
have had if it were distributed) — SURVEY §7 asks for this as a config
choice. This module builds a train step where:

  * the model forward runs INSIDE `shard_map` over the `data` axis, so
    BatchNorm sees only the device-local batch (per-device statistics);
  * projected embeddings are `all_gather`-ed across `data` so contrastive
    losses still see the full global batch of negatives;
  * gradients are `psum`-ed; the optimizer update runs replicated;
  * stored BN running statistics are `pmean`-ed across replicas so the saved
    state stays replica-consistent (documented divergence from torch-DDP's
    rank-0 stats);
  * each replica folds its axis index into the augmentation PRNG key, so
    view sampling stays independent across shards.

Enabled per algorithm with `per_device_bn: true` (supported by the
simple two-view algorithms: SimCLR, Barlow Twins).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..train.base import apply_train


def make_two_view_per_device_step(algo, batch_fn, mesh, loss_over_gathered):
    """Build fn(state, images, labels, idx, key) -> (state, metrics) with
    per-device BN. `loss_over_gathered(z1_global, z2_global)` computes the
    scalar loss from gathered projections."""

    def local_step(state, images, labels, idx, key):
        # identical key per replica -> decorrelate with the axis index
        key = jax.random.fold_in(key, lax.axis_index("data"))
        k_data, _ = jax.random.split(key)
        batch = batch_fn(images, labels, idx, k_data)

        def loss_fn(params):
            z1, bs = apply_train(algo.model, params, state.batch_stats,
                                 batch["aug_1"])
            z2, bs = apply_train(algo.model, params, bs, batch["aug_2"])
            z1g = lax.all_gather(z1, "data", axis=0, tiled=True)
            z2g = lax.all_gather(z2, "data", axis=0, tiled=True)
            return loss_over_gathered(z1g, z2g), bs

        (loss, bstats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        grads = lax.psum(grads, "data")
        # per-device running stats -> replica-consistent stored state
        bstats = jax.tree_util.tree_map(lambda x: lax.pmean(x, "data"), bstats)
        loss = lax.pmean(loss, "data")

        updates, opt_state = algo.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new = state.replace(step=state.step + 1, params=params,
                            batch_stats=bstats, opt_state=opt_state)
        return new, {"loss": loss}

    state_spec = P()
    return shard_map(
        local_step, mesh=mesh,
        in_specs=(state_spec, P(), P(), P("data"), P()),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
