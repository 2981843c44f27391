"""Linear probe on frozen features, fully on device.

Capability parity with the reference's `linear_evaluation`
(eval_utils.py:37-76): an nn.Linear probe trained with SGD (momentum 0.9,
weight decay 1e-6), cosine-annealed LR over `epochs`, NLL loss, then test
accuracy. The reference path cannot actually run as written (tuple-bound
loaders :38-39, bool-mean :55, missing `return_metrics` :75 — see SURVEY.md
§2); this is the repaired semantics.

TPU design: features (50000 x D) stay on device; the entire multi-epoch
training loop is ONE jitted `lax.scan` over steps — per-epoch shuffles are
precomputed as a (steps, batch) index matrix, so a 100-epoch probe run is a
single XLA program with no host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..utils.schedules import warmup_cosine


def linear_evaluation(config: dict, train_data: dict, test_data: dict,
                      num_classes: int, seed: int = 0) -> float:
    cfg = dict(config)
    epochs = int(cfg.get("epochs", 100))
    batch_size = int(cfg.get("batch_size", 256))
    lr = float(cfg.get("lr", 0.1))
    momentum = float(cfg.get("momentum", 0.9))
    wd = float(cfg.get("weight_decay", 1e-6))

    x = jnp.asarray(train_data["fvecs"], jnp.float32)
    y = jnp.asarray(train_data["labels"], jnp.int32)
    xt = jnp.asarray(test_data["fvecs"], jnp.float32)
    yt = jnp.asarray(test_data["labels"], jnp.int32)

    n, d = x.shape
    batch_size = min(batch_size, n)  # smoke-scale runs: n < configured batch
    steps_per_epoch = max(n // batch_size, 1)
    total_steps = epochs * steps_per_epoch

    key = jax.random.PRNGKey(seed)
    k_init, k_perm = jax.random.split(key)
    params = {
        "w": jax.random.normal(k_init, (d, num_classes)) * (1.0 / jnp.sqrt(d)),
        "b": jnp.zeros((num_classes,)),
    }

    def lr_fn(step):
        # reference: CosineAnnealingLR(T_max=epochs, eta_min=0), no warmup
        return warmup_cosine(step, base_lr=lr, total_steps=total_steps, warmup_steps=0)

    tx = optax.chain(optax.add_decayed_weights(wd),
                     optax.sgd(learning_rate=lr_fn, momentum=momentum))
    opt_state = tx.init(params)

    # precompute all epoch shuffles on device: (total_steps, batch)
    def epoch_perm(k):
        return jax.random.permutation(k, n)[: steps_per_epoch * batch_size]
    perms = jax.vmap(epoch_perm)(jax.random.split(k_perm, epochs))
    idx_mat = perms.reshape(total_steps, batch_size)

    def loss_fn(p, xb, yb):
        logits = xb @ p["w"] + p["b"]
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, yb[:, None], axis=1))

    # Data enters as ARGUMENTS, not closure captures: a closed-over feature
    # matrix is baked into the HLO as a literal (a 4096-dim probe embeds
    # 50000x4096 f32 = 819 MB of constants), exploding compile payloads.
    @jax.jit
    def run(params, opt_state, x, y, xt, yt, idx_mat):
        def step(carry, idx):
            p, s = carry
            xb, yb = x[idx], y[idx]
            loss, grads = jax.value_and_grad(loss_fn)(p, xb, yb)
            updates, s = tx.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), loss

        (params, _), losses = jax.lax.scan(step, (params, opt_state), idx_mat)
        logits = xt @ params["w"] + params["b"]
        acc = jnp.mean((jnp.argmax(logits, axis=-1) == yt).astype(jnp.float32))
        return params, acc, losses[-1]

    _, acc, _ = run(params, opt_state, x, y, xt, yt, idx_mat)
    return float(acc)
