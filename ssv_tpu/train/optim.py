"""Optimizers from the reference YAML schema, as optax chains.

Mirrors `get_optimizer` (reference train_utils.py:6-21): `sgd` means
momentum=0.9 + nesterov (the reference hardcodes those, ignoring config
keys — preserved), `adam`/`adamw` take lr/eps/weight_decay. Weight decay is
coupled (L2-into-grad) for sgd/adam and decoupled for adamw, matching torch.

Extras the reference mutates imperatively are expressed as schedules:
`weight_decay_fn` (DINO's per-epoch cosine WD ramp, dino.py:122-127) and
`grad_clip` (DINO's per-element clamp hooks, dino.py:75-79).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import optax


def _clip_by_value(clip: float):
    def update_fn(updates, state, params=None):
        import jax
        return (jax.tree_util.tree_map(lambda g: jnp.clip(g, -clip, clip), updates),
                state)
    return optax.GradientTransformation(lambda params: optax.EmptyState(), update_fn)


def _scheduled_decay(weight_decay_fn: Callable):
    """Adds wd(step) * params to updates (coupled L2), tracking a step count."""
    def init_fn(params):
        return {"count": jnp.zeros((), jnp.int32)}

    def update_fn(updates, state, params=None):
        import jax
        wd = weight_decay_fn(state["count"])
        updates = jax.tree_util.tree_map(lambda g, p: g + wd * p, updates, params)
        return updates, {"count": state["count"] + 1}

    return optax.GradientTransformation(init_fn, update_fn)


def get_optimizer(cfg: dict, lr_fn: Callable,
                  weight_decay_fn: Optional[Callable] = None,
                  grad_clip: Optional[float] = None) -> optax.GradientTransformation:
    name = cfg.get("name", "sgd")
    wd = float(cfg.get("weight_decay", 1e-6))

    parts = []
    if grad_clip is not None:
        parts.append(_clip_by_value(float(grad_clip)))

    if name == "sgd":
        if weight_decay_fn is not None:
            parts.append(_scheduled_decay(weight_decay_fn))
        elif wd:
            parts.append(optax.add_decayed_weights(wd))
        parts.append(optax.sgd(learning_rate=lr_fn, momentum=0.9, nesterov=True))
    elif name == "adam":
        if weight_decay_fn is not None:
            parts.append(_scheduled_decay(weight_decay_fn))
        elif wd:
            parts.append(optax.add_decayed_weights(wd))
        parts.append(optax.adam(learning_rate=lr_fn,
                                eps=float(cfg.get("epsilon", 1e-8))))
    elif name == "adamw":
        # decoupled decay: scale_by_adam -> add wd(step)*p -> -lr scaling
        parts.append(optax.scale_by_adam(eps=float(cfg.get("epsilon", 1e-8))))
        if weight_decay_fn is not None:
            parts.append(_scheduled_decay(weight_decay_fn))
        elif wd:
            parts.append(optax.add_decayed_weights(wd))
        parts.append(optax.scale_by_learning_rate(lr_fn))
    else:
        raise ValueError(f"Unknown optimizer {name!r}")

    return optax.chain(*parts)
