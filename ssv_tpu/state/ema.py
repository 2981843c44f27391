"""EMA (momentum) updates over parameter pytrees.

Replaces the per-parameter Python loops in MoCo (moco.py:108-111), BYOL
(byol.py:120-123), ReLIC (relic.py:115-122) and DINO (dino.py:129-134) with
one fused tree_map — XLA compiles it into a handful of wide vector ops, and
under jit it runs in the same program as the optimizer step.
"""

from __future__ import annotations

import jax


def ema_update(target_tree, online_tree, tau):
    """target <- tau * target + (1 - tau) * online. `tau` may be traced."""
    return jax.tree_util.tree_map(
        lambda t, o: tau * t + (1.0 - tau) * o, target_tree, online_tree)
