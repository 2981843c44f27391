"""Shared composite network used by most algorithms: encoder [+ projector
[+ predictor]], with optional L2-normalized output — the pattern every
reference trainer re-declares inline (EncoderModel/OnlineNetwork/
TargetNetwork variants across models/*.py)."""

from __future__ import annotations

from typing import Optional

from flax import linen as nn

from ...models.heads import l2_normalize


class Tower(nn.Module):
    encoder: nn.Module
    proj: Optional[nn.Module] = None
    pred: Optional[nn.Module] = None
    norm_out: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True, use_pred: bool = True,
                 return_pair: bool = False):
        z = self.encoder(x, train=train)
        if self.proj is not None:
            z = self.proj(z, train=train)
        if return_pair and self.pred is not None:
            # (projector_out, predictor_out) from ONE pass — the projector
            # output is an intermediate of the predictor path, so algorithms
            # needing both (SimSiam stop-grad) must not re-encode
            p = self.pred(z, train=train)
            if self.norm_out:
                return l2_normalize(z), l2_normalize(p)
            return z, p
        if self.pred is not None and use_pred:
            z = self.pred(z, train=train)
        if self.norm_out:
            z = l2_normalize(z)
        return z


def forward_views(model, params, batch_stats, views, fuse: bool):
    """Encode several same-shape view batches through one tower.

    fuse=True concatenates the views into ONE forward (one kernel launch
    sequence, len(views)-times larger MXU batch; BatchNorm sees the union
    batch — exact for BN-free towers like ViT, a documented semantics
    choice for BN towers). fuse=False runs sequential per-view forwards
    with per-view batch statistics, matching the reference trainers.
    Returns ([z_view...], new_batch_stats).
    """
    import jax.numpy as jnp

    from ..base import apply_train

    if fuse:
        out, bs = apply_train(model, params, batch_stats,
                              jnp.concatenate(views, axis=0))
        return list(jnp.split(out, len(views), axis=0)), bs
    outs = []
    bs = batch_stats
    for v in views:
        z, bs = apply_train(model, params, bs, v)
        outs.append(z)
    return outs, bs
