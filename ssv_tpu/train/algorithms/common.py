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
    def __call__(self, x, train: bool = True, use_pred: bool = True):
        z = self.encoder(x, train=train)
        if self.proj is not None:
            z = self.proj(z, train=train)
        if self.pred is not None and use_pred:
            z = self.pred(z, train=train)
        if self.norm_out:
            z = l2_normalize(z)
        return z
