"""A minimal CNN encoder for fast tests and examples.

Not part of the reference's NETWORKS table — exists so integration tests can
exercise every algorithm's full train loop without paying ResNet-18's XLA
CPU-compile cost. Same contract as the real backbones:
(B, H, W, 3) -> (B, feature_dim), BatchNorm batch_stats collection included
so the BN-handling code paths are still covered.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

TINY_DIM = 64


class TinyEncoder(nn.Module):
    features: int = TINY_DIM
    dtype: Any = jnp.bfloat16
    reduce_bottom_conv: bool = True  # accepted for config compatibility
    zero_init_residual: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = x.astype(self.dtype)
        x = nn.Conv(32, (3, 3), strides=2, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), strides=2, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32)(x)
        x = nn.relu(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
