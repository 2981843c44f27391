"""Projection / prediction heads and prototype tables.

Covers every head variant the reference defines inline per-algorithm:
  * SimCLR 2-layer proj with trailing BN   (simclr.py:23-36)
  * BYOL / ReLIC MLP (fc-bn-relu-fc)        (byol.py:24-34, relic.py:24-35)
  * SimSiam 3-layer proj + bottleneck pred  (simsiam.py:24-48)
  * Barlow 3-layer proj, L2-normalized      (barlow.py:23-36)
  * MoCo / PIRL linear heads                (moco.py:42-52, pirl.py:49-77)
  * SwAV proj (fc-bn-gelu-fc-bn, L2) + normalized prototype table
                                            (swav.py:25-54)
  * DINO 3-layer GELU proj + L2 + weight-normed output (dino.py:25-42)

All heads run in bf16 on the MXU with f32 params; BatchNorm stats are f32 and
globally synced under jit (see models/resnet.py docstring).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


def l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


class MLPHead(nn.Module):
    """Generic MLP head driven by a layer spec.

    spec: sequence of layer widths; bn: which fc layers (0-indexed) are
    followed by BatchNorm; act: activation between layers ("relu"/"gelu").
    """

    widths: Sequence[int]
    bn_after: Sequence[int] = ()
    act: str = "relu"
    final_act: bool = False
    l2_norm_out: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        act = {"relu": nn.relu, "gelu": lambda v: nn.gelu(v, approximate=False)}[self.act]
        n = len(self.widths)
        x = x.astype(self.dtype)
        for i, w in enumerate(self.widths):
            x = nn.Dense(w, dtype=self.dtype, param_dtype=jnp.float32)(x)
            if i in self.bn_after:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32)(x)
            if i < n - 1 or self.final_act:
                x = act(x)
        x = x.astype(jnp.float32)
        if self.l2_norm_out:
            x = l2_normalize(x)
        return x


def simclr_projection(input_dim: int, proj_dim: int,
                      dtype: Any = jnp.bfloat16) -> MLPHead:
    """fc(d,d)-bn-relu-fc(d,p)-bn (no final act)."""
    return MLPHead(widths=(input_dim, proj_dim), bn_after=(0, 1), dtype=dtype)


def byol_mlp(input_dim: int, output_dim: int,
             dtype: Any = jnp.bfloat16) -> MLPHead:
    """fc(d,d)-bn-relu-fc(d,p)."""
    return MLPHead(widths=(input_dim, output_dim), bn_after=(0,), dtype=dtype)


def simsiam_projector(proj_dim: int, dtype: Any = jnp.bfloat16) -> MLPHead:
    """fc-bn-relu ×2 then fc-bn."""
    return MLPHead(widths=(proj_dim, proj_dim, proj_dim), bn_after=(0, 1, 2),
                   dtype=dtype)


def simsiam_predictor(proj_dim: int, bottleneck_dim: int,
                      dtype: Any = jnp.bfloat16) -> MLPHead:
    return MLPHead(widths=(bottleneck_dim, proj_dim), bn_after=(0,), dtype=dtype)


def barlow_projection(proj_dim: int, dtype: Any = jnp.bfloat16) -> MLPHead:
    return MLPHead(widths=(proj_dim, proj_dim, proj_dim), bn_after=(0, 1),
                   l2_norm_out=True, dtype=dtype)


def swav_projection(hidden_dim: int, proj_dim: int,
                    dtype: Any = jnp.bfloat16) -> MLPHead:
    return MLPHead(widths=(hidden_dim, proj_dim), bn_after=(0, 1), act="gelu",
                   l2_norm_out=True, dtype=dtype)


class LinearHead(nn.Module):
    """ReLU -> Linear, as used by MoCo's EncoderModel (moco.py:42-52)."""

    features: int
    pre_relu: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.pre_relu:
            x = nn.relu(x)
        x = nn.Dense(self.features, dtype=self.dtype, param_dtype=jnp.float32)(x)
        return x.astype(jnp.float32)


class WeightNormDense(nn.Module):
    """Dense layer with weight normalization (torch nn.utils.weight_norm,
    dim=0): W[:, j] = g[j] * v[:, j] / ||v[:, j]||; g initialized to ||v||."""

    features: int

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        v = self.param("v", nn.initializers.lecun_normal(), (in_dim, self.features))
        g = self.param("g", lambda rng, shape: jnp.linalg.norm(v, axis=0), (self.features,))
        b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        w = v * (g / jnp.maximum(jnp.linalg.norm(v, axis=0), 1e-12))[None, :]
        return jnp.dot(x, w, preferred_element_type=jnp.float32) + b


class DinoHead(nn.Module):
    """3-layer GELU MLP -> L2 normalize -> weight-normed linear (dino.py:25-42)."""

    hidden_dim: int
    proj_dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = MLPHead(widths=(self.hidden_dim, self.hidden_dim, self.hidden_dim),
                    act="gelu", dtype=self.dtype)(x, train=train)
        x = l2_normalize(x)
        return WeightNormDense(self.proj_dim, name="fc_out")(x)


class Prototypes(nn.Module):
    """Learnable prototype table, rows L2-normalized on read (swav.py:44-54).

    TPU note: at (3000, 128) this is a single MXU-friendly matrix; under a
    model-parallel mesh axis it can be sharded on the prototype dim and the
    score matmul becomes a local matmul + all_gather of score columns.
    """

    count: int
    dim: int

    @nn.compact
    def __call__(self):
        table = self.param("table", nn.initializers.normal(1.0), (self.count, self.dim))
        return l2_normalize(table, axis=-1)


class ClusterHeads(nn.Module):
    """N parallel linear cluster heads (sela.py:30-43). Evaluated as one
    batched einsum over a stacked (heads, dim, clusters) kernel: one MXU call
    instead of a Python loop over heads."""

    num_heads: int
    num_clusters: int

    @nn.compact
    def __call__(self, features):
        d = features.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.num_heads, d, self.num_clusters))
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.num_heads, self.num_clusters))
        logits = jnp.einsum("bd,hdk->hbk", features, w,
                            preferred_element_type=jnp.float32) + b[:, None, :]
        return logits  # (heads, batch, clusters)
