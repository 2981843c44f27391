"""Fused photometric augmentation as a Pallas TPU kernel.

Covers the head of the standard SSL pipeline — RandomApply(ColorJitter)
followed by RandomGrayscale (the first two entries of every reference config,
e.g. configs/simclr.yaml data.transforms.train) — in ONE VMEM pass per image:
the four jitter ops are applied in their per-image random order via
`lax.switch`, then the grayscale gate, with no HBM round-trips between ops.

Randomness stays in `jax.random` on the host side of the kernel:
`sample_photometric_params` draws per-image (order, factors, gates) with the
EXACT same key-splitting discipline as the reference per-example path
(data/augment.py color_jitter/_wrap_prob/random_grayscale), so the fused
kernel is a drop-in replacement — tests assert elementwise equivalence.

Layout: images are passed channels-leading as (B, 3, H*W) so the pixel axis
(1024 for CIFAR) lands on the 128-wide lane dimension; the per-image scalar
parameters ride in via PrefetchScalarGridSpec (SMEM).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GRAY_W = (0.299, 0.587, 0.114)


def _gray(x):
    return GRAY_W[0] * x[0] + GRAY_W[1] * x[1] + GRAY_W[2] * x[2]


def _blend(a, b, f):
    return jnp.clip(f * a + (1.0 - f) * b, 0.0, 1.0)


def _brightness(x, f):
    return jnp.clip(f * x, 0.0, 1.0)


def _contrast(x, f):
    mean = jnp.mean(_gray(x))
    return _blend(x, jnp.full_like(x, mean), f)


def _saturation(x, f):
    g = _gray(x)
    return _blend(x, jnp.stack([g, g, g]), f)


def _hue(x, shift):
    r, g, b = x[0], x[1], x[2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(delta == 0, 0.0, h)

    h = (h + shift) % 1.0
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    # chained where instead of jnp.select: select lowers through argmax,
    # which Mosaic only supports for f32 — where chains lower cleanly.
    def pick(c0, c1, c2, c3, c4, c5):
        return jnp.where(i == 0, c0,
               jnp.where(i == 1, c1,
               jnp.where(i == 2, c2,
               jnp.where(i == 3, c3,
               jnp.where(i == 4, c4, c5)))))

    r2 = pick(v, q, p, p, t, v)
    g2 = pick(t, v, v, q, p, p)
    b2 = pick(p, p, t, v, v, q)
    return jnp.stack([r2, g2, b2])


def _kernel(order_ref, params_ref, img_ref, out_ref):
    i = pl.program_id(0)
    x = img_ref[0]  # (3, HW) f32

    fb = params_ref[i, 0]
    fc = params_ref[i, 1]
    fs = params_ref[i, 2]
    hue = params_ref[i, 3]
    gray_gate = params_ref[i, 4]

    branches = [
        lambda v: _brightness(v, fb),
        lambda v: _contrast(v, fc),
        lambda v: _saturation(v, fs),
        lambda v: _hue(v, hue),
    ]

    def body(j, v):
        return lax.switch(order_ref[i, j], branches, v)

    x = lax.fori_loop(0, 4, body, x)

    g = _gray(x)
    x = jnp.where(gray_gate > 0.5, jnp.stack([g, g, g]), x)
    out_ref[0] = x


def fused_photometric(images, order, params, interpret: bool = False):
    """images: (B, H, W, 3) float32 in [0,1]; order: (B, 4) int32 op
    permutation; params: (B, 5) f32 [fb, fc, fs, hue_shift, gray_gate].
    Returns images with jitter+grayscale applied, same shape."""
    B, H, W, C = images.shape
    assert C == 3
    hw = H * W
    x = images.reshape(B, hw, 3).transpose(0, 2, 1)  # (B, 3, HW)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 3, hw), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, hw), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 3, hw), jnp.float32),
        interpret=interpret,
    )(order, params, x)
    return out.transpose(0, 2, 1).reshape(B, H, W, C)


def sample_photometric_params(k_jitter, k_gray, jitter_cfg: dict, gray_p: float,
                              apply_prob: float | None):
    """Per-image parameter sampling with the SAME key discipline as the
    per-example reference path (augment.py): `k_jitter` is the step key the
    pipeline would hand the (gated) color_jitter op, `k_gray` the one for
    random_grayscale. Returns (order (4,), params (5,)) for ONE image; vmap
    over key batches. Guarantees the fused kernel is bit-compatible with the
    vmapped per-example path."""
    brightness = float(jitter_cfg.get("brightness", 0.0))
    contrast = float(jitter_cfg.get("contrast", 0.0))
    saturation = float(jitter_cfg.get("saturation", 0.0))
    hue = float(jitter_cfg.get("hue", 0.0))

    if apply_prob is not None:
        k_gate, k_op = jax.random.split(k_jitter)
        gate = jax.random.uniform(k_gate, ()) < apply_prob
    else:
        gate = jnp.asarray(True)
        k_op = k_jitter

    k_perm, kb, kc, ks, kh = jax.random.split(k_op, 5)
    fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - brightness),
                            maxval=1 + brightness)
    fc = jax.random.uniform(kc, (), minval=max(0.0, 1 - contrast),
                            maxval=1 + contrast)
    fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - saturation),
                            maxval=1 + saturation)
    fh = jax.random.uniform(kh, (), minval=-hue, maxval=hue)
    order = jax.random.permutation(k_perm, 4).astype(jnp.int32)

    # identity factors when the RandomApply gate is off
    fb = jnp.where(gate & (brightness > 0), fb, 1.0)
    fc = jnp.where(gate & (contrast > 0), fc, 1.0)
    fs = jnp.where(gate & (saturation > 0), fs, 1.0)
    fh = jnp.where(gate & (hue > 0), fh, 0.0)

    gray_gate = (jax.random.uniform(k_gray, ()) < gray_p).astype(jnp.float32)
    params = jnp.stack([fb, fc, fs, fh, gray_gate])
    return order, params
