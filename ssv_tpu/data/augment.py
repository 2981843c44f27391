"""On-device image augmentations (pure JAX, per-example, vmappable).

This replaces the reference's host-side PIL/torchvision pipeline
(reference utils/augmentations.py — GaussianBlur :10, Cutout :20,
RandomAugment :43-109, TRANSFORM_HELPER :113-126, get_transform :128-144)
with jittable functions of (PRNG key, image). The whole two-view pipeline
compiles *into the train step*: zero host work, zero H2D image traffic per
step (the uint8 dataset lives in HBM), and XLA fuses the elementwise color
ops into the first conv's input pipeline.

Conventions:
  * images are float32 HWC in [0, 1] (use `to_float` on uint8 input);
    `normalize` may push values outside [0,1] at the end of a pipeline.
  * every random op takes a `key` first; deterministic ops don't.
  * shapes are static: crop-style ops resample a dynamically-sized box to a
    fixed output size via `scale_and_translate` (a pair of small per-example
    matmuls on TPU — MXU-friendly), never a dynamic slice.

`build_transform(cfg)` compiles the reference's order-sensitive YAML mapping
(name -> kwargs, reserved key ``apply_prob``) into a single composed
function, preserving `get_transform` semantics exactly.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


# --------------------------------------------------------------------------
# basics
# --------------------------------------------------------------------------

def to_float(img_u8):
    return img_u8.astype(jnp.float32) / 255.0


def normalize(img, mean, std):
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (img - mean) / std


def rgb_to_grayscale(img, keep_channels: bool = True):
    w = jnp.array([0.299, 0.587, 0.114], jnp.float32)
    gray = jnp.tensordot(img, w, axes=[[-1], [0]])
    if keep_channels:
        gray = jnp.repeat(gray[..., None], img.shape[-1], axis=-1)
    return gray


def rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
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
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(img):
    h, s, v = img[..., 0], img[..., 1], img[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _blend(a, b, factor):
    return jnp.clip(factor * a + (1.0 - factor) * b, 0.0, 1.0)


# --------------------------------------------------------------------------
# color ops (torchvision ColorJitter semantics)
# --------------------------------------------------------------------------

def adjust_brightness(img, factor):
    return _blend(img, jnp.zeros_like(img), factor)


def adjust_contrast(img, factor):
    mean = jnp.mean(rgb_to_grayscale(img, keep_channels=False))
    return _blend(img, jnp.full_like(img, mean), factor)


def adjust_saturation(img, factor):
    return _blend(img, rgb_to_grayscale(img), factor)


def adjust_hue(img, shift):
    hsv = rgb_to_hsv(img)
    h = (hsv[..., 0] + shift) % 1.0
    return hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def color_jitter(key, img, brightness=0.0, contrast=0.0, saturation=0.0, hue=0.0):
    """torchvision.ColorJitter: factors sampled uniformly from
    [max(0, 1-x), 1+x] (hue from [-h, h]), applied in a random order."""
    k_perm, kb, kc, ks, kh = jax.random.split(key, 5)
    fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - brightness), maxval=1 + brightness)
    fc = jax.random.uniform(kc, (), minval=max(0.0, 1 - contrast), maxval=1 + contrast)
    fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - saturation), maxval=1 + saturation)
    fh = jax.random.uniform(kh, (), minval=-hue, maxval=hue)

    branches = [
        lambda im: adjust_brightness(im, fb) if brightness > 0 else im,
        lambda im: adjust_contrast(im, fc) if contrast > 0 else im,
        lambda im: adjust_saturation(im, fs) if saturation > 0 else im,
        lambda im: adjust_hue(im, fh) if hue > 0 else im,
    ]
    order = jax.random.permutation(k_perm, 4)

    def body(i, im):
        return lax.switch(order[i], branches, im)

    return lax.fori_loop(0, 4, body, img)


def random_grayscale(key, img, p=0.1):
    u = jax.random.uniform(key, ())
    return jnp.where(u < p, rgb_to_grayscale(img), img)


def random_flip(key, img, p=0.5):
    u = jax.random.uniform(key, ())
    return jnp.where(u < p, img[:, ::-1, :], img)


# --------------------------------------------------------------------------
# geometric ops
# --------------------------------------------------------------------------

def crop_resize(img, box_ijhw, out_size, method: str = "linear",
                antialias: bool = True):
    """Resample the (traced, dynamically-sized) box (i, j, h, w) of `img`
    to a fixed `out_size` = (H, W).

    Implemented with `jax.image.scale_and_translate`, which lowers to two
    small dense matmuls per spatial dim — static shapes, MXU-friendly, and
    trivially vmappable over per-example boxes. This is the TPU answer to
    torchvision's RandomResizedCrop (reference augmentations.py:117 usage).
    """
    i, j, h, w = [b.astype(jnp.float32) for b in box_ijhw]
    out_h, out_w = out_size
    scale = jnp.array([out_h / h, out_w / w], jnp.float32)
    # out = in * scale + translation, so input row `i` lands on output row 0.
    translation = jnp.array([-i * out_h / h, -j * out_w / w], jnp.float32)
    return jax.image.scale_and_translate(
        img, (out_h, out_w, img.shape[-1]), (0, 1), scale, translation,
        method=method, antialias=antialias)


def sample_rrc_box(key, in_size, scale, ratio=(3.0 / 4.0, 4.0 / 3.0)):
    """torchvision RandomResizedCrop.get_params: 10 rejection-sampling
    attempts for (area, aspect), first valid wins, else aspect-clamped
    center crop. Vectorized: all 10 candidates are drawn at once and the
    first valid is selected with an argmax over the validity mask."""
    H, W = in_size
    area = float(H * W)
    k_area, k_ratio, k_i, k_j = jax.random.split(key, 4)
    target_area = area * jax.random.uniform(k_area, (10,), minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(k_ratio, (10,), minval=math.log(ratio[0]),
                                   maxval=math.log(ratio[1]))
    ar = jnp.exp(log_ratio)
    ws = jnp.round(jnp.sqrt(target_area * ar)).astype(jnp.int32)
    hs = jnp.round(jnp.sqrt(target_area / ar)).astype(jnp.int32)
    valid = (ws > 0) & (ws <= W) & (hs > 0) & (hs <= H)
    idx = jnp.argmax(valid)  # first True (argmax returns first max)
    any_valid = jnp.any(valid)
    h = hs[idx]
    w = ws[idx]

    # fallback: clamp aspect, center
    in_ratio = W / H
    if in_ratio < ratio[0]:
        fw, fh = W, int(round(W / ratio[0]))
    elif in_ratio > ratio[1]:
        fh, fw = H, int(round(H * ratio[1]))
    else:
        fw, fh = W, H
    h = jnp.where(any_valid, h, fh)
    w = jnp.where(any_valid, w, fw)

    u_i = jax.random.uniform(k_i, ())
    u_j = jax.random.uniform(k_j, ())
    i = jnp.where(any_valid, (u_i * (H - h + 1).astype(jnp.float32)).astype(jnp.int32),
                  (H - h) // 2)
    j = jnp.where(any_valid, (u_j * (W - w + 1).astype(jnp.float32)).astype(jnp.int32),
                  (W - w) // 2)
    return i, j, h, w


def random_resized_crop(key, img, size, scale=(0.08, 1.0),
                        ratio=(3.0 / 4.0, 4.0 / 3.0), method: str = "linear"):
    size = (size, size) if isinstance(size, int) else tuple(size)
    box = sample_rrc_box(key, img.shape[:2], tuple(scale), tuple(ratio))
    return crop_resize(img, box, size, method=method)


def center_crop(img, size):
    size = (size, size) if isinstance(size, int) else tuple(size)
    H, W = img.shape[:2]
    i, j = (H - size[0]) // 2, (W - size[1]) // 2
    return img[i:i + size[0], j:j + size[1], :]


def random_crop(key, img, size, padding: int = 0):
    size = (size, size) if isinstance(size, int) else tuple(size)
    if padding:
        img = jnp.pad(img, ((padding, padding), (padding, padding), (0, 0)))
    H, W = img.shape[:2]
    ki, kj = jax.random.split(key)
    i = jax.random.randint(ki, (), 0, H - size[0] + 1)
    j = jax.random.randint(kj, (), 0, W - size[1] + 1)
    return lax.dynamic_slice(img, (i, j, 0), (size[0], size[1], img.shape[-1]))


def resize(img, size, method: str = "linear"):
    size = (size, size) if isinstance(size, int) else tuple(size)
    return jax.image.resize(img, (size[0], size[1], img.shape[-1]), method=method)


def affine_warp(img, matrix):
    """Inverse-mapped affine warp with bilinear sampling and zero fill —
    the JAX analogue of PIL Image.transform(AFFINE) (used by RandomAugment's
    rotate/shear/translate, reference augmentations.py:70-102).

    `matrix` = (a, b, c, d, e, f): output (x, y) samples input
    (a*x + b*y + c, d*x + e*y + f), PIL convention with x = column.
    """
    H, W, C = img.shape
    a, b, c, d, e, f = [jnp.asarray(m, jnp.float32) for m in matrix]
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    src_x = a * xx + b * yy + c
    src_y = d * xx + e * yy + f

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    wx = src_x - x0
    wy = src_y - y0

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        vals = img[yc, xc, :]
        return jnp.where(inb[..., None], vals, 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx[..., None]) + v01 * wx[..., None]
    bot = v10 * (1 - wx[..., None]) + v11 * wx[..., None]
    return top * (1 - wy[..., None]) + bot * wy[..., None]


def rotate(img, degrees):
    """PIL Image.rotate(angle): counter-clockwise about the center, expand=False."""
    H, W, _ = img.shape
    # CCW content rotation (PIL convention, verified against Image.rotate):
    # the inverse output->input map rotates coordinates clockwise.
    theta = -jnp.deg2rad(jnp.asarray(degrees, jnp.float32))
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    a, b = cos, sin
    d, e = -sin, cos
    c = cx - a * cx - b * cy
    f = cy - d * cx - e * cy
    return affine_warp(img, (a, b, c, d, e, f))


# --------------------------------------------------------------------------
# filters
# --------------------------------------------------------------------------

def gaussian_blur(key, img, sigma=(0.1, 2.0), kernel_radius: int = 4):
    """PIL GaussianBlur with radius ~ U[sigma0, sigma1] (reference
    augmentations.py:10-17). Separable conv with a static 2R+1 tap kernel
    whose weights are a traced function of sigma — static shapes, fused by
    XLA into two tiny convs."""
    s = jax.random.uniform(key, (), minval=sigma[0], maxval=sigma[1])
    return _gaussian_blur_sigma(img, s, kernel_radius)


def _gaussian_blur_sigma(img, s, kernel_radius: int = 4):
    r = kernel_radius
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / jnp.maximum(s, 1e-3)) ** 2)
    k = k / jnp.sum(k)
    # Pad with edge values (PIL extends edges), then two 1-D convolutions.
    pad = jnp.pad(img, ((r, r), (0, 0), (0, 0)), mode="edge")
    vert = sum(pad[i:i + img.shape[0]] * k[i] for i in range(2 * r + 1))
    pad = jnp.pad(vert, ((0, 0), (r, r), (0, 0)), mode="edge")
    horz = sum(pad[:, i:i + img.shape[1]] * k[i] for i in range(2 * r + 1))
    return horz


def sharpness(img, factor):
    """PIL ImageEnhance.Sharpness: blend with a 3x3 smooth filter
    (kernel [[1,1,1],[1,5,1],[1,1,1]]/13), edges kept from the original."""
    k = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    pad = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    smooth = sum(pad[i:i + img.shape[0], j:j + img.shape[1]] * k[i, j]
                 for i in range(3) for j in range(3))
    # PIL leaves the 1-px border untouched by the filter
    H, W, _ = img.shape
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    border = (yy == 0) | (yy == H - 1) | (xx == 0) | (xx == W - 1)
    smooth = jnp.where(border[..., None], img, smooth)
    return _blend(img, smooth, factor)


def cutout(key, img, n_cuts=0, max_len=1):
    """Random square occlusions (reference augmentations.py:20-40)."""
    H, W, _ = img.shape
    k_len, k_xy = jax.random.split(key)
    cut_len = jax.random.randint(k_len, (), 1, max_len + 1)
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    mask = jnp.ones((H, W), jnp.float32)
    xs = jax.random.randint(k_xy, (max(n_cuts, 1), 2), 0, max(W, H) + 1)
    for n in range(n_cuts):
        x, y = xs[n, 0] % (W + 1), xs[n, 1] % (H + 1)
        x1, x2 = jnp.clip(x - cut_len // 2, 0, W), jnp.clip(x + cut_len // 2, 0, W)
        y1, y2 = jnp.clip(y - cut_len // 2, 0, H), jnp.clip(y + cut_len // 2, 0, H)
        hole = (yy >= y1) & (yy < y2) & (xx >= x1) & (xx < x2)
        mask = jnp.where(hole, 0.0, mask)
    return img * mask[..., None]


# --------------------------------------------------------------------------
# RandAugment ops (reference augmentations.py:43-109)
# --------------------------------------------------------------------------

def solarize(img, threshold):
    """PIL ImageOps.solarize: invert pixels >= threshold (threshold in u8)."""
    return jnp.where(img * 255.0 >= threshold, 1.0 - img, img)


def posterize(img, bits):
    """PIL ImageOps.posterize: keep `bits` high bits per channel."""
    bits = jnp.clip(jnp.asarray(bits, jnp.int32), 1, 8)
    levels = 2 ** bits
    q = jnp.floor(img * 255.0).astype(jnp.int32)
    shift = 8 - bits
    q = (q >> shift) << shift
    return q.astype(jnp.float32) / 255.0


def autocontrast(img):
    """Per-channel min/max stretch (PIL ImageOps.autocontrast, cutoff=0)."""
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    scale = jnp.where(hi > lo, 1.0 / (hi - lo), 1.0)
    off = jnp.where(hi > lo, lo, 0.0)
    return jnp.clip((img - off) * scale, 0.0, 1.0)


def equalize(img):
    """Per-channel histogram equalization on the u8 quantization (PIL
    ImageOps.equalize semantics, including the step/offset rule)."""
    def eq_channel(ch):
        q = jnp.clip(jnp.round(ch * 255.0), 0, 255).astype(jnp.int32)
        hist = jnp.zeros((256,), jnp.int32).at[q.reshape(-1)].add(1)
        nonzero = hist > 0
        # index of last nonzero bin
        last_idx = 255 - jnp.argmax(nonzero[::-1])
        step = (jnp.sum(hist) - hist[last_idx]) // 255
        cum = jnp.cumsum(hist)
        lut = (cum - hist + step // 2) // jnp.maximum(step, 1)
        lut = jnp.clip(lut, 0, 255)
        out = lut[q].astype(jnp.float32) / 255.0
        return jnp.where(step > 0, out, ch)
    return jnp.stack([eq_channel(img[..., c]) for c in range(img.shape[-1])], axis=-1)


def shear_x(img, v):
    return affine_warp(img, (1.0, v, 0.0, 0.0, 1.0, 0.0))


def shear_y(img, v):
    return affine_warp(img, (1.0, 0.0, 0.0, v, 1.0, 0.0))


def translate_x(img, v_frac):
    W = img.shape[1]
    return affine_warp(img, (1.0, 0.0, v_frac * W, 0.0, 1.0, 0.0))


def translate_y(img, v_frac):
    H = img.shape[0]
    return affine_warp(img, (1.0, 0.0, 0.0, 0.0, 1.0, v_frac * H))


_RANDAUG_OPS = [
    # (name, min_v, max_v, signed, fn(img, v))
    ("identity", 1, 1, False, lambda im, v: im),
    ("autocontrast", 1, 1, False, lambda im, v: autocontrast(im)),
    ("equalize", 1, 1, False, lambda im, v: equalize(im)),
    ("rotate", -30, 30, True, lambda im, v: rotate(im, v)),
    ("solarize", 1, 1, False, lambda im, v: solarize(im, v)),
    ("color", 1, 1, False, lambda im, v: adjust_saturation(im, v)),
    ("contrast", 1, 1, False, lambda im, v: adjust_contrast(im, v)),
    ("brightness", 1, 1, False, lambda im, v: adjust_brightness(im, v)),
    ("sharpness", 1, 1, False, lambda im, v: sharpness(im, v)),
    ("shear_x", -0.1, 0.1, True, lambda im, v: shear_x(im, v)),
    ("shear_y", -0.1, 0.1, True, lambda im, v: shear_y(im, v)),
    ("translate_x", -0.1, 0.1, True, lambda im, v: translate_x(im, v)),
    ("translate_y", -0.1, 0.1, True, lambda im, v: translate_y(im, v)),
    ("posterize", 1, 1, False, lambda im, v: posterize(im, v)),
]


def rand_augment(key, img, n_aug=4):
    """The reference's 14-op RandAugment (augmentations.py:43-109): n_aug
    ops chosen with replacement; magnitude uniform in the op's range, with
    an extra random sign flip for the signed ops (matching the reference's
    `random.random() > 0.5: v = -v` — a double-negation quirk that makes
    the effective distribution symmetric; ours is directly symmetric)."""
    n_ops = len(_RANDAUG_OPS)

    def apply_op(i, carry):
        im, k = carry
        k, k_choice, k_v, k_sign = jax.random.split(k, 4)
        choice = jax.random.randint(k_choice, (), 0, n_ops)
        u = jax.random.uniform(k_v, ())
        sgn = jnp.where(jax.random.uniform(k_sign, ()) > 0.5, -1.0, 1.0)

        branches = []
        for (_, lo, hi, signed, fn) in _RANDAUG_OPS:
            v = lo + (hi - lo) * u
            if signed:
                v = v * sgn
            branches.append(partial(lambda f, val, im_: f(im_, val), fn, v))
        im = lax.switch(choice, branches, im)
        return im, k

    out, _ = lax.fori_loop(0, n_aug, apply_op, (img, key))
    return out


# --------------------------------------------------------------------------
# pipeline compiler (reference get_transform, augmentations.py:128-144)
# --------------------------------------------------------------------------

def _wrap_prob(fn: Callable, p: float, random_op: bool):
    """RandomApply: gate a shape-preserving op with probability p."""
    if random_op:
        def gated(key, img):
            k_gate, k_op = jax.random.split(key)
            u = jax.random.uniform(k_gate, ())
            return jnp.where(u < p, fn(k_op, img), img)
    else:
        def gated(key, img):
            u = jax.random.uniform(key, ())
            return jnp.where(u < p, fn(img), img)
    return gated


# name -> (fn, needs_key, shape_preserving)
TRANSFORM_OPS = {
    "gaussian_blur": (gaussian_blur, True, True),
    "color_jitter": (color_jitter, True, True),
    "random_gray": (random_grayscale, True, True),
    "random_crop": (random_crop, True, False),
    "random_resized_crop": (random_resized_crop, True, False),
    "center_crop": (center_crop, False, False),
    "resize": (resize, False, False),
    "random_flip": (random_flip, True, True),
    "to_tensor": (None, False, True),   # layout/scaling handled by to_float
    "normalize": (normalize, False, True),
    "rand_aug": (rand_augment, True, True),
    "cutout": (cutout, True, True),
}


def _compile_steps(cfg: dict):
    """name->kwargs mapping -> list of (name, fn, needs_key) steps."""
    cfg = {k: (dict(v) if isinstance(v, dict) else v)
           for k, v in dict(cfg or {}).items()}
    steps = []
    for name, kwargs in cfg.items():
        if name not in TRANSFORM_OPS:
            raise ValueError(f"Unknown transform {name!r}")
        fn, needs_key, shape_preserving = TRANSFORM_OPS[name]
        if name == "to_tensor":
            continue
        kwargs = dict(kwargs or {})
        p = kwargs.pop("apply_prob", None)
        bound = partial(fn, **kwargs) if kwargs else fn
        if p is not None:
            if not shape_preserving:
                raise ValueError(f"apply_prob on shape-changing op {name!r}")
            steps.append((name, _wrap_prob(bound, float(p), needs_key), True))
        else:
            steps.append((name, bound, needs_key))
    return steps


def _run_steps(steps, keys, img):
    """Apply compiled steps to one image with explicit per-step keys."""
    if img.dtype == jnp.uint8:
        img = to_float(img)
    ki = 0
    out = img
    for _, fn_, needs_key_ in steps:
        if needs_key_:
            out = fn_(keys[ki], out)
            ki += 1
        else:
            out = fn_(out)
    return out


def build_transform(cfg: dict) -> Callable:
    """Compile an ordered name->kwargs mapping (the reference YAML transform
    schema) into one function `fn(key, img_u8_or_f32) -> f32 image`.

    Mirrors reference `get_transform` (augmentations.py:128-144): entries are
    applied in YAML order; a `None` value means default kwargs; the reserved
    `apply_prob` kwarg wraps the op in RandomApply. `to_tensor` marks the
    u8->[0,1] float conversion point; since our ops already work in floats,
    conversion happens up front and `to_tensor` is a no-op marker.
    """
    steps = _compile_steps(cfg)
    n_random = sum(1 for _, _, nk in steps if nk)

    def transform(key, img):
        keys = jax.random.split(key, max(n_random, 1))
        return _run_steps(steps, keys, img)

    return transform


def _pallas_default() -> bool:
    """MEASURED OFF by default: at batch 512 on a v5e the fused Pallas
    photometric kernel runs 352 us vs 271 us for XLA's own fusion of the
    identical elementwise chain (scripts/bench_augment.py, SCAN=1000 —
    ~2% of the full SimCLR step). XLA already fuses the jitter/grayscale
    chain into the surrounding program; the hand-written kernel only adds
    VMEM staging. Kept behind $SSV_TPU_PALLAS=1 with bit-equivalence tests
    (tests/test_pallas_photometric.py) for future chips where the tradeoff
    may flip."""
    env = os.environ.get("SSV_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "False")
    return False


def build_batch_transform(cfg: dict, use_pallas: bool | None = None,
                          interpret: bool = False) -> Callable:
    """Batch-level pipeline `fn(keys (B,2), imgs (B,H,W,3)) -> (B,h,w,3)`.

    When the pipeline starts with the canonical [RandomApply(color_jitter),
    random_gray] pair (every reference train config does), those two ops are
    fused into ONE Pallas VMEM kernel over the batch
    (ops/pallas/photometric.py); the remaining ops run vmapped per example.
    Per-step PRNG keys are derived identically to the per-example path, so
    enabling/disabling the fused kernel does not change the augmentation
    stream. The Pallas path is opt-in ($SSV_TPU_PALLAS=1 / use_pallas=True):
    measured slower than XLA's own fusion on v5e (see _pallas_default).
    """
    if use_pallas is None:
        use_pallas = _pallas_default()
    steps = _compile_steps(cfg)
    n_random = sum(1 for _, _, nk in steps if nk)

    names = [s[0] for s in steps]
    fusable = (use_pallas and len(names) >= 2
               and names[0] == "color_jitter" and names[1] == "random_gray")
    if not fusable:
        def fallback(keys, imgs):
            t = lambda k, im: _run_steps(steps, jax.random.split(k, max(n_random, 1)), im)
            return jax.vmap(t)(keys, imgs)
        return fallback

    from ..ops.pallas.photometric import (fused_photometric,
                                          sample_photometric_params)

    raw_cfg = {k: (dict(v) if isinstance(v, dict) else v)
               for k, v in dict(cfg or {}).items()}
    jitter_cfg = dict(raw_cfg["color_jitter"] or {})
    apply_prob = jitter_cfg.pop("apply_prob", None)
    gray_p = float((raw_cfg["random_gray"] or {}).get("p", 0.1))
    rest = steps[2:]

    def transform(keys, imgs):
        if imgs.dtype == jnp.uint8:
            imgs = jax.vmap(to_float)(imgs)
        # identical key schedule to the per-example path: split each image's
        # key into n_random step keys; steps 0/1 drive the fused kernel.
        step_keys = jax.vmap(lambda k: jax.random.split(k, max(n_random, 1)))(keys)
        order, params = jax.vmap(
            lambda kj, kg: sample_photometric_params(kj, kg, jitter_cfg,
                                                     gray_p, apply_prob)
        )(step_keys[:, 0], step_keys[:, 1])
        out = fused_photometric(imgs, order, params, interpret=interpret)

        def rest_fn(ks, im):
            return _run_steps(rest, ks, im)
        return jax.vmap(rest_fn)(step_keys[:, 2:], out)

    return transform


def batched(transform: Callable):
    """vmap a per-example transform over (keys, images)."""
    return jax.vmap(transform, in_axes=(0, 0))
