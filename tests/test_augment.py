"""Augmentation correctness: PIL oracles where semantics match pixel-wise
(enhance ops, solarize/posterize/autocontrast/equalize, blur), structural
invariants for the geometric ops (our warps are bilinear by design — the
reference's PIL calls default to nearest; documented divergence), and
pipeline-compiler behavior (ordering, apply_prob, to_tensor)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image, ImageEnhance, ImageFilter, ImageOps

from ssv_tpu.data import augment as A

rs = np.random.RandomState(0)
IMG_U8 = rs.randint(0, 256, size=(32, 32, 3), dtype=np.uint8)
IMG = IMG_U8.astype(np.float32) / 255.0
PIL_IMG = Image.fromarray(IMG_U8)


def from_pil(img):
    return np.asarray(img).astype(np.float32) / 255.0


def test_brightness_matches_pil():
    for f in (0.3, 0.9, 1.4):
        want = from_pil(ImageEnhance.Brightness(PIL_IMG).enhance(f))
        got = np.asarray(A.adjust_brightness(jnp.array(IMG), f))
        np.testing.assert_allclose(got, want, atol=2 / 255)


def test_saturation_matches_pil():
    for f in (0.2, 0.8, 1.5):
        want = from_pil(ImageEnhance.Color(PIL_IMG).enhance(f))
        got = np.asarray(A.adjust_saturation(jnp.array(IMG), f))
        np.testing.assert_allclose(got, want, atol=3 / 255)


def test_contrast_matches_pil():
    for f in (0.2, 0.8, 1.5):
        want = from_pil(ImageEnhance.Contrast(PIL_IMG).enhance(f))
        got = np.asarray(A.adjust_contrast(jnp.array(IMG), f))
        np.testing.assert_allclose(got, want, atol=3 / 255)


def test_hue_roundtrip_and_range():
    img = jnp.array(IMG)
    same = np.asarray(A.adjust_hue(img, 0.0))
    np.testing.assert_allclose(same, IMG, atol=1e-4)
    full = np.asarray(A.adjust_hue(img, 1.0))  # full rotation = identity
    np.testing.assert_allclose(full, IMG, atol=1e-4)
    shifted = np.asarray(A.adjust_hue(img, 0.25))
    assert shifted.min() >= -1e-6 and shifted.max() <= 1 + 1e-6
    # luminance-preserving-ish: V channel unchanged by hue rotation
    np.testing.assert_allclose(shifted.max(-1), IMG.max(-1), atol=1e-4)


def test_hue_matches_colorsys():
    """Exact oracle: per-pixel HSV rotation via colorsys."""
    import colorsys

    small = IMG[:4, :4, :]
    for shift in (0.1, -0.2, 0.45):
        got = np.asarray(A.adjust_hue(jnp.array(small), shift))
        want = np.zeros_like(small)
        for y in range(4):
            for x in range(4):
                h, s, v = colorsys.rgb_to_hsv(*small[y, x])
                want[y, x] = colorsys.hsv_to_rgb((h + shift) % 1.0, s, v)
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_solarize_matches_pil():
    for thr in (64, 128, 200):
        want = from_pil(ImageOps.solarize(PIL_IMG, thr))
        got = np.asarray(A.solarize(jnp.array(IMG), thr))
        np.testing.assert_allclose(got, want, atol=2 / 255)


def test_posterize_matches_pil():
    for bits in (1, 3, 5, 7):
        want = from_pil(ImageOps.posterize(PIL_IMG, bits))
        got = np.asarray(A.posterize(jnp.array(IMG), bits))
        np.testing.assert_allclose(got, want, atol=1.5 / 255)


def test_autocontrast_matches_pil():
    want = from_pil(ImageOps.autocontrast(PIL_IMG))
    got = np.asarray(A.autocontrast(jnp.array(IMG)))
    np.testing.assert_allclose(got, want, atol=2 / 255)


def test_equalize_matches_pil():
    want = from_pil(ImageOps.equalize(PIL_IMG))
    got = np.asarray(A.equalize(jnp.array(IMG)))
    np.testing.assert_allclose(got, want, atol=2 / 255)


def test_gaussian_blur_close_to_pil():
    # PIL approximates a Gaussian with box passes; agree to ~2%
    for sigma in (0.5, 1.0, 2.0):
        want = from_pil(PIL_IMG.filter(ImageFilter.GaussianBlur(radius=sigma)))
        got = np.asarray(A._gaussian_blur_sigma(jnp.array(IMG), jnp.float32(sigma)))
        assert np.abs(got - want).mean() < 0.01
        # PIL approximates the Gaussian with box passes; edges differ most
        np.testing.assert_allclose(got[2:-2, 2:-2], want[2:-2, 2:-2], atol=0.06)


def test_grayscale_weights():
    g = np.asarray(A.rgb_to_grayscale(jnp.array(IMG)))
    want = IMG @ np.array([0.299, 0.587, 0.114], np.float32)
    np.testing.assert_allclose(g[..., 0], want, atol=1e-5)
    np.testing.assert_allclose(g[..., 0], g[..., 1])


def test_flip_and_center_crop():
    key = jax.random.PRNGKey(0)
    flipped = np.asarray(A.random_flip(key, jnp.array(IMG), p=1.0))
    np.testing.assert_allclose(flipped, IMG[:, ::-1, :])
    same = np.asarray(A.random_flip(key, jnp.array(IMG), p=0.0))
    np.testing.assert_allclose(same, IMG)
    cc = np.asarray(A.center_crop(jnp.array(IMG), (16, 16)))
    np.testing.assert_allclose(cc, IMG[8:24, 8:24, :])


def test_normalize():
    mean, std = [0.5, 0.4, 0.3], [0.2, 0.25, 0.3]
    out = np.asarray(A.normalize(jnp.array(IMG), mean, std))
    np.testing.assert_allclose(out, (IMG - np.array(mean)) / np.array(std),
                               rtol=1e-5, atol=1e-6)


def test_crop_resize_identity_box():
    box = (jnp.int32(0), jnp.int32(0), jnp.int32(32), jnp.int32(32))
    out = np.asarray(A.crop_resize(jnp.array(IMG), box, (32, 32)))
    np.testing.assert_allclose(out, IMG, atol=1e-4)


def test_crop_resize_matches_slice_resize():
    box = (jnp.int32(4), jnp.int32(8), jnp.int32(16), jnp.int32(16))
    out = np.asarray(A.crop_resize(jnp.array(IMG), box, (32, 32),
                                   antialias=False))
    want = np.asarray(jax.image.resize(jnp.array(IMG[4:20, 8:24]),
                                       (32, 32, 3), method="linear"))
    # interiors match exactly; at the box border crop_resize samples real
    # neighboring pixels where slice-resize clamps to the slice edge
    np.testing.assert_allclose(out[2:-2, 2:-2], want[2:-2, 2:-2], atol=1e-4)


def test_rrc_box_distribution():
    keys = jax.random.split(jax.random.PRNGKey(0), 200)
    boxes = jax.vmap(lambda k: A.sample_rrc_box(k, (32, 32), (0.2, 1.0)))(keys)
    i, j, h, w = [np.asarray(b) for b in boxes]
    assert (h > 0).all() and (w > 0).all()
    assert (i >= 0).all() and (i + h <= 32).all()
    assert (j >= 0).all() and (j + w <= 32).all()
    areas = (h * w) / (32.0 * 32.0)
    # sampled target areas are in [0.2, 1.0]; rounding can nudge slightly
    assert areas.min() >= 0.13 and areas.max() <= 1.01
    assert 0.3 < areas.mean() < 0.9


def test_translate_matches_roll():
    # integer translation with zero fill
    out = np.asarray(A.translate_x(jnp.array(IMG), 4 / 32))  # shift by 4 px
    # PIL convention: output(x) = input(x + v) -> content moves LEFT
    np.testing.assert_allclose(out[:, :-4 - 1, :], IMG[:, 4:-1, :], atol=1e-4)
    assert np.abs(out[:, -4:, :]).max() < 1e-6  # zero fill


def test_rotate_90_is_transpose():
    out = np.asarray(A.rotate(jnp.array(IMG), 90.0))
    # PIL rotate is counter-clockwise: out[y][x] = in[x][H-1-y]
    want = np.asarray(PIL_IMG.rotate(90, resample=Image.BILINEAR)).astype(np.float32) / 255
    np.testing.assert_allclose(out, want, atol=2 / 255)


def test_cutout_masks_pixels():
    key = jax.random.PRNGKey(5)
    out = np.asarray(A.cutout(key, jnp.array(IMG) + 0.5, n_cuts=3, max_len=8))
    n_zero = (out == 0).all(-1).sum()
    assert n_zero > 0


def test_rand_augment_runs_and_stays_bounded():
    key = jax.random.PRNGKey(7)
    out = np.asarray(A.rand_augment(key, jnp.array(IMG), n_aug=4))
    assert out.shape == IMG.shape
    assert np.isfinite(out).all()
    assert out.min() >= -1e-5 and out.max() <= 1 + 1e-5


def test_pipeline_compiler_order_and_to_tensor():
    cfg = {
        "center_crop": {"size": [16, 16]},
        "to_tensor": None,
        "normalize": {"mean": [0.5, 0.5, 0.5], "std": [0.5, 0.5, 0.5]},
    }
    t = A.build_transform(cfg)
    out = np.asarray(t(jax.random.PRNGKey(0), jnp.array(IMG_U8)))
    want = (IMG[8:24, 8:24] - 0.5) / 0.5
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_apply_prob_gates():
    cfg = {"color_jitter": {"brightness": 0.9, "contrast": 0.9,
                            "saturation": 0.9, "hue": 0.4, "apply_prob": 0.0}}
    t = A.build_transform(cfg)
    out = np.asarray(t(jax.random.PRNGKey(0), jnp.array(IMG)))
    np.testing.assert_allclose(out, IMG, atol=1e-5)

    cfg_on = {"color_jitter": {"brightness": 0.9, "contrast": 0.9,
                               "saturation": 0.9, "hue": 0.4, "apply_prob": 1.0}}
    t_on = A.build_transform(cfg_on)
    outs = [np.asarray(t_on(k, jnp.array(IMG)))
            for k in jax.random.split(jax.random.PRNGKey(0), 4)]
    assert any(np.abs(o - IMG).max() > 0.05 for o in outs)


def test_multicrop_shapes():
    from ssv_tpu.data.multicrop import MultiCrop
    mc = MultiCrop({
        "num_local_views": 3, "num_global_views": 2,
        "global_size": [32, 32], "local_size": [8, 8],
        "scale_threshold": 0.3,
        "train_transforms": {"random_flip": None, "to_tensor": None},
    })
    views = mc(jax.random.PRNGKey(0), jnp.array(IMG))
    assert views["global_1"].shape == (2, 32, 32, 3)
    assert views["local_2"].shape == (3, 8, 8, 3)
