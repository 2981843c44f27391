"""Fused Pallas photometric kernel == the per-example jnp path, bit-for-bit
on the same keys (interpret mode on CPU; the same kernel compiles on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from ssv_tpu.data.augment import build_batch_transform, build_transform

CFG = {
    "color_jitter": {"brightness": 0.4, "contrast": 0.4, "saturation": 0.4,
                     "hue": 0.1, "apply_prob": 0.8},
    "random_gray": {"p": 0.2},
    "random_flip": None,
    "to_tensor": None,
    "normalize": {"mean": [0.4914, 0.4822, 0.4465],
                  "std": [0.2470, 0.2435, 0.2616]},
}

rs = np.random.RandomState(0)
IMGS = jnp.asarray(rs.randint(0, 256, size=(16, 32, 32, 3), dtype=np.uint8))
KEYS = jax.random.split(jax.random.PRNGKey(42), 16)


def test_fused_matches_per_example():
    per_example = build_transform(CFG)
    want = jax.vmap(per_example)(KEYS, IMGS)

    fused = build_batch_transform(CFG, use_pallas=True, interpret=True)
    got = fused(KEYS, IMGS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fallback_matches_per_example():
    per_example = build_transform(CFG)
    want = jax.vmap(per_example)(KEYS, IMGS)
    fb = build_batch_transform(CFG, use_pallas=False)
    got = fb(KEYS, IMGS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)


def test_nonmatching_pattern_falls_back():
    cfg = {"random_flip": None, "normalize": {"mean": [0.5] * 3, "std": [0.5] * 3}}
    t = build_batch_transform(cfg, use_pallas=True)
    out = t(KEYS, IMGS)
    assert out.shape == (16, 32, 32, 3)


def test_gray_gate_statistics():
    """With p=1.0 every image is grayscale after the fused kernel."""
    cfg = {"color_jitter": {"brightness": 0.2, "contrast": 0.2,
                            "saturation": 0.2, "hue": 0.05, "apply_prob": 0.5},
           "random_gray": {"p": 1.0}, "to_tensor": None}
    t = build_batch_transform(cfg, use_pallas=True, interpret=True)
    out = np.asarray(t(KEYS, IMGS))
    np.testing.assert_allclose(out[..., 0], out[..., 1], atol=1e-6)
    np.testing.assert_allclose(out[..., 1], out[..., 2], atol=1e-6)
