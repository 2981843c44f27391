"""MultiCrop batch path (Pallas-fusable base aug) == per-example path."""

import numpy as np
import jax
import jax.numpy as jnp

from ssv_tpu.data.multicrop import MultiCrop

CFG = {
    "num_local_views": 3, "num_global_views": 2,
    "global_size": [32, 32], "local_size": [8, 8],
    "scale_threshold": 0.3,
    "train_transforms": {
        "color_jitter": {"brightness": 0.4, "contrast": 0.4, "saturation": 0.4,
                         "hue": 0.1, "apply_prob": 0.8},
        "random_gray": {"p": 0.2},
        "random_flip": None,
        "to_tensor": None,
        "normalize": {"mean": [0.5, 0.5, 0.5], "std": [0.5, 0.5, 0.5]},
    },
}


def test_batch_call_matches_per_example():
    mc = MultiCrop(CFG)
    rs = np.random.RandomState(0)
    imgs = jnp.asarray(rs.randint(0, 256, size=(6, 32, 32, 3), dtype=np.uint8))
    keys = jax.random.split(jax.random.PRNGKey(3), 6)

    want = jax.vmap(mc)(keys, imgs)
    got = mc.batch_call(keys, imgs)
    for k in ("global_1", "global_2", "local_1", "local_2"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   atol=1e-5)


def _sela_trainer(tmp_path, mode=None):
    import yaml
    from helpers import mini_config
    from ssv_tpu.train import Trainer

    cfg = mini_config("sela")
    if mode is not None:
        cfg["self_label_mode"] = mode
    p = tmp_path / f"sela-{mode}.yaml"
    with open(p, "w") as f:
        yaml.dump(cfg, f)
    args = {"config": str(p), "algo": "sela", "arch": "tiny",
            "task": "train", "output": f"sk-{mode}", "load": None}
    return Trainer(args, synthetic_sizes=(64, 32))


def test_sela_default_is_sinkhorn_and_does_not_collapse(tmp_path):
    """Regression for the round-1 collapse: the default self-labelling must
    be the paper's Sinkhorn (uniform marginals), and the pseudo-label
    distribution after a labelling round + a training epoch must keep
    entropy >= 0.5 * log(K) (VERDICT round-1 item 4)."""
    t = _sela_trainer(tmp_path, mode=None)   # no key in config -> default
    assert t.algorithm.sl_mode == "sinkhorn"

    state = t.algorithm.pre_train(t.state, t)
    images, labels = t._train_arrays
    idx_mat = t.pipeline.epoch_indices(jax.random.PRNGKey(1))
    state, _ = t._epoch_fn(state, images, labels, idx_mat, jax.random.PRNGKey(2))
    # re-label with the trained head, as the quadratic milestones would
    state = t.algorithm._self_label(state, t)

    pl = np.asarray(state.extra["pseudo_labels"])
    k = t.algorithm.num_clusters
    counts = np.bincount(pl, minlength=k).astype(np.float64)
    p = counts / counts.sum()
    entropy = -(p[p > 0] * np.log(p[p > 0])).sum()
    assert entropy >= 0.5 * np.log(k), (entropy, counts)


def test_sela_reference_mode_still_available(tmp_path):
    t = _sela_trainer(tmp_path, mode="reference")
    assert t.algorithm.sl_mode == "reference"
    state = t.algorithm.pre_train(t.state, t)
    pl = np.asarray(state.extra["pseudo_labels"])
    assert pl.shape == (64,) and pl.min() >= 0
