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


def test_sela_sinkhorn_mode(tmp_path):
    import yaml
    from helpers import mini_config
    from ssv_tpu.train import Trainer

    cfg = mini_config("sela")
    cfg["self_label_mode"] = "sinkhorn"
    p = tmp_path / "s.yaml"
    with open(p, "w") as f:
        yaml.dump(cfg, f)
    args = {"config": str(p), "algo": "sela", "arch": "tiny",
            "task": "train", "output": "sk", "load": None}
    t = Trainer(args, synthetic_sizes=(64, 32))
    state = t.algorithm.pre_train(t.state, t)
    pl = np.asarray(state.extra["pseudo_labels"])
    # sinkhorn labelling with uniform marginals should not collapse
    assert len(set(pl.tolist())) > 1
