"""The reference's own YAML config files (read-only at /root/reference)
must drive this framework unmodified: same schema, same keys, same
order-sensitive transform maps. Skipped when the reference isn't mounted."""

import os

import pytest

REF = "/root/reference/configs"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not mounted")

ALGOS = ["simclr", "moco", "byol", "simsiam", "relic", "barlow", "swav",
         "pirl", "deep_cluster", "sela", "dino"]


@pytest.mark.parametrize("algo", ALGOS)
def test_reference_yaml_builds_algorithm(algo):
    from ssv_tpu.core.config import load_config
    from ssv_tpu.train.base import DataInfo
    from ssv_tpu.train.registry import build_algorithm
    from ssv_tpu.data.augment import build_transform
    from ssv_tpu.data.multicrop import MultiCrop

    cfg = load_config(os.path.join(REF, f"{algo}.yaml")).raw()
    info = DataInfo(num_classes=10, n_train=50000,
                    batch_size=int(cfg["data"]["batch_size"]),
                    steps_per_epoch=50000 // int(cfg["data"]["batch_size"]))
    arch = "vit" if algo == "dino" else "tiny"
    a = build_algorithm(algo, cfg, arch, info)
    assert a.name == algo
    assert a.epochs == int(cfg["epochs"])

    # the transform/multicrop blocks compile through our pipeline compiler
    data = cfg["data"]
    if "multicrop_config" in data:
        MultiCrop(data["multicrop_config"])
    else:
        t = data["transforms"]
        for k in t:
            build_transform(t[k])


def test_reference_simclr_yaml_full_pipeline(tmp_path):
    """End to end: the reference simclr.yaml drives a real Trainer (tiny
    arch, synthetic data, epochs overridden) through one train step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ssv_tpu.train import Trainer

    args = {"config": os.path.join(REF, "simclr.yaml"), "algo": "simclr",
            "arch": "tiny", "task": "train", "output": "refcfg", "load": None}
    os.chdir(tmp_path)
    t = Trainer(args, overrides={"epochs": 1,
                                 "data": {"batch_size": 16, "root": str(tmp_path)}},
                synthetic_sizes=(48, 16))
    images, labels = t._train_arrays
    state, metrics = t._step_fn(t.state, images, labels,
                                jnp.arange(16, dtype=jnp.int32),
                                jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
