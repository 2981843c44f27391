"""CLI surface: flags, registries, and the three tasks end to end
(train / linear_eval / get_features) through main.py's code path."""

import os
import subprocess
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from helpers import mini_config


def test_registries_match_reference_surface():
    import main as cli
    from ssv_tpu.train import ALGORITHMS

    assert set(ALGORITHMS) == {"simclr", "moco", "byol", "dino", "pirl",
                               "barlow", "simsiam", "relic", "deep_cluster",
                               "swav", "sela"}
    for n in ["resnet18", "resnet50", "resnext50", "resnext101",
              "wide_resnet50", "wide_resnet101", "vit"]:
        assert n in cli.NETWORKS
    assert cli.TASKS == ["train", "linear_eval", "get_features"]


def test_cli_requires_load_for_inference():
    import main as cli
    import pytest

    with pytest.raises(ValueError):
        cli._check_checkpoint_specified({"load": None})
    cli._check_checkpoint_specified({"load": "somewhere"})


def test_get_features_binary_npy(tmp_path, monkeypatch):
    """The reference's get_features crashes on text-mode np.save
    (main.py:63-70); ours must produce loadable .npy files."""
    from ssv_tpu.train import Trainer

    cfg = mini_config("simclr")
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    monkeypatch.chdir(tmp_path)
    args = {"config": str(cfg_path), "algo": "simclr", "arch": "tiny",
            "task": "get_features", "output": "feat", "load": None}
    t = Trainer(args, synthetic_sizes=(48, 24))
    train_fvecs, train_gt = t.build_features("train")
    test_fvecs, test_gt = t.build_features("test")
    for name, arr in [("train_fvecs", train_fvecs), ("train_gt", train_gt),
                      ("test_fvecs", test_fvecs), ("test_gt", test_gt)]:
        np.save(os.path.join(t.output_dir, f"{name}.npy"), arr)
        loaded = np.load(os.path.join(t.output_dir, f"{name}.npy"))
        np.testing.assert_array_equal(loaded, arr)
    assert train_fvecs.shape == (48, 16)
    assert test_gt.shape == (24,)
    # unit-norm features (simclr embed semantics, simclr.py:110-111)
    np.testing.assert_allclose(np.linalg.norm(test_fvecs, axis=1), 1.0,
                               rtol=1e-4)
