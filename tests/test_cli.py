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


def _stage_fake_cifar(root, n_batch=128, n_test=256):
    """Tiny CIFAR-10 pickle batches so the CLI drives the REAL reader path
    (reference data_utils.py:18-92), not the synthetic fallback."""
    import pickle

    d = os.path.join(root, "cifar-10-batches-py")
    os.makedirs(d, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(1, 6):
        with open(os.path.join(d, f"data_batch_{i}"), "wb") as f:
            pickle.dump({"data": rng.randint(0, 256, (n_batch, 3072), dtype=np.uint8),
                         "labels": rng.randint(0, 10, n_batch).tolist()}, f)
    with open(os.path.join(d, "test_batch"), "wb") as f:
        pickle.dump({"data": rng.randint(0, 256, (n_test, 3072), dtype=np.uint8),
                     "labels": rng.randint(0, 10, n_test).tolist()}, f)


def test_cli_end_to_end(tmp_path, monkeypatch, capsys):
    """The mandated surface, driven verbatim (reference main.py:37-70):
    `main.py` argv → train (2 epochs) → linear_eval --load →
    get_features --load, in-process on the CPU mesh. Asserts the four
    binary .npy dumps and the task-aware checkpoint preference
    (train → `latest` first, inference → `best_model` first)."""
    import main as cli
    import pytest

    _stage_fake_cifar(tmp_path / "data")
    cfg = mini_config("simclr", epochs=2)
    cfg["data"]["root"] = str(tmp_path / "data")
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    monkeypatch.chdir(tmp_path)
    # `tiny` lives in the encoder registry for tests but not in the CLI's
    # reference-parity NETWORKS list; widen the argparse choices only
    monkeypatch.setattr(cli, "NETWORKS", cli.NETWORKS + ["tiny"])

    def drive(*argv):
        monkeypatch.setattr(sys, "argv", ["main.py", "-c", str(cfg_path),
                                          "-m", "tiny", "-a", "simclr",
                                          *argv])
        cli.main()

    drive("-t", "train", "-o", "e2e")
    outdir = tmp_path / "outputs" / "simclr" / "tiny" / "e2e"
    assert (outdir / "latest").is_dir() and (outdir / "best_model").is_dir()
    assert (outdir / "trainlogs.txt").exists()
    assert (outdir / "hyperparameters.txt").exists()
    capsys.readouterr()

    # inference tasks refuse to run without --load (reference main.py:54-57)
    with pytest.raises(ValueError):
        drive("-t", "linear_eval", "-o", "e2e-noload")

    drive("-t", "linear_eval", "-o", "e2e-lin", "-l", str(outdir))
    out = capsys.readouterr().out
    assert f"Loaded checkpoint from {outdir / 'best_model'}" in out
    assert "Test linear eval accuracy" in out

    drive("-t", "get_features", "-o", "e2e-feat", "-l", str(outdir))
    out = capsys.readouterr().out
    assert f"Loaded checkpoint from {outdir / 'best_model'}" in out
    featdir = tmp_path / "outputs" / "simclr" / "tiny" / "e2e-feat"
    for name, shape0 in [("train_fvecs", 640), ("train_gt", 640),
                         ("test_fvecs", 256), ("test_gt", 256)]:
        arr = np.load(featdir / f"{name}.npy")
        assert arr.shape[0] == shape0

    # train --load resumes and prefers the rolling `latest`
    drive("-t", "train", "-o", "e2e", "-l", str(outdir))
    out = capsys.readouterr().out
    assert f"Loaded checkpoint from {outdir / 'latest'}" in out


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
