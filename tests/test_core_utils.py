"""Core config / experiment-init / logging units."""

import json
import os

import pytest
import yaml

from ssv_tpu.core.config import Config, load_config, _merge
from ssv_tpu.core.experiment import initialize_experiment, seed_everything
from ssv_tpu.utils.logging import AverageMeter, Logger, get_wandb, count_parameters


def test_config_mapping_and_order(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "a: 1\n"
        "nested:\n  x: 2\n  y: [3, 4]\n"
        "transforms:\n  color_jitter:\n    brightness: 0.4\n  random_flip:\n")
    cfg = load_config(str(p))
    assert cfg["a"] == 1 and cfg.a == 1
    assert isinstance(cfg["nested"], Config)
    assert cfg.nested.x == 2 and cfg["nested"]["y"] == [3, 4]
    assert cfg.get("missing", 7) == 7
    # YAML insertion order preserved (order-sensitive transform maps)
    assert list(cfg["transforms"]) == ["color_jitter", "random_flip"]
    assert cfg["transforms"]["random_flip"] is None
    raw = cfg.raw()
    assert isinstance(raw, dict) and isinstance(raw["nested"], dict)


def test_config_merge():
    base = {"a": 1, "n": {"x": 1, "y": 2}}
    out = _merge(base, {"n": {"y": 5, "z": 6}, "b": 7})
    assert out == {"a": 1, "n": {"x": 1, "y": 5, "z": 6}, "b": 7}
    assert base["n"]["y"] == 2  # no mutation
    cfg = Config(base).updated({"n": {"y": 9}})
    assert cfg.n.y == 9


def test_initialize_experiment(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    p = tmp_path / "c.yaml"
    p.write_text("epochs: 3\ndata:\n  batch_size: 8\n")
    args = {"config": str(p), "output": "run1"}
    cfg, outdir, logger = initialize_experiment(args, str(tmp_path / "out"))
    assert cfg["epochs"] == 3
    assert outdir.endswith("run1") and os.path.isdir(outdir)
    hp = open(os.path.join(outdir, "hyperparameters.txt")).read()
    assert "epochs: 3" in hp and "batch_size: 8" in hp
    logger.write("hello", mode="train")
    logs = open(os.path.join(outdir, "trainlogs.txt")).read()
    assert "hello" in logs


def test_seed_everything_deterministic():
    import numpy as np
    seed_everything(123)
    a = np.random.rand(3)
    seed_everything(123)
    b = np.random.rand(3)
    import numpy.testing as npt
    npt.assert_array_equal(a, b)


def test_average_meter_both_spellings():
    m = AverageMeter()
    m.add({"loss": 2.0, "acc": 0.5})
    m.add({"loss": 4.0})
    d = m.return_dict()
    assert d["loss"] == pytest.approx(3.0) and d["acc"] == pytest.approx(0.5)
    # the reference's typo'd call site name works too (eval_utils.py:75)
    assert m.return_metrics() == d
    assert "[loss] 3.0000" in m.return_msg()


def test_offline_wandb_jsonl(tmp_path):
    wb = get_wandb()
    run = wb.init(project="p", output_dir=str(tmp_path))
    run.log({"Train loss": 1.5, "Epoch": 2})
    lines = open(tmp_path / "wandb_offline.jsonl").read().strip().splitlines()
    rec = json.loads(lines[-1])
    assert rec["Train loss"] == 1.5 and rec["Epoch"] == 2.0
    assert run.get_url().startswith("offline://")


def test_count_parameters():
    import jax.numpy as jnp
    params = {"a": jnp.zeros((3, 4)), "b": {"c": jnp.zeros((5,))}}
    assert count_parameters(params) == 17
