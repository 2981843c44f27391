"""DataPipeline mechanics: epoch shuffles, eval batching/padding, batch-dict
schemas, eval transform selection."""

import numpy as np
import jax
import jax.numpy as jnp

from helpers import mini_config
from ssv_tpu.data.pipeline import DataPipeline


def make_pipeline(algo="simclr", batch_size=16, n_train=70, n_test=34):
    cfg = mini_config(algo, batch_size=batch_size)
    return DataPipeline(cfg["data"], synthetic_sizes=(n_train, n_test))


def test_epoch_indices_cover_without_repeat():
    dp = make_pipeline()
    assert dp.steps_per_epoch == 4  # 70 // 16
    idx = np.asarray(dp.epoch_indices(jax.random.PRNGKey(0)))
    assert idx.shape == (4, 16)
    flat = idx.reshape(-1)
    assert len(set(flat.tolist())) == len(flat)  # no repeats within epoch
    assert flat.min() >= 0 and flat.max() < 70
    idx2 = np.asarray(dp.epoch_indices(jax.random.PRNGKey(1)))
    assert not np.array_equal(idx, idx2)  # reshuffled per epoch


def test_eval_batches_pad_and_counts():
    dp = make_pipeline()
    batches = list(dp.eval_batches("test", batch_size=16))
    assert len(batches) == 3  # ceil(34/16)
    counts = [c for _, c in batches]
    assert counts == [16, 16, 2]
    for idx, _ in batches:
        assert idx.shape == (16,)
    total = sum(counts)
    assert total == dp.n_test


def test_double_batch_schema():
    dp = make_pipeline()
    fn = jax.jit(dp.make_batch_fn("double"))
    images, labels = dp.arrays("train")
    idx = jnp.arange(16, dtype=jnp.int32)
    b = fn(images, labels, idx, jax.random.PRNGKey(0))
    assert set(b) == {"index", "img", "aug_1", "aug_2", "label"}
    assert b["aug_1"].shape == (16, 32, 32, 3)
    # the two views differ, and differ from the deterministic view
    assert np.abs(np.asarray(b["aug_1"] - b["aug_2"])).max() > 1e-3
    # deterministic view is reproducible
    b2 = fn(images, labels, idx, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(b["img"]), np.asarray(b2["img"]),
                               atol=1e-6)


def test_pseudolabel_batch_schema():
    dp = make_pipeline("sela", batch_size=16)
    fn = jax.jit(dp.make_batch_fn("pseudolabel"))
    images, labels = dp.arrays("train")
    b = fn(images, labels, jnp.arange(16, dtype=jnp.int32), jax.random.PRNGKey(0))
    assert set(b) == {"idx", "img", "aug", "label"}


def test_multicrop_batch_schema():
    cfg = mini_config("dino", batch_size=8)
    dp = DataPipeline(cfg["data"], synthetic_sizes=(40, 16))
    fn = jax.jit(dp.make_batch_fn("multicrop"))
    images, labels = dp.arrays("train")
    b = fn(images, labels, jnp.arange(8, dtype=jnp.int32), jax.random.PRNGKey(0))
    assert b["global_1"].shape == (8, 2, 32, 32, 3)
    assert b["local_1"].shape == (8, 2, 8, 8, 3)
    assert set(b) >= {"img", "label", "global_1", "global_2", "local_1",
                      "local_2"}
