"""Native IO library: builds with g++, reads CIFAR binary + pickle layouts,
raw cache roundtrips, and agrees with the pure-NumPy fallbacks."""

import os
import pickle

import numpy as np
import pytest

from ssv_tpu.data import native_io
from ssv_tpu.data.datasets import load_dataset

rs = np.random.RandomState(0)


def test_native_lib_builds():
    assert native_io.available(), "g++ build of native/ssv_io.cc failed"


def test_chw_to_hwc_matches_numpy():
    chw = rs.randint(0, 256, size=(17, 3, 32, 32), dtype=np.uint8)
    want = chw.transpose(0, 2, 3, 1)
    got = native_io.chw_to_hwc(chw)
    np.testing.assert_array_equal(got, want)


def _write_cifar10_binary(d, n=20, seed=0):
    r = np.random.RandomState(seed)
    os.makedirs(d, exist_ok=True)
    labels = r.randint(0, 10, n).astype(np.uint8)
    images_chw = r.randint(0, 256, size=(n, 3, 32, 32), dtype=np.uint8)
    rows = np.concatenate([labels[:, None],
                           images_chw.reshape(n, -1)], axis=1)
    return labels, images_chw, rows.tobytes()


def test_read_cifar_binary(tmp_path):
    labels, images_chw, payload = _write_cifar10_binary(tmp_path)
    path = tmp_path / "data_batch_1.bin"
    path.write_bytes(payload)

    imgs, lbls = native_io.read_cifar_binary(str(path), 1, 10000)
    np.testing.assert_array_equal(lbls, labels.astype(np.int32))
    np.testing.assert_array_equal(imgs, images_chw.transpose(0, 2, 3, 1))

    # numpy fallback agrees
    imgs2, lbls2 = native_io._read_cifar_binary_numpy(str(path), 1, 10000)
    np.testing.assert_array_equal(imgs, imgs2)
    np.testing.assert_array_equal(lbls, lbls2)


def test_raw_cache_roundtrip(tmp_path):
    images = rs.randint(0, 256, size=(13, 32, 32, 3), dtype=np.uint8)
    labels = rs.randint(0, 10, 13).astype(np.int32)
    p = str(tmp_path / "c.raw")
    assert native_io.write_raw_cache(p, images, labels)
    out = native_io.read_raw_cache(p)
    assert out is not None
    np.testing.assert_array_equal(out[0], images)
    np.testing.assert_array_equal(out[1], labels)
    assert native_io.read_raw_cache(str(tmp_path / "missing.raw")) is None


def test_load_dataset_from_binary_dir_and_cache(tmp_path):
    d = tmp_path / "cifar-10-batches-bin"
    os.makedirs(d)
    all_labels, all_images = [], []
    for i in range(1, 6):
        labels, images_chw, payload = _write_cifar10_binary(d, n=10, seed=i)
        (d / f"data_batch_{i}.bin").write_bytes(payload)
        all_labels.append(labels)
        all_images.append(images_chw.transpose(0, 2, 3, 1))
    tl, ti, tp = _write_cifar10_binary(d, n=8, seed=99)
    (d / "test_batch.bin").write_bytes(tp)

    ds = load_dataset("cifar10", str(tmp_path), allow_synthetic=False)
    np.testing.assert_array_equal(ds.train.images, np.concatenate(all_images))
    np.testing.assert_array_equal(ds.train.labels,
                                  np.concatenate(all_labels).astype(np.int32))
    assert ds.test.images.shape == (8, 32, 32, 3)
    assert not ds.synthetic

    # second load must come from the raw cache (delete the source dir)
    import shutil
    shutil.rmtree(d)
    ds2 = load_dataset("cifar10", str(tmp_path), allow_synthetic=False)
    np.testing.assert_array_equal(ds2.train.images, ds.train.images)


def test_load_dataset_from_pickle_dir(tmp_path):
    d = tmp_path / "cifar-10-batches-py"
    os.makedirs(d)
    r = np.random.RandomState(0)
    for i in range(1, 6):
        entry = {"data": r.randint(0, 256, size=(10, 3072), dtype=np.uint8)
                 .astype(np.uint8),
                 "labels": r.randint(0, 10, 10).tolist()}
        with open(d / f"data_batch_{i}", "wb") as f:
            pickle.dump(entry, f)
    with open(d / "test_batch", "wb") as f:
        pickle.dump({"data": r.randint(0, 256, size=(6, 3072), dtype=np.uint8),
                     "labels": r.randint(0, 10, 6).tolist()}, f)

    ds = load_dataset("cifar10", str(tmp_path), allow_synthetic=False)
    assert ds.train.images.shape == (50, 32, 32, 3)
    assert ds.test.images.shape == (6, 32, 32, 3)


def test_synthetic_fallback_refusable(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_dataset("cifar10", str(tmp_path / "nope"), allow_synthetic=False)
    ds = load_dataset("cifar10", str(tmp_path / "nope"),
                      synthetic_sizes=(100, 50))
    assert ds.synthetic and ds.train.images.shape == (100, 32, 32, 3)


def test_synth100_hard_benchmark_properties():
    """The non-saturating benchmark (VERDICT round-1 item 1b): 100 classes,
    deterministic, and — the defining property — raw-pixel nearest-neighbor
    similarity must be nearly useless (the class signal is the texture power
    spectrum; phase is per-instance nuisance), so few-epoch KNN can rank
    algorithms instead of pinning at ~1.0."""
    import numpy as np

    from ssv_tpu.data.datasets import load_dataset

    ds = load_dataset("synth100", root=None, synthetic_sizes=(800, 400))
    assert ds.num_classes == 100 and ds.synthetic
    assert ds.train.images.shape == (800, 32, 32, 3)
    assert ds.train.images.dtype == np.uint8
    assert len(set(ds.train.labels.tolist())) > 50

    ds2 = load_dataset("synth100", root=None, synthetic_sizes=(800, 400))
    np.testing.assert_array_equal(ds.train.images, ds2.train.images)

    x = ds.test.images.reshape(400, -1).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    sim = x @ x.T
    np.fill_diagonal(sim, -np.inf)
    nn = np.argsort(-sim, axis=1)[:, :20]
    raw_knn = (ds.test.labels[nn] == ds.test.labels[:, None]).mean()
    assert raw_knn < 0.25, raw_knn   # chance is 0.01; easy-synthetic is ~1.0


def test_shapes100_augmentation_invariant_benchmark():
    """VERDICT round-2 item 1: a benchmark whose class signal SURVIVES the
    train augmentations. Classes are shape/layout prototypes; colors,
    positions and chirality are per-instance nuisance. Checks: determinism,
    label coverage, mirror-symmetry of the generator's shape types (a
    horizontal flip of any image must stay in-distribution for its class),
    luminance separation that survives grayscale, and a raw-pixel KNN far
    below saturation (algorithms must beat ~0.1, chance 0.01)."""
    import numpy as np

    from ssv_tpu.data.datasets import load_dataset

    ds = load_dataset("shapes100", root=None, synthetic_sizes=(800, 400))
    assert ds.num_classes == 100 and ds.synthetic
    assert ds.train.images.shape == (800, 32, 32, 3)
    assert ds.train.images.dtype == np.uint8
    assert len(set(ds.train.labels.tolist())) > 50

    ds2 = load_dataset("shapes100", root=None, synthetic_sizes=(800, 400))
    np.testing.assert_array_equal(ds.train.images, ds2.train.images)
    np.testing.assert_array_equal(ds.train.labels, ds2.train.labels)

    # raw-pixel 20-NN (reference metric semantics, self dropped): present
    # but far from saturated — layout is pixel-visible, colors are not
    x = ds.test.images.reshape(400, -1).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    sim = x @ x.T
    np.fill_diagonal(sim, -np.inf)
    nn = np.argsort(-sim, axis=1)[:, :20]
    raw_knn = (ds.test.labels[nn] == ds.test.labels[:, None]).mean()
    assert 0.02 < raw_knn < 0.35, raw_knn

    # grayscale-survivable contrast: shape pixels are bright, background
    # dark — the luminance histogram must be bimodal with mass in both bands
    lum = ds.train.images.mean(axis=-1) / 255.0
    dark = (lum < 0.40).mean()
    bright = (lum > 0.50).mean()
    assert dark > 0.4 and bright > 0.1, (dark, bright)
