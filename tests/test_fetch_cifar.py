"""scripts/fetch_cifar.py staging path: a published-layout tarball staged
with --from must be readable by load_dataset(allow_synthetic=False) and must
produce the .raw fast-start cache (VERDICT r1 item 2 — the moment real data
arrives by any route, staging is one command)."""

import os
import pickle
import subprocess
import sys
import tarfile

import numpy as np

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "fetch_cifar.py")


def make_fake_cifar10_tarball(tmp_path, n_per_batch=40, n_test=60):
    rng = np.random.RandomState(0)
    src = tmp_path / "build" / "cifar-10-batches-py"
    os.makedirs(src, exist_ok=True)

    def write(fname, n):
        entry = {"data": rng.randint(0, 256, size=(n, 3072), dtype=np.uint8),
                 "labels": rng.randint(0, 10, size=n).tolist()}
        with open(src / fname, "wb") as f:
            pickle.dump(entry, f)

    for i in range(1, 6):
        write(f"data_batch_{i}", n_per_batch)
    write("test_batch", n_test)

    tar_path = tmp_path / "cifar-10-python.tar.gz"
    with tarfile.open(tar_path, "w:gz") as tf:
        tf.add(src, arcname="cifar-10-batches-py")
    return tar_path


def test_stage_from_tarball_then_load(tmp_path):
    tar_path = make_fake_cifar10_tarball(tmp_path)
    root = tmp_path / "data"

    proc = subprocess.run(
        [sys.executable, SCRIPT, "--dataset", "cifar10",
         "--root", str(root), "--from", str(tar_path)],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    # fake data: the md5 warning must fire, staging must proceed
    assert "md5 mismatch" in proc.stdout

    from ssv_tpu.data.datasets import load_dataset

    ds = load_dataset("cifar10", str(root), allow_synthetic=False)
    assert not ds.synthetic
    assert ds.train.images.shape == (200, 32, 32, 3)
    assert ds.test.images.shape == (60, 32, 32, 3)
    assert ds.num_classes == 10
    # the fast-start cache was written by the warm_cache step
    assert os.path.exists(root / "cifar10_train.raw")
    assert os.path.exists(root / "cifar10_test.raw")

    # second load comes from the .raw cache and must be identical
    ds2 = load_dataset("cifar10", str(root), allow_synthetic=False)
    np.testing.assert_array_equal(ds.train.images, ds2.train.images)
    np.testing.assert_array_equal(ds.train.labels, ds2.train.labels)
