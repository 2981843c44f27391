#!/usr/bin/env python
"""Stage CIFAR-10/100 for ssv_tpu (VERDICT round-1 item: dataset tooling).

The reference downloads CIFAR through torchvision (`download=True`,
reference utils/data_utils.py:8-11,99-131). This environment has no network
egress, so staging is a first-class, one-command operation the moment data
becomes available by ANY route:

    python scripts/fetch_cifar.py --dataset cifar10 --root data
        try to download from the canonical URL (+ mirrors); if the network
        is unreachable, print the exact manual staging instructions.

    python scripts/fetch_cifar.py --dataset cifar10 --root data \
        --from /path/to/cifar-10-python.tar.gz   (or an extracted dir)
        stage from a local tarball / directory, no network needed.

After staging, `ssv_tpu.data.datasets.load_dataset` finds the data under
`--root` automatically (pickle layout), converts it once to the flat
`.raw` cache via the native IO library, and every later start is a single
sequential read. Verified against the published md5s.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import shutil
import sys
import tarfile
import urllib.request

URLS = {
    "cifar10": [
        "https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz",
        "https://ossci-datasets.s3.amazonaws.com/cifar-10-python.tar.gz",
    ],
    "cifar100": [
        "https://www.cs.toronto.edu/~kriz/cifar-100-python.tar.gz",
        "https://ossci-datasets.s3.amazonaws.com/cifar-100-python.tar.gz",
    ],
}
MD5 = {
    "cifar10": "c58f30108f718f92721af3b95e74349a",
    "cifar100": "eb9058c3a382ffc7106e4002c42a8d85",
}
EXTRACTED_DIR = {"cifar10": "cifar-10-batches-py", "cifar100": "cifar-100-python"}


def md5_of(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def stage_tarball(tar_path: str, dataset: str, root: str) -> str:
    got = md5_of(tar_path)
    if got != MD5[dataset]:
        print(f"WARNING: md5 mismatch for {tar_path}: got {got}, "
              f"expected {MD5[dataset]} — staging anyway, loader will "
              "fail loudly if the layout is wrong")
    os.makedirs(root, exist_ok=True)
    with tarfile.open(tar_path) as tf:
        tf.extractall(root)
    out = os.path.join(root, EXTRACTED_DIR[dataset])
    if not os.path.isdir(out):
        raise FileNotFoundError(f"extraction did not produce {out}")
    return out


def try_download(dataset: str, root: str) -> str | None:
    os.makedirs(root, exist_ok=True)
    tar_path = os.path.join(root, f"{dataset}-python.tar.gz")
    for url in URLS[dataset]:
        try:
            print(f"downloading {url} ...")
            with urllib.request.urlopen(url, timeout=30) as r, \
                    open(tar_path, "wb") as f:
                shutil.copyfileobj(r, f)
            return stage_tarball(tar_path, dataset, root)
        except OSError as e:
            print(f"  unreachable ({type(e).__name__}: {e})")
    return None


def warm_cache(dataset: str, root: str) -> None:
    """One load_dataset call: reads the pickles, writes the .raw cache."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from ssv_tpu.data.datasets import load_dataset

    ds = load_dataset(dataset, root, allow_synthetic=False)
    print(f"staged {dataset}: train {ds.train.images.shape}, "
          f"test {ds.test.images.shape}, classes {ds.num_classes}; "
          f".raw fast-start cache written under {root}/")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="cifar10",
                    choices=["cifar10", "cifar100"])
    ap.add_argument("--root", default="data",
                    help="staging directory (the `data.root` of the configs)")
    ap.add_argument("--from", dest="src", default=None,
                    help="local tarball or extracted directory to stage from")
    args = ap.parse_args()

    if args.src:
        if os.path.isdir(args.src):
            dst = os.path.join(args.root, EXTRACTED_DIR[args.dataset])
            if os.path.abspath(args.src) != os.path.abspath(dst):
                os.makedirs(args.root, exist_ok=True)
                shutil.copytree(args.src, dst, dirs_exist_ok=True)
        else:
            stage_tarball(args.src, args.dataset, args.root)
        warm_cache(args.dataset, args.root)
        return

    if try_download(args.dataset, args.root):
        warm_cache(args.dataset, args.root)
        return

    tar = f"{EXTRACTED_DIR[args.dataset]}.tar.gz".replace("-batches-py", "-python")
    print(f"""
No network route to any mirror. To stage manually, place ONE of these under
an accessible path and re-run with --from:

  * the official tarball  {tar}
    (md5 {MD5[args.dataset]}), or
  * an already-extracted  {EXTRACTED_DIR[args.dataset]}/  directory, or
  * the binary layout     {'cifar-10-batches-bin/' if args.dataset == 'cifar10' else 'cifar-100-binary/'}
    (read natively by ssv_tpu.data.native_io)

e.g.  python scripts/fetch_cifar.py --dataset {args.dataset} --root data \\
          --from /mnt/transfer/{tar}
""")
    sys.exit(2)


if __name__ == "__main__":
    main()
