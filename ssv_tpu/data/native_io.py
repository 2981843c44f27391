"""ctypes bindings for the native IO library (native/ssv_io.cc).

Builds the shared object with g++ on first use (cached under native/build/);
every entry point has a pure-NumPy fallback so the framework works without a
toolchain. This is the TPU build's native data-loader layer — the analogue of
the reference's C-backed torchvision/PIL dataset path (SURVEY §2).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_ROOT = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.abspath(os.path.join(_ROOT, "ssv_io.cc"))
        if not os.path.isfile(src):
            return None
        build = os.path.abspath(os.path.join(_ROOT, "build"))
        so = os.path.join(build, "libssv_io.so")
        try:
            if (not os.path.isfile(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                os.makedirs(build, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-pthread", src, "-o", so],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(so)
        except (OSError, subprocess.CalledProcessError):
            return None

        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.chw_to_hwc_u8.argtypes = [u8p, u8p, ctypes.c_int64, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.read_cifar_binary.argtypes = [ctypes.c_char_p, ctypes.c_int, u8p,
                                          i32p, ctypes.c_int64]
        lib.read_cifar_binary.restype = ctypes.c_int64
        lib.write_raw_cache.argtypes = [ctypes.c_char_p, u8p, i32p,
                                        ctypes.c_int64, ctypes.c_int,
                                        ctypes.c_int, ctypes.c_int]
        lib.write_raw_cache.restype = ctypes.c_int
        lib.read_raw_cache_header.argtypes = [ctypes.c_char_p, i32p]
        lib.read_raw_cache_header.restype = ctypes.c_int64
        lib.read_raw_cache.argtypes = [ctypes.c_char_p, u8p, i32p,
                                       ctypes.c_int64, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_int]
        lib.read_raw_cache.restype = ctypes.c_int
        _LIB = lib
        return _LIB


def available() -> bool:
    return _build_and_load() is not None


def _u8(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i32(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def chw_to_hwc(images_chw: np.ndarray, n_threads: int = 4) -> np.ndarray:
    """(N, 3, H, W) uint8 -> (N, H, W, 3) uint8."""
    n, c, h, w = images_chw.shape
    lib = _build_and_load()
    if lib is None:
        return np.ascontiguousarray(images_chw.transpose(0, 2, 3, 1))
    src = np.ascontiguousarray(images_chw)
    dst = np.empty((n, h, w, c), np.uint8)
    lib.chw_to_hwc_u8(_u8(src), _u8(dst), n, h, w, c, n_threads)
    return dst


def read_cifar_binary(path: str, label_bytes: int, max_n: int):
    """Read one CIFAR binary batch file. Returns (images HWC u8, labels i32)
    or None if the native lib is unavailable (caller falls back)."""
    lib = _build_and_load()
    if lib is None:
        return _read_cifar_binary_numpy(path, label_bytes, max_n)
    images = np.empty((max_n, 32, 32, 3), np.uint8)
    labels = np.empty((max_n,), np.int32)
    n = lib.read_cifar_binary(path.encode(), label_bytes, _u8(images),
                              _i32(labels), max_n)
    if n < 0:
        raise FileNotFoundError(path)
    return images[:n], labels[:n]


def _read_cifar_binary_numpy(path: str, label_bytes: int, max_n: int):
    raw = np.fromfile(path, np.uint8)
    row = label_bytes + 3072
    n = min(len(raw) // row, max_n)
    raw = raw[: n * row].reshape(n, row)
    labels = raw[:, label_bytes - 1].astype(np.int32)
    images = raw[:, label_bytes:].reshape(n, 3, 32, 32).transpose(0, 2, 3, 1)
    return np.ascontiguousarray(images), labels


def write_raw_cache(path: str, images: np.ndarray, labels: np.ndarray) -> bool:
    lib = _build_and_load()
    n, h, w, c = images.shape
    labels = labels.astype(np.int32)
    if lib is None:
        with open(path, "wb") as f:
            np.lib.format.write_array(f, images)  # fallback: plain npy pair
            np.lib.format.write_array(f, labels)
        return True
    images = np.ascontiguousarray(images)
    return lib.write_raw_cache(path.encode(), _u8(images), _i32(labels),
                               n, h, w, c) == 0


def read_raw_cache(path: str):
    """Returns (images, labels) or None if missing/invalid."""
    if not os.path.isfile(path):
        return None
    lib = _build_and_load()
    if lib is None:
        try:
            with open(path, "rb") as f:
                images = np.lib.format.read_array(f)
                labels = np.lib.format.read_array(f)
            return images, labels
        except Exception:
            return None
    hwc = np.zeros((3,), np.int32)
    n = lib.read_raw_cache_header(path.encode(), _i32(hwc))
    if n < 0:
        return None
    h, w, c = (int(x) for x in hwc)
    images = np.empty((n, h, w, c), np.uint8)
    labels = np.empty((n,), np.int32)
    if lib.read_raw_cache(path.encode(), _u8(images), _i32(labels),
                          n, h, w, c) != 0:
        return None
    return images, labels
