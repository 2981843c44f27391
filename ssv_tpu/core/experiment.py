"""Experiment initialization.

TPU-native analogue of the reference's `initialize_experiment`
(common.py:96-129): fixed seed (420), config load, timestamped output dir
under `outputs/<algo>/<arch>/`, hyperparameter dump, logger. Instead of
picking a single cuda/cpu device (common.py:124-127) we report the JAX
platform and the device mesh the run will shard over.
"""

from __future__ import annotations

import os
import random
from datetime import datetime as dt

import numpy as np

from .config import load_config
from ..utils.logging import Logger

DEFAULT_SEED = 420  # parity with reference common.py:96-101


def seed_everything(seed: int = DEFAULT_SEED) -> int:
    """Seed host-side RNGs. Device-side randomness flows through explicit
    `jax.random` keys derived from this seed — nothing global on device."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return seed


def initialize_experiment(args: dict, output_root: str, seed: int = DEFAULT_SEED,
                          make_dirs: bool = True):
    """Returns (config, output_dir, logger).

    `args` carries the CLI dict (`config`, `output`, ...) exactly as the
    reference's main.py builds it (main.py:37-44).
    """
    seed_everything(seed)
    config = load_config(args["config"])

    output_dir = os.path.join(output_root, args.get("output") or dt.now().strftime("%d-%m-%Y_%H-%M"))
    if make_dirs:
        os.makedirs(output_dir, exist_ok=True)

    logger = Logger(output_dir if make_dirs else None)
    if make_dirs:
        with open(os.path.join(output_dir, "hyperparameters.txt"), "w") as f:
            f.write(_render(config.raw()))

    import jax

    logger.print(
        f"Platform: {jax.default_backend()} | devices: {jax.device_count()}",
        mode="info",
    )
    return config, output_dir, logger


def _render(d: dict, indent: int = 0) -> str:
    lines = []
    for k, v in d.items():
        if isinstance(v, dict):
            lines.append("  " * indent + f"{k}:")
            lines.append(_render(v, indent + 1))
        else:
            lines.append("  " * indent + f"{k}: {v}")
    return "\n".join(lines)
