"""Algorithm registry — the reference's ALGORITHMS table (main.py:14-26)."""

from __future__ import annotations

from .algorithms.barlow import BarlowTwins
from .algorithms.byol import BYOL
from .algorithms.deep_cluster import DeepCluster
from .algorithms.dino import DINO
from .algorithms.moco import MoCo
from .algorithms.pirl import PIRL
from .algorithms.relic import ReLIC
from .algorithms.sela import SeLA
from .algorithms.simclr import SimCLR
from .algorithms.simsiam import SimSiam
from .algorithms.swav import SwAV

ALGORITHMS = {
    "simclr": SimCLR,
    "moco": MoCo,
    "byol": BYOL,
    "dino": DINO,
    "pirl": PIRL,
    "barlow": BarlowTwins,
    "simsiam": SimSiam,
    "relic": ReLIC,
    "deep_cluster": DeepCluster,
    "swav": SwAV,
    "sela": SeLA,
}


def build_algorithm(name: str, config, arch: str, data_info):
    if name not in ALGORITHMS:
        raise ValueError(f"Unknown algorithm {name!r}; expected one of {list(ALGORITHMS)}")
    return ALGORITHMS[name](config, arch, data_info)
