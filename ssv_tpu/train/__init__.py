from .base import TrainState, Algorithm, DataInfo
from .trainer import Trainer
from .registry import ALGORITHMS, build_algorithm
