from .datasets import load_dataset, DATASETS
from .augment import build_transform, TRANSFORM_OPS
from .multicrop import MultiCrop
from .pipeline import DataPipeline
