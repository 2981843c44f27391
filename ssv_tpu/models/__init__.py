from .registry import NETWORKS, build_encoder
from . import resnet, vit, heads
