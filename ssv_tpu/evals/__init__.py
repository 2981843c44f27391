from .knn import compute_neighbor_accuracy
from .hungarian import hungarian_match
from .linear import linear_evaluation
