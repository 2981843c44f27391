from .knn import knn_label_agreement, cosine_topk
from .kmeans import kmeans
