from . import (barlow, byol, deep_cluster, dino, moco, pirl, relic, sela,
               simclr, simsiam, swav)
