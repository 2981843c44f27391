"""ssv_tpu — a TPU-native self-supervised vision pretraining framework.

A ground-up JAX / XLA / Pallas re-design of the capabilities of
NightShade99/Self-Supervised-Vision (reference mounted at /root/reference):
eleven SSL algorithms (SimCLR, MoCo, BYOL, SimSiam, DINO, PIRL, Barlow Twins,
ReLIC, DeepCluster, SwAV, SeLA) over ResNet/ViT backbones with a fully
on-device input pipeline, on-device KNN / linear-probe / K-means evaluation,
and data-parallel scaling over a `jax.sharding.Mesh`.

Design principles (none of this mirrors the reference's architecture):
  * everything on device: augmentations, memory banks, Sinkhorn, K-means, KNN
  * one generic `Trainer` + small pure-functional `Algorithm` objects instead
    of the reference's 11 copy-pasted trainer classes
  * all mutable training state (EMA params, queues, centers, banks) lives in a
    single pytree threaded through a jitted (and `lax.scan`-unrolled) step
  * parallelism via shardings on a device mesh, not per-tensor `.to(device)`
"""

__version__ = "0.1.0"
