"""Backbone registry — mirrors the NETWORKS tables duplicated across every
reference trainer (e.g. simclr.py:12-19, dino.py:13-22), defined once."""

from __future__ import annotations

import jax.numpy as jnp

from . import resnet, vit
from .tiny import TinyEncoder, TINY_DIM


NETWORKS = {
    "tiny": {"net": TinyEncoder, "dim": TINY_DIM},  # test/example backbone
    "resnet18": {"net": resnet.resnet18, "dim": 512},
    "resnet34": {"net": resnet.resnet34, "dim": 512},
    "resnet50": {"net": resnet.resnet50, "dim": 2048},
    "resnet101": {"net": resnet.resnet101, "dim": 2048},
    "resnet152": {"net": resnet.resnet152, "dim": 2048},
    "resnext50": {"net": resnet.resnext50_32x4d, "dim": 2048},
    "resnext101": {"net": resnet.resnext101_32x8d, "dim": 2048},
    "wide_resnet50": {"net": resnet.wide_resnet50_2, "dim": 2048},
    "wide_resnet101": {"net": resnet.wide_resnet101_2, "dim": 2048},
    "vit": {"net": None, "dim": None},  # built from config, see build_encoder
}


def build_encoder(arch: str, encoder_cfg: dict):
    """Instantiate a backbone module + its feature dim from the YAML
    `encoder` block (kwargs style for resnets, config style for vit —
    matching how each reference trainer constructs them)."""
    if arch not in NETWORKS:
        raise ValueError(f"Unknown arch {arch!r}; expected one of {list(NETWORKS)}")
    cfg = dict(encoder_cfg or {})
    if arch == "vit":
        model = vit.TransformerEncoder(
            hidden_dim=cfg["hidden_dim"],
            embedding_dim=cfg["embedding_dim"],
            intermediate_dim=cfg["intermediate_dim"],
            num_attention_heads=cfg["num_attention_heads"],
            patch_size=cfg["patch_size"],
            num_encoder_layers=cfg["num_encoder_layers"],
            num_global_patches=cfg["num_global_patches"],
            num_local_patches=cfg["num_local_patches"],
            seq_pad_multiple=int(cfg.get("seq_pad_multiple", 0)),
            fuse_qkv=bool(cfg.get("fuse_qkv", False)),
            **({"dtype": jnp.dtype(cfg["dtype"])} if "dtype" in cfg else {}),
        )
        return model, cfg["hidden_dim"]
    entry = NETWORKS[arch]
    # Tolerate configs written for other backbones (e.g. running
    # `--algo dino --arch resnet18` with dino.yaml's ViT encoder block —
    # a combination that crashes the reference, dino.py:57): keep only
    # keys the conv backbones understand.
    allowed = {"reduce_bottom_conv", "zero_init_residual", "dtype",
               "param_dtype", "features"}
    cfg = {k: v for k, v in cfg.items() if k in allowed}
    if "dtype" in cfg:
        cfg["dtype"] = jnp.dtype(cfg["dtype"])
    model = entry["net"](**cfg)
    return model, entry["dim"]
