"""PIRL (reference models/pirl.py): jigsaw pretext — the augmented view is
cut into patches, each encoded, shuffled, concatenated and projected; NCE
against a per-sample EMA memory bank with sampled negatives.

TPU redesign of the hot spots:
  * all patches of the batch are encoded in ONE forward of shape
    (B * n_patches, p, p, 3) instead of the reference's sequential
    per-patch-position forwards (pirl.py:66-71);
  * the per-step O(N) host loop for negative sampling (pirl.py:44-46)
    becomes an on-device masked top-k (state/banks.py);
  * the bank (50000 x 128) lives in HBM and is EMA-updated by one scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...models.heads import l2_normalize
from ...models.registry import build_encoder
from ...objectives import pirl_nce
from ...parallel.per_device import pgather, pmean_tree
from ...state.banks import (SampleBank, sample_bank_init, sample_bank_set,
                            sample_bank_update, sample_negatives)
from ..base import Algorithm, DataInfo, TrainState, apply_eval, apply_train, init_module


class PirlNet(nn.Module):
    encoder: nn.Module
    proj_dim: int
    patch_size: int
    num_patches: int

    @nn.compact
    def __call__(self, imgs, patch_imgs=None, perm=None, train: bool = True):
        f_proj = nn.Dense(self.proj_dim, name="f_proj")
        img_features = f_proj(self.encoder(imgs, train=train))
        if patch_imgs is None:
            return img_features

        B, H, W, C = patch_imgs.shape
        p = self.patch_size
        gh, gw = H // p, W // p
        n = gh * gw
        # (B, gw, gh, p, p, C) flattened column-major over (x, y) to match
        # the reference's w-then-h patch enumeration (pirl.py:66-71)
        patches = patch_imgs.reshape(B, gh, p, gw, p, C)
        patches = patches.transpose(0, 3, 1, 2, 4, 5).reshape(B * n, p, p, C)
        pf = self.encoder(patches, train=train)
        pf = nn.Dense(self.proj_dim, name="g_proj_head_initial")(pf)
        pf = pf.reshape(B, n, self.proj_dim)
        if perm is not None:
            pf = jnp.take(pf, perm, axis=1)   # shared shuffle across batch
        pf = pf.reshape(B, n * self.proj_dim)
        patch_features = nn.Dense(self.proj_dim, name="g_proj_head_final")(pf)
        return img_features, patch_features


class PIRL(Algorithm):
    name = "pirl"
    batch_kind = "double"

    def __init__(self, config, arch: str, data: DataInfo):
        super().__init__(config, arch, data)
        self.proj_dim = int(config["proj_dim"])
        self.num_patches = int(config.get("num_patches", 4))
        self.patch_size = int(config.get("patch_size", 16))
        self.m = float(config.get("momentum", 0.5))
        self.num_negatives = int(config.get("num_negatives", 1000))
        encoder, dim = build_encoder(arch, self.encoder_cfg())
        self.model = PirlNet(encoder=encoder, proj_dim=self.proj_dim,
                             patch_size=self.patch_size,
                             num_patches=self.num_patches)
        self.loss_cfg = dict(config.get("loss_fn", {}) or {})
        # Default to the corrected NCE: the reference's negative block
        # mm(m_pos, m_neg^T) carries no parameter gradient, so only the
        # attraction term trains and the encoder collapses to chance
        # (losses.py:108; measured in VALIDATION.md). `negatives_from:
        # memory` reproduces the reference quirk — same policy as SeLA's
        # self_label_mode (SURVEY §7: learning-relevant defects get
        # corrected defaults, quirk behind a flag).
        self.loss_cfg.setdefault("negatives_from", "features")
        self.tx = self.make_tx()

    def init_state(self, rng) -> TrainState:
        x = self.sample_image()
        params, bstats = init_module(rng, self.model, x, x,
                                     jnp.arange(self.num_patches))
        extra = {"bank": sample_bank_init(self.data.n_train, self.proj_dim)}
        return TrainState(jnp.zeros((), jnp.int32), params, bstats,
                          self.tx.init(params), extra)

    def pre_train(self, state, trainer):
        """Initialize the bank with a full forward pass (pirl.py:187-196)."""
        fvecs, _ = trainer.features_for(state, split="train",
                                        feature_fn=self._bank_feature)
        bank = sample_bank_set(state.extra["bank"],
                               jnp.arange(self.data.n_train), jnp.asarray(fvecs))
        return state.replace(extra={"bank": bank})

    def _bank_feature(self, state, images):
        # reference initializes with raw f-projection outputs; the bank
        # normalizes rows on write (pirl.py:34-36)
        return apply_eval(self.model, state.params, state.batch_stats, images)

    def train_step(self, state, batch, key, axis=None):
        # Under per-device BN each replica draws its own patch permutation
        # and negative set (the key arrives replica-folded) — a documented
        # divergence that only widens negative diversity vs the reference's
        # single shared draw (pirl.py:44-46,131-135).
        k_perm, k_neg = jax.random.split(key)
        perm = jax.random.permutation(k_perm, self.num_patches)
        idx = batch["index"]
        bank: SampleBank = state.extra["bank"]
        mem_pos = bank.data[idx]
        mem_neg = sample_negatives(k_neg, bank, idx, self.num_negatives)

        def loss_fn(params):
            (img_f, patch_f), bs = apply_train(self.model, params,
                                               state.batch_stats,
                                               batch["aug_1"], batch["aug_2"],
                                               perm=perm)
            loss = pirl_nce(img_f, patch_f, mem_pos, mem_neg, **self.loss_cfg)
            return loss, (bs, img_f)

        params, opt_state, loss, (bstats, img_f) = self.grad_step(
            state, loss_fn, axis=axis, loss_scope="local")
        # the per-sample bank scatter covers the GLOBAL batch on every replica
        bank = sample_bank_update(bank, pgather(idx, axis),
                                  pgather(jax.lax.stop_gradient(img_f), axis),
                                  self.m)
        new = state.replace(step=state.step + 1, params=params,
                            batch_stats=pmean_tree(bstats, axis),
                            opt_state=opt_state, extra={"bank": bank})
        return new, {"loss": loss}

    def embed(self, state, images):
        z = apply_eval(self.model, state.params, state.batch_stats, images)
        return l2_normalize(z)
