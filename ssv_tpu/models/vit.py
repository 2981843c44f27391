"""Vision Transformer with the reference's (unusual) embedding scheme.

Parity notes against reference networks/vit.py:
  * patchify + projection = the reference's nn.Unfold then
    Dense([patch || pos]) (vit.py:99,105,82); here the SAME parameters are
    applied as one pxp/stride-p convolution plus a positional projection
    (algebraic split of the Dense — see TransformerEncoder.__call__), which
    removes the patch-extraction transposes entirely.
  * a learned CLS token in *patch-pixel* space is prepended (vit.py:80-81).
  * positional embeddings are **concatenated on the feature dim**, not added
    (vit.py:82), with two separate tables for global vs local patch counts
    (vit.py:69-77) — which table is used is decided by the (static) sequence
    length of the input.
  * each transformer sublayer computes its branch from the *un-normalized*
    input and adds the LayerNorm of the input as the "residual"
    (vit.py:24-31,44-46). Faithfully reproduced — it changes training
    dynamics, so it is part of capability parity.
  * forward returns the CLS embedding; per-layer attention maps on request
    (vit.py:114-117).

TPU notes: the residual stream and all matmul operands are bf16 (LayerNorm
statistics stay f32 inside flax, but LN emits bf16 — an f32 residual stream
forced an f32<->bf16 layout copy per sublayer, profiled as the top DINO
"data formatting" cost). Only the attention score einsum accumulates in f32
(`preferred_element_type`); probs@V and the Dense layers run plain bf16.
Sequence lengths are tiny (<= 65 tokens) so attention is a plain fused
softmax(QK^T)V — no need for custom kernels at this scale.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn
from jax import lax


class _Kernel(nn.Module):
    """A bare Dense kernel (params[<name>]["kernel"], same tree/init as
    nn.Dense) whose matmul is performed by the caller — lets fuse_qkv share
    parameters and checkpoints with the unfused three-Dense layout."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.linear.default_kernel_init,
                          (self.in_dim, self.out_dim), jnp.float32)


class SelfAttention(nn.Module):
    hidden_dim: int
    num_heads: int
    dtype: Any = jnp.bfloat16
    fuse_qkv: bool = False

    @nn.compact
    def __call__(self, x, valid_len: int | None = None):
        b, n, _ = x.shape
        head = self.hidden_dim // self.num_heads
        dense = lambda name: nn.Dense(self.hidden_dim, use_bias=False, dtype=self.dtype,
                                      param_dtype=jnp.float32, name=name)
        # Reference quirk: LayerNorm(x) is the residual, raw x feeds QKV.
        # LN emits the compute dtype (statistics are still f32 inside flax):
        # an f32 residual stream forces an f32<->bf16 layout copy per
        # sublayer, profiled as the top "data formatting" cost of the DINO
        # step. Head split/merge stays inside the einsums — no materialized
        # (b,h,n,d) transposes.
        identity = nn.LayerNorm(dtype=self.dtype, name="ln")(x)
        if self.fuse_qkv:
            # opt-in (VALIDATION.md MFU study): one (d, 3d) matmul instead
            # of three (d, d) — triples the N dimension of the step's most
            # common small matmul. Param TREE is unchanged (three separate
            # kernels, concatenated at apply time), so checkpoints and the
            # unfused path share parameters; the concat is 3*(d*d) f32 —
            # noise next to the matmul itself.
            in_dim = x.shape[-1]
            w = jnp.concatenate(
                [_Kernel(in_dim, self.hidden_dim, name="query")(),
                 _Kernel(in_dim, self.hidden_dim, name="key")(),
                 _Kernel(in_dim, self.hidden_dim, name="value")()],
                axis=1).astype(self.dtype)
            qkv = (x @ w).reshape(b, n, 3, self.num_heads, head)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        else:
            q = dense("query")(x).reshape(b, n, self.num_heads, head)
            k = dense("key")(x).reshape(b, n, self.num_heads, head)
            v = dense("value")(x).reshape(b, n, self.num_heads, head)
        scores = jnp.einsum("bihd,bjhd->bhij", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(head)
        if valid_len is not None and valid_len < n:
            # sequence padded for MXU tile alignment: padded KEY positions
            # must not receive attention mass (padded QUERY rows are never
            # read — only CLS at position 0 leaves the encoder)
            key_mask = (jnp.arange(n) < valid_len)[None, None, None, :]
            scores = jnp.where(key_mask, scores, jnp.float32(-1e9))
        probs = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", probs.astype(self.dtype), v)
        out = out.reshape(b, n, self.hidden_dim)
        return out + identity, probs


class FeedForward(nn.Module):
    hidden_dim: int
    intermediate_dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        identity = nn.LayerNorm(dtype=self.dtype, name="ln")(x)
        y = nn.Dense(self.intermediate_dim, dtype=self.dtype, param_dtype=jnp.float32)(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32)(y)
        return y + identity


class TransformerLayer(nn.Module):
    hidden_dim: int
    intermediate_dim: int
    num_heads: int
    dtype: Any = jnp.bfloat16
    fuse_qkv: bool = False

    @nn.compact
    def __call__(self, x, valid_len: int | None = None):
        y, probs = SelfAttention(self.hidden_dim, self.num_heads, self.dtype,
                                 self.fuse_qkv,
                                 name="attention")(x, valid_len=valid_len)
        y = FeedForward(self.hidden_dim, self.intermediate_dim, self.dtype,
                        name="feedfwd")(y)
        return y, probs


def patchify(img: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/p * W/p, p*p*C), channel-major within a patch.

    Matches torch nn.Unfold output ordering (c, py, px) per patch so weights
    trained against either layout are interchangeable after a fixed permute.
    """
    b, h, w, c = img.shape
    p = patch_size
    x = img.reshape(b, h // p, p, w // p, p, c)
    # -> (b, gh, gw, c, py, px), flattening (c, py, px) mirrors Unfold.
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, (h // p) * (w // p), c * p * p)


class _DenseParams(nn.Module):
    """Parameter container with nn.Dense's tree shape and init — the kernel
    is consumed manually (split + reshaped into a conv) by the encoder."""

    input_dim: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.input_dim, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


class TransformerEncoder(nn.Module):
    """Config keys follow reference configs/dino.yaml `encoder` block."""

    hidden_dim: int
    embedding_dim: int
    intermediate_dim: int
    num_attention_heads: int
    patch_size: int
    num_encoder_layers: int
    num_global_patches: int
    num_local_patches: int
    dtype: Any = jnp.bfloat16
    # Pad the token sequence to a multiple of this (0 = off) and mask the
    # padded keys: 65 tokens mis-tile the MXU's 8-row granularity (65 -> 72,
    # 5 -> 8). Exact by construction (padded keys masked, padded queries
    # never read); measured on-chip before shipping a default — see
    # VALIDATION.md "DINO full-size data-path work".
    seq_pad_multiple: int = 0
    # Fuse the per-layer Q/K/V projections into one (d, 3d) matmul (same
    # param tree; kernels concatenated at apply time). Opt-in pending an
    # on-chip measurement — see VALIDATION.md MFU-ceiling note.
    fuse_qkv: bool = False

    @nn.compact
    def __call__(self, img, train: bool = True, return_attn: bool = False):
        p = self.patch_size
        input_dim = 3 * p * p
        b, h, w, _ = img.shape
        n = (h // p) * (w // p)

        cls = self.param("cls_embedding", nn.initializers.normal(1.0), (1, 1, input_dim))

        # Both tables are created unconditionally so the same param pytree
        # serves global and local inputs (DINO runs both through one model).
        pos_global = self.param("pos_embedding_global", nn.initializers.normal(1.0),
                                (self.num_global_patches + 1, self.embedding_dim))
        pos_local = self.param("pos_embedding_local", nn.initializers.normal(1.0),
                               (self.num_local_patches + 1, self.embedding_dim))
        if n == self.num_global_patches:
            pos = pos_global
        elif n == self.num_local_patches:
            pos = pos_local
        else:
            raise ValueError(
                f"Sequence of {n} patches matches neither global "
                f"({self.num_global_patches}) nor local ({self.num_local_patches})")

        # The reference embeds token_i = Dense([pixels_i || pos_i])
        # (patchify -> CLS prepend -> feature-dim pos concat -> projection,
        # vit.py:80-82,99-105). Algebraically Dense([a||b]) splits into
        # W_pix @ a + W_pos @ b, and W_pix over non-overlapping patches IS a
        # pxp/stride-p convolution — so the same parameters are applied as
        # one MXU conv plus a (n+1, hidden) positional projection, with NO
        # patch extraction: the reshape/transpose patchify chain profiled at
        # 19% of the DINO step wall ("data formatting", VALIDATION.md) as
        # well as both big concats disappear. `patchify` (below) remains the
        # semantic reference; tests/test_models.py pins this path against
        # the explicit concat+Dense computation.
        kernel, bias = _DenseParams(input_dim + self.embedding_dim,
                                    self.hidden_dim, name="projection_fc")()
        dt = self.dtype
        w_pix = kernel[:input_dim]          # rows ordered (c, py, px)
        w_pos = kernel[input_dim:]
        k_conv = w_pix.reshape(3, p, p, self.hidden_dim).transpose(1, 2, 0, 3)
        tok = lax.conv_general_dilated(
            img.astype(dt), k_conv.astype(dt), window_strides=(p, p),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        tok = tok.reshape(b, n, self.hidden_dim)
        cls_tok = cls.reshape(1, input_dim).astype(dt) @ w_pix.astype(dt)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_tok[None], (b, 1, self.hidden_dim)), tok], axis=1)
        x = x + (pos.astype(dt) @ w_pos.astype(dt))[None] + bias.astype(dt)

        seq = n + 1
        valid_len = None
        if self.seq_pad_multiple:
            pad = (-seq) % self.seq_pad_multiple
            if pad:
                x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
                valid_len = seq

        attn = {}
        for i in range(self.num_encoder_layers):
            x, probs = TransformerLayer(self.hidden_dim, self.intermediate_dim,
                                        self.num_attention_heads, self.dtype,
                                        self.fuse_qkv,
                                        name=f"layer_{i}")(x, valid_len=valid_len)
            if valid_len is not None:
                # alignment padding is an internal artifact: attention-map
                # consumers (per-patch reshapes, visualization) must always
                # see n_patches+1 on both query and key axes (advisor r3)
                probs = probs[..., :valid_len, :valid_len]
            attn[f"layer_{i}"] = probs

        cls_out = x[:, 0, :].astype(jnp.float32)
        if return_attn:
            return cls_out, attn
        return cls_out
