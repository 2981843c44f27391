"""Backbone/head structure and quirk tests (reference networks/*.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssv_tpu.models import build_encoder
from ssv_tpu.models.heads import (ClusterHeads, DinoHead, Prototypes,
                                  WeightNormDense, simclr_projection)
from ssv_tpu.models.vit import patchify

VIT_CFG = dict(hidden_dim=48, embedding_dim=16, intermediate_dim=64,
               num_attention_heads=4, patch_size=4, num_local_patches=4,
               num_global_patches=64, num_encoder_layers=2)


def test_resnet_feature_dims():
    for arch, dim in [("resnet18", 512), ("resnet50", 2048),
                      ("resnext50", 2048), ("wide_resnet50", 2048)]:
        m, d = build_encoder(arch, {"reduce_bottom_conv": True})
        assert d == dim


def test_resnet18_shapes_and_bnstats():
    m, d = build_encoder("resnet18", {"reduce_bottom_conv": True})
    x = jnp.zeros((2, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=True)
    out, upd = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 512) and out.dtype == jnp.float32
    # eval mode uses running stats, no mutation needed
    out_eval = m.apply(v, x, train=False)
    assert out_eval.shape == (2, 512)


def test_resnet_zero_init_residual():
    m, _ = build_encoder("resnet18", {"reduce_bottom_conv": True,
                                      "zero_init_residual": True})
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=True)
    # last BN of each BasicBlock has scale == 0
    flat = jax.tree_util.tree_flatten_with_path(v["params"])[0]
    zero_scales = [p for p, leaf in flat
                   if "BatchNorm_1" in str(p) and "scale" in str(p)
                   and float(np.abs(np.asarray(leaf)).max()) == 0.0]
    assert len(zero_scales) >= 8  # 2 blocks x 4 stages


def test_patchify_matches_unfold_order():
    """nn.Unfold flattens each patch as (c, py, px) — channel-major."""
    img = jnp.arange(2 * 8 * 8 * 3).reshape(2, 8, 8, 3).astype(jnp.float32)
    p = patchify(img, 4)
    assert p.shape == (2, 4, 48)
    # manual first patch of image 0: channels-major over the 4x4 block
    want = img[0, :4, :4, :].transpose(2, 0, 1).reshape(-1)
    np.testing.assert_allclose(np.asarray(p[0, 0]), np.asarray(want))


def test_vit_dual_pos_tables_one_param_tree():
    m, d = build_encoder("vit", VIT_CFG)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))
    params = v["params"]
    assert params["pos_embedding_global"].shape == (65, 16)
    assert params["pos_embedding_local"].shape == (5, 16)
    # same tree serves both input sizes
    out_g = m.apply(v, jnp.zeros((2, 32, 32, 3)))
    out_l = m.apply(v, jnp.zeros((2, 8, 8, 3)))
    assert out_g.shape == out_l.shape == (2, 48)
    with pytest.raises(ValueError):
        m.apply(v, jnp.zeros((2, 16, 16, 3)))


def test_vit_returns_attention_maps():
    m, _ = build_encoder("vit", VIT_CFG)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)))
    out, attn = m.apply(v, jnp.zeros((2, 32, 32, 3)), return_attn=True)
    assert set(attn) == {"layer_0", "layer_1"}
    assert attn["layer_0"].shape == (2, 4, 65, 65)
    # rows are distributions
    np.testing.assert_allclose(np.asarray(attn["layer_0"]).sum(-1), 1.0,
                               rtol=1e-3)


def test_vit_layernorm_residual_quirk():
    """Reference quirk (vit.py:24-31): the residual added to the attention
    output is LayerNorm(x), NOT x. With zeroed QKV/FF the layer must reduce
    to LayerNorm composition rather than identity."""
    from ssv_tpu.models.vit import TransformerLayer
    from flax import linen as nn

    layer = TransformerLayer(hidden_dim=8, intermediate_dim=16, num_heads=2,
                             dtype=jnp.float32)  # f32: exact vs LN oracle
    x = jnp.array(np.random.RandomState(0).randn(1, 3, 8), jnp.float32)
    v = layer.init(jax.random.PRNGKey(0), x)
    # zero every Dense kernel/bias -> branch contributions vanish
    zeroed = jax.tree_util.tree_map(
        lambda a: jnp.zeros_like(a) if a.ndim >= 1 else a, v["params"])
    # keep LayerNorm scales at 1
    def restore_ln(p):
        for sub in p.values():
            if isinstance(sub, dict):
                restore_ln(sub)
        if "ln" in p:
            p["ln"]["scale"] = jnp.ones_like(p["ln"]["scale"])
        return p
    import flax
    zeroed = flax.core.unfreeze(zeroed)
    restore_ln(zeroed)
    out, _ = layer.apply({"params": zeroed}, x)
    ln = nn.LayerNorm()
    lnv = ln.init(jax.random.PRNGKey(0), x)
    want = ln.apply(lnv, ln.apply(lnv, x))  # two stacked norm-residuals
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)


def test_weight_norm_dense_matches_torch_semantics():
    """W[:, j] = g[j] * v[:, j]/||v[:, j]||, g init = ||v|| => initial output
    equals plain dense with v."""
    m = WeightNormDense(6)
    x = jnp.array(np.random.RandomState(0).randn(3, 4), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    vmat = np.asarray(v["params"]["v"])
    np.testing.assert_allclose(np.asarray(out), x @ vmat, rtol=1e-4, atol=1e-5)
    # g scaling changes column norms proportionally
    v2 = flax_set = jax.tree_util.tree_map(lambda a: a, v)
    g = np.asarray(v["params"]["g"])
    import flax
    v2 = flax.core.unfreeze(v2)
    v2["params"]["g"] = jnp.asarray(g * 2)
    out2 = m.apply(v2, x)
    np.testing.assert_allclose(np.asarray(out2), 2 * np.asarray(out),
                               rtol=1e-4)


def test_prototypes_rows_unit_norm():
    m = Prototypes(10, 8)
    v = m.init(jax.random.PRNGKey(0))
    table = m.apply(v)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(table, axis=1)),
                               1.0, rtol=1e-5)


def test_cluster_heads_match_loop():
    m = ClusterHeads(num_heads=3, num_clusters=5)
    x = jnp.array(np.random.RandomState(0).randn(4, 6), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    out = np.asarray(m.apply(v, x))
    w = np.asarray(v["params"]["kernel"])
    b = np.asarray(v["params"]["bias"])
    for h in range(3):
        np.testing.assert_allclose(out[h], np.asarray(x) @ w[h] + b[h],
                                   rtol=1e-4, atol=1e-5)


def test_simclr_projection_structure():
    m = simclr_projection(16, 8)
    x = jnp.zeros((4, 16))
    v = m.init(jax.random.PRNGKey(0), x)
    out, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert out.shape == (4, 8)
    # two BN layers (after each fc)
    assert len([k for k in v["batch_stats"] if "BatchNorm" in k]) == 2


def test_vit_conv_embedding_equals_concat_dense():
    """The conv-formulated embedding (TransformerEncoder.__call__) must
    equal the reference formulation — patchify -> CLS prepend -> feature-dim
    pos concat -> Dense — applied with the SAME parameters. Zero encoder
    layers isolates the embedding stage (output = projected CLS token);
    token rows are checked through a 1-layer encoder output too."""
    from ssv_tpu.models.vit import TransformerEncoder, patchify

    cfg = dict(VIT_CFG, num_encoder_layers=0, dtype=jnp.float32)
    m = TransformerEncoder(**cfg)
    rng = np.random.RandomState(0)
    for shape, n in [((3, 32, 32, 3), 64), ((3, 8, 8, 3), 4)]:
        img = jnp.asarray(rng.rand(*shape), jnp.float32)
        v = m.init(jax.random.PRNGKey(1), img)
        params = v["params"]
        kernel = np.asarray(params["projection_fc"]["kernel"])
        bias = np.asarray(params["projection_fc"]["bias"])
        cls = np.asarray(params["cls_embedding"])
        key = ("pos_embedding_global" if n == 64 else "pos_embedding_local")
        pos = np.asarray(params[key])

        # reference formulation in NumPy
        x = np.asarray(patchify(img, 4))
        x = np.concatenate([np.broadcast_to(cls, (shape[0], 1, 48)), x], 1)
        x = np.concatenate([x, np.broadcast_to(pos[None], (shape[0], n + 1,
                                                           pos.shape[-1]))], -1)
        want = x @ kernel + bias  # (b, n+1, hidden)

        got_cls = np.asarray(m.apply(v, img))  # 0 layers -> projected CLS
        np.testing.assert_allclose(got_cls, want[:, 0, :], rtol=1e-5,
                                   atol=1e-5)


def test_vit_conv_embedding_full_forward_parity():
    """All token rows: feed the reference-formulated embedding through the
    encoder's own transformer layers (params extracted from the tree) and
    compare against the model's full forward — attention mixes every token
    into the CLS output, so any row mismatch shows up."""
    from ssv_tpu.models.vit import TransformerEncoder, TransformerLayer, patchify

    cfg = dict(VIT_CFG, num_encoder_layers=2, dtype=jnp.float32)
    m = TransformerEncoder(**cfg)
    img = jnp.asarray(np.random.RandomState(3).rand(2, 32, 32, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(2), img)
    params = v["params"]

    x = np.asarray(patchify(img, 4))
    cls = np.asarray(params["cls_embedding"])
    pos = np.asarray(params["pos_embedding_global"])
    x = np.concatenate([np.broadcast_to(cls, (2, 1, 48)), x], 1)
    x = np.concatenate([x, np.broadcast_to(pos[None], (2, 65, 16))], -1)
    x = jnp.asarray(x @ np.asarray(params["projection_fc"]["kernel"])
                    + np.asarray(params["projection_fc"]["bias"]))
    layer = TransformerLayer(hidden_dim=48, intermediate_dim=64, num_heads=4,
                             dtype=jnp.float32)
    for i in range(2):
        x, _ = layer.apply({"params": params[f"layer_{i}"]}, x)
    want = np.asarray(x[:, 0, :])
    got = np.asarray(m.apply(v, img))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_vit_fuse_qkv_parity():
    """fuse_qkv computes Q/K/V with one (d, 3d) matmul against the
    concatenated kernels; the param TREE is identical to the three-Dense
    layout (checkpoint compatible) and the same params must produce the
    same outputs on both pos-table paths."""
    m, _ = build_encoder("vit", {**VIT_CFG, "dtype": "float32"})
    mf, _ = build_encoder("vit", {**VIT_CFG, "dtype": "float32",
                                  "fuse_qkv": True})
    k = jax.random.PRNGKey(0)
    v = m.init(k, jnp.zeros((2, 32, 32, 3)))
    vf = mf.init(k, jnp.zeros((2, 32, 32, 3)))
    assert (jax.tree_util.tree_structure(v) ==
            jax.tree_util.tree_structure(vf))
    for a, b in zip(jax.tree_util.tree_leaves(v), jax.tree_util.tree_leaves(vf)):
        assert a.shape == b.shape
    for shape in [(2, 32, 32, 3), (2, 8, 8, 3)]:
        x = jax.random.normal(jax.random.PRNGKey(1), shape)
        out = m.apply(v, x)        # same param tree serves both variants
        out_f = mf.apply(v, x)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out),
                                   rtol=1e-5, atol=1e-5)
        _, attn = mf.apply(v, x, return_attn=True)
        _, attn0 = m.apply(v, x, return_attn=True)
        np.testing.assert_allclose(np.asarray(attn["layer_0"]),
                                   np.asarray(attn0["layer_0"]),
                                   rtol=1e-5, atol=1e-6)


def test_vit_seq_pad_parity():
    """seq_pad_multiple pads tokens to an MXU-aligned length (65->72, 5->8)
    with masked keys; the CLS output must match the unpadded encoder to
    numerical tolerance for BOTH pos tables (global and local inputs), and
    the same param tree must serve both variants."""
    m, _ = build_encoder("vit", VIT_CFG)
    mp, _ = build_encoder("vit", {**VIT_CFG, "seq_pad_multiple": 8})
    k = jax.random.PRNGKey(0)
    v = m.init(k, jnp.zeros((2, 32, 32, 3)))
    for shape in [(2, 32, 32, 3), (2, 8, 8, 3)]:
        x = jax.random.normal(jax.random.PRNGKey(1), shape)
        out = m.apply(v, x)
        out_p = mp.apply(v, x)  # identical param tree
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out),
                                   rtol=2e-2, atol=2e-2)
        # attention maps are sliced back to the valid length (advisor r3:
        # consumers must never see alignment padding), and the sliced rows
        # still sum to 1 — i.e. the masked pad keys carried no mass
        _, attn = mp.apply(v, x, return_attn=True)
        n_valid = 65 if shape[1] == 32 else 5
        probs = np.asarray(attn["layer_0"], np.float32)
        assert probs.shape[-2:] == (n_valid, n_valid), probs.shape
        np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=0, atol=1e-5)
