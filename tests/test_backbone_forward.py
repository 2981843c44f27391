"""Forward-pass coverage for the Bottleneck/grouped-conv backbone variants
(the parametrized-factory table alone doesn't execute those code paths)."""

import jax
import jax.numpy as jnp
import pytest

from ssv_tpu.models import build_encoder


@pytest.mark.parametrize("arch,dim", [("resnet50", 2048), ("resnext50", 2048),
                                      ("wide_resnet50", 2048)])
def test_bottleneck_variants_forward(arch, dim):
    m, d = build_encoder(arch, {"reduce_bottom_conv": True})
    assert d == dim
    x = jnp.zeros((1, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=True)
    out, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert out.shape == (1, dim)


def test_full_stem_no_reduce_bottom_conv():
    """The 7x7/s2 ImageNet stem path (resnet.py:96-99 'else' branch)."""
    m, _ = build_encoder("resnet18", {"reduce_bottom_conv": False})
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=True)
    out, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert out.shape == (1, 512)
