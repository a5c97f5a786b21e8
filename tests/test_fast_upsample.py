"""Subpixel decoder decomposition: the 4x4-phase-conv fast path must be
EXACTLY equal to bilinear-2x + 5x5 conv (interior analytic kernels + border
slab restitch)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rpg_ramnet_tpu.models import layers as L


@pytest.mark.parametrize("h,w", [(16, 16), (9, 13), (4, 4), (32, 24), (5, 4)])
def test_fast_upsample_exact(h, w):
    rng = np.random.RandomState(h * 100 + w)
    cin, cout = 6, 4
    p = L.upsample_conv_layer_init(jax.random.PRNGKey(0), cin, cout, 5)
    x = jnp.asarray(rng.randn(2, h, w, cin).astype(np.float32))
    ref = L.upsample_conv_layer_apply(p, x, 2, "relu", None)
    fast = L.upsample_conv_layer_fast_apply(p, x, 2, "relu", None)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_fast_upsample_grads_match():
    rng = np.random.RandomState(0)
    p = L.upsample_conv_layer_init(jax.random.PRNGKey(1), 4, 3, 5)
    x = jnp.asarray(rng.randn(1, 12, 14, 4).astype(np.float32))

    def loss_ref(pp):
        return jnp.sum(L.upsample_conv_layer_apply(pp, x, 2, "relu", None) ** 2)

    def loss_fast(pp):
        return jnp.sum(L.upsample_conv_layer_fast_apply(pp, x, 2, "relu", None) ** 2)

    g1 = jax.grad(loss_ref)(p)
    g2 = jax.grad(loss_fast)(p)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-3, rtol=1e-4), g1, g2)
