"""Fused Pallas Canny kernel vs the jnp reference implementation (runs in
interpret mode on CPU; compiled on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from edge_enhancement_tpu.ops import canny_step125
from edge_enhancement_tpu.ops.pallas.canny_fused import canny_step125_fused


@pytest.mark.parametrize("shape,alpha", [((4, 20, 24, 3), 0.1),
                                         ((2, 28, 28, 1), 0.3),
                                         ((3, 64, 64, 3), 0.0)])
def test_forward_parity(shape, alpha):
    x = jax.random.uniform(jax.random.PRNGKey(0), shape)
    got = np.asarray(canny_step125_fused(x, 76 / 255, 1.0, alpha))
    want = np.asarray(canny_step125(x, high_threshold=76 / 255, alpha=alpha))
    np.testing.assert_array_equal(got, want)


def test_backward_parity():
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 20, 24, 3))
    g1 = np.asarray(jax.grad(
        lambda v: (canny_step125_fused(v, 0.2, 1.0, 0.1)
                   * jnp.arange(1.0, 4 * 20 * 24 + 1).reshape(4, 20, 24, 1)).sum())(x))
    g2 = np.asarray(jax.grad(
        lambda v: (canny_step125(v, high_threshold=0.2, alpha=0.1)
                   * jnp.arange(1.0, 4 * 20 * 24 + 1).reshape(4, 20, 24, 1)).sum())(x))
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-4)


def test_fused_frontend_matches_unfused():
    from edge_enhancement_tpu.models.ee_frontend import EEConfig, ee_frontend
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
    base = dict(r=8, w=1.0, low=38., high=76., alpha=0.0, sigma=1.0,
                type_canny="CannyFilter_step125_1")
    a = ee_frontend(x, EEConfig(**base, fused=False))
    b = ee_frontend(x, EEConfig(**base, fused=True))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
