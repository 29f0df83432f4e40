"""Fused Pallas Canny kernel vs the jnp reference implementation (runs in
interpret mode on CPU; compiled on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from edge_enhancement_tpu.ops import canny_step125
from edge_enhancement_tpu.ops.pallas.ee_fused import canny_step125_fused


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


class TestFusedCompositeFrontend:
    """The fully-fused EE front-end kernel pair (ops/pallas/ee_fused.py):
    add_square + HFS + step125-canny + clamp, forward AND hand-derived
    adjoint, vs the jnp composition — same PRNG key, so the square draws
    are identical on both paths."""

    BASE = dict(r=8, w=1.0, low=38., high=76., alpha=0.0, sigma=1.0,
                type_canny="CannyFilter_step125_1")

    def _pair(self, square):
        from edge_enhancement_tpu.models.ee_frontend import (EEConfig,
                                                             ee_frontend)
        extra = dict(square=True, epsilon=0.0627, n_queries=1) if square \
            else {}
        c_ref = EEConfig(**self.BASE, fused=False, **extra)
        c_fus = EEConfig(**self.BASE, fused=True, **extra)
        key = jax.random.PRNGKey(7) if square else None
        return (lambda v: ee_frontend(v, c_ref, key),
                lambda v: ee_frontend(v, c_fus, key))

    @pytest.mark.parametrize("square", [False, True])
    def test_forward_parity(self, square):
        ref, fus = self._pair(square)
        x = jax.random.uniform(jax.random.PRNGKey(3), (4, 64, 64, 3))
        np.testing.assert_allclose(np.asarray(fus(x)), np.asarray(ref(x)),
                                   atol=2e-6)

    @pytest.mark.parametrize("square", [False, True])
    def test_input_grad_parity(self, square):
        """The adjoint must match jax.grad of the jnp composition, including
        the ball-projection paths into x, the STE window, and the clip-tie
        0.5 conventions (ties occur structurally: the square chain clips
        exactly to 0/1)."""
        ref, fus = self._pair(square)
        x = jax.random.uniform(jax.random.PRNGKey(4), (3, 64, 64, 3))
        u = jax.random.normal(jax.random.PRNGKey(5), (3, 64, 64, 3))
        g_ref = np.asarray(jax.grad(lambda v: jnp.sum(ref(v) * u))(x))
        g_fus = np.asarray(jax.grad(lambda v: jnp.sum(fus(v) * u))(x))
        np.testing.assert_allclose(g_fus, g_ref, rtol=1e-4, atol=1e-5)

    def test_bf16_runs_and_tracks_f32(self):
        """bf16: the hard edge threshold can flip on 1-ulp rounding
        differences between the two op orders (decision-boundary-adjacent
        pixels only) — assert the flip rate is tiny and everything else
        matches elementwise."""
        ref, fus = self._pair(True)
        x = jax.random.uniform(jax.random.PRNGKey(6), (2, 64, 64, 3))
        a = np.asarray(fus(x.astype(jnp.bfloat16)).astype(jnp.float32))
        b = np.asarray(ref(x.astype(jnp.bfloat16)).astype(jnp.float32))
        close = np.abs(a - b) <= 2e-2
        assert np.mean(~close) < 0.01, np.mean(~close)
