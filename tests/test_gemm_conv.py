"""Channels-on-contraction Pallas GEMM-conv (ops/pallas/gemm_conv.py):
forward, dgrad, and wgrad must match XLA's native SAME 3x3 conv and its
jax.grad exactly (interpret mode on CPU; tools/bench_gemm_conv.py carries
the on-hardware perf comparison)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edge_enhancement_tpu.ops.pallas.gemm_conv import (conv3x3_cgemm,
                                                       conv_cgemm_nhwc)


def _native(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("shape", [(4, 16, 16, 64, 64), (2, 8, 8, 32, 64),
                                   (3, 16, 16, 64, 128), (2, 7, 9, 16, 32)])
def test_forward_matches_native(shape):
    b, h, w, ci, co = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, h, w, ci)), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.1, jnp.float32)
    got = conv_cgemm_nhwc(x, wk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_native(x, wk)),
                               atol=2e-5, rtol=1e-5)


def test_grads_match_native():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 16, 16, 64)), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.1, jnp.float32)

    def loss_p(x, w):
        return jnp.sum(jnp.tanh(conv3x3_cgemm(x, w)))

    def loss_n(x, w):
        return jnp.sum(jnp.tanh(_native(x, w)))

    gx_p, gw_p = jax.grad(loss_p, argnums=(0, 1))(x, wk)
    gx_n, gw_n = jax.grad(loss_n, argnums=(0, 1))(x, wk)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_n),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_n),
                               atol=3e-4, rtol=1e-4)
