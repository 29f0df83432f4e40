"""Phase-decomposed stride-2 conv dgrad: exactness vs the native lowering.

ops/phase_dgrad.py replaces only d/dx of a stride-2 convolution (the
input-dilated conv XLA emits at ~half MXU occupancy — docs/PERF.md) with
four dense stride-1 convs over the cotangent, one per output-pixel parity
phase. Forward and weight gradient must be bit-identical to the native op
(they ARE the native op); dx must match to float reassociation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from edge_enhancement_tpu.ops.phase_dgrad import _DN, conv2d_s2


def _native(x, k, pad):
    return lax.conv_general_dilated(x, k, (2, 2), pad,
                                    dimension_numbers=_DN,
                                    preferred_element_type=x.dtype)


CASES = [
    # (H, kh, pad): the R50 strided-bottleneck 3x3, the 1x1 projections,
    # the torchvision 7x7 stem, and a non-square-input sanity case.
    (8, 3, 1),
    (8, 1, 0),
    (12, 7, 3),
    (14, 3, 1),
]


@pytest.mark.parametrize("h,kh,pad", CASES)
def test_phase_dgrad_matches_native(h, kh, pad):
    rng = np.random.RandomState(h * 31 + kh)
    x = jnp.asarray(rng.randn(2, h, h + 2 * (pad > 0) * 0, 5)
                    .astype(np.float32))
    k = jnp.asarray(rng.randn(kh, kh, 5, 7).astype(np.float32))
    P = ((pad, pad), (pad, pad))
    w = jnp.asarray(rng.randn(*_native(x, k, P).shape).astype(np.float32))

    y_ref, y_new = _native(x, k, P), conv2d_s2(x, k, P)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_new))

    dref = jax.grad(lambda a, b: (_native(a, b, P) * w).sum(),
                    argnums=(0, 1))(x, k)
    dnew = jax.grad(lambda a, b: (conv2d_s2(a, b, P) * w).sum(),
                    argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(dref[0]), np.asarray(dnew[0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(dref[1]), np.asarray(dnew[1]))


def test_phase_dgrad_under_jit_and_vmapless_scan():
    """The op must trace cleanly inside jit (attack loops scan over it)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))
    P = ((1, 1), (1, 1))

    @jax.jit
    def pgd_like(x, k):
        def body(xc, _):
            g = jax.grad(lambda a: conv2d_s2(a, k, P).sum())(xc)
            return xc + 0.01 * jnp.sign(g), None
        return lax.scan(body, x, None, length=3)[0]

    out = pgd_like(x, k)

    def native_pgd(x, k):
        xc = x
        for _ in range(3):
            g = jax.grad(lambda a: _native(a, k, P).sum())(xc)
            xc = xc + 0.01 * jnp.sign(g)
        return xc

    np.testing.assert_allclose(np.asarray(out), np.asarray(native_pgd(x, k)),
                               rtol=1e-5, atol=1e-6)
