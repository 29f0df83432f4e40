"""Max pooling with torch's exact backward semantics (first-max wins).

The reference backbones all use nn.MaxPool2d(3, stride=2, padding=1)
(e.g. Tiny_ImageNet/models_tinyimagenet/resnet_EE_square.py:152), whose
backward routes each window's gradient to the FIRST maximal element in
row-major window order (torch keeps the forward argmax). Ties are COMMON
here: the edge-enhancement front-end saturates whole regions at exactly 1.0
(clamp of hfs + binary edge map), so pooled windows over plateaus tie almost
everywhere — the tie rule is part of trajectory parity with the reference.

XLA's select-and-scatter (the reduce_window_max transpose) uses a GE select
scanned in row-major window order, which picks the first max too — verified
bit-exact against torch on tie-heavy inputs (tests/test_ops.py) — AND it is
the fast path on TPU (the hand-written 9-pass backward below measured
+27 ms/step on the bs512 attack loop: the custom_vjp boundary blocks XLA's
fusion of the pool into the surrounding step). So the default export is the
plain XLA pool; `max_pool_3x3_s2_firstmax` is the explicit-semantics oracle
the test suite checks both torch and XLA against.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_WIN, _STRIDE, _PAD = 3, 2, 1


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-2 pad-1 max pool over NHWC (XLA native; torch-equal
    backward tie routing, see module docstring)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, _WIN, _WIN, 1),
        window_strides=(1, _STRIDE, _STRIDE, 1),
        padding=((0, 0), (_PAD, _PAD), (_PAD, _PAD), (0, 0)))


@jax.custom_vjp
def max_pool_3x3_s2_firstmax(x: jnp.ndarray) -> jnp.ndarray:
    """Same pool with an EXPLICIT first-max backward — the semantics oracle."""
    return max_pool_3x3_s2(x)


def _fwd(x):
    y = max_pool_3x3_s2(x)
    return y, (x, y)


def _bwd(res, g):
    x, y = res
    n, h, w, c = x.shape
    oh, ow = y.shape[1], y.shape[2]
    neg = jnp.asarray(-jnp.inf, x.dtype)
    xp = jnp.pad(x, ((0, 0), (_PAD, _PAD), (_PAD, _PAD), (0, 0)),
                 constant_values=neg)
    hp, wp = h + 2 * _PAD, w + 2 * _PAD

    taken = jnp.zeros(y.shape, bool)
    grad_p = jnp.zeros((n, hp, wp, c), g.dtype)
    for dy in range(_WIN):
        for dx in range(_WIN):          # row-major: torch's argmax scan order
            win = jax.lax.slice(
                xp, (0, dy, dx, 0),
                (n, dy + _STRIDE * (oh - 1) + 1, dx + _STRIDE * (ow - 1) + 1, c),
                (1, _STRIDE, _STRIDE, 1))
            hit = (win == y) & ~taken
            taken = taken | hit
            contrib = jnp.where(hit, g, jnp.zeros_like(g))
            # upsample by the stride (pure reshape/pad), place at (dy, dx)
            up = jnp.zeros((n, oh, _STRIDE, ow, _STRIDE, c), g.dtype)
            up = up.at[:, :, 0, :, 0, :].set(contrib)
            up = up.reshape(n, oh * _STRIDE, ow * _STRIDE, c)
            pad_h = max(hp - oh * _STRIDE - dy, 0)
            pad_w = max(wp - ow * _STRIDE - dx, 0)
            up = jnp.pad(up, ((0, 0), (dy, pad_h), (dx, pad_w), (0, 0)))
            grad_p = grad_p + up[:, :hp, :wp, :]
    return (grad_p[:, _PAD:_PAD + h, _PAD:_PAD + w, :],)


max_pool_3x3_s2_firstmax.defvjp(_fwd, _bwd)
