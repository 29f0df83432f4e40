"""Square-attack-style stochastic input perturbation (defense preprocessing).

Parity target: `Add_Square` (reference utils/core.py:589-655). Semantics:
  1. init: x_best = clamp(x + eps * random_sign per (batch, column, channel))
     — vertical stripes (the sign broadcasts down each column).
  2. for each of n_queries iterations i: pick one square position vh (shared
     by the whole batch, as in the reference where new_deltas is (C,H,H)),
     side s from the decaying p_selection(i) schedule, add 2*eps*sign per
     channel on the square [vh:vh+s, vh:vh+s] (on the diagonal), then project
     into the L-inf eps-ball around x and clamp to [0, 1].

Gradient flows through the clamps/min/max exactly as in the reference (the
attack differentiates through this layer); the random draws are constants
w.r.t. autodiff. `n_queries` and the size schedule are static, so the loop
unrolls at trace time and the dynamic square placement is a broadcasted iota
mask (no dynamic-update-slice, no dynamic shapes).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def p_selection(it: int, p_init: float, n_queries: int, rescale_schedule: bool = False) -> float:
    """Decaying square-size schedule (reference utils/core.py:607-634)."""
    if rescale_schedule:
        it = int(it / n_queries * 10000)
    thresholds = [(8000, 512), (6000, 256), (4000, 128), (2000, 64),
                  (1000, 32), (500, 16), (200, 8), (50, 4), (10, 2)]
    for lo, div in thresholds:
        if it > lo:
            return p_init / div
    return p_init


def _random_sign(key, shape):
    """sign(2*U[0,1) - 1): matches the reference's random_choice distribution
    (utils/core.py:599-601). P(+1) ~ 1/2 (sign(0) -> 0 has measure zero)."""
    return jnp.sign(2.0 * jax.random.uniform(key, shape) - 1.0)


def add_square_draws(key: jax.Array, shape, *, epsilon: float = 0.05,
                     p_init: float = 0.8, n_queries: int = 1,
                     rescale_schedule: bool = False):
    """The EXACT random-draw sequence of `add_square` for n_queries == 1,
    returned as explicit arrays so a fused kernel can consume them:
    (stripes (B,1,W,C), square_mask (H,W), channel_sign (1,1,1,C)).
    Bit-identical to the draws add_square makes internally (same key splits,
    same order), so the fused and unfused paths see the same randomness."""
    if n_queries != 1:
        raise ValueError("draw extraction only supports n_queries == 1")
    b, h, w, c = shape
    key_init, key_loop = jax.random.split(key)
    stripes = _random_sign(key_init, (b, 1, w, c))
    _, key_pos, key_sgn = jax.random.split(key_loop, 3)
    p = p_selection(0, p_init, n_queries, rescale_schedule)
    s = max(int(round(math.sqrt(p * (c * h * h) / c))), 1)
    vh = jnp.floor(jax.random.uniform(key_pos) * (h - s)).astype(jnp.int32)
    rows = jnp.arange(h)
    in_span = (rows >= vh) & (rows < vh + s)
    square_mask = (in_span[:, None] & in_span[None, :]).astype(jnp.float32)
    channel_sign = _random_sign(key_sgn, (1, 1, 1, c))
    return stripes, square_mask, channel_sign


def add_square(x: jnp.ndarray, key: jax.Array, *,
               epsilon: float = 0.05,
               p_init: float = 0.8,
               n_queries: int = 5000,
               rescale_schedule: bool = False) -> jnp.ndarray:
    """Apply the stochastic square perturbation to an NHWC batch.

    The reference assumes square images (H == W == `size`) and uses the same
    coordinate for rows and columns; we keep that behaviour.
    """
    b, h, w, c = x.shape
    key_init, key_loop = jax.random.split(key)

    # Column-stripe init: sign per (batch, 1, column, channel), broadcast over
    # rows. Signs are exact in any float dtype; cast so a bf16 front-end
    # (mixed-precision policy) stays bf16 end-to-end.
    stripes = _random_sign(key_init, (b, 1, w, c)).astype(x.dtype)
    x_best = jnp.clip(x + epsilon * stripes, 0.0, 1.0)

    n_features = c * h * h
    rows = jnp.arange(h)

    for i in range(n_queries):
        key_loop, key_pos, key_sgn = jax.random.split(key_loop, 3)
        p = p_selection(i, p_init, n_queries, rescale_schedule)
        s = max(int(round(math.sqrt(p * n_features / c))), 1)
        # random_int(0, h - s): floor(U[0, h-s)) (utils/core.py:603-605).
        vh = jnp.floor(jax.random.uniform(key_pos) * (h - s)).astype(jnp.int32)
        in_span = (rows >= vh) & (rows < vh + s)
        square_mask = (in_span[:, None] & in_span[None, :]).astype(x.dtype)
        channel_sign = _random_sign(key_sgn, (1, 1, 1, c)).astype(x.dtype)
        delta = 2.0 * epsilon * channel_sign * square_mask[None, :, :, None]
        x_best = x_best + delta
        x_best = jnp.minimum(jnp.maximum(x_best, x - epsilon), x + epsilon)
        x_best = jnp.clip(x_best, 0.0, 1.0)

    return x_best
