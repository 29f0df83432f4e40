"""Straight-through estimators (custom VJPs) for the Canny thresholding ops.

These reproduce the exact gradient semantics of the reference's autograd
Functions — the robustness numbers depend on attack gradients flowing through
these, so the backward masks must match bit-for-bit:

* `binary_connect` — fwd sign(x) with sign(0) := -1; bwd passes grad where
  |x| <= 1.001 (reference BinaryConnectDeterministic, utils/core.py:121-145).
* `to_compare`    — fwd 1[x > t]; bwd passes grad where x > t and x <= 1.001
  (reference To_compare, utils/core.py:329-358).
* `to_eq`         — fwd 1[x == 0.5]; bwd passes grad where x == 0.5
  (reference To_eq, utils/core.py:361-382).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def safe_sign(x: jnp.ndarray) -> jnp.ndarray:
    """sign(x) with zeros mapped to -1 (reference safeSign, utils/core.py:115)."""
    s = jnp.sign(x)
    return jnp.where(s == 0, -1.0, s).astype(x.dtype)


@jax.custom_vjp
def binary_connect(x):
    return safe_sign(x)


def _bc_fwd(x):
    return safe_sign(x), x


def _bc_bwd(x, g):
    return (jnp.where(jnp.abs(x) > 1.001, 0.0, g),)


binary_connect.defvjp(_bc_fwd, _bc_bwd)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def to_compare(x, threshold: float):
    return (x > threshold).astype(x.dtype)


def _tc_fwd(x, threshold):
    return (x > threshold).astype(x.dtype), x


def _tc_bwd(threshold, x, g):
    keep = (x > threshold) & (x <= 1.001)
    return (jnp.where(keep, g, 0.0),)


to_compare.defvjp(_tc_fwd, _tc_bwd)


@jax.custom_vjp
def to_eq(x):
    return (x == 0.5).astype(x.dtype)


def _te_fwd(x):
    return (x == 0.5).astype(x.dtype), x


def _te_bwd(x, g):
    return (jnp.where(x == 0.5, g, 0.0),)


to_eq.defvjp(_te_fwd, _te_bwd)
