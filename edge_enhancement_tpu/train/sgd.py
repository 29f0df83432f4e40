"""SGD with momentum + coupled weight decay, bit-matching torch.optim.SGD.

torch semantics (dampening=0, nesterov=False), which every reference driver
uses: g' = g + wd * p; buf = mu * buf + g' (buf starts at g' on the first
step); p = p - lr * buf. Weight decay applies to ALL parameters — including
BN scales/biases — as in the reference. The learning rate is a traced scalar
so per-epoch schedules never trigger recompilation.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def init_momentum(params: Any) -> Any:
    return jax.tree.map(jnp.zeros_like, params)


def sgd_update(params: Any, grads: Any, momentum_buf: Any, *,
               lr: jnp.ndarray, momentum: float, weight_decay: float,
               decay_mask: Any = None) -> tuple[Any, Any]:
    """One SGD step (torch's lazy first-step buffer init buf=g equals
    mu*0 + g with zero-init buffers, so no special case is needed).

    `decay_mask` (optional pytree of 0/1) restricts weight decay to a subset
    of parameters — the fast-AT driver excludes BatchNorm parameters
    (fgsm_imagenet/main_fast.py:107-112).
    """
    if decay_mask is None:
        new_buf = jax.tree.map(
            lambda p, g, b: momentum * b + g + weight_decay * p,
            params, grads, momentum_buf)
    else:
        new_buf = jax.tree.map(
            lambda p, g, b, m: momentum * b + g + weight_decay * m * p,
            params, grads, momentum_buf, decay_mask)
    new_params = jax.tree.map(lambda p, b: p - lr * b, params, new_buf)
    return new_params, new_buf


def batchnorm_decay_mask(params: Any) -> Any:
    """1.0 everywhere except parameters owned by a BatchNorm module."""
    def mask_leaf(path, leaf):
        in_bn = any("BatchNorm" in (getattr(k, "key", str(k))) for k in path)
        return jnp.asarray(0.0 if in_bn else 1.0, leaf.dtype)

    return jax.tree_util.tree_map_with_path(mask_leaf, params)
