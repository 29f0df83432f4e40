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
               lr: jnp.ndarray, momentum: float, weight_decay: float
               ) -> tuple[Any, Any]:
    """One SGD step (torch's lazy first-step buffer init buf=g equals
    mu*0 + g with zero-init buffers, so no special case is needed)."""
    new_buf = jax.tree.map(
        lambda p, g, b: momentum * b + g + weight_decay * p,
        params, grads, momentum_buf)
    new_params = jax.tree.map(lambda p, b: p - lr * b, params, new_buf)
    return new_params, new_buf
