"""CW-style margin attack under an L-inf constraint.

Parity target: `CWLinfAttack` (reference utils/attacks.py:136-232): filter
out already-misclassified samples, random start, ascend on
loss = -sum(relu(correct_logit - wrong_logit + 50)) with a fixed step of
0.00392, project to the magnitude ball, [0,1], and the cumulative-eps window
around x - previous_p, and track the cumulative perturbation for
multi-restart use.

The reference gathers the correctly-classified subset into a smaller tensor
(dynamic shapes); under jit we keep the full batch and mask instead — the
loss is summed over active samples only, and final updates are applied only
where the mask is set. Identical semantics, static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

# forward_fn(x, key) -> logits (eval mode: the reference calls model.eval()).
ForwardFn = Callable[[jnp.ndarray, jax.Array], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class CWConfig:
    magnitude: float          # per-call L-inf radius
    max_eps: float            # cumulative L-inf budget
    max_iters: int = 20
    step_size: float = 0.00392  # fixed in the reference (attacks.py:212)
    margin: float = 50.0
    num_classes: int = 10


def cw_linf(forward_fn: ForwardFn, x: jnp.ndarray, y: jnp.ndarray,
            key: jax.Array, cfg: CWConfig,
            previous_p: Optional[jnp.ndarray] = None,
            target: Optional[jnp.ndarray] = None
            ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (x_adv, cumulative perturbation)."""
    key_pred, key_init, key_loop = jax.random.split(key, 3)

    pred = jnp.argmax(forward_fn(x, key_pred), axis=-1)
    active = (pred == y)  # only attack samples the model currently gets right
    expand = (slice(None),) + (None,) * (x.ndim - 1)
    active_b = active[expand]

    one_hot_y = jax.nn.one_hot(y, cfg.num_classes, dtype=x.dtype)

    rand = jax.random.uniform(key_init, x.shape, minval=-cfg.magnitude,
                              maxval=cfg.magnitude)
    adv = jnp.clip(x + rand, 0.0, 1.0)

    if previous_p is not None:
        max_x = x - previous_p + cfg.max_eps
        min_x = x - previous_p - cfg.max_eps
    else:
        max_x = x + cfg.max_eps
        min_x = x - cfg.max_eps

    def margin_loss(adv_imgs, k):
        logits = forward_fn(adv_imgs, k)
        correct = jnp.sum(one_hot_y * logits, axis=1)
        if target is not None:
            one_hot_t = jax.nn.one_hot(target, cfg.num_classes, dtype=x.dtype)
            wrong = jnp.sum(one_hot_t * logits, axis=1)
        else:
            wrong = jnp.max((1.0 - one_hot_y) * logits - 1e4 * one_hot_y, axis=1)
        per_sample = jax.nn.relu(correct - wrong + cfg.margin)
        return -jnp.sum(per_sample * active.astype(x.dtype))

    grad_fn = jax.grad(margin_loss, argnums=0)
    keys = jax.random.split(key_loop, max(cfg.max_iters, 1))

    def body(i, adv_c):
        g = grad_fn(adv_c, keys[i])
        adv_c = adv_c + cfg.step_size * jnp.sign(g)
        adv_c = jnp.maximum(jnp.minimum(adv_c, x + cfg.magnitude), x - cfg.magnitude)
        adv_c = jnp.clip(adv_c, 0.0, 1.0)
        adv_c = jnp.maximum(jnp.minimum(adv_c, max_x), min_x)
        return adv_c

    adv = jax.lax.fori_loop(0, cfg.max_iters, body, adv)
    adv = jnp.clip(adv, 0.0, 1.0)

    now_p = adv - x
    adv_out = jnp.where(active_b, adv, x)
    if previous_p is not None:
        p_out = jnp.where(active_b, previous_p + now_p, previous_p)
    else:
        p_out = jnp.where(active_b, now_p, jnp.zeros_like(now_p))
    return adv_out, p_out
