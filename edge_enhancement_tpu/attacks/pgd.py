"""L-inf / L2 PGD, targeted PGD (+ "trick" init), and FGSM.

Parity targets: reference utils/attacks.py — PGD (:12-29), targeted_PGD
(:33-56), targeted_PGD_trick (:59-86), FGSM (:110-128), the ALP/TRADES inner
attacks (:247-261, :381-418), and the AVmixup perturb loops (:447-518).

Design: one attack engine over a differentiable loss closure

    loss_fn(x, aux, key) -> (scalar loss, new_aux)

where `aux` is an arbitrary pytree threaded through the loop (e.g. BatchNorm
running statistics: the reference runs train-mode BN inside the AT attack, so
running stats update on every attack forward — we reproduce that by carrying
the mutable variable collections through the loop) and `key` supplies
per-step randomness (dropout masks, Add_Square draws), split each iteration
exactly like torch re-draws per forward.

The loop is a `lax.fori_loop`, so attack + train step fuse into one XLA
program; `jax.grad` w.r.t. the input gives the same gradients torch's
`autograd.grad(loss, [x])` does.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

LossFn = Callable[[jnp.ndarray, Any, jax.Array], tuple[jnp.ndarray, Any]]


@dataclasses.dataclass(frozen=True)
class PGDConfig:
    epsilon: float
    num_steps: int
    step_size: float
    # 'none' | 'uniform' (U[-eps,eps], reference PGD random=True)
    # | 'gaussian' (0.001*N(0,1), ALP/TRADES inner init)
    # | 'trick' (uniform with prob 1-prob_start_from_clean, else clean)
    random_init: str = "uniform"
    prob_start_from_clean: float = 0.0
    ascend: bool = True          # False for targeted attacks (gradient descent)
    clip_min: float = 0.0
    clip_max: float = 1.0
    project: bool = True         # FGSM skips the eps-ball projection
    unroll: int = 1              # fori_loop unroll factor (scheduling knob)


def _init_perturbation(cfg: PGDConfig, key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
    if cfg.random_init == "none":
        return x
    if cfg.random_init == "uniform":
        noise = jax.random.uniform(key, x.shape, minval=-cfg.epsilon, maxval=cfg.epsilon)
        return jnp.clip(x + noise, cfg.clip_min, cfg.clip_max)
    if cfg.random_init == "gaussian":
        # ALP/TRADES init: x + 0.001*N(0,1), NOT clamped (attacks.py:250,383).
        return x + 0.001 * jax.random.normal(key, x.shape)
    if cfg.random_init == "trick":
        key_u, key_b = jax.random.split(key)
        noise = jax.random.uniform(key_u, x.shape, minval=-cfg.epsilon, maxval=cfg.epsilon)
        use_noise = (jax.random.uniform(key_b, ()) > cfg.prob_start_from_clean
                     ).astype(x.dtype)
        return jnp.clip(x + use_noise * noise, cfg.clip_min, cfg.clip_max)
    raise ValueError(f"unknown random_init {cfg.random_init!r}")


def pgd_linf(loss_fn: LossFn, x_natural: jnp.ndarray, key: jax.Array,
             cfg: PGDConfig, aux: Any = None) -> tuple[jnp.ndarray, Any]:
    """L-inf PGD. Returns (x_adv, final aux state)."""
    key_init, key_loop = jax.random.split(key)
    x0 = _init_perturbation(cfg, key_init, x_natural)
    sign = 1.0 if cfg.ascend else -1.0
    grad_fn = jax.grad(loss_fn, argnums=0, has_aux=True)
    # pre-split the per-step keys: one batched threefry up front instead of a
    # serialized chain of tiny split ops on the critical path between the
    # big fwd/bwd fusions (measured ~4% of the TPU step)
    keys = jax.random.split(key_loop, max(cfg.num_steps, 1))

    def body(i, carry):
        x, aux_c = carry
        g, aux_c = grad_fn(x, aux_c, keys[i])
        x = x + sign * cfg.step_size * jnp.sign(g)
        if cfg.project:
            x = jnp.minimum(jnp.maximum(x, x_natural - cfg.epsilon),
                            x_natural + cfg.epsilon)
        x = jnp.clip(x, cfg.clip_min, cfg.clip_max)
        return x, aux_c

    if cfg.unroll >= cfg.num_steps:
        # full static unroll: same XLA program as fori_loop(unroll=n) but each
        # iteration is traced individually (distinct trace-time effects, e.g.
        # per-call randomness fakes in the parity tests)
        carry = (x0, aux)
        for i in range(cfg.num_steps):
            carry = body(i, carry)
        x_adv, aux = carry
    else:
        x_adv, aux = jax.lax.fori_loop(0, cfg.num_steps, body, (x0, aux),
                                       unroll=cfg.unroll)
    return x_adv, aux


def _batch_l2_norm(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(mean of squares) per sample — the reference's l2_norm uses mean,
    not sum (utils/attacks.py:360-366)."""
    flat = x.reshape(x.shape[0], -1)
    return jnp.sqrt(jnp.mean(flat ** 2, axis=1))


def pgd_l2(loss_fn: LossFn, x_natural: jnp.ndarray, key: jax.Array,
           cfg: PGDConfig, aux: Any = None) -> tuple[jnp.ndarray, Any]:
    """L2 PGD with mean-normalised gradient steps (reference Trades.PGD_L2,
    utils/attacks.py:381-401)."""
    key_init, key_loop = jax.random.split(key)
    x0 = _init_perturbation(cfg, key_init, x_natural)
    grad_fn = jax.grad(loss_fn, argnums=0, has_aux=True)
    expand = (slice(None),) + (None,) * (x_natural.ndim - 1)
    keys = jax.random.split(key_loop, max(cfg.num_steps, 1))

    def body(i, carry):
        x, aux_c = carry
        g, aux_c = grad_fn(x, aux_c, keys[i])
        g = g / (_batch_l2_norm(g)[expand] + 1e-8)
        x = x + cfg.step_size * g
        delta = x - x_natural
        norm = _batch_l2_norm(delta)
        scale = jnp.where(norm > cfg.epsilon, cfg.epsilon / jnp.maximum(norm, 1e-12), 1.0)
        x = x_natural + delta * scale[expand]
        x = jnp.clip(x, cfg.clip_min, cfg.clip_max)
        return x, aux_c

    x_adv, aux = jax.lax.fori_loop(0, cfg.num_steps, body, (x0, aux))
    return x_adv, aux


def fgsm(loss_fn: LossFn, x_natural: jnp.ndarray, key: jax.Array,
         step_size: float = 0.007, targeted: bool = False,
         aux: Any = None) -> tuple[jnp.ndarray, Any]:
    """One-step sign attack, clamp to [0,1], no ball projection
    (reference FGSM, utils/attacks.py:110-128)."""
    g, aux = jax.grad(loss_fn, argnums=0, has_aux=True)(x_natural, aux, key)
    sign = -1.0 if targeted else 1.0
    x = x_natural + sign * step_size * jnp.sign(g)
    return jnp.clip(x, 0.0, 1.0), aux


def random_targets(key: jax.Array, labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Uniformly random wrong labels: (y + U{1..nclass-1}) mod nclass
    (reference targeted_PGD, utils/attacks.py:38-40)."""
    offset = jax.random.randint(key, labels.shape, 1, num_classes)
    return jnp.mod(labels + offset, num_classes)
