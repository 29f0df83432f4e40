"""Multi-restart PGD with early stopping and mixup support.

Parity target: the AWP drivers' local `attack_pgd` + `mixup_data` /
`mixup_criterion` / `normalize` helpers
(AWP/Cifar100/experiments_cifar100_awp.py:32-116). The reference defines but
does not call this attack in its shipped training path (the driver uses
utils.attacks.PGD); it is provided for full surface parity and for stronger
evaluation.

Semantics: for each restart, init uniformly in the ball (l_inf) or on the
sphere-scaled gaussian (l_2), take `attack_iters` sign/normalised steps with
early stopping (samples already misclassified stop updating), and keep the
delta of the restart with the highest final CE loss per sample.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

ForwardFn = Callable[[jnp.ndarray, jax.Array], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class RestartPGDConfig:
    epsilon: float
    alpha: float                 # step size
    attack_iters: int = 10
    restarts: int = 1
    norm: str = "l_inf"          # l_inf | l_2
    early_stop: bool = True


def _per_sample_ce(logits, y):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]


def _l2_normalize(g):
    flat = g.reshape(g.shape[0], -1)
    n = jnp.linalg.norm(flat, axis=1).reshape(-1, *([1] * (g.ndim - 1)))
    return g / jnp.maximum(n, 1e-10)


def _project_l2(d, eps):
    flat = d.reshape(d.shape[0], -1)
    n = jnp.linalg.norm(flat, axis=1).reshape(-1, *([1] * (d.ndim - 1)))
    factor = jnp.minimum(1.0, eps / jnp.maximum(n, 1e-10))
    return d * factor


def attack_pgd(forward_fn: ForwardFn, x: jnp.ndarray, y: jnp.ndarray,
               key: jax.Array, cfg: RestartPGDConfig) -> jnp.ndarray:
    """Returns the best delta over restarts (reference returns delta,
    the caller forms clamp(x + delta))."""
    expand = (slice(None),) + (None,) * (x.ndim - 1)
    max_delta = jnp.zeros_like(x)
    max_loss = jnp.full((x.shape[0],), -jnp.inf)

    for r in range(cfg.restarts):
        key, k_init, k_loop = jax.random.split(key, 3)
        if cfg.norm == "l_inf":
            delta = jax.random.uniform(k_init, x.shape, minval=-cfg.epsilon,
                                       maxval=cfg.epsilon)
        else:
            delta = _project_l2(jax.random.normal(k_init, x.shape), cfg.epsilon)
        delta = jnp.clip(x + delta, 0.0, 1.0) - x

        def body(_, carry):
            d, k = carry
            k, k_f = jax.random.split(k)
            logits = forward_fn(x + d, k_f)
            correct = (jnp.argmax(logits, -1) == y) if cfg.early_stop else \
                jnp.ones_like(y, bool)
            g = jax.grad(lambda dd, kk: _per_sample_ce(
                forward_fn(x + dd, kk), y).sum())(d, k_f)
            if cfg.norm == "l_inf":
                step = cfg.alpha * jnp.sign(g)
                d_new = jnp.clip(d + step, -cfg.epsilon, cfg.epsilon)
            else:
                d_new = _project_l2(d + cfg.alpha * _l2_normalize(g), cfg.epsilon)
            d_new = jnp.clip(x + d_new, 0.0, 1.0) - x
            d = jnp.where(correct[expand], d_new, d)  # early stop
            return d, k

        delta, _ = jax.lax.fori_loop(0, cfg.attack_iters, body, (delta, k_loop))
        key, k_eval = jax.random.split(key)
        loss = _per_sample_ce(forward_fn(x + delta, k_eval), y)
        better = loss > max_loss
        max_delta = jnp.where(better[expand], delta, max_delta)
        max_loss = jnp.maximum(loss, max_loss)

    return max_delta


def mixup_data(x: jnp.ndarray, y: jnp.ndarray, key: jax.Array,
               alpha: float = 1.0):
    """(mixed_x, y_a, y_b, lam) — reference mixup_data
    (experiments_cifar100_awp.py:46-55); lam ~ Beta(alpha, alpha)."""
    k_lam, k_perm = jax.random.split(key)
    lam = jax.random.beta(k_lam, alpha, alpha) if alpha > 0 else 1.0
    idx = jax.random.permutation(k_perm, x.shape[0])
    mixed = lam * x + (1.0 - lam) * x[idx]
    return mixed, y, y[idx], lam


def mixup_criterion(loss_fn, pred, y_a, y_b, lam):
    """lam * loss(pred, y_a) + (1-lam) * loss(pred, y_b)
    (experiments_cifar100_awp.py:58-60)."""
    return lam * loss_fn(pred, y_a) + (1.0 - lam) * loss_fn(pred, y_b)


CIFAR100_MEAN = (0.5070751592371323, 0.48654887331495095, 0.4409178433670343)
CIFAR100_STD = (0.2673342858792401, 0.2564384629170883, 0.27615047132568404)


def normalize(x: jnp.ndarray,
              mean=CIFAR100_MEAN, std=CIFAR100_STD) -> jnp.ndarray:
    """Channel normalisation helper (experiments_cifar100_awp.py:32-44).
    NOTE: as in the reference, the shipped training paths do NOT normalise
    (pixels stay in [0,1]); provided for parity with the unused helper."""
    mean = jnp.asarray(mean, x.dtype).reshape(1, 1, 1, -1)
    std = jnp.asarray(std, x.dtype).reshape(1, 1, 1, -1)
    return (x - mean) / std
