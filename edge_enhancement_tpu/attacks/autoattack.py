"""AutoAttack-lite: APGD-CE, APGD-T (targeted DLR), and the Square attack.

The reference evaluates with the external `autoattack` package's 'standard'
suite (Tiny_ImageNet/experiments_tinyimagenet.py:435-456, utils/aa.py). This
module provides a TPU-native evaluation harness with the suite's two
strongest white-box members (APGD on CE / targeted DLR losses, following the
published algorithm of Croce & Hein 2020) and its black-box member (Square
attack, Andriushchenko et al. 2020), all as jit-compatible static loops with
per-sample masking instead of dynamic-shape filtering.

`run_autoattack` composes them the way AutoAttack does: each attack runs on
the samples still classified correctly, and the union of successful
adversarials is accumulated.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

ForwardFn = Callable[[jnp.ndarray, jax.Array], jnp.ndarray]  # x, key -> logits


# --------------------------------------------------------------------------
# APGD
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class APGDConfig:
    epsilon: float
    num_steps: int = 100
    num_classes: int = 10
    rho: float = 0.75          # step-halving success-rate threshold
    momentum: float = 0.75


def _apgd_checkpoints(num_steps: int) -> list[int]:
    """w_j from the APGD paper: p0=0, p1=0.22,
    p_{j+1} = p_j + max(p_j - p_{j-1} - 0.03, 0.06); w_j = ceil(p_j * N)."""
    ps = [0.0, 0.22]
    while ps[-1] < 1.0:
        ps.append(ps[-1] + max(ps[-1] - ps[-2] - 0.03, 0.06))
    return sorted({int(math.ceil(p * num_steps)) for p in ps if p <= 1.0})


def _ce_loss(logits, y, num_classes):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]


def _dlr_targeted(logits, y, y_target):
    """Targeted DLR loss (APGD-T)."""
    sorted_logits = jnp.sort(logits, axis=-1)
    zy = jnp.take_along_axis(logits, y[:, None], axis=-1)[:, 0]
    zt = jnp.take_along_axis(logits, y_target[:, None], axis=-1)[:, 0]
    z1 = sorted_logits[:, -1]
    z3 = sorted_logits[:, -3]
    z4 = sorted_logits[:, -4] if logits.shape[-1] >= 4 else sorted_logits[:, 0]
    return -(zy - zt) / (z1 - 0.5 * z3 - 0.5 * z4 + 1e-12)


def apgd(forward_fn: ForwardFn, x: jnp.ndarray, y: jnp.ndarray,
         key: jax.Array, cfg: APGDConfig,
         y_target: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """APGD maximising CE (untargeted) or targeted DLR. Returns x_adv."""
    eps = cfg.epsilon
    checkpoints = set(_apgd_checkpoints(cfg.num_steps))
    expand = (slice(None),) + (None,) * (x.ndim - 1)

    def loss_fn(xa, k):
        logits = forward_fn(xa, k)
        if y_target is None:
            per = _ce_loss(logits, y, cfg.num_classes)
        else:
            per = _dlr_targeted(logits, y, y_target)
        return jnp.sum(per), per

    grad_fn = jax.grad(lambda xa, k: loss_fn(xa, k)[0])

    key, k0, k1 = jax.random.split(key, 3)
    t = jax.random.uniform(k0, x.shape, minval=-1.0, maxval=1.0)
    x0 = jnp.clip(x + eps * t, 0.0, 1.0)
    _, f0 = loss_fn(x0, k1)

    # first step
    alpha = jnp.full((x.shape[0],), 2.0 * eps)
    key, k = jax.random.split(key)
    g = grad_fn(x0, k)
    x1 = jnp.clip(jnp.clip(x0 + alpha[expand] * jnp.sign(g),
                           x - eps, x + eps), 0.0, 1.0)
    key, k = jax.random.split(key)
    _, f1 = loss_fn(x1, k)

    improved = (f1 > f0)
    x_best = jnp.where(improved[expand], x1, x0)
    f_best = jnp.maximum(f0, f1)

    # loop state
    state = dict(x_prev=x0, x_cur=x1, x_best=x_best, f_best=f_best,
                 alpha=alpha, n_improved=improved.astype(jnp.int32),
                 f_best_last=f_best, alpha_last=alpha, key=key)
    last_ckpt = 1

    for step in range(1, cfg.num_steps):
        key, k_g, k_f = jax.random.split(state["key"], 3)
        g = grad_fn(state["x_cur"], k_g)
        a = state["alpha"][expand]
        z = jnp.clip(jnp.clip(state["x_cur"] + a * jnp.sign(g),
                              x - eps, x + eps), 0.0, 1.0)
        xn = (state["x_cur"] + cfg.momentum * (z - state["x_cur"])
              + (1 - cfg.momentum) * (state["x_cur"] - state["x_prev"]))
        xn = jnp.clip(jnp.clip(xn, x - eps, x + eps), 0.0, 1.0)
        _, f = loss_fn(xn, k_f)

        improved = f > state["f_best"]
        state["n_improved"] = state["n_improved"] + improved.astype(jnp.int32)
        state["x_best"] = jnp.where(improved[expand], xn, state["x_best"])
        state["f_best"] = jnp.maximum(f, state["f_best"])
        state["x_prev"], state["x_cur"], state["key"] = state["x_cur"], xn, key

        if (step + 1) in checkpoints:
            interval = (step + 1) - last_ckpt
            # condition 1: too few improving steps in the interval
            cond1 = state["n_improved"] < cfg.rho * interval
            # condition 2: step size unchanged AND best loss unchanged
            cond2 = ((state["alpha_last"] == state["alpha"])
                     & (state["f_best_last"] >= state["f_best"]))
            halve = cond1 | cond2
            state["alpha"] = jnp.where(halve, state["alpha"] / 2.0, state["alpha"])
            # restart from the best point where halved
            state["x_cur"] = jnp.where(halve[expand], state["x_best"], state["x_cur"])
            state["x_prev"] = jnp.where(halve[expand], state["x_best"], state["x_prev"])
            state["n_improved"] = jnp.zeros_like(state["n_improved"])
            state["f_best_last"] = state["f_best"]
            state["alpha_last"] = state["alpha"]
            last_ckpt = step + 1

    return state["x_best"]


# --------------------------------------------------------------------------
# Square attack
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SquareConfig:
    epsilon: float
    n_queries: int = 1000
    p_init: float = 0.8
    num_classes: int = 10


def _margin_loss(logits, y):
    """z_y - max_{i != y} z_i: negative == misclassified."""
    one_hot = jax.nn.one_hot(y, logits.shape[-1], dtype=logits.dtype)
    zy = jnp.sum(one_hot * logits, axis=-1)
    zother = jnp.max(logits - 1e9 * one_hot, axis=-1)
    return zy - zother


def _square_p(it: int, n_queries: int, p_init: float) -> float:
    it = int(it / n_queries * 10000)
    sched = [(10, 1), (50, 2), (200, 4), (500, 8), (1000, 16), (2000, 32),
             (4000, 64), (6000, 128), (8000, 256), (10001, 512)]
    for bound, div in sched:
        if it <= bound:
            return p_init / div if div > 1 else p_init
    return p_init / 512


def square_attack(forward_fn: ForwardFn, x: jnp.ndarray, y: jnp.ndarray,
                  key: jax.Array, cfg: SquareConfig) -> jnp.ndarray:
    """L-inf Square attack: greedy random square updates accepted when the
    margin loss decreases. Per-sample positions (unlike the Add_Square
    defense layer, which shares one square per batch)."""
    b, h, w, c = x.shape
    eps = cfg.epsilon
    n_feat = c * h * w

    key, k0, k1 = jax.random.split(key, 3)
    stripes = jnp.sign(jax.random.uniform(k0, (b, 1, w, c)) * 2 - 1)
    x_best = jnp.clip(x + eps * stripes, 0.0, 1.0)
    loss_best = _margin_loss(forward_fn(x_best, k1), y)

    rows = jnp.arange(h)
    cols = jnp.arange(w)

    for it in range(cfg.n_queries):
        p = _square_p(it, cfg.n_queries, cfg.p_init)
        s = max(int(round(math.sqrt(p * n_feat / c))), 1)
        s = min(s, h - 1, w - 1)
        key, kr, kc, ks, kf = jax.random.split(key, 5)
        vh = jax.random.randint(kr, (b,), 0, h - s)
        vw = jax.random.randint(kc, (b,), 0, w - s)
        sgn = jnp.sign(jax.random.uniform(ks, (b, 1, 1, c)) * 2 - 1)

        rmask = (rows[None, :] >= vh[:, None]) & (rows[None, :] < (vh + s)[:, None])
        cmask = (cols[None, :] >= vw[:, None]) & (cols[None, :] < (vw + s)[:, None])
        mask = (rmask[:, :, None] & cmask[:, None, :]).astype(x.dtype)[..., None]

        cand = x_best + 2.0 * eps * sgn * mask
        cand = jnp.clip(jnp.clip(cand, x - eps, x + eps), 0.0, 1.0)
        loss_cand = _margin_loss(forward_fn(cand, kf), y)
        accept = loss_cand < loss_best
        x_best = jnp.where(accept[:, None, None, None], cand, x_best)
        loss_best = jnp.minimum(loss_cand, loss_best)

    return x_best


# --------------------------------------------------------------------------
# Suite
# --------------------------------------------------------------------------

def run_autoattack(forward_fn: ForwardFn, x: jnp.ndarray, y: jnp.ndarray,
                   key: jax.Array, *, epsilon: float, num_classes: int,
                   apgd_steps: int = 100, square_queries: int = 1000,
                   n_target_classes: int = 3,
                   attacks_to_run=("apgd-ce", "apgd-t", "square")) -> jnp.ndarray:
    """APGD-CE -> APGD-T -> Square, accumulating successful adversarials.
    Returns x_adv; robust accuracy = acc(forward(x_adv), y).

    `attacks_to_run` selects a subset — the reference's AutoAttack
    'individual'/'custom' versions (utils/aa.py:119-153)."""
    def pred(xa, k):
        return jnp.argmax(forward_fn(xa, k), axis=-1)

    x_adv = x
    key, k = jax.random.split(key)
    still_ok = pred(x_adv, k) == y
    expand = (slice(None),) + (None,) * (x.ndim - 1)

    def merge(x_adv, cand, still_ok, k):
        newly_broken = (pred(cand, k) != y) & still_ok
        x_adv = jnp.where(newly_broken[expand], cand, x_adv)
        return x_adv, still_ok & ~newly_broken

    if "apgd-ce" in attacks_to_run:
        key, k1, k2 = jax.random.split(key, 3)
        cand = apgd(forward_fn, x, y, k1,
                    APGDConfig(epsilon, apgd_steps, num_classes))
        x_adv, still_ok = merge(x_adv, cand, still_ok, k2)

    if "apgd-t" in attacks_to_run:
        # APGD-T over the top-k wrong classes
        for t in range(2, 2 + n_target_classes):
            key, k0, k1, k2 = jax.random.split(key, 4)
            logits = forward_fn(x, k0)
            y_target = jnp.argsort(logits, axis=-1)[:, -t]
            cand = apgd(forward_fn, x, y, k1,
                        APGDConfig(epsilon, apgd_steps, num_classes),
                        y_target=y_target)
            x_adv, still_ok = merge(x_adv, cand, still_ok, k2)

    if "square" in attacks_to_run:
        key, k1, k2 = jax.random.split(key, 3)
        cand = square_attack(forward_fn, x, y, k1,
                             SquareConfig(epsilon, square_queries,
                                          num_classes=num_classes))
        x_adv, still_ok = merge(x_adv, cand, still_ok, k2)
    return x_adv
