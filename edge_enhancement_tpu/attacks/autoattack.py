"""AutoAttack: APGD-CE, APGD-T (targeted DLR), FAB-T, and the Square attack.

The reference evaluates with the external `autoattack` package's 'standard'
suite = APGD-CE + APGD-T + FAB-T + Square
(Tiny_ImageNet/experiments_tinyimagenet.py:435-456, utils/aa.py:42,129-132).
This module provides the full four-member TPU-native equivalent, each attack
implemented from its paper as a static-shape `lax.fori_loop` (per-sample
masking instead of dynamic-shape filtering) so one XLA compile covers any
number of evaluation batches:

* APGD (Croce & Hein 2020, "Reliable evaluation ..."): momentum PGD with the
  published checkpoint schedule and per-sample step halving.
* FAB-T (Croce & Hein 2020, "Minimally distorted adversarial examples with a
  fast adaptive boundary attack"): iterative linearization of the decision
  boundary toward a target class; the L-inf projection onto the
  hyperplane-box intersection is solved by per-sample bisection over the radius
  (monotone feasibility), which is exactly vectorizable — no sorting network.
* Square (Andriushchenko et al. 2020): random-search with the published
  size schedule; one square position/sign per query shared across the batch
  and the still-correct gating, exactly as the official port implements it.

`build_autoattack` compiles the suite once for a given forward_fn/shape;
`run_autoattack` is the one-shot convenience wrapper.
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
    """Checkpoint positions exactly as the official AutoAttack implements
    them (autopgd_base.py: n_iter_2/n_iter_min/size_decr with int()
    truncation, window decayed at each checkpoint) — NOT the paper's
    p_j-ceil formula, which differs by rounding for N != 100. The reference's
    robust numbers come from the official package (utils/aa.py:129-132), so
    the package's arithmetic is the parity target."""
    n2 = max(int(0.22 * num_steps), 1)
    n_min = max(int(0.06 * num_steps), 1)
    decr = max(int(0.03 * num_steps), 1)
    ckpts = []
    k, pos = n2, n2
    while pos <= num_steps:
        ckpts.append(pos)
        k = max(k - decr, n_min)
        pos += k
    return ckpts


def _ce_loss(logits, y, num_classes):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]


def _dlr_untargeted(logits, y):
    """Untargeted DLR loss (APGD-DLR, Croce & Hein 2020 eq. 6):
    -(z_y - max_{i!=y} z_i) / (z_pi1 - z_pi3)."""
    sorted_logits = jnp.sort(logits, axis=-1)
    zy = jnp.take_along_axis(logits, y[:, None], axis=-1)[:, 0]
    one_hot = jax.nn.one_hot(y, logits.shape[-1], dtype=logits.dtype)
    zother = jnp.max(logits - 1e9 * one_hot, axis=-1)
    z1 = sorted_logits[:, -1]
    z3 = (sorted_logits[:, -3] if logits.shape[-1] >= 3
          else sorted_logits[:, 0])
    return -(zy - zother) / (z1 - z3 + 1e-12)


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
         y_target: Optional[jnp.ndarray] = None,
         loss: str = "ce", return_info: bool = False) -> jnp.ndarray:
    """APGD maximising CE or untargeted DLR (loss='ce'|'dlr'), or targeted
    DLR when y_target is given. Returns x_adv.

    The published checkpoint schedule is static, so the step loop is a
    `lax.fori_loop` over precomputed is-checkpoint / interval tables — one
    compiled body regardless of num_steps."""
    eps = cfg.epsilon
    expand = (slice(None),) + (None,) * (x.ndim - 1)

    # static per-step tables: is step+1 a checkpoint, and the interval length
    all_ckpts = _apgd_checkpoints(cfg.num_steps)
    # a checkpoint at position 1 (any num_steps <= 9 gives n_iter_2 == 1) is
    # folded into the pre-loop first-step bookkeeping below; the device loop
    # only sees positions >= 2
    ckpts = [c for c in all_ckpts if c > 1]
    is_ckpt = [False] * (cfg.num_steps + 1)
    interval = [0] * (cfg.num_steps + 1)
    # last=0: the official first window spans the full n_iter_2 steps — its
    # check_oscillation wraps around to loss_steps[-1]==0, comparing the
    # first update's loss against 0 (emulated below by seeding the counter
    # with f1 > 0)
    last = 1 if 1 in all_ckpts else 0
    for c in ckpts:
        if c <= cfg.num_steps:
            is_ckpt[c] = True
            interval[c] = c - last
            last = c
    is_ckpt_t = jnp.asarray(is_ckpt)
    interval_t = jnp.asarray(interval, jnp.float32)

    def loss_fn(xa, k):
        logits = forward_fn(xa, k)
        if y_target is not None:
            per = _dlr_targeted(logits, y, y_target)
        elif loss == "dlr":
            per = _dlr_untargeted(logits, y)
        else:
            per = _ce_loss(logits, y, cfg.num_classes)
        return jnp.sum(per), (per, logits)

    grad_fn = jax.grad(lambda xa, k: loss_fn(xa, k)[0])

    key, k0, k1, k2 = jax.random.split(key, 4)
    t = jax.random.uniform(k0, x.shape, minval=-1.0, maxval=1.0)
    x0 = jnp.clip(x + eps * t, 0.0, 1.0)
    _, (f0, logits0) = loss_fn(x0, k1)
    # official bookkeeping: the latest MISCLASSIFIED iterate is what the
    # attack returns (x_best_adv, autopgd_base.py); the max-loss iterate
    # only steers the search/restarts
    found = jnp.argmax(logits0, axis=-1) != y
    x_adv_found = jnp.where(found[expand], x0, x)

    # first step (official i=0: momentum weight 1.0)
    alpha = jnp.full((x.shape[0],), 2.0 * eps)
    g = grad_fn(x0, k2)
    x1 = jnp.clip(jnp.clip(x0 + alpha[expand] * jnp.sign(g),
                           x - eps, x + eps), 0.0, 1.0)
    key, k = jax.random.split(key)
    _, (f1, logits1) = loss_fn(x1, k)
    mis1 = jnp.argmax(logits1, axis=-1) != y
    x_adv_found = jnp.where(mis1[expand], x1, x_adv_found)
    found = found | mis1

    improved = (f1 > f0)
    x_best = jnp.where(improved[expand], x1, x0)
    f_best = jnp.maximum(f0, f1)

    # counter seed f1 > 0: the official first-window check_oscillation
    # compares loss_steps[0] against the zero-initialized loss_steps[-1]
    # (numpy wrap-around) — an implementation quirk reproduced exactly.
    # halved_last starts all-True, matching the official
    # reduced_last_check init, which disables the no-improvement halving
    # condition (cond2) at the FIRST checkpoint.
    n_incr = (f1 > 0).astype(jnp.int32)
    halved_last = jnp.ones((x.shape[0],), bool)
    f_best_last = f_best
    if 1 in all_ckpts:
        # first checkpoint lands at position 1 (window = 1): apply it here,
        # between the first step and the device loop. cond2 is dead at the
        # first checkpoint (halved_last init all-True), so only the
        # oscillation count decides.
        halve = n_incr.astype(jnp.float32) <= cfg.rho * 1.0
        alpha = jnp.where(halve, alpha / 2.0, alpha)
        x1 = jnp.where(halve[expand], x_best, x1)
        n_incr = jnp.zeros_like(n_incr)
        halved_last = halve

    step_keys = jax.random.split(key, 2 * max(cfg.num_steps, 1)
                                 ).reshape(cfg.num_steps if cfg.num_steps
                                           else 1, 2, -1)

    def body(step, st):
        (x_prev, x_cur, x_best, f_best, alpha, n_incr, f_prev, f_best_last,
         halved_last, found, x_adv_found) = st
        k_g, k_f = step_keys[step, 0], step_keys[step, 1]
        g = grad_fn(x_cur, k_g)
        a = alpha[expand]
        z = jnp.clip(jnp.clip(x_cur + a * jnp.sign(g),
                              x - eps, x + eps), 0.0, 1.0)
        xn = (x_cur + cfg.momentum * (z - x_cur)
              + (1 - cfg.momentum) * (x_cur - x_prev))
        xn = jnp.clip(jnp.clip(xn, x - eps, x + eps), 0.0, 1.0)
        _, (f, logits) = loss_fn(xn, k_f)
        mis = jnp.argmax(logits, axis=-1) != y
        x_adv_found = jnp.where(mis[expand], xn, x_adv_found)
        found = found | mis

        # halving counter: SUCCESSIVE loss increases f_i > f_{i-1}
        # (official check_oscillation), not improvements over the best
        n_incr = n_incr + (f > f_prev).astype(jnp.int32)
        improved = f > f_best
        x_best = jnp.where(improved[expand], xn, x_best)
        f_best = jnp.maximum(f, f_best)
        x_prev, x_cur, f_prev = x_cur, xn, f

        def at_ckpt(args):
            (x_prev, x_cur, alpha, n_incr, f_best_last, halved_last) = args
            # official conditions (autopgd_base.py): halve when the window's
            # successive-increase count is <= rho * window, OR when the last
            # checkpoint did NOT halve and the best loss has not improved
            cond1 = (n_incr.astype(jnp.float32)
                     <= cfg.rho * interval_t[step + 1])
            cond2 = (~halved_last) & (f_best_last >= f_best)
            halve = cond1 | cond2
            alpha = jnp.where(halve, alpha / 2.0, alpha)
            # restart the search at the best point; x_prev is NOT reset
            # (official keeps x_adv_old, so the first post-restart momentum
            # term references the pre-restart iterate)
            x_cur = jnp.where(halve[expand], x_best, x_cur)
            return (x_prev, x_cur, alpha, jnp.zeros_like(n_incr),
                    f_best, halve)

        (x_prev, x_cur, alpha, n_incr, f_best_last, halved_last) = \
            jax.lax.cond(is_ckpt_t[step + 1], at_ckpt, lambda a: a,
                         (x_prev, x_cur, alpha, n_incr, f_best_last,
                          halved_last))
        return (x_prev, x_cur, x_best, f_best, alpha, n_incr, f_prev,
                f_best_last, halved_last, found, x_adv_found)

    st = (x0, x1, x_best, f_best, alpha,
          n_incr, f1, f_best_last,
          halved_last, found, x_adv_found)
    st = jax.lax.fori_loop(1, cfg.num_steps, body, st)
    (_, _, x_best, f_best, alpha, _, _, _, _, found, x_adv_found) = st
    # found -> the official return (latest misclassified iterate); otherwise
    # the max-loss iterate (strictly stronger than the official's untouched
    # init fallback — can only lower measured robust accuracy)
    out = jnp.where(found[expand], x_adv_found, x_best)
    if return_info:
        return out, {"alpha": alpha, "f_best": f_best, "found": found,
                     "x_best": x_best}
    return out


# --------------------------------------------------------------------------
# FAB-T
# --------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FABConfig:
    epsilon: float
    num_steps: int = 100
    alpha_max: float = 0.1
    eta: float = 1.05          # overshoot
    beta: float = 0.9          # backward step
    proj_iters: int = 40       # bisection iterations for the L-inf projection


def _proj_linf_box(p: jnp.ndarray, w: jnp.ndarray, c: jnp.ndarray,
                   iters: int) -> jnp.ndarray:
    """min ||z - p||_inf  s.t.  w.z = c,  0 <= z <= 1  (per sample).

    Monotone bisection over the radius r: within radius r the reachable
    box is [max(p-r,0), min(p+r,1)]; the extremal value of w.z over it is
    monotone in r, so the smallest feasible r is found by bisection and the
    optimizer is the clipped signed step. Returns z (falls back to the
    box-extremal point if the hyperplane misses the unit box entirely).

    p, w: (B, D); c: (B,). Independent re-derivation of the FAB projection
    (the official implementation uses a sort-based exact solver; bisection
    to 2^-iters is equivalent at f32 and maps better to the VPU).
    """
    v = jnp.sum(w * p, axis=1) - c                    # >0: need to decrease
    sgn = jnp.where(v >= 0, 1.0, -1.0)                # normalize direction
    w_eff = w * sgn[:, None]
    c_eff = c * sgn                                    # now w_eff.p - c_eff >= 0

    def extremal(r):
        lo = jnp.maximum(p - r[:, None], 0.0)
        hi = jnp.minimum(p + r[:, None], 1.0)
        z = jnp.where(w_eff > 0, lo, hi)              # minimizes w_eff.z
        return jnp.sum(w_eff * z, axis=1)

    feasible_at_1 = extremal(jnp.ones(p.shape[0])) <= c_eff

    def bisect_body(_, bounds):
        lo_r, hi_r = bounds
        mid = 0.5 * (lo_r + hi_r)
        ok = extremal(mid) <= c_eff                   # mid radius reaches plane
        return jnp.where(ok, lo_r, mid), jnp.where(ok, mid, hi_r)

    lo_r, hi_r = jax.lax.fori_loop(
        0, iters, bisect_body,
        (jnp.zeros(p.shape[0]), jnp.ones(p.shape[0])))
    r = hi_r
    lo = jnp.maximum(p - r[:, None], 0.0)
    hi = jnp.minimum(p + r[:, None], 1.0)
    z = jnp.where(w_eff > 0, lo, hi)
    # move each coordinate only as far as needed: scale the step from p
    # toward z so w.z' = c exactly (linear in the un-clipped interior)
    num = jnp.sum(w_eff * p, axis=1) - c_eff
    den = jnp.sum(w_eff * (p - z), axis=1)
    theta = jnp.clip(num / jnp.where(jnp.abs(den) < 1e-12, 1e-12, den), 0.0, 1.0)
    z_exact = p + theta[:, None] * (z - p)
    return jnp.where(feasible_at_1[:, None], z_exact, z)


def fab_targeted(forward_fn: ForwardFn, x: jnp.ndarray, y: jnp.ndarray,
                 y_target: jnp.ndarray, key: jax.Array,
                 cfg: FABConfig) -> jnp.ndarray:
    """FAB-T toward y_target. Returns the best adversarial found (x where
    none was found within epsilon).

    Arithmetic mirrors the official fab_base.py attack_single_run_targeted
    (trajectory-pinned in tests/test_autoattack_fidelity.py): the targeted
    decision function df = z_target - z_y linearized at the current iterate,
    both projections (from the iterate and from the original point), the
    interpolation weight alpha = a1/(a1+a2) with the official 1e-8 floor on
    both radii and the alpha_max cap, the eta overshoot, misclassification
    (argmax != y) as the success test, best-point bookkeeping by strict
    L-inf distance, and the beta backward step applied at adversarial
    iterates. Documented deviations: the L-inf projection solves the same
    hyperplane-box program by bisection instead of the official sort-based
    solver (oracle-tested equal to 2^-proj_iters), and one call runs from
    the clean point only (the official first restart is also rand-start-
    free; eval-level restarts cover the rest)."""
    b = x.shape[0]
    flat = lambda a: a.reshape(b, -1)
    expand = (slice(None),) + (None,) * (x.ndim - 1)

    def decision(xa, k):
        logits = forward_fn(xa, k)
        zy = jnp.take_along_axis(logits, y[:, None], axis=-1)[:, 0]
        zt = jnp.take_along_axis(logits, y_target[:, None], axis=-1)[:, 0]
        return jnp.sum(zy - zt), (zy - zt, logits)    # f < 0: target beats y

    grad_fn = jax.grad(lambda xa, k: decision(xa, k)[0])
    keys = jax.random.split(key, 2 * max(cfg.num_steps, 1)
                            ).reshape(max(cfg.num_steps, 1), 2, -1)

    def body(i, st):
        x_cur, x_best, d_best = st
        k_f, k_g = keys[i, 0], keys[i, 1]
        _, (f, _) = decision(x_cur, k_f)
        g = grad_fn(x_cur, k_g)
        gf = flat(g)
        # hyperplane f + g.(z - x_cur) = 0  ->  g.z = g.x_cur - f
        c = jnp.sum(gf * flat(x_cur), axis=1) - f
        z_cur = _proj_linf_box(flat(x_cur), gf, c, cfg.proj_iters)
        z_orig = _proj_linf_box(flat(x), gf, c, cfg.proj_iters)
        # official a0 = max(|d|, 1e-8) on BOTH radii before the blend
        d_cur = jnp.maximum(jnp.max(jnp.abs(z_cur - flat(x_cur)), axis=1),
                            1e-8)
        d_orig = jnp.maximum(jnp.max(jnp.abs(z_orig - flat(x)), axis=1),
                             1e-8)
        alpha = jnp.clip(d_cur / (d_cur + d_orig), 0.0, cfg.alpha_max)
        step_cur = flat(x_cur) + cfg.eta * (z_cur - flat(x_cur))
        step_orig = flat(x) + cfg.eta * (z_orig - flat(x))
        xn = ((1.0 - alpha)[:, None] * step_cur + alpha[:, None] * step_orig)
        xn = jnp.clip(xn.reshape(x.shape), 0.0, 1.0)

        # bookkeeping on the new point, then backward step where adversarial
        # (official is_adv: MISCLASSIFIED, not necessarily argmax==target)
        _, (_, logits_new) = decision(xn, keys[i, 0])
        adv = jnp.argmax(logits_new, axis=-1) != y
        dist = jnp.max(jnp.abs(flat(xn) - flat(x)), axis=1)
        better = adv & (dist < d_best)
        x_best = jnp.where(better[expand], xn, x_best)
        d_best = jnp.where(better, dist, d_best)
        xn = jnp.where(adv[expand],
                       jnp.clip((1.0 - cfg.beta) * x + cfg.beta * xn, 0.0, 1.0),
                       xn)
        return xn, x_best, d_best

    x_best0 = x
    d_best0 = jnp.full((b,), jnp.inf)
    x_cur, x_best, d_best = jax.lax.fori_loop(
        0, cfg.num_steps, body, (x, x_best0, d_best0))
    ok = d_best <= cfg.epsilon
    return jnp.where(ok[expand], x_best, x)


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
    """L-inf Square attack, the official AutoAttack port's arithmetic
    (square.py, trajectory-pinned in tests/test_autoattack_fidelity.py):
    per-sample stripe init counts as the first query; each of the remaining
    n_queries-1 iterations draws ONE square position and ONE per-channel
    sign vector shared across the batch, applies it to the current best
    point, projects into the eps-ball around x and [0,1], and accepts
    per-sample on a strict margin-loss decrease — only for samples still
    correctly classified (the official idx_to_fool gate). The published
    size schedule is static, so the query loop is a fori_loop over a
    precomputed size table — one compiled body for any n_queries.

    Documented deviation: the official resamples a candidate square until
    it changes at least one element of the current iterate; the static-
    shape loop takes the first draw (a rare wasted query, never a wrong
    update)."""
    b, h, w, c = x.shape
    eps = cfg.epsilon
    n_feat = c * h * w

    key, k0, k1 = jax.random.split(key, 3)
    stripes = jnp.sign(jax.random.uniform(k0, (b, 1, w, c)) * 2 - 1)
    x_best = jnp.clip(x + eps * stripes, 0.0, 1.0)
    loss_best = _margin_loss(forward_fn(x_best, k1), y)

    rows = jnp.arange(h)
    cols = jnp.arange(w)
    # official: the stripe init is query 1; the loop runs n_queries-1 times
    # (n_queries=1 therefore runs ONLY the stripe init, zero loop queries)
    n_iter = max(cfg.n_queries - 1, 0)
    if n_iter == 0:
        return x_best
    s_table = jnp.asarray(
        [min(max(int(round(math.sqrt(_square_p(it, cfg.n_queries, cfg.p_init)
                                     * n_feat / c))), 1), h - 1, w - 1)
         for it in range(n_iter)], jnp.int32)
    keys = jax.random.split(key, 4 * n_iter).reshape(n_iter, 4, -1)

    def body(it, st):
        x_best, loss_best = st
        s = s_table[it]
        kr, kc, ks, kf = keys[it, 0], keys[it, 1], keys[it, 2], keys[it, 3]
        # official random_int: one position for the whole batch this query
        vh = jax.random.randint(kr, (), 0, h - s)
        vw = jax.random.randint(kc, (), 0, w - s)
        # official random_choice([c, 1, 1]): one sign per channel, shared
        sgn = jnp.sign(jax.random.uniform(ks, (1, 1, 1, c)) * 2 - 1)

        rmask = (rows >= vh) & (rows < vh + s)
        cmask = (cols >= vw) & (cols < vw + s)
        mask = (rmask[:, None] & cmask[None, :]).astype(x.dtype)[None, :, :, None]

        cand = x_best + 2.0 * eps * sgn * mask
        cand = jnp.clip(jnp.clip(cand, x - eps, x + eps), 0.0, 1.0)
        loss_cand = _margin_loss(forward_fn(cand, kf), y)
        # official idx_to_fool: misclassified samples are not queried again
        accept = (loss_cand < loss_best) & (loss_best > 0.0)
        x_best = jnp.where(accept[:, None, None, None], cand, x_best)
        loss_best = jnp.where(accept, loss_cand, loss_best)
        return x_best, loss_best

    x_best, _ = jax.lax.fori_loop(0, n_iter, body, (x_best, loss_best))
    return x_best


# --------------------------------------------------------------------------
# Suite
# --------------------------------------------------------------------------

STANDARD_ATTACKS = ("apgd-ce", "apgd-t", "fab-t", "square")


def build_autoattack(forward_fn: ForwardFn, *, epsilon: float,
                     num_classes: int, apgd_steps: int = 100,
                     fab_steps: int = 100, square_queries: int = 1000,
                     n_target_classes: int = 9,
                     attacks_to_run=STANDARD_ATTACKS) -> Callable:
    """Returns a jitted suite fn(x, y, key) -> x_adv. Each attack compiles
    once per input shape; successive eval batches reuse the executables.

    n_target_classes=9 matches AutoAttack 'standard' (both APGD-T and FAB-T
    iterate the top-9 wrong classes, utils/aa.py 'standard' suite)."""
    n_tc = max(1, min(n_target_classes, num_classes - 1))

    apgd_cfg = APGDConfig(epsilon, apgd_steps, num_classes)
    fab_cfg = FABConfig(epsilon, fab_steps)
    sq_cfg = SquareConfig(epsilon, square_queries, num_classes=num_classes)

    j_apgd_ce = jax.jit(lambda x, y, k: apgd(forward_fn, x, y, k, apgd_cfg))
    j_apgd_dlr = jax.jit(lambda x, y, k: apgd(forward_fn, x, y, k, apgd_cfg,
                                              loss="dlr"))
    j_apgd_t = jax.jit(lambda x, y, yt, k: apgd(forward_fn, x, y, k, apgd_cfg,
                                                y_target=yt))
    j_fab_t = jax.jit(lambda x, y, yt, k: fab_targeted(forward_fn, x, y, yt,
                                                       k, fab_cfg))
    j_square = jax.jit(lambda x, y, k: square_attack(forward_fn, x, y, k,
                                                     sq_cfg))
    j_pred = jax.jit(lambda x, k: jnp.argmax(forward_fn(x, k), axis=-1))
    j_order = jax.jit(lambda x, k: jnp.argsort(forward_fn(x, k), axis=-1))

    def suite(x, y, key):
        expand = (slice(None),) + (None,) * (x.ndim - 1)
        key, k = jax.random.split(key)
        x_adv = x
        still_ok = j_pred(x, k) == y

        def merge(x_adv, cand, still_ok, k):
            newly_broken = (j_pred(cand, k) != y) & still_ok
            x_adv = jnp.where(newly_broken[expand], cand, x_adv)
            return x_adv, still_ok & ~newly_broken

        if "apgd-ce" in attacks_to_run:
            key, k1, k2 = jax.random.split(key, 3)
            x_adv, still_ok = merge(x_adv, j_apgd_ce(x, y, k1), still_ok, k2)

        # 'individual'-mode extra (official AutoAttack apgd-dlr; not in the
        # standard suite)
        if "apgd-dlr" in attacks_to_run:
            key, k1, k2 = jax.random.split(key, 3)
            x_adv, still_ok = merge(x_adv, j_apgd_dlr(x, y, k1), still_ok, k2)

        if "apgd-t" in attacks_to_run or "fab-t" in attacks_to_run:
            key, k0 = jax.random.split(key)
            order = j_order(x, k0)

        if "apgd-t" in attacks_to_run:
            for t in range(2, 2 + n_tc):
                key, k1, k2 = jax.random.split(key, 3)
                cand = j_apgd_t(x, y, order[:, -t], k1)
                x_adv, still_ok = merge(x_adv, cand, still_ok, k2)

        if "fab-t" in attacks_to_run:
            for t in range(2, 2 + n_tc):
                key, k1, k2 = jax.random.split(key, 3)
                cand = j_fab_t(x, y, order[:, -t], k1)
                x_adv, still_ok = merge(x_adv, cand, still_ok, k2)

        if "square" in attacks_to_run:
            key, k1, k2 = jax.random.split(key, 3)
            x_adv, still_ok = merge(x_adv, j_square(x, y, k1), still_ok, k2)
        return x_adv

    return suite


def run_autoattack(forward_fn: ForwardFn, x: jnp.ndarray, y: jnp.ndarray,
                   key: jax.Array, *, epsilon: float, num_classes: int,
                   apgd_steps: int = 100, square_queries: int = 1000,
                   n_target_classes: int = 9,
                   attacks_to_run=STANDARD_ATTACKS) -> jnp.ndarray:
    """One-shot suite run (see build_autoattack for the compiled version).
    Returns x_adv; robust accuracy = acc(forward(x_adv), y)."""
    suite = build_autoattack(
        forward_fn, epsilon=epsilon, num_classes=num_classes,
        apgd_steps=apgd_steps, square_queries=square_queries,
        n_target_classes=n_target_classes, attacks_to_run=attacks_to_run)
    return suite(x, y, key)
