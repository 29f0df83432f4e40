"""AutoAttack fidelity: pin our native suite to the OFFICIAL package's
arithmetic (the reference's robust numbers come from `autoattack`,
utils/aa.py:129-132 — the package itself is not installable here, so its
algorithms are transcribed as independent numpy oracles/mirrors).

1. APGD checkpoint schedule — golden values of the official iterative
   int()-truncated window decay (autopgd_base.py n_iter_2/size_decr/
   n_iter_min), which differs from the paper's p_j-ceil formula for N!=100.
2. APGD step-halving trajectory — a full numpy mirror of the official
   attack_single_run loop (successive-increase counter, <= rho*k threshold,
   first-window wrap-around quirk, reduced_last_check gating, restart-from-
   best without resetting the momentum reference) run on a fixed linear+CE
   model must reproduce our lax.fori_loop implementation elementwise.
3. FAB L-inf projection — property-tested against an exact sort-based
   breakpoint-walk oracle: the bisection must achieve the exact minimal
   radius, land on the hyperplane, and stay in the box.
4. FAB-T full trajectory — numpy transcription of the official
   attack_single_run_targeted (linearization, both projections, 1e-8
   radius floor, alpha_max blend, eta overshoot, misclassification success
   test, beta backward step, distance bookkeeping), exact on a linear
   model.
5. Square full trajectory — numpy transcription of the official square.py
   port (stripe init as query 1, shared per-query square position +
   channel signs, idx_to_fool gating, strict margin-decrease accept),
   consuming the same jax draws as the implementation; plus size-schedule
   goldens of the int()/round arithmetic.

Known remaining deviations from the official package (documented, all make
our suite equal or stronger): where APGD never misclassifies, we return the
max-loss iterate instead of the untouched init; FAB-T runs from the clean
point only (no random restarts inside one call — eval restarts cover it,
and the official first restart is also rand-start-free); Square takes the
first candidate square instead of resampling until it changes an element
(rare wasted query, never a wrong update); the FAB projection is a
bisection solver oracle-tested equal to the official sort-based one.
"""

import numpy as np
import jax
import jax.numpy as jnp

from edge_enhancement_tpu.attacks.autoattack import (APGDConfig,
                                                     _apgd_checkpoints,
                                                     _proj_linf_box, apgd)


# --------------------------------------------------------------------------
# 1. checkpoint schedule goldens (official arithmetic, worked by hand)
# --------------------------------------------------------------------------

def test_apgd_checkpoint_schedule_official_goldens():
    # N=100: n2=22, decr=3, min=6 -> windows 22,19,16,13,10,7,6,6
    assert _apgd_checkpoints(100) == [22, 41, 57, 70, 80, 87, 93, 99]
    # N=50: n2=11, decr=1, min=3 -> windows 11,10,9,8,7
    assert _apgd_checkpoints(50) == [11, 21, 30, 38, 45]
    # N=20: n2=4, decr=max(int(0.6),1)=1, min=1
    assert _apgd_checkpoints(20) == [4, 7, 9, 10, 11, 12, 13, 14, 15, 16,
                                     17, 18, 19, 20]
    # N=1000: n2=220, decr=30, min=60
    assert _apgd_checkpoints(1000) == [220, 410, 570, 700, 800, 870, 930, 990]


# --------------------------------------------------------------------------
# 2. full-trajectory mirror of the official APGD on a linear+CE model
# --------------------------------------------------------------------------

def _mirror_official_apgd(W, b, xf, y, eps, n_iter, t, rho=0.75, mom=0.75,
                          per_loss=None, grad=None):
    """Official autopgd_base.py attack_single_run, transcribed to numpy for
    a deterministic linear model with (sum-)CE loss (or a supplied
    loss/grad pair): the i-in-range(n_iter) loop, the loss_steps array whose
    zero last row gives the first window's wrap-around comparison,
    counter3/k window decay with int() arithmetic, check_oscillation,
    reduced_last_check initialized ALL-TRUE (disabling the no-improvement
    condition at the first checkpoint), and restart-from-best that keeps
    x_adv_old. Returns the final x_best, f_best, per-sample step sizes, and
    the halve-decision log."""
    B = xf.shape[0]
    y_idx = (np.arange(B), y)

    if per_loss is None:
        def per_loss(z):
            logits = (z @ W + b).astype(np.float32)
            m = logits.max(axis=1, keepdims=True)
            lse = m + np.log(np.exp(logits - m).sum(axis=1, keepdims=True))
            return -(logits - lse)[y_idx]

        def grad(z):
            logits = (z @ W + b).astype(np.float32)
            m = logits.max(axis=1, keepdims=True)
            p = np.exp(logits - m)
            p /= p.sum(axis=1, keepdims=True)
            gl = -p.copy()
            gl[y_idx] += 1.0
            return (-gl @ W.T).astype(np.float32)    # d(sum CE)/dz

    def proj(z):
        return np.clip(np.clip(z, xf - eps, xf + eps), 0.0, 1.0)

    n2 = max(int(0.22 * n_iter), 1)
    n_min = max(int(0.06 * n_iter), 1)
    decr = max(int(0.03 * n_iter), 1)

    x_adv = np.clip(xf + eps * t, 0.0, 1.0).astype(np.float32)
    x_adv_old = x_adv.copy()
    x_best = x_adv.copy()
    loss_best = per_loss(x_adv)
    g = grad(x_adv)
    alpha = np.full(B, 2.0 * eps, np.float32)
    loss_steps = np.zeros((n_iter, B), np.float32)
    reduced_last_check = np.ones(B, bool)
    loss_best_last_check = loss_best.copy()
    k = n2
    counter3 = 0
    halve_log = []
    for i in range(n_iter):
        grad2 = x_adv - x_adv_old
        x_adv_old = x_adv.copy()
        a = mom if i > 0 else 1.0
        z = proj(x_adv + alpha[:, None] * np.sign(g))
        x_adv = proj(x_adv + a * (z - x_adv)
                     + (1 - a) * grad2).astype(np.float32)
        g = grad(x_adv)
        f = per_loss(x_adv)
        loss_steps[i] = f
        imp = f > loss_best
        x_best = np.where(imp[:, None], x_adv, x_best)
        loss_best = np.maximum(f, loss_best)
        counter3 += 1
        if counter3 == k:
            # check_oscillation: numpy negative indexing supplies the
            # first-window wrap-around against the zero last row
            tcount = np.zeros(B)
            for c5 in range(k):
                tcount += loss_steps[i - c5] > loss_steps[i - c5 - 1]
            fl_osc = tcount <= k * rho
            fl_reduce_no_impr = ((~reduced_last_check)
                                 & (loss_best_last_check >= loss_best))
            fl_osc = fl_osc | fl_reduce_no_impr
            reduced_last_check = fl_osc.copy()
            loss_best_last_check = loss_best.copy()
            alpha = np.where(fl_osc, alpha / 2.0, alpha).astype(np.float32)
            x_adv = np.where(fl_osc[:, None], x_best, x_adv)
            # official restores grad_best on restart; with a deterministic
            # forward, recomputing at the (possibly restarted) point is equal
            g = grad(x_adv)
            counter3 = 0
            k = max(k - decr, n_min)
            halve_log.append(fl_osc.copy())
    return x_best, loss_best, alpha, halve_log


def test_apgd_matches_official_mirror_on_linear_model():
    B, D, NC, EPS, N = 6, 12, 5, 0.08, 30
    rng = np.random.default_rng(11)
    W = rng.standard_normal((D, NC)).astype(np.float32)
    b = rng.standard_normal(NC).astype(np.float32)
    x = rng.random((B, 3, 2, 2)).astype(np.float32) * 0.6 + 0.2
    y = rng.integers(0, NC, B).astype(np.int32)

    def fwd(xx, kk):
        return xx.reshape(xx.shape[0], -1) @ jnp.asarray(W) + jnp.asarray(b)

    cfg = APGDConfig(EPS, N, NC)
    key = jax.random.PRNGKey(42)
    out, info = apgd(fwd, jnp.asarray(x), jnp.asarray(y), key, cfg,
                     return_info=True)

    # replicate the implementation's init draw (same key-split sequence)
    key2, k0, k1, k2 = jax.random.split(key, 4)
    t = np.asarray(jax.random.uniform(k0, x.shape, minval=-1.0, maxval=1.0))

    xb_m, fb_m, alpha_m, halve_log = _mirror_official_apgd(
        W, b, x.reshape(B, -1), y, EPS, N, t.reshape(B, -1))

    # trajectory-level agreement: same halving decisions (exact), same step
    # sizes (exact powers of 2eps), same best loss / best point
    np.testing.assert_array_equal(np.asarray(info["alpha"]), alpha_m)
    np.testing.assert_allclose(np.asarray(info["f_best"]), fb_m, rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(info["x_best"]).reshape(B, -1), xb_m, atol=2e-5)
    # the schedule actually exercised halving on this instance
    assert any(h.any() for h in halve_log)
    assert len(halve_log) == len(_apgd_checkpoints(N))


def test_apgd_targeted_dlr_matches_official_mirror():
    """Same control-flow mirror, targeted-DLR loss (APGD-T — the attack
    behind most of the suite's robust-accuracy signal). The loss/grad
    primitives are shared with the implementation (they're formula-tested
    elsewhere); what this pins is the scheduling around them."""
    from edge_enhancement_tpu.attacks.autoattack import _dlr_targeted

    B, D, NC, EPS, N = 6, 12, 6, 0.08, 25
    rng = np.random.default_rng(23)
    W = rng.standard_normal((D, NC)).astype(np.float32)
    b = rng.standard_normal(NC).astype(np.float32)
    x = rng.random((B, 3, 2, 2)).astype(np.float32) * 0.6 + 0.2
    y = rng.integers(0, NC, B).astype(np.int32)
    yt = ((y + 1 + rng.integers(0, NC - 1, B)) % NC).astype(np.int32)

    def fwd(xx, kk):
        return xx.reshape(xx.shape[0], -1) @ jnp.asarray(W) + jnp.asarray(b)

    cfg = APGDConfig(EPS, N, NC)
    key = jax.random.PRNGKey(5)
    out, info = apgd(fwd, jnp.asarray(x), jnp.asarray(y), key, cfg,
                     y_target=jnp.asarray(yt), return_info=True)
    key2, k0, k1, k2 = jax.random.split(key, 4)
    t = np.asarray(jax.random.uniform(k0, x.shape, minval=-1.0, maxval=1.0))

    def per_loss(z):
        logits = jnp.asarray(z.reshape(B, -1) @ W + b)
        return np.asarray(_dlr_targeted(logits, jnp.asarray(y),
                                        jnp.asarray(yt)))

    grad_j = jax.jit(jax.grad(lambda z: jnp.sum(_dlr_targeted(
        z @ jnp.asarray(W) + jnp.asarray(b), jnp.asarray(y),
        jnp.asarray(yt)))))

    def grad(z):
        return np.asarray(grad_j(jnp.asarray(z)))

    xb_m, fb_m, alpha_m, halve_log = _mirror_official_apgd(
        W, b, x.reshape(B, -1), y, EPS, N, t.reshape(B, -1),
        per_loss=per_loss, grad=grad)
    np.testing.assert_array_equal(np.asarray(info["alpha"]), alpha_m)
    np.testing.assert_allclose(np.asarray(info["f_best"]), fb_m, rtol=2e-5,
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(info["x_best"]).reshape(B, -1), xb_m, atol=2e-5)
    assert len(halve_log) == len(_apgd_checkpoints(N))


def test_apgd_small_niter_checkpoints_every_step():
    """num_steps <= 9 makes n_iter_2 == 1, so the official schedule
    checkpoints at EVERY iteration (window 1) including position 1 — which
    our implementation folds into the pre-loop first-step bookkeeping.
    Untargeted DLR is negative for still-correctly-classified samples, so
    the first window's f1 <= 0 halving actually fires here."""
    from edge_enhancement_tpu.attacks.autoattack import _dlr_untargeted

    assert _apgd_checkpoints(8) == [1, 2, 3, 4, 5, 6, 7, 8]

    B, D, NC, EPS, N = 8, 10, 5, 0.1, 8
    rng = np.random.default_rng(0)
    W = rng.standard_normal((D, NC)).astype(np.float32)
    b = rng.standard_normal(NC).astype(np.float32)
    x = rng.random((B, 10)).astype(np.float32) * 0.6 + 0.2
    y = rng.integers(0, NC, B).astype(np.int32)

    def fwd(xx, kk):
        return xx.reshape(xx.shape[0], -1) @ jnp.asarray(W) + jnp.asarray(b)

    cfg = APGDConfig(EPS, N, NC)
    key = jax.random.PRNGKey(0)
    out, info = apgd(fwd, jnp.asarray(x), jnp.asarray(y), key, cfg,
                     loss="dlr", return_info=True)
    key2, k0, k1, k2 = jax.random.split(key, 4)
    t = np.asarray(jax.random.uniform(k0, x.shape, minval=-1.0, maxval=1.0))

    def per_loss(z):
        logits = jnp.asarray(z @ W + b)
        return np.asarray(_dlr_untargeted(logits, jnp.asarray(y)))

    grad_j = jax.jit(jax.grad(lambda z: jnp.sum(_dlr_untargeted(
        z @ jnp.asarray(W) + jnp.asarray(b), jnp.asarray(y)))))

    def grad(z):
        return np.asarray(grad_j(jnp.asarray(z)))

    xb_m, fb_m, alpha_m, halve_log = _mirror_official_apgd(
        W, b, x, y, EPS, N, t, per_loss=per_loss, grad=grad)
    np.testing.assert_array_equal(np.asarray(info["alpha"]), alpha_m)
    np.testing.assert_allclose(np.asarray(info["f_best"]), fb_m, rtol=2e-5,
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(info["x_best"]).reshape(B, -1), xb_m, atol=2e-5)
    assert len(halve_log) == N
    # the position-1 checkpoint made a non-trivial decision on this instance
    assert halve_log[0].any() and not halve_log[0].all()


# --------------------------------------------------------------------------
# 3. FAB L-inf projection vs an exact sort-based oracle
# --------------------------------------------------------------------------

def _exact_min_radius(p, w, c):
    """Exact minimal r such that the hyperplane w.z = c intersects
    [max(p-r,0), min(p+r,1)]: phi(r) = min_{z in box(r)} w_eff.z is
    piecewise linear and non-increasing in r; walk its breakpoints
    ({p_i : w_i>0} u {1-p_i : w_i<0}, sorted) and solve the segment.
    Returns (r, feasible)."""
    v = float(w @ p - c)
    s = 1.0 if v >= 0 else -1.0
    w = w * s
    c = c * s

    def phi(r):
        lo = np.maximum(p - r, 0.0)
        hi = np.minimum(p + r, 1.0)
        return float(np.sum(np.where(w > 0, w * lo, w * hi)))

    if phi(1.0) > c:
        return 1.0, False
    bps = sorted(set([0.0] + [float(pi) for pi, wi in zip(p, w) if wi > 0]
                     + [float(1 - pi) for pi, wi in zip(p, w) if wi < 0]
                     + [1.0]))
    for a_r, b_r in zip(bps, bps[1:]):
        fa, fb = phi(a_r), phi(b_r)
        if fa >= c >= fb:
            if fa == fb:
                return a_r, True
            return a_r + (fa - c) / (fa - fb) * (b_r - a_r), True
    return 0.0, True   # already on/below the plane at r=0


def test_fab_projection_matches_exact_oracle():
    rng = np.random.default_rng(0)
    B, D, ITERS = 64, 24, 50
    # f32 inputs (what the attack feeds the projection); the oracle promotes
    # the SAME f32 values to f64 internally
    p = rng.random((B, D)).astype(np.float32)
    w = rng.standard_normal((B, D)).astype(np.float32)
    # mix of easy, hard, and infeasible hyperplanes
    c = (np.sum(w * p, axis=1)
         + rng.standard_normal(B) * np.linalg.norm(w, axis=1) * 0.3)
    c[:8] = np.sum(w[:8] * p[:8], axis=1)            # already on the plane
    c[8:12] -= 100.0                                  # infeasible (too low)
    c = c.astype(np.float32)

    z = np.asarray(_proj_linf_box(jnp.asarray(p), jnp.asarray(w),
                                  jnp.asarray(c), ITERS))
    tol = 2.0 ** -ITERS + 1e-5   # + f32 slack on the feasibility boundary
    for i in range(B):
        r_exact, feasible = _exact_min_radius(p[i], w[i], c[i])
        r_got = np.max(np.abs(z[i] - p[i]))
        assert (z[i] >= -1e-9).all() and (z[i] <= 1 + 1e-9).all(), i
        if feasible:
            # optimal radius achieved...
            assert r_got <= r_exact + tol, (i, r_got, r_exact)
            # ...AND the point actually reaches the hyperplane
            resid = abs(float(w[i] @ z[i] - c[i]))
            assert resid <= 1e-4 * max(1.0, abs(c[i])), (i, resid)
        else:
            # infeasible: falls back to the closest box-extremal value
            v = float(w[i] @ p[i] - c[i])
            s = 1.0 if v >= 0 else -1.0
            best = float(np.sum(np.where(s * w[i] > 0,
                                         s * w[i] * np.zeros(D),
                                         s * w[i] * np.ones(D))))
            assert abs(float(s * w[i] @ z[i]) - best) <= 1e-6, i


def test_fab_projection_zero_radius_when_on_plane():
    rng = np.random.default_rng(1)
    p = rng.random((4, 10))
    w = rng.standard_normal((4, 10))
    c = np.sum(w * p, axis=1)
    z = np.asarray(_proj_linf_box(jnp.asarray(p), jnp.asarray(w),
                                  jnp.asarray(c), 50))
    np.testing.assert_allclose(z, p, atol=1e-6)


# --------------------------------------------------------------------------
# 4. FAB-T full-trajectory mirror of the official fab_base.py targeted loop
# --------------------------------------------------------------------------

def _exact_proj_point(p, w, c):
    """Exact minimal-L-inf projection POINT onto {w.z = c} ∩ [0,1]^D (the
    official projection_linf semantics): minimal radius via the breakpoint
    walk, then the per-coordinate clipped step scaled to land on the plane.
    Falls back to the box-extremal point when infeasible."""
    r, feasible = _exact_min_radius(p, w, c)
    v = float(w @ p - c)
    s = 1.0 if v >= 0 else -1.0
    we, ce = w * s, c * s
    lo = np.maximum(p - r, 0.0)
    hi = np.minimum(p + r, 1.0)
    z = np.where(we > 0, lo, hi)
    if not feasible:
        return z
    num = float(we @ p - ce)
    den = float(we @ (p - z))
    theta = np.clip(num / (den if abs(den) > 1e-12 else 1e-12), 0.0, 1.0)
    return p + theta * (z - p)


def _mirror_official_fab_t(W, b, xf, y, yt, eps, n_iter, alpha_max=0.1,
                           eta=1.05, beta=0.9):
    """Official fab_base.py attack_single_run_targeted transcribed to numpy
    for a linear model (the linearization is then exact): df = z_t - z_y
    hyperplane, both projections, the 1e-8-floored alpha blend capped at
    alpha_max, eta overshoot, clamp, is_adv = misclassified, best-point by
    strict L-inf distance, beta backward step at adversarial iterates, and
    the final <= eps success gate."""
    B = xf.shape[0]
    u = np.arange(B)
    x0 = xf.astype(np.float64)
    x1 = x0.copy()
    adv_best = x0.copy()
    res = np.full(B, np.inf)
    for _ in range(n_iter):
        logits = x1 @ W + b
        f = logits[u, y] - logits[u, yt]              # our f = zy - zt
        g = (W[:, y] - W[:, yt]).T                    # (B, D) = grad f
        cvec = np.sum(g * x1, axis=1) - f
        z1 = np.stack([_exact_proj_point(x1[i], g[i], cvec[i])
                       for i in range(B)])
        z0 = np.stack([_exact_proj_point(x0[i], g[i], cvec[i])
                       for i in range(B)])
        a1 = np.maximum(np.max(np.abs(z1 - x1), axis=1), 1e-8)
        a2 = np.maximum(np.max(np.abs(z0 - x0), axis=1), 1e-8)
        alpha = np.clip(a1 / (a1 + a2), 0.0, alpha_max)
        xn = ((1 - alpha)[:, None] * (x1 + eta * (z1 - x1))
              + alpha[:, None] * (x0 + eta * (z0 - x0)))
        xn = np.clip(xn, 0.0, 1.0)
        adv = (xn @ W + b).argmax(axis=1) != y
        dist = np.max(np.abs(xn - x0), axis=1)
        better = adv & (dist < res)
        adv_best = np.where(better[:, None], xn, adv_best)
        res = np.where(better, dist, res)
        x1 = np.where(adv[:, None],
                      np.clip((1 - beta) * x0 + beta * xn, 0.0, 1.0), xn)
    ok = res <= eps
    return np.where(ok[:, None], adv_best, x0), res


def test_fab_targeted_matches_official_mirror_on_linear_model():
    from edge_enhancement_tpu.attacks.autoattack import FABConfig, fab_targeted

    B, D, NC, EPS, N = 8, 12, 5, 0.25, 12
    rng = np.random.default_rng(2)
    W = rng.standard_normal((D, NC)).astype(np.float32)
    b = rng.standard_normal(NC).astype(np.float32)
    x = (rng.random((B, 3, 2, 2)) * 0.6 + 0.2).astype(np.float32)
    logits0 = x.reshape(B, -1) @ W + b
    y = logits0.argmax(axis=1).astype(np.int32)       # start correct
    yt = ((y + 1 + rng.integers(0, NC - 1, B)) % NC).astype(np.int32)

    def fwd(xx, kk):
        return xx.reshape(xx.shape[0], -1) @ jnp.asarray(W) + jnp.asarray(b)

    cfg = FABConfig(EPS, N, proj_iters=50)
    out = np.asarray(fab_targeted(fwd, jnp.asarray(x), jnp.asarray(y),
                                  jnp.asarray(yt), jax.random.PRNGKey(0),
                                  cfg)).reshape(B, -1)
    want, res = _mirror_official_fab_t(W.astype(np.float64),
                                       b.astype(np.float64),
                                       x.reshape(B, -1), y, yt, EPS, N)
    # the trajectory actually exercised the interesting paths
    assert np.isfinite(res).any()                     # someone found an adv
    assert (res > EPS).any() or np.isinf(res).any() or (res <= EPS).all()
    np.testing.assert_allclose(out, want, atol=2e-4)
    # ball + box invariants on the attack output
    succeeded = np.isfinite(res) & (res <= EPS)
    d = np.abs(out - x.reshape(B, -1)).max(axis=1)
    assert (d[~succeeded] == 0).all()
    assert (d[succeeded] <= EPS + 1e-5).all()


# --------------------------------------------------------------------------
# 5. Square attack full-trajectory mirror of the official square.py port
# --------------------------------------------------------------------------

def test_square_size_schedule_official_goldens():
    """p_selection + square-size arithmetic: the official int()/round chain
    for n_queries=1000, p_init=0.8 on a 32x32x3 input, worked by hand."""
    from edge_enhancement_tpu.attacks.autoattack import _square_p

    n, p = 1000, 0.8
    # it -> scaled it/n*10000: 0->0 (p), 5->50 (p/2), 6->60 (p/4),
    # 20->200 (p/4), 21->210 (p/8), 50->500 (p/8), 51->510 (p/16)
    assert _square_p(0, n, p) == p
    assert _square_p(1, n, p) == p                    # it=10 still <= 10
    assert _square_p(5, n, p) == p / 2
    assert _square_p(20, n, p) == p / 4
    assert _square_p(50, n, p) == p / 8
    assert _square_p(51, n, p) == p / 16
    assert _square_p(999, n, p) == p / 512
    # size: s = min(max(round(sqrt(p * h*w)), 1), h-1) for c-channel square
    import math
    h = w = 32
    s0 = int(round(math.sqrt(0.8 * h * w)))
    assert s0 == 29                                    # sqrt(819.2)=28.62->29


def _mirror_official_square(W, b, x, y, eps, n_queries, p_init, key):
    """Official square.py (AutoAttack port) transcribed to numpy, consuming
    the SAME jax draws as the implementation (stripe init; per-query shared
    position + per-channel sign): stripe init counts as query 1, loop runs
    n_queries-1 times, idx_to_fool gating, strict margin-decrease accept."""
    import math
    B, h, w, c = x.shape
    n_feat = c * h * w
    u = np.arange(B)

    def margin(z):
        logits = z.reshape(B, -1) @ W + b
        zy = logits[u, y]
        lm = logits.copy()
        lm[u, y] = -1e9
        return zy - lm.max(axis=1)

    key, k0, k1 = jax.random.split(jnp.asarray(key), 3)
    stripes = np.sign(np.asarray(
        jax.random.uniform(k0, (B, 1, w, c))) * 2 - 1)
    x_best = np.clip(x + eps * stripes, 0.0, 1.0).astype(np.float32)
    loss_best = margin(x_best)

    from edge_enhancement_tpu.attacks.autoattack import _square_p
    n_iter = max(n_queries - 1, 0)
    keys = jax.random.split(key, 4 * n_iter).reshape(n_iter, 4, -1)
    for it in range(n_iter):
        p = _square_p(it, n_queries, p_init)
        s = min(max(int(round(math.sqrt(p * n_feat / c))), 1), h - 1, w - 1)
        vh = int(jax.random.randint(keys[it, 0], (), 0, h - s))
        vw = int(jax.random.randint(keys[it, 1], (), 0, w - s))
        sgn = np.sign(np.asarray(
            jax.random.uniform(keys[it, 2], (1, 1, 1, c))) * 2 - 1)
        cand = x_best.copy()
        cand[:, vh:vh + s, vw:vw + s, :] = (
            x_best[:, vh:vh + s, vw:vw + s, :] + 2.0 * eps * sgn)
        cand = np.clip(np.clip(cand, x - eps, x + eps), 0.0, 1.0
                       ).astype(np.float32)
        loss_cand = margin(cand)
        accept = (loss_cand < loss_best) & (loss_best > 0.0)
        x_best = np.where(accept[:, None, None, None], cand, x_best)
        loss_best = np.where(accept, loss_cand, loss_best)
    return x_best, loss_best


def test_square_matches_official_mirror_on_linear_model():
    from edge_enhancement_tpu.attacks.autoattack import (SquareConfig,
                                                         square_attack)

    B, h, w, c, NC, EPS, NQ = 6, 8, 8, 4, 5, 0.15, 40
    rng = np.random.default_rng(4)
    W = rng.standard_normal((h * w * c, NC)).astype(np.float32)
    b = rng.standard_normal(NC).astype(np.float32)
    x = (rng.random((B, h, w, c)) * 0.6 + 0.2).astype(np.float32)
    logits0 = x.reshape(B, -1) @ W + b
    y = logits0.argmax(axis=1).astype(np.int32)

    def fwd(xx, kk):
        return xx.reshape(xx.shape[0], -1) @ jnp.asarray(W) + jnp.asarray(b)

    key = jax.random.PRNGKey(3)
    out = np.asarray(square_attack(fwd, jnp.asarray(x), jnp.asarray(y), key,
                                   SquareConfig(EPS, NQ, num_classes=NC)))
    want, loss_best = _mirror_official_square(W, b, x, y, EPS, NQ, 0.8, key)
    np.testing.assert_allclose(out, want, atol=1e-6)
    # the run exercised accepts (trajectory non-trivial)
    assert (np.abs(want - np.clip(x + EPS * np.sign(want - x), 0, 1))
            > 0).any() or (loss_best <= 0).any()
