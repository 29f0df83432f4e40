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

Known remaining deviations from the official package (documented, all make
our suite equal or stronger): where APGD never misclassifies, we return the
max-loss iterate instead of the untouched init; FAB-T runs from the clean
point only (no random restarts inside one call — eval restarts cover it).
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
    loss/grad pair). Returns the final x_best, f_best, per-sample step
    sizes, and the halve-decision log."""
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

    ckpts = set(_apgd_checkpoints(n_iter))
    x0 = np.clip(xf + eps * t, 0.0, 1.0).astype(np.float32)
    f0 = per_loss(x0)
    alpha = np.full(B, 2.0 * eps, np.float32)
    x1 = proj(x0 + alpha[:, None] * np.sign(grad(x0))).astype(np.float32)
    f1 = per_loss(x1)
    x_best = np.where((f1 > f0)[:, None], x1, x0)
    f_best = np.maximum(f0, f1)

    # official loss_steps[-1] wrap-around: first window counts ls[0] > 0
    n_incr = (f1 > 0).astype(np.int64)
    halved_last = np.zeros(B, bool)
    f_best_last = f_best.copy()
    x_prev, x_cur, f_prev = x0, x1, f1
    last_ck = 0
    halve_log = []
    for step in range(1, n_iter):
        g = grad(x_cur)
        z = proj(x_cur + alpha[:, None] * np.sign(g))
        xn = proj(x_cur + mom * (z - x_cur) + (1 - mom) * (x_cur - x_prev)
                  ).astype(np.float32)
        f = per_loss(xn)
        n_incr += (f > f_prev)
        imp = f > f_best
        x_best = np.where(imp[:, None], xn, x_best)
        f_best = np.maximum(f, f_best)
        x_prev, x_cur, f_prev = x_cur, xn, f
        if (step + 1) in ckpts:
            k = (step + 1) - last_ck
            cond1 = n_incr <= rho * k
            cond2 = (~halved_last) & (f_best_last >= f_best)
            halve = cond1 | cond2
            alpha = np.where(halve, alpha / 2.0, alpha)
            x_cur = np.where(halve[:, None], x_best, x_cur)
            halved_last = halve
            f_best_last = f_best.copy()
            n_incr = np.zeros(B, np.int64)
            last_ck = step + 1
            halve_log.append(halve.copy())
    return x_best, f_best, alpha, halve_log


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
