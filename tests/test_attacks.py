"""Attack-layer tests: projection invariants, monotone loss increase,
targeted semantics, APGD/Square suite behavior on a toy model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from edge_enhancement_tpu.attacks.autoattack import (APGDConfig, FABConfig,
                                                     SquareConfig,
                                                     _proj_linf_box, apgd,
                                                     build_autoattack,
                                                     fab_targeted,
                                                     run_autoattack,
                                                     square_attack)
from edge_enhancement_tpu.attacks.cw import CWConfig, cw_linf
from edge_enhancement_tpu.attacks.pgd import (PGDConfig, fgsm, pgd_l2,
                                              pgd_linf, random_targets)
from edge_enhancement_tpu.train.modelops import cross_entropy


class Tiny(nn.Module):
    nclass: int = 4

    @nn.compact
    def __call__(self, x, train=False):
        x = x.reshape((x.shape[0], -1))
        return nn.Dense(self.nclass)(x)


@pytest.fixture(scope="module")
def toy():
    model = Tiny()
    x = jax.random.uniform(jax.random.PRNGKey(0), (8, 6, 6, 1))
    y = jnp.arange(8) % 4
    params = model.init(jax.random.PRNGKey(1), x)
    fwd = lambda xx, kk: model.apply(params, xx)
    return fwd, x, y


def loss_closure(fwd, y):
    def loss_fn(x, aux, key):
        return cross_entropy(fwd(x, key), y, "sum"), aux
    return loss_fn


class TestPGD:
    def test_ball_and_range_invariant(self, toy):
        fwd, x, y = toy
        cfg = PGDConfig(epsilon=0.1, num_steps=5, step_size=0.03)
        x_adv, _ = pgd_linf(loss_closure(fwd, y), x, jax.random.PRNGKey(2), cfg)
        d = np.asarray(x_adv - x)
        assert np.abs(d).max() <= 0.1 + 1e-6
        assert float(x_adv.min()) >= 0 and float(x_adv.max()) <= 1

    def test_loss_increases(self, toy):
        fwd, x, y = toy
        cfg = PGDConfig(epsilon=0.2, num_steps=10, step_size=0.05,
                        random_init="none")
        x_adv, _ = pgd_linf(loss_closure(fwd, y), x, jax.random.PRNGKey(3), cfg)
        l0 = float(cross_entropy(fwd(x, None), y, "sum"))
        l1 = float(cross_entropy(fwd(x_adv, None), y, "sum"))
        assert l1 > l0

    def test_targeted_descends(self, toy):
        fwd, x, y = toy
        tgt = random_targets(jax.random.PRNGKey(4), y, 4)
        assert not bool(jnp.any(tgt == y))
        cfg = PGDConfig(epsilon=0.3, num_steps=10, step_size=0.05,
                        random_init="none", ascend=False)
        x_adv, _ = pgd_linf(loss_closure(fwd, tgt), x, jax.random.PRNGKey(5), cfg)
        l0 = float(cross_entropy(fwd(x, None), tgt, "sum"))
        l1 = float(cross_entropy(fwd(x_adv, None), tgt, "sum"))
        assert l1 < l0  # target CE decreases

    def test_l2_ball_invariant(self, toy):
        fwd, x, y = toy
        cfg = PGDConfig(epsilon=0.05, num_steps=5, step_size=0.02,
                        random_init="gaussian")
        x_adv, _ = pgd_l2(loss_closure(fwd, y), x, jax.random.PRNGKey(6), cfg)
        d = np.asarray(x_adv - x).reshape(8, -1)
        norms = np.sqrt((d ** 2).mean(axis=1))  # reference mean-style norm
        assert (norms <= 0.05 + 1e-5).all()

    def test_fgsm_no_projection_but_clamped(self, toy):
        fwd, x, y = toy
        x_adv, _ = fgsm(loss_closure(fwd, y), x, jax.random.PRNGKey(7),
                        step_size=0.3)
        assert float(x_adv.min()) >= 0 and float(x_adv.max()) <= 1


class TestCW:
    def test_ball_invariant_and_p_tracking(self, toy):
        fwd, x, y = toy
        cfg = CWConfig(magnitude=0.1, max_eps=0.1, max_iters=5, num_classes=4)
        x_adv, p = cw_linf(fwd, x, y, jax.random.PRNGKey(8), cfg)
        assert np.abs(np.asarray(x_adv - x)).max() <= 0.1 + 1e-5
        # p is the realised perturbation on attacked samples
        pred = jnp.argmax(fwd(x, None), -1)
        active = np.asarray(pred == y)
        d = np.asarray(x_adv - x)
        np.testing.assert_allclose(np.asarray(p)[active], d[active], atol=1e-6)
        assert (np.asarray(p)[~active] == 0).all()


class TestAPGD:
    def test_ball_invariant_and_stronger_than_clean(self, toy):
        fwd, x, y = toy
        cfg = APGDConfig(epsilon=0.15, num_steps=20, num_classes=4)
        x_adv = apgd(fwd, x, y, jax.random.PRNGKey(9), cfg)
        assert np.abs(np.asarray(x_adv - x)).max() <= 0.15 + 1e-5
        l0 = float(cross_entropy(fwd(x, None), y, "sum"))
        l1 = float(cross_entropy(fwd(x_adv, None), y, "sum"))
        assert l1 >= l0

    def test_targeted_variant_runs(self, toy):
        fwd, x, y = toy
        tgt = (y + 1) % 4
        cfg = APGDConfig(epsilon=0.15, num_steps=15, num_classes=4)
        x_adv = apgd(fwd, x, y, jax.random.PRNGKey(10), cfg, y_target=tgt)
        assert np.isfinite(np.asarray(x_adv)).all()

    def test_dlr_variant_ball_and_margin(self, toy):
        """apgd-dlr (official 'individual' mode): stays in the ball and
        never worsens the per-sample DLR margin objective it maximises."""
        from edge_enhancement_tpu.attacks.autoattack import _dlr_untargeted
        fwd, x, y = toy
        cfg = APGDConfig(epsilon=0.15, num_steps=20, num_classes=4)
        x_adv = apgd(fwd, x, y, jax.random.PRNGKey(12), cfg, loss="dlr")
        assert np.abs(np.asarray(x_adv - x)).max() <= 0.15 + 1e-5
        d0 = float(jnp.sum(_dlr_untargeted(fwd(x, None), y)))
        d1 = float(jnp.sum(_dlr_untargeted(fwd(x_adv, None), y)))
        assert d1 >= d0 - 1e-5  # best-iterate tracking: never worse overall


class TestSquare:
    def test_ball_invariant_and_margin_never_worse(self, toy):
        fwd, x, y = toy
        cfg = SquareConfig(epsilon=0.2, n_queries=20, num_classes=4)
        x_adv = square_attack(fwd, x, y, jax.random.PRNGKey(11), cfg)
        assert np.abs(np.asarray(x_adv - x)).max() <= 0.2 + 1e-5
        assert float(x_adv.min()) >= 0 and float(x_adv.max()) <= 1


class TestFAB:
    def test_projection_hits_hyperplane_inside_box(self):
        # random hyperplanes: the projection must satisfy w.z = c (to
        # bisection tolerance), stay in [0,1], and not move farther in
        # L-inf than the box-extremal solution
        rng = np.random.default_rng(0)
        p = jnp.asarray(rng.random((16, 32)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)
        # pick c between the min and max of w.z over the box -> feasible
        lo = np.sum(np.where(np.asarray(w) > 0, 0.0, np.asarray(w)), axis=1)
        hi = np.sum(np.where(np.asarray(w) > 0, np.asarray(w), 0.0), axis=1)
        c = jnp.asarray(lo + rng.random(16) * (hi - lo), jnp.float32)
        z = _proj_linf_box(p, w, c, iters=40)
        assert float(z.min()) >= 0.0 and float(z.max()) <= 1.0
        resid = np.asarray(jnp.sum(w * z, axis=1) - c)
        scale = np.abs(np.asarray(w)).sum(axis=1)
        assert (np.abs(resid) <= 1e-3 * scale + 1e-4).all(), resid

    def test_projection_identity_when_on_plane(self):
        p = jnp.full((2, 8), 0.5)
        w = jnp.ones((2, 8))
        c = jnp.full((2,), 4.0)  # w.p == c already
        z = _proj_linf_box(p, w, c, iters=40)
        np.testing.assert_allclose(np.asarray(z), np.asarray(p), atol=1e-5)

    def test_fab_returns_valid_adversarials_or_clean(self, toy):
        fwd, x, y = toy
        tgt = (y + 1) % 4
        cfg = FABConfig(epsilon=0.3, num_steps=20)
        x_adv = fab_targeted(fwd, x, y, tgt, jax.random.PRNGKey(13), cfg)
        d = np.abs(np.asarray(x_adv - x)).reshape(len(x), -1).max(axis=1)
        assert (d <= 0.3 + 1e-5).all()
        assert float(x_adv.min()) >= 0 and float(x_adv.max()) <= 1
        # every sample FAB moved must actually be misclassified (FAB only
        # keeps points that crossed the boundary within epsilon)
        moved = d > 1e-6
        pred = np.asarray(jnp.argmax(fwd(x_adv, None), -1))
        assert (pred[moved] != np.asarray(y)[moved]).all()


class TestSuite:
    def test_robust_acc_monotone(self, toy):
        fwd, x, y = toy
        x_adv = run_autoattack(fwd, x, y, jax.random.PRNGKey(12),
                               epsilon=0.2, num_classes=4, apgd_steps=10,
                               square_queries=10, n_target_classes=1)
        acc_clean = float(jnp.mean((jnp.argmax(fwd(x, None), -1) == y)))
        acc_adv = float(jnp.mean((jnp.argmax(fwd(x_adv, None), -1) == y)))
        assert acc_adv <= acc_clean
        assert np.abs(np.asarray(x_adv - x)).max() <= 0.2 + 1e-5

    def test_standard_suite_with_fab(self, toy):
        fwd, x, y = toy
        suite = build_autoattack(fwd, epsilon=0.25, num_classes=4,
                                 apgd_steps=8, fab_steps=8, square_queries=8,
                                 n_target_classes=2)
        x_adv = suite(x, y, jax.random.PRNGKey(14))
        assert np.abs(np.asarray(x_adv - x)).max() <= 0.25 + 1e-5
        acc_clean = float(jnp.mean((jnp.argmax(fwd(x, None), -1) == y)))
        acc_adv = float(jnp.mean((jnp.argmax(fwd(x_adv, None), -1) == y)))
        assert acc_adv <= acc_clean
        # compiled suite is reusable on a second batch of the same shape
        x2 = jnp.clip(x + 0.01, 0, 1)
        x_adv2 = suite(x2, y, jax.random.PRNGKey(15))
        assert np.abs(np.asarray(x_adv2 - x2)).max() <= 0.25 + 1e-5


class TestRestartPGD:
    def test_linf_restarts_and_ball(self, toy):
        from edge_enhancement_tpu.attacks.restart_pgd import (RestartPGDConfig,
                                                              attack_pgd)
        fwd, x, y = toy
        cfg = RestartPGDConfig(epsilon=0.1, alpha=0.03, attack_iters=5,
                               restarts=2, norm="l_inf")
        d = attack_pgd(fwd, x, y, jax.random.PRNGKey(20), cfg)
        assert np.abs(np.asarray(d)).max() <= 0.1 + 1e-6
        assert float((x + d).min()) >= -1e-6 and float((x + d).max()) <= 1 + 1e-6
        l0 = float(cross_entropy(fwd(x, None), y, "sum"))
        l1 = float(cross_entropy(fwd(x + d, None), y, "sum"))
        assert l1 >= l0 - 1e-5

    def test_l2_ball(self, toy):
        from edge_enhancement_tpu.attacks.restart_pgd import (RestartPGDConfig,
                                                              attack_pgd)
        fwd, x, y = toy
        cfg = RestartPGDConfig(epsilon=0.5, alpha=0.1, attack_iters=5,
                               restarts=1, norm="l_2")
        d = np.asarray(attack_pgd(fwd, x, y, jax.random.PRNGKey(21), cfg))
        norms = np.linalg.norm(d.reshape(len(d), -1), axis=1)
        assert (norms <= 0.5 + 1e-4).all()

    def test_mixup_helpers(self):
        from edge_enhancement_tpu.attacks.restart_pgd import (mixup_criterion,
                                                              mixup_data)
        x = jax.random.uniform(jax.random.PRNGKey(0), (8, 4, 4, 1))
        y = jnp.arange(8) % 4
        mx, ya, yb, lam = mixup_data(x, y, jax.random.PRNGKey(1), alpha=1.0)
        assert mx.shape == x.shape and 0.0 <= float(lam) <= 1.0
        loss = mixup_criterion(lambda p, t: cross_entropy(p, t, "mean"),
                               jax.random.normal(jax.random.PRNGKey(2), (8, 4)),
                               ya, yb, lam)
        assert np.isfinite(float(loss))
