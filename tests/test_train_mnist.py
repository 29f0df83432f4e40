"""End-to-end MNIST slice: every training objective runs a jitted fused
attack+update step, loss decreases under ST, metrics/eval battery work, and
the whole thing shards over the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from edge_enhancement_tpu.data.datasets import SPECS, get_dataset
from edge_enhancement_tpu.models.cnn_mnist import net2, net2_ee, net2_ee_square
from edge_enhancement_tpu.objectives.methods import MethodConfig, canonical_method
from edge_enhancement_tpu.parallel import mesh as meshlib
from edge_enhancement_tpu.train.modelops import ModelOps
from edge_enhancement_tpu.train.trainer import (EvalAttackConfig, OptimConfig,
                                                build_eval_step, build_train_step,
                                                create_train_state)


def make_batch(bs=8, seed=0):
    ds, _ = get_dataset("mnist", None, True, synthetic_size=64)
    x, y = next(ds.batches(bs, shuffle=True, seed=seed))
    return jnp.asarray(x), jnp.asarray(y)


@pytest.fixture(scope="module")
def mnist_state():
    ops = ModelOps(net2())
    x, _ = make_batch()
    state = create_train_state(ops, jax.random.PRNGKey(0), x[:1])
    return ops, state


class TestUint8TransferPath:
    def test_uint8_batch_matches_float_batch(self, mnist_state):
        """as_uint8 batches + on-device conversion produce the same step as
        host-side f32 conversion (the pixels are exactly representable;
        u8*(1/255) vs u8/255 agree to f32 ulp)."""
        ops, state = mnist_state
        ds, _ = get_dataset("mnist", None, True, synthetic_size=64)
        xf, y = next(ds.batches(8, shuffle=False, seed=3))
        xu, yu = next(ds.batches(8, shuffle=False, seed=3, as_uint8=True))
        assert xu.dtype == np.uint8
        np.testing.assert_array_equal(y, yu)
        mcfg = MethodConfig(method_name="AT", epsilon=0.3, num_steps=2,
                            step_size=0.01, num_classes=10)
        step = build_train_step(ops, mcfg, OptimConfig(momentum=0.9))
        k = jax.random.PRNGKey(5)
        s1, m1 = step(state, jnp.asarray(xf), jnp.asarray(y), k,
                      jnp.float32(0.1))
        s2, m2 = step(state, jnp.asarray(xu), jnp.asarray(yu), k,
                      jnp.float32(0.1))
        assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4
        d = max(float(jnp.abs(a - b).max()) for a, b in
                zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)))
        assert d < 1e-5


class TestEvalRestarts:
    def test_restarts_monotone_and_clean_invariant(self, mnist_state):
        """Multi-restart eval PGD (fgsm_imagenet/lib/validation.py:31-57):
        extra restarts keep the first run's output unless a restart flips a
        still-correct prediction — robust accuracy is monotonically
        non-increasing in restarts, clean metrics identical."""
        ops, state = mnist_state
        x, y = make_batch(16, seed=9)
        m_by_r = {}
        for r in (1, 4):
            es = build_eval_step(ops, EvalAttackConfig(
                "PGD", epsilon=0.15, num_steps=3, step_size=0.06,
                random=True, num_classes=10, restarts=r))
            m_by_r[r] = jax.device_get(es(state, x, y, jax.random.PRNGKey(7)))
        assert m_by_r[4]["adv_top1"] <= m_by_r[1]["adv_top1"] + 1e-6
        assert m_by_r[4]["clean_top1"] == m_by_r[1]["clean_top1"]


class TestCanonicalMethod:
    def test_mapping(self):
        assert canonical_method("ST") == "st"
        assert canonical_method("AT") == "at"
        assert canonical_method("EE_AT") == "at"
        assert canonical_method("EE_BPDA3_AT_square") == "at"
        assert canonical_method("EE_BPDA3_AT_pre_square") == "at"
        assert canonical_method("tarAT") == "tar_at"
        assert canonical_method("tarEE_BPDA3_AT_square") == "tar_at"
        assert canonical_method("tarEE_trick") == "tar_at_trick"
        assert canonical_method("tarFD_trick") == "tar_at_trick"
        assert canonical_method("ALP") == "alp"
        assert canonical_method("tarALP") == "tar_alp"
        assert canonical_method("TRADES") == "trades"
        assert canonical_method("AVmixup") == "avmixup"
        assert canonical_method("tarAVmixup") == "tar_avmixup"


class TestTrainSteps:
    @pytest.mark.parametrize("method", ["ST", "AT", "tarAT", "ALP", "TRADES",
                                        "AVmixup", "tarAVmixup", "tarEE_trick"])
    def test_objective_step_runs(self, mnist_state, method):
        ops, state = mnist_state
        mcfg = MethodConfig(method_name=method, epsilon=0.3, num_steps=2,
                            step_size=0.01, num_classes=10, label_smooth=0.1)
        step = build_train_step(ops, mcfg, OptimConfig(momentum=0.9, weight_decay=1e-4))
        x, y = make_batch()
        new_state, metrics = step(state, x, y, jax.random.PRNGKey(1), jnp.float32(0.1))
        assert np.isfinite(float(metrics["loss"]))
        assert 0.0 <= float(metrics["top1"]) <= 100.0
        # params actually moved
        diff = jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda p, q: float(jnp.abs(p - q).sum()),
                         state.params, new_state.params))
        assert diff > 0

    def test_st_loss_decreases(self, mnist_state):
        ops, _ = mnist_state
        x, y = make_batch(bs=16)
        state = create_train_state(ops, jax.random.PRNGKey(2), x[:1])
        mcfg = MethodConfig(method_name="ST", num_classes=10)
        step = build_train_step(ops, mcfg, OptimConfig(momentum=0.9))
        losses = []
        key = jax.random.PRNGKey(3)
        for i in range(20):
            key, k = jax.random.split(key)
            state, m = step(state, x, y, k, jnp.float32(0.05))
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0] * 0.7, losses

    def test_at_increases_robustness_structure(self, mnist_state):
        # The PGD-adv loss on the attack batch must be >= the clean loss
        # (the attack maximises CE).
        ops, state = mnist_state
        x, y = make_batch(bs=16)
        eval_clean = build_eval_step(ops, EvalAttackConfig("none"))
        eval_pgd = build_eval_step(ops, EvalAttackConfig("PGD", epsilon=0.3,
                                                         num_steps=5, step_size=0.1))
        m_c = eval_clean(state, x, y, jax.random.PRNGKey(4))
        m_a = eval_pgd(state, x, y, jax.random.PRNGKey(4))
        assert float(m_a["adv_loss"]) >= float(m_c["clean_loss"]) - 1e-5


class TestEEModels:
    def test_ee_square_step(self):
        ops = ModelOps(net2_ee_square(r=4, low=25., high=51., alpha=0.3,
                                      type_canny="CannyFilter_step125_1",
                                      epsilon=0.3, n_queries=1))
        x, y = make_batch()
        state = create_train_state(ops, jax.random.PRNGKey(5), x[:1])
        mcfg = MethodConfig(method_name="EE_BPDA3_AT_square", epsilon=0.3,
                            num_steps=2, step_size=0.01, num_classes=10)
        step = build_train_step(ops, mcfg, OptimConfig(momentum=0.3, weight_decay=1e-4))
        state, m = step(state, x, y, jax.random.PRNGKey(6), jnp.float32(0.1))
        assert np.isfinite(float(m["loss"]))

    def test_ee_full_canny_model(self):
        ops = ModelOps(net2_ee(r=8, low=60., high=120.))
        x, y = make_batch()
        state = create_train_state(ops, jax.random.PRNGKey(7), x[:1])
        logits = ops.logits_eval(state.params, state.batch_stats, x,
                                 jax.random.PRNGKey(8))
        assert logits.shape == (x.shape[0], 10)
        assert np.isfinite(np.asarray(logits)).all()


class TestEvalBattery:
    @pytest.mark.parametrize("attack", ["PGD", "FGSM", "CW"])
    def test_attacks_stay_in_ball(self, mnist_state, attack):
        ops, state = mnist_state
        x, y = make_batch()
        ev = build_eval_step(ops, EvalAttackConfig(attack, epsilon=0.3,
                                                   num_steps=3, step_size=0.1))
        m = ev(state, x, y, jax.random.PRNGKey(9))
        for k, v in m.items():
            assert np.isfinite(float(v)), (k, v)


class TestEvalProtocol:
    """Reference validate() protocol quirks: targeted batteries for tar*
    methods (experiments_tinyimagenet.py:355-371), Add_Square on validation
    inputs for pre_square methods (:341-352), and the trick-init random gate
    (utils/attacks.py:68-73)."""

    @pytest.mark.parametrize("attack", ["PGD", "FGSM", "CW"])
    def test_targeted_battery_runs(self, mnist_state, attack):
        ops, state = mnist_state
        x, y = make_batch()
        ev = build_eval_step(ops, EvalAttackConfig(
            attack, epsilon=0.3, num_steps=3, step_size=0.1, targeted=True))
        m = ev(state, x, y, jax.random.PRNGKey(20))
        for k, v in m.items():
            assert np.isfinite(float(v)), (k, v)

    def test_targeted_pgd_differs_from_untargeted(self, mnist_state):
        # descent toward a random wrong class vs ascent on the true class
        # must produce different adversarial losses for the same key
        ops, state = mnist_state
        x, y = make_batch(bs=16)
        kwargs = dict(epsilon=0.3, num_steps=3, step_size=0.1)
        m_u = build_eval_step(ops, EvalAttackConfig("PGD", **kwargs))(
            state, x, y, jax.random.PRNGKey(21))
        m_t = build_eval_step(ops, EvalAttackConfig("PGD", targeted=True,
                                                    **kwargs))(
            state, x, y, jax.random.PRNGKey(21))
        assert float(m_u["adv_loss"]) != float(m_t["adv_loss"])

    def test_pre_square_changes_validation_inputs(self, mnist_state):
        ops, state = mnist_state
        x, y = make_batch(bs=16)
        m0 = build_eval_step(ops, EvalAttackConfig("none"))(
            state, x, y, jax.random.PRNGKey(22))
        m1 = build_eval_step(ops, EvalAttackConfig(
            "none", pre_square=True, square_epsilon=0.3))(
            state, x, y, jax.random.PRNGKey(22))
        assert float(m0["clean_loss"]) != float(m1["clean_loss"])

    def test_trick_init_gated_on_random(self):
        from edge_enhancement_tpu.objectives.methods import tar_init_policy
        assert tar_init_policy("tar_at_trick", True) == "trick"
        assert tar_init_policy("tar_at_trick", False) == "none"
        assert tar_init_policy("tar_at", True) == "uniform"
        assert tar_init_policy("tar_at", False) == "none"


class TestChainedStep:
    def test_chained_equals_sequential(self, mnist_state):
        """K steps per dispatch (lax.scan over a batch stack) must produce
        the same state as K sequential single-step dispatches given the same
        per-step keys."""
        from edge_enhancement_tpu.train.trainer import \
            build_chained_train_step
        ops, _ = mnist_state
        x, y = make_batch(bs=24)
        xs = np.stack([np.asarray(x[i * 8:(i + 1) * 8]) for i in range(3)])
        ys = np.stack([np.asarray(y[i * 8:(i + 1) * 8]) for i in range(3)])
        keys = jax.random.split(jax.random.PRNGKey(40), 3)
        mcfg = MethodConfig(method_name="AT", epsilon=0.3, num_steps=2,
                            step_size=0.1, num_classes=10)
        opt = OptimConfig(momentum=0.9, weight_decay=1e-4)

        s1 = create_train_state(ops, jax.random.PRNGKey(41), x[:1])
        step1 = build_train_step(ops, mcfg, opt)
        for i in range(3):
            s1, m1 = step1(s1, jnp.asarray(xs[i]), jnp.asarray(ys[i]),
                           keys[i], jnp.float32(0.1))

        s2 = create_train_state(ops, jax.random.PRNGKey(41), x[:1])
        stepK = build_chained_train_step(ops, mcfg, opt)
        s2, m2 = stepK(s2, jnp.asarray(xs), jnp.asarray(ys), keys,
                       jnp.float32(0.1))

        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-6)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)
        for a, b in zip(jax.tree.leaves(s1.batch_stats),
                        jax.tree.leaves(s2.batch_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


class TestDataParallel:
    def test_step_on_8_device_mesh(self, mnist_state):
        ops, _ = mnist_state
        mesh = meshlib.make_mesh()
        assert mesh.devices.size == 8
        x, y = make_batch(bs=16)
        state = create_train_state(ops, jax.random.PRNGKey(10), x[:1])
        state = meshlib.replicate(mesh, state)
        xb, yb = meshlib.shard_batch(mesh, (np.asarray(x), np.asarray(y)))
        mcfg = MethodConfig(method_name="AT", epsilon=0.3, num_steps=2,
                            step_size=0.01, num_classes=10)
        step = build_train_step(ops, mcfg, OptimConfig(momentum=0.9), mesh=mesh)
        new_state, m = step(state, xb, yb,
                            jax.random.PRNGKey(11), jnp.float32(0.1))
        assert np.isfinite(float(m["loss"]))

    def test_sharded_matches_single_device(self, mnist_state):
        # The sharded ST step must produce numerically close params to the
        # unsharded one (same global batch, deterministic keys; ST avoids
        # attack-loop RNG order effects).
        ops, _ = mnist_state
        x, y = make_batch(bs=16)
        mcfg = MethodConfig(method_name="ST", num_classes=10)

        state1 = create_train_state(ops, jax.random.PRNGKey(12), x[:1])
        step1 = build_train_step(ops, mcfg, OptimConfig(momentum=0.9))
        s1, m1 = step1(state1, x, y, jax.random.PRNGKey(13), jnp.float32(0.1))

        mesh = meshlib.make_mesh()
        state2 = create_train_state(ops, jax.random.PRNGKey(12), x[:1])
        state2 = meshlib.replicate(mesh, state2)
        xb, yb = meshlib.shard_batch(mesh, (np.asarray(x), np.asarray(y)))
        step2 = build_train_step(ops, mcfg, OptimConfig(momentum=0.9), mesh=mesh)
        s2, m2 = step2(state2, xb, yb, jax.random.PRNGKey(13), jnp.float32(0.1))

        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
        l1 = jax.tree.leaves(s1.params)
        l2 = jax.tree.leaves(s2.params)
        for a, b in zip(l1, l2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestTensorParallel:
    def test_dp_tp_mesh_matches_pure_dp(self, mnist_state):
        """2-D (data x model) mesh with column-parallel kernels must produce
        the same numerics as pure DP (GSPMD inserts the collectives)."""
        from edge_enhancement_tpu.parallel import sharding as shardlib
        ops, _ = mnist_state
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        x, y = make_batch(bs=16)
        mcfg = MethodConfig(method_name="ST", num_classes=10)

        mesh_dp = meshlib.make_mesh(n_data=8, n_model=1)
        s_dp = create_train_state(ops, jax.random.PRNGKey(30), x[:1])
        s_dp = meshlib.replicate(mesh_dp, s_dp)
        step_dp = build_train_step(ops, mcfg, OptimConfig(momentum=0.9),
                                   mesh=mesh_dp)
        out_dp, m_dp = step_dp(s_dp, *meshlib.shard_batch(mesh_dp, (np.asarray(x), np.asarray(y))),
                               jax.random.PRNGKey(31), jnp.float32(0.1))

        mesh_tp = meshlib.make_mesh(n_data=4, n_model=2)
        s_tp = create_train_state(ops, jax.random.PRNGKey(30), x[:1])
        s_tp = shardlib.shard_state(mesh_tp, s_tp)
        sh = shardlib.state_shardings(mesh_tp, s_tp)
        step_tp = build_train_step(ops, mcfg, OptimConfig(momentum=0.9),
                                   mesh=mesh_tp, state_sharding=sh)
        out_tp, m_tp = step_tp(s_tp, *meshlib.shard_batch(mesh_tp, (np.asarray(x), np.asarray(y))),
                               jax.random.PRNGKey(31), jnp.float32(0.1))

        np.testing.assert_allclose(float(m_dp["loss"]), float(m_tp["loss"]),
                                   rtol=1e-5)
        for a, b in zip(jax.tree.leaves(out_dp.params), jax.tree.leaves(out_tp.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
        # the dense kernel is actually sharded over 'model'
        dk = out_tp.params["Dense_0"]["kernel"]
        assert "model" in str(dk.sharding.spec)
