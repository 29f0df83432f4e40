"""EE front-end variant coverage: with_gf smoothing, pre_square objectives,
full-canny and BPDA variants inside train steps, w-weighting."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from edge_enhancement_tpu.models.ee_frontend import EEConfig, ee_frontend
from edge_enhancement_tpu.models.registry import build_model
from edge_enhancement_tpu.objectives.methods import MethodConfig
from edge_enhancement_tpu.train.modelops import ModelOps
from edge_enhancement_tpu.train.trainer import (OptimConfig, build_train_step,
                                                create_train_state)


class TestFrontendVariants:
    def test_with_gf_smooths_edges(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 28, 28, 1))
        base = dict(r=4, w=1.0, low=25., high=51., alpha=0.0, sigma=1.0,
                    type_canny="CannyFilter")
        plain = ee_frontend(x, EEConfig(**base, with_gf=False))
        smooth = ee_frontend(x, EEConfig(**base, with_gf=True))
        assert not np.allclose(np.asarray(plain), np.asarray(smooth))
        assert np.isfinite(np.asarray(smooth)).all()

    def test_w_weighting(self):
        x = jax.random.uniform(jax.random.PRNGKey(1), (1, 20, 20, 3))
        base = dict(r=8, low=38., high=76., type_canny="CannyFilter_step125_1")
        w0 = ee_frontend(x, EEConfig(**base, w=0.0))
        w1 = ee_frontend(x, EEConfig(**base, w=1.0))
        from edge_enhancement_tpu.ops import high_freq_suppress
        np.testing.assert_allclose(np.asarray(w0),
                                   np.clip(np.asarray(high_freq_suppress(x, 8)), 0, 1),
                                   atol=1e-6)
        assert not np.allclose(np.asarray(w0), np.asarray(w1))

    def test_output_in_unit_range(self):
        x = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 3))
        out = np.asarray(ee_frontend(x, EEConfig(r=4, w=2.0, low=10., high=20.,
                                                 type_canny="CannyFilter_BPDA")))
        assert out.min() >= 0.0 and out.max() <= 1.0


class TestMethodVariants:
    def _run_step(self, arch, method, **margs):
        args = dict(r=4, w=1.0, gf=False, low=25., high=51., alpha=0.3,
                    sigma=1.0, type_canny="CannyFilter_step125_1",
                    epsilon=0.3, n_queries=1)
        ops = ModelOps(build_model(arch, args, 10))
        x = jax.random.uniform(jax.random.PRNGKey(0), (4, 28, 28, 1))
        y = jnp.arange(4) % 10
        state = create_train_state(ops, jax.random.PRNGKey(1), x[:1])
        mcfg = MethodConfig(method_name=method, epsilon=0.3, num_steps=2,
                            step_size=0.05, num_classes=10, **margs)
        step = build_train_step(ops, mcfg, OptimConfig(0.3, 1e-4))
        _, m = step(state, x, y, jax.random.PRNGKey(2), jnp.float32(0.1))
        assert np.isfinite(float(m["loss"])), (arch, method)

    def test_pre_square_method(self):
        # pre_square: Add_Square applied to the INPUT before the (non-square)
        # EE model (ee_at_bpda3_pre_square config: arch resnet18_EE)
        self._run_step("Net2_EE", "EE_BPDA3_AT_pre_square")

    def test_full_canny_at(self):
        self._run_step("Net2_EE", "EE_AT")

    def test_processing_method_aliases_to_at(self):
        self._run_step("Net2_EE_square", "Processing_EE_AT_square")


class TestU2NetFrontend:
    def test_u2netp_edge_source_trains_under_attack(self):
        """`type_canny: u2netp` (config tiny_imagenet/ee_at_u2netp.yml): the
        learned U2-Net edge extractor replaces Canny inside the EE front-end
        (reference resnet_EE.py:130-131). One PGD-AT train step must (a) run
        the attack THROUGH the U2Net edge path (white-box gradients flow
        into the input via the edge branch) and (b) update the U2Net
        parameters themselves (they are part of the trained model)."""
        args = dict(r=8, w=1.0, gf=False, low=38., high=76., alpha=0.0,
                    sigma=1.0, type_canny="u2netp")
        ops = ModelOps(build_model("resnet18_EE", args, 10))
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
        y = jnp.arange(2) % 10
        state = create_train_state(ops, jax.random.PRNGKey(1), x[:1])
        assert "U2Net_0" in state.params, list(state.params)
        mcfg = MethodConfig(method_name="EE_AT", epsilon=8 / 255, num_steps=1,
                            step_size=2 / 255, num_classes=10)
        step = build_train_step(ops, mcfg, OptimConfig(0.9, 1e-4))
        new_state, m = step(state, x, y, jax.random.PRNGKey(2),
                            jnp.float32(0.1))
        assert np.isfinite(float(m["loss"]))
        # the U2Net edge extractor's weights moved (nonzero gradients)
        before = jax.tree.leaves(state.params["U2Net_0"])
        after = jax.tree.leaves(new_state.params["U2Net_0"])
        moved = sum(float(np.abs(np.asarray(a) - np.asarray(b)).max())
                    for a, b in zip(after, before))
        assert moved > 0.0

        # white-box attack gradient reaches the input through the edge branch
        from edge_enhancement_tpu.train.modelops import cross_entropy

        def atk_loss(xx):
            logits = ops.logits_eval(state.params, state.batch_stats, xx,
                                     jax.random.PRNGKey(3))
            return cross_entropy(logits, y, "sum")

        g = np.asarray(jax.grad(atk_loss)(x))
        assert np.isfinite(g).all()
        assert np.abs(g).max() > 0.0
