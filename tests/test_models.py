"""Model-zoo tests: shapes, init, train/eval forwards, EE composition."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from edge_enhancement_tpu.models.ee_frontend import EEConfig
from edge_enhancement_tpu.models.registry import build_model
from edge_enhancement_tpu.models.resnet import preact_resnet, resnet
from edge_enhancement_tpu.models.u2net import sobel_magnitude, u2net_small
from edge_enhancement_tpu.train.modelops import ModelOps

EE_ARGS = dict(r=8, w=1.0, gf=False, low=38.0, high=76.0, alpha=0.0,
               sigma=1.0, type_canny="CannyFilter_step125_1",
               epsilon=0.0627, n_queries=1)


def run_model(model, shape, train=False):
    ops = ModelOps(model)
    x = jax.random.uniform(jax.random.PRNGKey(0), shape)
    params, bs = ops.init(jax.random.PRNGKey(1), x[:1])
    if train:
        logits, bs = ops.logits_train(params, bs, x, jax.random.PRNGKey(2))
    else:
        logits = ops.logits_eval(params, bs, x, jax.random.PRNGKey(2))
    return np.asarray(logits)


class TestResNets:
    @pytest.mark.parametrize("arch,nclass", [
        ("resnet18", 200), ("resnet50", 200), ("resnet18_EE", 200),
        ("resnet18_EE_square", 200), ("resnet18_fd", 16),
    ])
    def test_forward_shapes(self, arch, nclass):
        model = build_model(arch, EE_ARGS, nclass)
        # fd runs in train mode: its non-local block amplifies activations
        # cubically, so eval-mode-at-init (identity BN) overflows — the
        # reference behaves the same and only ever evals after training.
        out = run_model(model, (2, 32, 32, 3), train=(arch == "resnet18_fd"))
        assert out.shape == (2, nclass)
        assert np.isfinite(out).all()

    def test_bn_stats_update_in_train(self):
        ops = ModelOps(resnet(18, num_classes=10))
        x = jax.random.uniform(jax.random.PRNGKey(0), (4, 32, 32, 3))
        params, bs = ops.init(jax.random.PRNGKey(1), x[:1])
        _, bs2 = ops.logits_train(params, bs, x, jax.random.PRNGKey(2))
        diff = sum(float(jnp.abs(a - b).sum()) for a, b in
                   zip(jax.tree.leaves(bs), jax.tree.leaves(bs2)))
        assert diff > 0

    @pytest.mark.parametrize("arch", ["PreActResNet18", "PreActResNet18_EE",
                                      "PreActResNet18_EE_BPDA",
                                      "PreActResNet18_EE_BPDA_3"])
    def test_preact_variants(self, arch):
        model = build_model(arch, {**EE_ARGS, "dataset": "tiny_imagenet"}, 200)
        out = run_model(model, (2, 32, 32, 3))
        assert out.shape == (2, 200)

    def test_preact_cifar_stem(self):
        model = preact_resnet(18, dataset="CIFAR100")
        out = run_model(model, (2, 32, 32, 3))
        assert out.shape == (2, 100)

    def test_ee_gradient_through_resnet(self):
        ops = ModelOps(build_model("resnet18_EE_square", EE_ARGS, 16))
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
        params, bs = ops.init(jax.random.PRNGKey(1), x[:1])

        def loss(xx):
            return ops.logits_eval(params, bs, xx, jax.random.PRNGKey(2)).sum()

        g = np.asarray(jax.grad(loss)(x))
        assert np.isfinite(g).all() and (g != 0).any()


class TestU2Net:
    def test_u2netp_output(self):
        ops = ModelOps(u2net_small())
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
        params, bs = ops.init(jax.random.PRNGKey(1), x)
        out = ops.logits_eval(params, bs, x, jax.random.PRNGKey(2))
        assert out.shape == (1, 64, 64, 1)
        o = np.asarray(out)
        assert (o >= 0).all() and (o <= 1).all()  # sigmoid output

    def test_u2net_full_returns_seven_maps(self):
        from edge_enhancement_tpu.models.u2net import u2net_full
        ops = ModelOps(u2net_full())
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
        params, bs = ops.init(jax.random.PRNGKey(1), x)
        outs = ops.logits_eval(params, bs, x, jax.random.PRNGKey(2))
        assert isinstance(outs, tuple) and len(outs) == 7
        for o in outs:
            assert o.shape == (1, 32, 32, 1)

    def test_u2netp_odd_size(self):
        # ceil-mode pooling must handle non-power-of-two sizes (e.g. 28)
        ops = ModelOps(u2net_small())
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 28, 28, 3))
        params, bs = ops.init(jax.random.PRNGKey(1), x)
        out = ops.logits_eval(params, bs, x, jax.random.PRNGKey(2))
        assert out.shape == (1, 28, 28, 1)

    def test_sobel_magnitude(self):
        img = jnp.zeros((1, 16, 16, 1)).at[0, :, 8:, 0].set(1.0)
        mag = np.asarray(sobel_magnitude(img))
        assert mag.shape == (1, 16, 16, 1)
        assert mag[0, 8, 7, 0] > 0  # edge fires at the step
        assert mag[0, 8, 2, 0] == 0  # flat region silent


class TestU2NetFrontend:
    def test_u2netp_edge_extractor_trains(self):
        """type_canny='u2netp' swaps the Canny edge map for the learned
        U2-Net extractor (reference ResNet_EE's alternative edge source)."""
        from edge_enhancement_tpu.objectives.methods import MethodConfig
        from edge_enhancement_tpu.train.trainer import (OptimConfig,
                                                        build_train_step,
                                                        create_train_state)
        model = build_model("resnet18_EE",
                            {**EE_ARGS, "type_canny": "u2netp"}, 16)
        ops = ModelOps(model)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
        y = jnp.arange(2) % 16
        state = create_train_state(ops, jax.random.PRNGKey(1), x[:1])
        # u2netp params are part of the train state and receive gradients
        assert "U2Net_0" in state.params
        mcfg = MethodConfig(method_name="AT", epsilon=0.06, num_steps=1,
                            step_size=0.03, num_classes=16)
        step = build_train_step(ops, mcfg, OptimConfig(momentum=0.9))
        s2, m = step(state, x, y, jax.random.PRNGKey(2), jnp.float32(0.1))
        assert np.isfinite(float(m["loss"]))
        d = sum(float(jnp.abs(a - b).sum()) for a, b in
                zip(jax.tree.leaves(state.params["U2Net_0"]),
                    jax.tree.leaves(s2.params["U2Net_0"])))
        assert d > 0  # the edge extractor itself is trained end-to-end
