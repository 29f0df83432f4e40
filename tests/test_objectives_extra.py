"""Free-AT / fast-AT / AWP objective tests and analysis-tool tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from edge_enhancement_tpu.models.cnn_mnist import net2
from edge_enhancement_tpu.models.resnet import preact_resnet
from edge_enhancement_tpu.objectives.awp import AWPConfig, build_awp_train_step
from edge_enhancement_tpu.objectives.free_fast import (FreeFastConfig,
                                                       build_fast_train_step,
                                                       build_free_train_step,
                                                       init_noise)
from edge_enhancement_tpu.objectives.methods import MethodConfig
from edge_enhancement_tpu.train.modelops import ModelOps
from edge_enhancement_tpu.train.trainer import OptimConfig, create_train_state


@pytest.fixture(scope="module")
def mnist_setup():
    ops = ModelOps(net2())
    x = jax.random.uniform(jax.random.PRNGKey(0), (8, 28, 28, 1))
    y = jnp.arange(8) % 10
    state = create_train_state(ops, jax.random.PRNGKey(1), x[:1])
    return ops, state, x, y


class TestFreeAT:
    def test_noise_persists_and_projects(self, mnist_setup):
        ops, state, x, y = mnist_setup
        cfg = FreeFastConfig(n_repeats=3, fgsm_step=0.05, clip_eps=0.1)
        step = build_free_train_step(ops, cfg, OptimConfig(0.9, 1e-4))
        noise = init_noise(8, 28, 1)
        s2, n2, m = step(state, noise, x, y, jax.random.PRNGKey(2),
                         jnp.float32(0.1))
        assert np.abs(np.asarray(n2)).max() <= 0.1 + 1e-6
        assert (np.asarray(n2) != 0).any()
        assert np.isfinite(float(m["loss"]))
        # step counter advances by n_repeats (epochs are divided by repeats)
        assert int(s2.step) == int(state.step) + 3

    def test_params_take_n_repeats_updates(self, mnist_setup):
        ops, state, x, y = mnist_setup
        cfg1 = FreeFastConfig(n_repeats=1, fgsm_step=0.05, clip_eps=0.1)
        cfg3 = FreeFastConfig(n_repeats=3, fgsm_step=0.05, clip_eps=0.1)
        noise = init_noise(8, 28, 1)
        s1, _, _ = build_free_train_step(ops, cfg1, OptimConfig(0.9))(
            state, noise, x, y, jax.random.PRNGKey(3), jnp.float32(0.1))
        s3, _, _ = build_free_train_step(ops, cfg3, OptimConfig(0.9))(
            state, noise, x, y, jax.random.PRNGKey(3), jnp.float32(0.1))
        d1 = sum(float(jnp.abs(a - b).sum()) for a, b in
                 zip(jax.tree.leaves(state.params), jax.tree.leaves(s1.params)))
        d3 = sum(float(jnp.abs(a - b).sum()) for a, b in
                 zip(jax.tree.leaves(state.params), jax.tree.leaves(s3.params)))
        assert d3 > d1  # three optimizer steps move farther than one


class TestFastAT:
    def test_step_and_bn_no_decay(self):
        ops = ModelOps(preact_resnet(18, dataset="Tiny-ImageNet"))
        x = jax.random.uniform(jax.random.PRNGKey(0), (4, 32, 32, 3))
        y = jnp.arange(4) % 200
        state = create_train_state(ops, jax.random.PRNGKey(1), x[:1])
        cfg = FreeFastConfig(n_repeats=1, fgsm_step=2.5 / 255,
                             clip_eps=2.0 / 255, random_init=True)
        step = build_fast_train_step(ops, cfg, OptimConfig(0.9, 1e-4,
                                                           bn_no_decay=True))
        s2, n2, m = step(state, init_noise(4, 32, 3), x, y,
                         jax.random.PRNGKey(2), jnp.float32(0.1))
        assert np.isfinite(float(m["loss"]))
        assert np.abs(np.asarray(n2)).max() <= 2.0 / 255 + 1e-6


class TestAWP:
    def test_awp_step_and_warmup_gate(self):
        ops = ModelOps(preact_resnet(18, dataset="Tiny-ImageNet"))
        x = jax.random.uniform(jax.random.PRNGKey(0), (4, 32, 32, 3))
        y = jnp.arange(4) % 200
        state = create_train_state(ops, jax.random.PRNGKey(1), x[:1])
        mcfg = MethodConfig(method_name="AT_AWP", epsilon=0.0627, num_steps=2,
                            step_size=0.0078, num_classes=200)
        step = build_awp_train_step(ops, mcfg, OptimConfig(0.9, 5e-4),
                                    AWPConfig(gamma=0.005))
        k = jax.random.PRNGKey(2)
        s_on, m_on = step(state, x, y, k, jnp.float32(0.1), jnp.float32(1.0))
        s_off, m_off = step(state, x, y, k, jnp.float32(0.1), jnp.float32(0.0))
        assert np.isfinite(float(m_on["loss"]))
        # gamma gate changes the result (perturbed vs unperturbed loss point)
        d = sum(float(jnp.abs(a - b).sum()) for a, b in
                zip(jax.tree.leaves(s_on.params), jax.tree.leaves(s_off.params)))
        assert d > 0


class TestFreeFastDriver:
    def _cfg(self, tmp_path):
        return {
            "method_name": "free_AT", "dataset": "mnist", "arch": "Net_2",
            "epochs": 4, "n_repeats": 2, "batch_size": 8, "cize": 28,
            "lr": 0.1, "momentum": 0.9, "weight_decay": 1e-4,
            "fgsm_step": 4.0, "clip_eps": 4.0, "seed": 1,
            "num_steps_1": 1, "step_size_1": 1 / 255, "epsilon": 4 / 255,
            "limit_batches": 1, "print_freq": 1,
            "output": str(tmp_path),
        }

    def test_resume_continues_at_checkpoint_epoch(self, tmp_path):
        """Free-AT resume must continue the epoch loop where the checkpoint
        left off (reference AT_free_imagenet_ddp.py restores start_epoch),
        not restart at 0."""
        from edge_enhancement_tpu.data.datasets import SPECS, synthetic_dataset
        from edge_enhancement_tpu.parallel import mesh as meshlib
        from edge_enhancement_tpu.train import checkpoint as ckpt
        import train as train_mod

        cfg = self._cfg(tmp_path)
        ops = ModelOps(net2())
        mesh = meshlib.make_mesh()
        ds = synthetic_dataset(SPECS["mnist"], 16, seed=0)
        state = create_train_state(ops, jax.random.PRNGKey(1),
                                   jnp.zeros((1, 28, 28, 1)))
        state = meshlib.replicate(mesh, state)
        lines = []
        out_dir = str(tmp_path / "run")
        # epochs=4 / n_repeats=2 -> 2 loop epochs trained
        train_mod.run_free_fast(cfg, ops, mesh, state, ds, ds, lines.append,
                                out_dir, 10)
        assert any("Epoch: [0]" in l for l in lines)
        assert any("Epoch: [1]" in l for l in lines)
        payload = ckpt.load_checkpoint(os.path.join(out_dir, "ckpt"))
        assert payload["meta"]["epoch"] == 2
        # replay noise persists as per-process shard files (multihost-safe;
        # this process is rank 0) and is non-trivially evolved
        shard = ckpt.load_noise_shard(os.path.join(out_dir, "ckpt"))
        assert shard is not None and shard.shape == (8, 28, 28, 1)
        assert np.abs(shard).max() > 0

        # resume at the stored epoch: nothing left to train
        cfg2 = dict(cfg, resume=os.path.join(out_dir, "ckpt"))
        lines2 = []
        train_mod.run_free_fast(cfg2, ops, mesh, state, ds, ds, lines2.append,
                                out_dir, 10,
                                start_epoch=payload["meta"]["epoch"])
        assert not any("Epoch: [" in l for l in lines2)


class TestAnalysis:
    REF_LOG = ("/root/reference/Tiny_ImageNet/checkpoint_Tiny_ImageNet/"
               "EE_BPDA3_AT_square/resnet18_EE_square-bs100-lr0.1-momentum0.9"
               "-wd0.0002-seed1/log/log.txt")

    @pytest.mark.skipif(not os.path.exists(REF_LOG),
                        reason="reference logs not available")
    def test_parses_reference_log_to_baseline_numbers(self):
        from edge_enhancement_tpu.utils.analysis import parse_train_log
        d = parse_train_log(self.REF_LOG)
        # BASELINE.md numbers recovered from the reference's own training log
        assert d["clean_top1"][-1] == 28.86
        np.testing.assert_array_equal(d["adv_top1"][-3:], [18.87, 16.19, 15.26])

    def test_frequency_split_reconstructs(self):
        from edge_enhancement_tpu.utils.analysis import frequency_split
        img = np.random.default_rng(0).random((32, 32, 3)).astype(np.float32)
        low, high = frequency_split(img, 8)
        np.testing.assert_allclose(low + high, img, atol=1e-5)


class TestFreeFastMesh:
    def test_free_step_on_8_device_mesh(self):
        """Free-AT's persistent noise buffer is batch-sharded over the mesh
        (SURVEY hardest-part (d): noise state x data sharding)."""
        from edge_enhancement_tpu.parallel import mesh as meshlib
        mesh = meshlib.make_mesh()
        if mesh.devices.size < 8:
            pytest.skip("needs 8 virtual devices")
        ops = ModelOps(net2())
        x = np.random.default_rng(0).random((16, 28, 28, 1)).astype(np.float32)
        y = np.arange(16, dtype=np.int32) % 10
        state = create_train_state(ops, jax.random.PRNGKey(1),
                                   jnp.asarray(x[:1]))
        state = meshlib.replicate(mesh, state)
        cfg = FreeFastConfig(n_repeats=2, fgsm_step=0.05, clip_eps=0.1)
        step = build_free_train_step(ops, cfg, OptimConfig(0.9), mesh=mesh)
        noise = meshlib.shard_batch(mesh, np.zeros((16, 28, 28, 1), np.float32))
        xb, yb = meshlib.shard_batch(mesh, (x, y))
        s2, n2, m = step(state, noise, xb, yb, jax.random.PRNGKey(2),
                         jnp.float32(0.1))
        assert np.isfinite(float(m["loss"]))
        # noise stays sharded on the data axis
        assert "data" in str(n2.sharding.spec)
