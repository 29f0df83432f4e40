"""tools/convert_torch_checkpoint.py end-to-end: a reference torch
checkpoint converted to our Orbax format must produce the same eval-mode
logits through our model (migration path for users with trained reference
models)."""

import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REF = "/root/reference"
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

import test_step_parity_resnet  # noqa: F401,E402  (installs torch shims)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO, "tools", "convert_torch_checkpoint.py")


def _convert(tmp_path, tmodel, arch, num_classes, cize, extra=()):
    pth = tmp_path / "ref.pth"
    torch.save({"epoch": 7, "arch": arch, "best_prec1": 12.5,
                "state_dict": {"module." + k: v  # DataParallel prefix
                               for k, v in tmodel.state_dict().items()}},
               str(pth))
    out = tmp_path / "converted"
    r = subprocess.run(
        [sys.executable, TOOL, str(pth), str(out), "--arch", arch,
         "--num-classes", str(num_classes), "--cize", str(cize), *extra],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stdout + r.stderr
    return out


def _load_state(out_dir, arch, num_classes, cize, channels, margs):
    from edge_enhancement_tpu.models.registry import build_model
    from edge_enhancement_tpu.train import checkpoint as ckpt
    from edge_enhancement_tpu.train.modelops import ModelOps
    from edge_enhancement_tpu.train.trainer import create_train_state
    ops = ModelOps(build_model(arch, margs, num_classes))
    state = create_train_state(ops, jax.random.PRNGKey(0),
                               jnp.zeros((1, cize, cize, channels)))
    payload = ckpt.load_checkpoint(str(out_dir), "best")
    state, epoch, best = ckpt.restore_into_state(state, payload)
    assert epoch == 7 and best == 12.5
    return ops, state


EE_ARGS = dict(r=8, w=1.0, gf=False, low=38.0, high=76.0, alpha=0.0,
               sigma=1.0, type_canny="CannyFilter_step125_1",
               epsilon=0.062745098, n_queries=1, cize=64)


def test_resnet18_ee_checkpoint_roundtrip(tmp_path):
    sys.path.insert(0, REF)
    from Tiny_ImageNet.models_tinyimagenet.resnet_EE import resnet18_EE
    torch.manual_seed(0)
    tm = resnet18_EE(pretrained=False, num_classes=200, cize=64, r=8, w=1.0,
                     with_gf=False, low=38.0, high=76.0, alpha=0.0,
                     sigma=1.0, type_canny="CannyFilter_step125_1").eval()
    out = _convert(tmp_path, tm, "resnet18_EE", 200, 64)
    ops, state = _load_state(out, "resnet18_EE", 200, 64, 3, EE_ARGS)

    x = np.random.default_rng(0).random((2, 64, 64, 3)).astype(np.float32)
    want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
              ).detach().numpy()
    got = np.asarray(ops.logits_eval(state.params, state.batch_stats,
                                     jnp.asarray(x), jax.random.PRNGKey(1)))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_mnist_net2_checkpoint_roundtrip(tmp_path):
    sys.path.insert(0, REF)
    from MNIST.models_mnist.Net2 import Net_2
    torch.manual_seed(1)
    tm = Net_2().eval()
    out = _convert(tmp_path, tm, "Net2", 10, 28)
    ops, state = _load_state(out, "Net2", 10, 28, 1, {})

    x = np.random.default_rng(1).random((2, 28, 28, 1)).astype(np.float32)
    want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
              ).detach().numpy()
    got = np.asarray(ops.logits_eval(state.params, state.batch_stats,
                                     jnp.asarray(x), jax.random.PRNGKey(1)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_preactresnet18_checkpoint_roundtrip(tmp_path):
    sys.path.insert(0, REF)
    from AWP.Tiny_imagenet.models_tiny_awp.preactresnet import PreActResNet18
    torch.manual_seed(2)
    tm = PreActResNet18(dataset="Tiny-ImageNet").eval()
    out = _convert(tmp_path, tm, "PreActResNet18", 200, 64)
    margs = dict(dataset_variant="Tiny-ImageNet")
    ops, state = _load_state(out, "PreActResNet18", 200, 64, 3, margs)

    x = np.random.default_rng(2).random((2, 64, 64, 3)).astype(np.float32)
    want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
              ).detach().numpy()
    got = np.asarray(ops.logits_eval(state.params, state.batch_stats,
                                     jnp.asarray(x), jax.random.PRNGKey(1)))
    np.testing.assert_allclose(got, want, atol=2e-3)
