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


def test_pretrained_torchvision_warm_start(tmp_path):
    """`--pretrained`: a torchvision-format 1000-class ResNet18 state_dict
    warm-starts our model. Same class count -> full eval-mode logits parity;
    task class count (200) -> backbone ingested, fc head skipped and left at
    fresh init (the reference loads torchvision weights then swaps the head,
    experiments_imagenet.py:65-81, experiments_tinyimagenet.py:60-70)."""
    sys.path.insert(0, REF)
    from Tiny_ImageNet.models_tinyimagenet.resnet import resnet18
    torch.manual_seed(3)
    tm = resnet18(pretrained=False, num_classes=1000).eval()
    pth = tmp_path / "tv_resnet18.pth"
    torch.save(tm.state_dict(), str(pth))    # raw torchvision layout

    from edge_enhancement_tpu.models.registry import build_model
    from edge_enhancement_tpu.train.modelops import ModelOps
    from edge_enhancement_tpu.train.trainer import create_train_state
    from tools.convert_torch_checkpoint import load_pretrained_torch

    def fresh(num_classes):
        ops = ModelOps(build_model("resnet18", dict(cize=64), num_classes))
        return ops, create_train_state(ops, jax.random.PRNGKey(0),
                                       jnp.zeros((1, 64, 64, 3)))

    # 1. matching head: every tensor ingests, logits match torch eval mode
    ops, state = fresh(1000)
    state1k, n, skipped = load_pretrained_torch(state, "resnet18", str(pth))
    assert not skipped and n > 100
    x = np.random.default_rng(3).random((2, 64, 64, 3)).astype(np.float32)
    want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
              ).detach().numpy()
    got = np.asarray(ops.logits_eval(state1k.params, state1k.batch_stats,
                                     jnp.asarray(x), jax.random.PRNGKey(1)))
    np.testing.assert_allclose(got, want, atol=2e-3)

    # 2. task head: backbone in, mismatched fc skipped with its fresh init
    ops2, state200 = fresh(200)
    state200b, n2, skipped2 = load_pretrained_torch(state200, "resnet18",
                                                    str(pth))
    assert sorted(k for k, _, _ in skipped2) == [("Dense_0", "bias"),
                                                 ("Dense_0", "kernel")]
    np.testing.assert_array_equal(
        np.asarray(state200b.params["Conv_0"]["kernel"]),
        tm.conv1.weight.detach().numpy().transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(state200b.params["Dense_0"]["kernel"]),
        np.asarray(state200.params["Dense_0"]["kernel"]))
    assert n2 == n - 2


def test_pretrained_flag_through_driver(tmp_path):
    """`train.py --pretrained` plumbs end to end: one driver run warm-starts
    from the .pth, logs the ingestion, trains a step, and checkpoints."""
    sys.path.insert(0, REF)
    from Tiny_ImageNet.models_tinyimagenet.resnet import resnet18
    torch.manual_seed(4)
    tm = resnet18(pretrained=False, num_classes=1000)
    pth = tmp_path / "tv.pth"
    torch.save(tm.state_dict(), str(pth))

    import train as train_mod
    from edge_enhancement_tpu.utils.config import load_config
    cfg = load_config(os.path.join(
        REPO, "edge_enhancement_tpu/configs/tiny_imagenet/standard_training.yml"),
        {"data": "synthetic", "epochs": 1, "limit_batches": 1,
         "batch_size": 8, "synthetic_size": 16, "output": str(tmp_path),
         "print_freq": 1, "pretrained": str(pth), "num_steps_1": 1,
         "attack_unroll": 1})
    train_mod.run(cfg)
    logs = list(tmp_path.rglob("log.txt")) + list(tmp_path.rglob("log"))
    text = "".join(p.read_text() for p in logs if p.is_file())
    assert "warm-started" in text and "Dense_0" in text


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


def test_inverse_converter_roundtrip():
    """tools/twin_cross_eval.py's params_to_torch_state_dict is the exact
    inverse of convert(): flax -> torch -> flax must reproduce every leaf
    bit-for-bit (the cross-attacker twin evidence in docs/TWIN.md v2 rides
    on this inverse being lossless)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from convert_torch_checkpoint import convert, resnet_name_map
    from twin_cross_eval import params_to_torch_state_dict

    from edge_enhancement_tpu.models.registry import build_model
    from edge_enhancement_tpu.train.modelops import ModelOps
    from edge_enhancement_tpu.train.trainer import create_train_state

    cfg_args = dict(r=8, w=1.0, gf=False, low=38.0, high=76.0, alpha=0.0,
                    sigma=1.0, type_canny="CannyFilter_step125_1",
                    epsilon=16 / 255, n_queries=1)
    ops = ModelOps(build_model("resnet18_EE_square", cfg_args, 200))
    st = create_train_state(ops, jax.random.PRNGKey(3),
                            jnp.zeros((1, 64, 64, 3)))

    nm = resnet_name_map(18)
    sd = params_to_torch_state_dict(st.params, st.batch_stats, nm)
    assert len(sd) == 102, len(sd)
    params2, stats2, matched, _ = convert(sd, nm, st.params, st.batch_stats)
    assert matched == 102, matched
    for orig, back in ((st.params, params2), (st.batch_stats, stats2)):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            orig, back)


def _export_to_torch(tmp_path, arch, num_classes, cize, channels, margs,
                     seed=5, extra=()):
    """Build a fresh flax state, save it as an orbax checkpoint, export it
    with `--to-torch`, and return (ops, state, pth_path)."""
    from edge_enhancement_tpu.models.registry import build_model
    from edge_enhancement_tpu.train import checkpoint as ckpt
    from edge_enhancement_tpu.train.modelops import ModelOps
    from edge_enhancement_tpu.train.trainer import create_train_state
    ops = ModelOps(build_model(arch, margs, num_classes))
    state = create_train_state(ops, jax.random.PRNGKey(seed),
                               jnp.zeros((1, cize, cize, channels)))
    ckpt_dir = tmp_path / "ours"
    ckpt.save_checkpoint(str(ckpt_dir), jax.device_get(state), 3, arch,
                         55.5, is_best=True)
    pth = tmp_path / "exported.pth"
    r = subprocess.run(
        [sys.executable, TOOL, str(ckpt_dir), str(pth), "--arch", arch,
         "--num-classes", str(num_classes), "--cize", str(cize),
         "--to-torch", *extra],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stdout + r.stderr
    return ops, state, pth


def test_to_torch_export_resnet18_ee(tmp_path):
    """Reverse migration: `--to-torch` writes a reference-format .pth the
    reference's own model consumes, logits matching our checkpoint (the
    bidirectional complement of test_resnet18_ee_checkpoint_roundtrip)."""
    sys.path.insert(0, REF)
    from Tiny_ImageNet.models_tinyimagenet.resnet_EE import resnet18_EE
    ops, state, pth = _export_to_torch(tmp_path, "resnet18_EE", 200, 64, 3,
                                       EE_ARGS)
    payload = torch.load(str(pth), map_location="cpu", weights_only=False)
    assert payload["epoch"] == 3 and payload["best_prec1"] == 55.5
    tm = resnet18_EE(pretrained=False, num_classes=200, cize=64, r=8, w=1.0,
                     with_gf=False, low=38.0, high=76.0, alpha=0.0,
                     sigma=1.0, type_canny="CannyFilter_step125_1")
    missing, unexpected = tm.load_state_dict(payload["state_dict"],
                                             strict=False)
    assert not unexpected, unexpected
    tm.eval()
    x = np.random.default_rng(5).random((2, 64, 64, 3)).astype(np.float32)
    want = np.asarray(ops.logits_eval(state.params, state.batch_stats,
                                      jnp.asarray(x), jax.random.PRNGKey(1)))
    got = tm(torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
             ).detach().numpy()
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_to_torch_export_net2_fc_remap(tmp_path):
    """The Net2 export must UNDO the NHWC->NCHW flatten-order remap on fc1
    (the forward converter's _FLATTEN_REMAP) — logits through the
    reference's own Net_2 pin the inverse permutation."""
    sys.path.insert(0, REF)
    from MNIST.models_mnist.Net2 import Net_2
    ops, state, pth = _export_to_torch(tmp_path, "Net2", 10, 28, 1, {},
                                       seed=6)
    payload = torch.load(str(pth), map_location="cpu", weights_only=False)
    tm = Net_2()
    missing, unexpected = tm.load_state_dict(payload["state_dict"],
                                             strict=False)
    assert not unexpected, unexpected
    tm.eval()
    x = np.random.default_rng(6).random((2, 28, 28, 1)).astype(np.float32)
    want = np.asarray(ops.logits_eval(state.params, state.batch_stats,
                                      jnp.asarray(x), jax.random.PRNGKey(1)))
    got = tm(torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
             ).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_to_torch_export_preact_single_head_alias(tmp_path):
    """The preact name map aliases BOTH torch head spellings ('linear' for
    CIFAR stems, 'fc' for (Tiny-)ImageNet — preactresnet.py:103-111) to our
    Dense_0; a `--to-torch` export must emit exactly the spelling the
    target dataset variant declares (no unexpected keys for the reference's
    resume), selected by --dataset."""
    sys.path.insert(0, REF)
    from AWP.Tiny_imagenet.models_tiny_awp.preactresnet import PreActResNet18
    margs = dict(dataset_variant="Tiny-ImageNet")
    ops, state, pth = _export_to_torch(tmp_path, "PreActResNet18", 200, 64,
                                       3, margs, seed=7)
    payload = torch.load(str(pth), map_location="cpu", weights_only=False)
    sd = payload["state_dict"]
    assert "fc.weight" in sd and "linear.weight" not in sd, sorted(sd)[-4:]
    torch.manual_seed(7)
    tm = PreActResNet18(dataset="Tiny-ImageNet")
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    tm.eval()
    x = np.random.default_rng(7).random((2, 64, 64, 3)).astype(np.float32)
    want = np.asarray(ops.logits_eval(state.params, state.batch_stats,
                                      jnp.asarray(x), jax.random.PRNGKey(1)))
    got = tm(torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
             ).detach().numpy()
    np.testing.assert_allclose(got, want, atol=2e-3)

    # CIFAR spelling: --dataset CIFAR100 flips the exported head to 'linear'
    pth2 = tmp_path / "exported_cifar.pth"
    import subprocess
    r = subprocess.run(
        [sys.executable, TOOL, str(tmp_path / "ours"), str(pth2), "--arch",
         "PreActResNet18", "--num-classes", "200", "--cize", "64",
         "--to-torch", "--dataset", "CIFAR100"],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stdout + r.stderr
    sd2 = torch.load(str(pth2), map_location="cpu",
                     weights_only=False)["state_dict"]
    assert "linear.weight" in sd2 and "fc.weight" not in sd2
