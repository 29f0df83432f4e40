"""AWP one-step parity vs the reference AdvWeightPerturb.

Composes what TestAWP checks structurally against the ACTUAL reference
implementation (AWP/Tiny_imagenet/models_tiny_awp/utils_awp.py:8-55 and the
driver step experiments_tiny_awp.py:255-286): proxy SGD(lr 0.01) ascent,
kernel-only normalised diff, perturb -> robust CE backward -> SGD(momentum,
wd) step -> restore, on copied PreActResNet-18 weights.

The inner PGD attack is bypassed on BOTH sides (num_steps=0, random=False ->
x_adv == x): attack parity is covered by test_trajectory_parity /
test_parity_torch; this test isolates the AWP weight-space semantics,
including the subtle wd-on-perturbed-weights coupling (torch's optimizer
steps while the weights are perturbed; our functional form folds the extra
wd*gamma*diff into the gradient — objectives/awp.py:112-116).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REF = "/root/reference"
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tools"))
import convert_torch_checkpoint as ctc  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from edge_enhancement_tpu.models.resnet import preact_resnet  # noqa: E402
from edge_enhancement_tpu.objectives.awp import (AWPConfig,  # noqa: E402
                                                 build_awp_train_step)
from edge_enhancement_tpu.objectives.methods import MethodConfig  # noqa: E402
from edge_enhancement_tpu.train.modelops import ModelOps  # noqa: E402
from edge_enhancement_tpu.train.trainer import (OptimConfig,  # noqa: E402
                                                create_train_state)

GAMMA, PROXY_LR, LR, MOMENTUM, WD = 0.005, 0.01, 0.1, 0.9, 5e-4


def _load_ref(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def setup():
    base = os.path.join(REF, "AWP/Tiny_imagenet/models_tiny_awp")
    pre = _load_ref("ref_preactresnet", os.path.join(base, "preactresnet.py"))
    uawp = _load_ref("ref_utils_awp", os.path.join(base, "utils_awp.py"))

    torch.manual_seed(0)
    tmodel = pre.PreActResNet(pre.PreActBlock, [2, 2, 2, 2],
                              num_classes=200, dataset="Tiny-ImageNet")
    proxy = pre.PreActResNet(pre.PreActBlock, [2, 2, 2, 2],
                             num_classes=200, dataset="Tiny-ImageNet")

    ops = ModelOps(preact_resnet(18, dataset="Tiny-ImageNet"))
    rng = np.random.default_rng(3)
    x = rng.random((4, 64, 64, 3)).astype(np.float32)
    y = rng.integers(0, 200, 4).astype(np.int32)
    state = create_train_state(ops, jax.random.PRNGKey(0),
                               jnp.asarray(x[:1]))
    # copy torch weights -> our tree via the converter's preact name map
    # (.numpy() views can alias torch storage — always copy, CLAUDE.md)
    sd = {k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()}
    params, stats, n, _ = ctc.convert(sd, ctc.preact_name_map(18),
                                      state.params, state.batch_stats)
    assert n >= 60, n  # all convs/BNs/fc matched
    state = state.replace(params=params, batch_stats=stats)
    return tmodel, proxy, uawp, ops, state, x, y


def _torch_awp_step(tmodel, proxy, uawp, x, y):
    import torch.nn.functional as F
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    yt = torch.from_numpy(y).long()
    opt = torch.optim.SGD(tmodel.parameters(), lr=LR, momentum=MOMENTUM,
                          weight_decay=WD)
    proxy_opt = torch.optim.SGD(proxy.parameters(), lr=PROXY_LR)
    adversary = uawp.AdvWeightPerturb(tmodel, proxy, proxy_opt, GAMMA)
    tmodel.train()
    diff = adversary.calc_awp(inputs_adv=xt, targets=yt)
    adversary.perturb(diff)
    loss = F.cross_entropy(tmodel(xt), yt)
    opt.zero_grad()
    loss.backward()
    opt.step()
    adversary.restore(diff)
    return float(loss.detach())


_CHECK = [("conv1.weight", ("Conv_0", "kernel")),
          ("fc.weight", ("Dense_0", "kernel")),
          ("layer2.0.conv1.weight", ("PreActBlock_2", "Conv_1", "kernel")),
          ("layer4.1.conv2.weight", ("PreActBlock_7", "Conv_1", "kernel"))]


def _fetch(tree, path):
    for k in path:
        tree = tree[k]
    return np.asarray(tree)


def test_awp_one_step_matches_reference(setup):
    tmodel, proxy, uawp, ops, state, x, y = setup
    params0 = jax.tree.map(np.asarray, state.params)

    mcfg = MethodConfig(method_name="AT_AWP", epsilon=8 / 255, num_steps=0,
                        step_size=2 / 255, random=False, num_classes=200)
    step = build_awp_train_step(ops, mcfg, OptimConfig(MOMENTUM, WD),
                                AWPConfig(gamma=GAMMA, proxy_lr=PROXY_LR))
    new_state, metrics = step(state, jnp.asarray(x), jnp.asarray(y),
                              jax.random.PRNGKey(1), jnp.float32(LR),
                              jnp.float32(1.0))
    t_loss = _torch_awp_step(tmodel, proxy, uawp, x, y)

    # the perturbed-point robust loss matches
    assert abs(float(metrics["loss"]) - t_loss) <= 5e-4 * max(t_loss, 1.0)

    tsd = dict(tmodel.named_parameters())
    for tname, fpath in _CHECK:
        tw = tsd[tname].detach().numpy()
        tw = tw.transpose(2, 3, 1, 0) if tw.ndim == 4 else tw.T
        ours = _fetch(new_state.params, fpath)
        upd_ref = np.abs(tw - _fetch(params0, fpath)).max()
        assert upd_ref > 0  # the step actually moved this tensor
        np.testing.assert_allclose(ours, tw, atol=5e-5, err_msg=tname)

    # BN running stats updated identically (one train-mode forward on the
    # real model: the perturbed robust forward)
    bufs = dict(tmodel.named_buffers())
    np.testing.assert_allclose(
        np.asarray(new_state.batch_stats["BatchNorm_0"]["mean"]),
        bufs["bn1.running_mean"].numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.batch_stats["BatchNorm_0"]["var"]),
        bufs["bn1.running_var"].numpy(), atol=1e-5)
