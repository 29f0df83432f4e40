"""tarALP / tarAVmixup parity vs the ACTUAL reference classes.

Rounds out the objective parity matrix (test_objective_parity_torch pins the
untargeted assemblies): here the reference's `targeted_ALP.tarPGD_Linf`
(utils/attacks.py:305-327) and `AVmixup.tar_perturb` (utils/attacks.py:481-518)
run themselves, with every random draw pinned identically on both sides
(target-label offsets, gaussian init noise, Beta mix weights), so the tests
cover exactly what the untargeted tests cannot: the targeted label plumbing —
random wrong-label construction, the descend step direction, and tarAVmixup's
fmod-one-hot "weird targets" quirk (fmod(one_hot + randint(1, nclass,
size=(B, nclass)), nclass) used directly as log-prob weights).

Two-stage structure per method:
  1. attack parity — one pinned-start descend step through the reference
     attack itself vs our `pgd_linf` inside the objective; elementwise equal
     outside the f32 sign-chaos pixels (see test_trajectory_parity).
  2. assembly parity — OUR x_adv is fed to the torch-side loss assembly
     (chaos pixels cancel), asserting loss, fc/conv1 grads, and BN stats.
"""

import os
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REF = "/root/reference"
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

from test_step_parity_resnet import copy_torch_resnet18_to_flax  # noqa: E402
from test_objective_parity_torch import _check, _grads_and_loss  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from edge_enhancement_tpu.models.resnet import resnet  # noqa: E402
from edge_enhancement_tpu.objectives import methods as methods_mod  # noqa: E402
from edge_enhancement_tpu.objectives.methods import (MethodConfig,  # noqa: E402
                                                     Objective)
from edge_enhancement_tpu.train.modelops import ModelOps  # noqa: E402
from edge_enhancement_tpu.train.trainer import create_train_state  # noqa: E402

B, H, NC = 4, 64, 200
EPS, STEP = 8 / 255.0, 2 / 255.0
BETA, GAMMA_AV, L1_AV, L2_AV = 0.7, 2.0, 1.0, 0.1


def _nchw(a):
    return torch.from_numpy(np.ascontiguousarray(a.transpose(0, 3, 1, 2)))


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


@pytest.fixture()
def setup_live():
    """Copied-weight resnet18 pair with the attack left LIVE (unstubbed)."""
    from Tiny_ImageNet.models_tinyimagenet.resnet import resnet18

    torch.manual_seed(0)
    tmodel = resnet18(pretrained=False, num_classes=NC)
    ops = ModelOps(resnet(18, num_classes=NC))
    rng = np.random.default_rng(77)
    x = rng.random((B, H, H, 3)).astype(np.float32)
    y = rng.integers(0, NC, B).astype(np.int32)
    state = create_train_state(ops, jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    params, batch_stats = copy_torch_resnet18_to_flax(tmodel, state.params,
                                                      state.batch_stats)
    return tmodel, ops, params, batch_stats, x, y, rng


def _spy_pgd(monkeypatch, captured):
    """Record the concrete x_adv produced inside an eager objective call."""
    real = methods_mod.pgd_linf

    def spy(loss_fn, xx, key, cfg, aux=None):
        out = real(loss_fn, xx, key, cfg, aux=aux)
        if "x_adv" not in captured:          # first (eager) call only
            captured["x_adv"] = out[0]
        return out

    monkeypatch.setattr(methods_mod, "pgd_linf", spy)


def test_tar_alp_parity(setup_live, monkeypatch):
    import torch.nn.functional as F
    from utils.attacks import targeted_ALP

    tmodel, ops, params, batch_stats, x, y, rng = setup_live
    offs = rng.integers(1, NC, size=y.shape)
    tgt = (y + offs) % NC
    noise_raw = rng.standard_normal(x.shape).astype(np.float32)

    # pin every draw: target labels + the 0.001*N(0,1) init
    monkeypatch.setattr(methods_mod, "random_targets",
                        lambda key, labels, nc: jnp.asarray(tgt))
    monkeypatch.setattr(jax.random, "normal",
                        lambda key, shape=None, **k: jnp.asarray(noise_raw))
    captured = {}
    _spy_pgd(monkeypatch, captured)

    cfg = MethodConfig(method_name="tarALP", epsilon=EPS, num_steps=1,
                       step_size=STEP, beta=BETA, num_classes=NC)
    obj = Objective(ops, cfg)
    loss_eager, _ = obj.loss(params, batch_stats, jnp.asarray(x),
                             jnp.asarray(y), jax.random.PRNGKey(4))
    x_adv_ours = np.asarray(captured["x_adv"])
    loss_j, grads, bs = _grads_and_loss(ops, params, batch_stats, cfg, x, y)
    np.testing.assert_allclose(float(loss_eager), loss_j, rtol=1e-6)

    # ---- torch: driver flow (experiments_tinyimagenet.py:254-257,292) ----
    xt, yt = _nchw(x), torch.from_numpy(y).long()
    tmodel.train()
    preds = tmodel(xt)                     # stat update BEFORE the attack
    monkeypatch.setattr(torch, "randint",
                        lambda *a, **k: torch.from_numpy(offs))
    monkeypatch.setattr(torch, "randn",
                        lambda *a, **k: _nchw(noise_raw))
    crit = targeted_ALP(step_size=STEP, epsilon=EPS, perturb_steps=1,
                        beta=BETA, n_class=NC)
    x_adv_t = _nhwc(crit.tarPGD_Linf(tmodel, xt, yt, "cpu"))

    # stage 1: the descend step itself. Eval-mode mean-CE input gradients
    # are ~20x smaller than the train-mode sum gradients the trajectory
    # tests compare, so more pixels sit in the f32-noise band where the
    # sign is chaotic (measured: mismatches' median |grad| is ~20x below
    # the overall median). Assert both the agreement fraction AND that
    # every mismatch is confined to noise-level gradients.
    agree_mask = np.abs(x_adv_ours - x_adv_t) < 1e-6
    agree = float(np.mean(agree_mask))
    assert agree >= 0.97, agree

    # classify mismatches by the torch-side gradient magnitude at the init
    x0t = _nchw(x + 0.001 * noise_raw).requires_grad_()
    tmodel.eval()
    g_t = torch.autograd.grad(
        F.cross_entropy(tmodel(x0t), torch.from_numpy(tgt).long()),
        [x0t])[0].numpy().transpose(0, 2, 3, 1)
    g_mag = np.abs(g_t)
    assert (np.median(g_mag[~agree_mask])
            <= 0.2 * np.median(g_mag)), "mismatches not confined to noise"

    # stage 2: assembly on OUR x_adv — model is still in EVAL mode after
    # tarPGD_Linf (the reference's adversarial-logits quirk), loss after
    # model.train() (targeted_ALP.loss, utils/attacks.py:326-336)
    output = tmodel(_nchw(x_adv_ours))
    tmodel.train()
    loss_t = (0.5 * F.cross_entropy(preds, yt)
              + 0.5 * F.cross_entropy(output, yt)
              + BETA * F.mse_loss(preds, output))
    tmodel.zero_grad()
    loss_t.backward()
    _check(tmodel, grads, bs, loss_j, loss_t)


def test_tar_avmixup_parity(setup_live, monkeypatch):
    import torch.nn.functional as F
    from utils.attacks import AVmixup

    tmodel, ops, params, batch_stats, x, y, rng = setup_live
    one_hot = np.eye(NC, dtype=np.float32)[y]
    offs = rng.integers(1, NC, size=(B, NC))
    w = rng.random((B, 1, 1, 1)).astype(np.float32)

    monkeypatch.setattr(jax.random, "randint",
                        lambda key, shape, lo, hi, **k: jnp.asarray(offs))
    monkeypatch.setattr(jax.random, "uniform",
                        lambda key, shape=(), **k: jnp.asarray(w.reshape(shape)))
    captured = {}
    _spy_pgd(monkeypatch, captured)

    cfg = MethodConfig(method_name="tarAVmixup", epsilon=EPS, num_steps=1,
                       step_size=STEP, random=False, num_classes=NC,
                       gamma=GAMMA_AV, lambda1=L1_AV, lambda2=L2_AV)
    obj = Objective(ops, cfg)
    loss_eager, _ = obj.loss(params, batch_stats, jnp.asarray(x),
                             jnp.asarray(y), jax.random.PRNGKey(4))
    x_adv_ours = np.asarray(captured["x_adv"])
    loss_j, grads, bs = _grads_and_loss(ops, params, batch_stats, cfg, x, y)
    np.testing.assert_allclose(float(loss_eager), loss_j, rtol=1e-6)

    # ---- torch: the ACTUAL reference tar_perturb, arranged to return the
    # raw x_adv (gamma=1, Beta weight pinned to 0 -> x_mix == clamp(x_adv));
    # its one train-mode attack forward supplies BN stat update #1
    xt = _nchw(x)
    one_hot_t = torch.from_numpy(one_hot)
    monkeypatch.setattr(torch, "randint",
                        lambda *a, **k: torch.from_numpy(offs))
    monkeypatch.setattr(np.random, "beta",
                        lambda a, b, shape=None: np.zeros(shape))
    av = AVmixup(types.SimpleNamespace(random=False, epsilon=EPS),
                 gamma=1.0, lambda1=L1_AV, lambda2=L2_AV, step_size=STEP,
                 num_steps=1, num_classes=NC, device="cpu")
    tmodel.train()
    x_adv_t, _ = av.tar_perturb(tmodel, xt, one_hot_t)
    x_adv_t = _nhwc(x_adv_t.float())

    # stage 1: descend step through the fmod weird-target loss
    agree = float(np.mean(np.abs(x_adv_ours - x_adv_t) < 1e-6))
    assert agree >= 0.995, agree

    # stage 2: mix assembly (reference formulas, utils/attacks.py:503-518 +
    # driver loss experiments_tinyimagenet.py:269,294-296) on OUR x_adv
    def smooth(oh, f):
        return oh * f + (oh - 1.0) * ((f - 1.0) / float(NC - 1))

    vertex = np.clip(x + GAMMA_AV * (x_adv_ours - x), 0.0, 1.0)
    x_mix = x * w + vertex * (1.0 - w)
    y_mix = smooth(one_hot, L1_AV) * w.reshape(-1, 1) + \
        smooth(one_hot, L2_AV) * (1.0 - w.reshape(-1, 1))
    out = tmodel(_nchw(x_mix.astype(np.float32)))   # stat update #2
    loss_t = -torch.sum(F.log_softmax(out, dim=1)
                        * torch.from_numpy(y_mix)) / B
    tmodel.zero_grad()
    loss_t.backward()
    _check(tmodel, grads, bs, loss_j, loss_t)
