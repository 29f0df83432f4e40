"""Flagship trajectory parity: EE_BPDA3_AT_square train steps vs the
reference, on copied weights with aligned randomness.

This composes everything the op-level parity tests check separately — the
BPDA-3 Canny front-end (STE gradients), HFS, Add_Square, PGD-in-train-mode
BN semantics, the CE objective, and SGD(momentum, wd) — against the
reference driver (experiments_tinyimagenet.py:246-295 'EE_BPDA3_AT_square'
branch + utils/attacks.py PGD).

Why two phases instead of one free-running comparison: the defense's edge
map is BINARY (STE thresholds), so a single borderline sign flip in the
attack gradient (f32 noise between frameworks on near-zero entries) flips
whole edge pixels and the trajectories decorrelate chaotically — measured:
~0.06% flipped gradient signs at iteration 1 grow to ~1% differing x_adv
pixels after PGD-2 and to fully decorrelated parameter updates within one
step. That chaos is a property of sign-based attacks on a binarizing
defense, not an implementation difference. So we assert the two halves that
compose the step, each of which is numerically stable:

  A. attack-gradient parity: input gradients through the full composed
     model match torch sign-for-sign on >= 99.8% of pixels, with an
     IDENTICAL zero set (the STE masks gate exactly the same pixels).
  B. train-step parity with the attack's input sequence recorded on the
     torch side and replayed on ours (same BN running-stat updates per
     attack forward, reference PGD semantics): ONE full attack+update step
     matches elementwise to f32-amplification tolerance, and a 3-step run
     tracks (update cosine / relative error / loss), not elementwise.

Why one elementwise step and not three: BN input-gradients divide by
sqrt(batch_var + eps), and the saturated front-end drives some channels'
batch variance toward zero on adversarial inputs — a ~300x amplifier of
f32 noise. Measured on identical inputs and weights: every WEIGHT gradient
matches torch to <= 6e-6, but gradients that pass through a near-zero
-variance BN input-grad differ by ~1e-2 (torch vs any reimplementation —
this is conditioning, not semantics), which feeds back into the forward by
step 2. The one-step bound plus multi-step tracking is the strongest
stable statement.

Randomness alignment: PGD runs with random=False (clean start, both sides);
the stochastic Add_Square layer is replaced ON BOTH SIDES by the same
deterministic per-call draw sequence (stripes / square position / channel
signs generated once in numpy) applied with each side's own projection
arithmetic. The RNG distributions themselves are covered by op-level tests.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REF = "/root/reference"
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

# reuse the torch shims + weight-copy helpers from the one-step parity test
from test_step_parity_resnet import copy_torch_resnet18_to_flax  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from edge_enhancement_tpu.models import ee_frontend as ee_mod  # noqa: E402
from edge_enhancement_tpu.models.registry import build_model  # noqa: E402
from edge_enhancement_tpu.train.modelops import ModelOps, cross_entropy  # noqa: E402
from edge_enhancement_tpu.train.sgd import init_momentum, sgd_update  # noqa: E402

CIZE = 64
EPS = 16 / 255.0
STEP = 2 / 255.0
PGD_STEPS = 2
TRAIN_STEPS = 3
LR, MOMENTUM, WD = 0.1, 0.9, 2e-4
EE_ARGS = dict(r=8, w=1.0, gf=False, low=38.0, high=76.0, alpha=0.0,
               sigma=1.0, type_canny="CannyFilter_step125_1",
               epsilon=0.062745098039216, n_queries=1, cize=CIZE)

# The square delta uses 1.9*eps (not the production 2*eps) so no pixel lands
# EXACTLY on the eps-ball boundary: torch and JAX route min/max gradients
# differently at exact ties (JAX splits 0.5/0.5), which is a subgradient
# convention, not a semantic difference — the fake avoids the tie set.
SQUARE_DELTA = 1.9


def make_square_draws(n_calls, b, h, c, seed=7):
    """One (stripes, vh, channel_sign) tuple per model forward, shared by
    both implementations. n_queries=1 -> square side from p_selection(0)."""
    from edge_enhancement_tpu.ops.square import p_selection
    rng = np.random.default_rng(seed)
    s = max(int(round(np.sqrt(p_selection(0, 0.8, 1) * h * h))), 1)
    draws = []
    for _ in range(n_calls):
        stripes = rng.choice([-1.0, 1.0], size=(b, 1, h, c)).astype(np.float32)
        vh = int(rng.integers(0, h - s + 1))
        csign = rng.choice([-1.0, 1.0], size=(c,)).astype(np.float32)
        draws.append((stripes, vh, csign))
    return draws, s


class FixedAddSquareTorch(torch.nn.Module):
    """Reference Add_Square with the random draws replaced by the shared
    sequence; projection arithmetic identical to utils/core.py:637-653."""

    def __init__(self, draws, s, epsilon):
        super().__init__()
        self.draws, self.s, self.epsilon = list(draws), s, epsilon

    def forward(self, x):  # x: NCHW
        stripes, vh, csign = self.draws.pop(0)
        eps, s = self.epsilon, self.s
        stripes_t = torch.from_numpy(
            stripes.transpose(0, 3, 1, 2))           # (B,C,1,H) cols broadcast
        x_best = torch.clamp(x + eps * stripes_t, 0.0, 1.0)
        mask = torch.zeros_like(x[:1, :1])
        mask[..., vh:vh + s, vh:vh + s] = 1.0
        csign_t = torch.from_numpy(csign).view(1, -1, 1, 1)
        x_best = x_best + SQUARE_DELTA * eps * csign_t * mask
        x_best = torch.min(torch.max(x_best, x - eps), x + eps)
        return torch.clamp(x_best, 0.0, 1.0)


def make_fixed_add_square_jax(draws, s, epsilon):
    """jnp twin of FixedAddSquareTorch; pops one draw per traced call."""
    queue = list(draws)

    def fixed(x, key, **kwargs):  # NHWC; signature-compatible with add_square
        del key, kwargs
        stripes, vh, csign = queue.pop(0)
        eps = epsilon
        x_best = jnp.clip(x + eps * jnp.asarray(stripes), 0.0, 1.0)
        mask = np.zeros((1, x.shape[1], x.shape[2], 1), np.float32)
        mask[:, vh:vh + s, vh:vh + s, :] = 1.0
        x_best = x_best + SQUARE_DELTA * eps * \
            jnp.asarray(csign).reshape(1, 1, 1, -1) * jnp.asarray(mask)
        x_best = jnp.minimum(jnp.maximum(x_best, x - eps), x + eps)
        return jnp.clip(x_best, 0.0, 1.0)

    return fixed


@pytest.fixture()
def setup(monkeypatch):
    sys.path.insert(0, REF)
    from Tiny_ImageNet.models_tinyimagenet.resnet_EE_square import \
        resnet18_EE_square

    b, c = 4, 3
    rng = np.random.default_rng(0)
    x = rng.random((b, CIZE, CIZE, c)).astype(np.float32)
    y = rng.integers(0, 200, b).astype(np.int32)

    n_calls = TRAIN_STEPS * (PGD_STEPS + 1) + 2
    draws, s = make_square_draws(n_calls, b, CIZE, c)

    torch.manual_seed(0)
    tmodel = resnet18_EE_square(
        pretrained=False, num_classes=200, cize=CIZE, r=EE_ARGS["r"],
        w=EE_ARGS["w"], with_gf=False, low=EE_ARGS["low"],
        high=EE_ARGS["high"], alpha=EE_ARGS["alpha"], sigma=EE_ARGS["sigma"],
        type_canny="CannyFilter_step125_1", epsilon=EE_ARGS["epsilon"],
        n_queries=1)
    tmodel.add_square = FixedAddSquareTorch(draws, s, EE_ARGS["epsilon"])

    ops = ModelOps(build_model("resnet18_EE_square", EE_ARGS, 200))
    params, batch_stats = ops.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    params, batch_stats = copy_torch_resnet18_to_flax(tmodel, params,
                                                      batch_stats)
    monkeypatch.setattr(
        ee_mod, "add_square",
        make_fixed_add_square_jax(draws, s, EE_ARGS["epsilon"]))
    return tmodel, ops, params, batch_stats, x, y


def test_attack_gradient_sign_parity(setup):
    """Phase A: d(sum CE)/dx through the composed EE model (train mode)
    matches the reference sign-for-sign on >=99.8% of pixels, and the STE
    masks gate exactly the same zero set."""
    import torch.nn.functional as F
    tmodel, ops, params, batch_stats, x, y = setup

    tmodel.train()
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    adv = xt.detach()
    adv.requires_grad_()
    loss = F.cross_entropy(tmodel(adv), torch.from_numpy(y).long(),
                           reduction="sum")
    g_t = torch.autograd.grad(loss, [adv])[0].numpy().transpose(0, 2, 3, 1)

    def loss_fn(xa, bsx, key):
        logits, bs2 = ops.logits_train(params, bsx, xa, key)
        return cross_entropy(logits, jnp.asarray(y), "sum"), bs2

    g_j, _ = jax.grad(loss_fn, has_aux=True)(
        jnp.asarray(x), batch_stats, jax.random.PRNGKey(5))
    g_j = np.asarray(g_j)

    np.testing.assert_array_equal(g_t == 0, g_j == 0)  # identical STE gating
    agree = np.mean(np.sign(g_t) == np.sign(g_j))
    assert agree >= 0.998, agree
    np.testing.assert_allclose(g_j, g_t, atol=5e-4)


def _torch_recorded_steps(tmodel, x, y, n_steps):
    """Run the reference EE_BPDA3_AT_square loop for n_steps, recording every
    attack-forward input (experiments_tinyimagenet.py:283-295 +
    utils/attacks.py:12-29 with random=False). Returns (recorded, losses)."""
    import torch.nn.functional as F
    opt = torch.optim.SGD(tmodel.parameters(), lr=LR, momentum=MOMENTUM,
                          weight_decay=WD)
    tmodel.train()
    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    yt = torch.from_numpy(y).long()
    recorded, losses = [], []
    for _ in range(n_steps):
        seq = []
        adv = xt.detach()
        for _ in range(PGD_STEPS):
            seq.append(adv.detach().numpy().transpose(0, 2, 3, 1).copy())
            adv.requires_grad_()
            with torch.enable_grad():
                loss = F.cross_entropy(tmodel(adv), yt, reduction="sum")
            g = torch.autograd.grad(loss, [adv])[0]
            adv = adv.detach() + STEP * torch.sign(g.detach())
            adv = torch.min(torch.max(adv, xt - EPS), xt + EPS)
            adv = torch.clamp(adv, 0, 1)
        seq.append(adv.detach().numpy().transpose(0, 2, 3, 1).copy())
        recorded.append(seq)
        out = tmodel(adv)
        loss = F.cross_entropy(out, yt)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss))
    return recorded, losses


def _replay_steps(ops, params, batch_stats, y, recorded):
    """Our side of phase B: replay the recorded attack inputs through our
    train-mode forwards (BN running stats update on every attack forward, as
    in the reference PGD), gradient+SGD on the final input. Deliberately
    UN-jitted: the deterministic Add_Square fake pops one draw per call, so
    every call must trace (a jit cache would replay draw #0)."""
    mom = init_momentum(params)
    key = jax.random.PRNGKey(100)
    losses = []

    def final_loss(p, bs, xa, k):
        logits, bs2 = ops.logits_train(p, bs, xa, k)
        return cross_entropy(logits, jnp.asarray(y), "mean"), bs2

    grad_final = jax.value_and_grad(final_loss, has_aux=True)
    for seq in recorded:
        for xa in seq[:-1]:
            key, k = jax.random.split(key)
            _, batch_stats = ops.logits_train(params, batch_stats,
                                              jnp.asarray(xa), k)
        key, k = jax.random.split(key)
        (loss, batch_stats), grads = grad_final(params, batch_stats,
                                                jnp.asarray(seq[-1]), k)
        params, mom = sgd_update(params, grads, mom, lr=jnp.float32(LR),
                                 momentum=MOMENTUM, weight_decay=WD)
        losses.append(float(loss))
    return params, batch_stats, losses


_CHECK = [("conv1.weight", ("Conv_0", "kernel")),
          ("fc.weight", ("Dense_0", "kernel")),
          ("layer3.0.conv1.weight", ("BasicBlock_4", "Conv_0", "kernel"))]


def _fetch(tree, path):
    for k in path:
        tree = tree[k]
    return np.asarray(tree)


def _torch_param(tsd, name):
    w = tsd[name].detach().numpy()
    return w.transpose(2, 3, 1, 0) if w.ndim == 4 else w.T


def test_flagship_one_full_step_parity(setup):
    """Phase B1: ONE full attack(PGD-2)+update step on the flagship model
    matches the reference elementwise (the plain-ResNet analogue lives in
    test_step_parity_resnet; this one composes the EE front-end, train-mode
    BN in the attack, and the fused objective)."""
    tmodel, ops, params, batch_stats, x, y = setup
    recorded, _ = _torch_recorded_steps(tmodel, x, y, 1)
    params, batch_stats, _ = _replay_steps(ops, params, batch_stats, y,
                                           recorded)

    tsd = dict(tmodel.named_parameters())
    for tname, fpath in _CHECK:
        np.testing.assert_allclose(_fetch(params, fpath),
                                   _torch_param(tsd, tname), atol=5e-3)
    bufs = dict(tmodel.named_buffers())
    np.testing.assert_allclose(
        np.asarray(batch_stats["BatchNorm_0"]["mean"]),
        bufs["bn1.running_mean"].numpy(), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(batch_stats["BatchNorm_0"]["var"]),
        bufs["bn1.running_var"].numpy(), atol=1e-3)


def test_flagship_3step_trajectory_tracks(setup):
    """Phase B2: over 3 recorded-attack steps the parameter UPDATES track the
    reference (cosine and relative error on the update vectors, losses within
    5%) — elementwise equality is precluded by the BN variance-conditioning
    amplification described in the module docstring."""
    tmodel, ops, params0, batch_stats, x, y = setup
    recorded, t_losses = _torch_recorded_steps(tmodel, x, y, TRAIN_STEPS)
    params, batch_stats, j_losses = _replay_steps(ops, params0, batch_stats,
                                                  y, recorded)

    tsd = dict(tmodel.named_parameters())
    for tname, fpath in [("conv1.weight", ("Conv_0", "kernel")),
                         ("fc.weight", ("Dense_0", "kernel"))]:
        upd_t = _torch_param(tsd, tname) - _fetch(params0, fpath)
        upd_j = _fetch(params, fpath) - _fetch(params0, fpath)
        cos = float((upd_t * upd_j).sum()
                    / (np.linalg.norm(upd_t) * np.linalg.norm(upd_j)))
        rel = float(np.linalg.norm(upd_j - upd_t) / np.linalg.norm(upd_t))
        assert cos >= 0.99, (tname, cos)
        assert rel <= 0.15, (tname, rel)
    for lt, lj in zip(t_losses, j_losses):
        assert abs(lt - lj) <= 0.05 * max(abs(lt), 1e-6), (t_losses, j_losses)
