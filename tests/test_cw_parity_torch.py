"""CWLinfAttack parity vs the reference implementation.

Runs the reference utils/attacks.py::CWLinfAttack itself (eval-mode model,
already-misclassified filter, random start, margin loss
-sum(relu(correct - wrong + 50)), fixed 0.00392 sign steps, the
magnitude-ball / [0,1] / cumulative-eps-window triple projection, and
previous_p tracking) against our masked static-shape cw_linf on copied
ResNet18 weights.

Alignment: y := argmax(model(x)) so every sample passes the filter (the
reference gathers a dynamic subset; ours masks — identical only when the
active sets agree, which argmax labels guarantee); the random start is
pinned to one shared draw on both sides; one iteration per call (sign-step
chaos on f32-noise gradient pixels precludes multi-iteration elementwise
comparison — see test_trajectory_parity), with the multi-restart
`previous_p` window exercised by a second call consuming the first call's
output.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REF = "/root/reference"
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

from test_step_parity_resnet import copy_torch_resnet18_to_flax  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from edge_enhancement_tpu.attacks import cw as cw_mod  # noqa: E402
from edge_enhancement_tpu.attacks.cw import CWConfig, cw_linf  # noqa: E402
from edge_enhancement_tpu.models.resnet import resnet  # noqa: E402
from edge_enhancement_tpu.train.modelops import ModelOps  # noqa: E402
from edge_enhancement_tpu.train.trainer import create_train_state  # noqa: E402

B, H, NC = 4, 64, 200
MAGNITUDE, MAX_EPS = 8 / 255.0, 16 / 255.0


def test_cw_one_iter_and_restart_window_parity(monkeypatch):
    from Tiny_ImageNet.models_tinyimagenet.resnet import resnet18
    from utils.attacks import CWLinfAttack

    torch.manual_seed(0)
    tmodel = resnet18(pretrained=False, num_classes=NC)
    tmodel.eval()
    ops = ModelOps(resnet(18, num_classes=NC))
    rng = np.random.default_rng(5)
    x = rng.random((B, H, H, 3)).astype(np.float32)

    state = create_train_state(ops, jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    params, stats = copy_torch_resnet18_to_flax(tmodel, state.params,
                                                state.batch_stats)

    def fwd(xx, kk):
        return ops.logits_eval(params, stats, xx, kk)

    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    # labels = the model's own predictions -> every sample is "correct" and
    # the filter keeps the full batch on both sides
    y = np.asarray(jnp.argmax(fwd(jnp.asarray(x), jax.random.PRNGKey(1)),
                              axis=-1)).astype(np.int32)
    assert (torch.argmax(tmodel(xt), -1).numpy() == y).all()
    yt = torch.from_numpy(y).long()

    # one shared random start per call
    rand1 = ((rng.random(x.shape) * 2 - 1) * MAGNITUDE).astype(np.float32)
    rand2 = ((rng.random(x.shape) * 2 - 1) * MAGNITUDE).astype(np.float32)
    rands_jax = [jnp.asarray(rand1), jnp.asarray(rand2)]
    monkeypatch.setattr(cw_mod.jax.random, "uniform",
                        lambda key, shape=(), **k: rands_jax.pop(0))
    rands_t = [torch.from_numpy(rand1.transpose(0, 3, 1, 2)),
               torch.from_numpy(rand2.transpose(0, 3, 1, 2))]
    monkeypatch.setattr(torch.Tensor, "uniform_",
                        lambda self, a=0.0, b=1.0: rands_t.pop(0))

    cfg = CWConfig(magnitude=MAGNITUDE, max_eps=MAX_EPS, max_iters=1,
                   num_classes=NC)
    # targeted mode: the reference's untargeted path is dead code (it
    # unconditionally indexes `target[ind_non_suc]` and crashes on None,
    # attacks.py:152); every reference call site passes target labels
    tgt = ((y + 1) % NC).astype(np.int32)
    tt = torch.from_numpy(tgt).long()

    # restart 1: previous_p = None
    adv_t1, p_t1 = CWLinfAttack(xt, yt, tmodel, MAGNITUDE, None, MAX_EPS,
                                max_iters=1, target=tt, n_class=NC)
    adv_j1, p_j1 = cw_linf(fwd, jnp.asarray(x), jnp.asarray(y),
                           jax.random.PRNGKey(2), cfg,
                           target=jnp.asarray(tgt))
    a_t1 = adv_t1.detach().numpy().transpose(0, 2, 3, 1)
    agree = np.isclose(np.asarray(adv_j1), a_t1, atol=1e-6).mean()
    assert agree >= 0.995, agree  # sign flips only on f32-noise gradients
    np.testing.assert_allclose(np.asarray(p_j1),
                               p_t1.detach().numpy().transpose(0, 2, 3, 1),
                               atol=2 * 0.00392 + 1e-6)

    # restart 2: consumes restart 1's OUR perturbation on both sides -> the
    # cumulative window x - previous_p +/- max_eps is exercised identically
    p_handoff = np.asarray(p_j1)
    adv_t2, p_t2 = CWLinfAttack(
        xt, yt, tmodel, MAGNITUDE,
        torch.from_numpy(p_handoff.transpose(0, 3, 1, 2).copy()), MAX_EPS,
        max_iters=1, target=tt, n_class=NC)
    adv_j2, p_j2 = cw_linf(fwd, jnp.asarray(x), jnp.asarray(y),
                           jax.random.PRNGKey(3), cfg,
                           previous_p=jnp.asarray(p_handoff),
                           target=jnp.asarray(tgt))
    a_t2 = adv_t2.detach().numpy().transpose(0, 2, 3, 1)
    agree2 = np.isclose(np.asarray(adv_j2), a_t2, atol=1e-6).mean()
    assert agree2 >= 0.995, agree2
    agree_p = np.isclose(np.asarray(p_j2),
                         p_t2.detach().numpy().transpose(0, 2, 3, 1),
                         atol=1e-6).mean()
    assert agree_p >= 0.995, agree_p
