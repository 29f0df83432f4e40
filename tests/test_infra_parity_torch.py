"""Infrastructure-layer parity vs the reference helper functions.

The L1 helpers are small but drive model selection and training dynamics:
a LR schedule off-by-one or a top-k tie-break difference silently shifts
which checkpoint is "best". Each test runs the reference function itself
(utils/helper.py, utils/attacks.py::LabelSmoothLoss,
torch.nn.KLDivLoss(batchmean)) against ours on the same inputs.
"""

import math
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
REF = "/root/reference"
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

import test_step_parity_resnet  # noqa: F401,E402  (torch shims + sys.path)

# utils/helper.py imports easydict (absent in this image; only used for its
# attribute-access dict) — shim it with an equivalent
import sys  # noqa: E402
import types  # noqa: E402

if "easydict" not in sys.modules:
    _ed = types.ModuleType("easydict")

    class _EasyDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:  # pragma: no cover
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    _ed.EasyDict = _EasyDict
    sys.modules["easydict"] = _ed

import jax.numpy as jnp  # noqa: E402

from edge_enhancement_tpu.train import schedules  # noqa: E402
from edge_enhancement_tpu.train.modelops import (kl_div_batchmean,  # noqa: E402
                                                 label_smooth_loss,
                                                 topk_accuracy)


class _FakeOptim:
    def __init__(self):
        self.param_groups = [{"lr": None}]

    @property
    def lr(self):
        return self.param_groups[0]["lr"]


def test_lr_schedules_match_reference():
    from utils import helper

    for init_lr in (0.1, 0.05):
        for epoch in range(0, 95):
            opt = _FakeOptim()
            helper.adjust_learning_rate(opt, epoch, init_lr)
            assert schedules.step30(init_lr, epoch) == pytest.approx(opt.lr)

            for n_rep in (1, 4):
                opt = _FakeOptim()
                helper.adjust_learning_rate_free(opt, epoch, init_lr, n_rep)
                assert schedules.step30_free(init_lr, epoch, n_rep) == \
                    pytest.approx(opt.lr), (epoch, n_rep)

            for total in (50, 90, 110):
                opt = _FakeOptim()
                helper.adjust_learning_rate_1(opt, epoch, init_lr, total)
                assert schedules.piecewise_50_75(init_lr, epoch, total) == \
                    pytest.approx(opt.lr), (epoch, total)


def test_label_smooth_loss_matches_reference():
    from utils.attacks import LabelSmoothLoss

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((8, 10)).astype(np.float32)
    y = rng.integers(0, 10, 8)
    for s in (0.0, 0.1, 0.3):
        ref = float(LabelSmoothLoss(s)(torch.from_numpy(logits),
                                       torch.from_numpy(y).long()))
        ours = float(label_smooth_loss(jnp.asarray(logits), jnp.asarray(y), s))
        assert ours == pytest.approx(ref, abs=1e-6), s


def test_topk_accuracy_matches_reference_incl_soft_labels_and_ties():
    from utils.helper import accuracy

    rng = np.random.default_rng(1)
    logits = rng.standard_normal((16, 10)).astype(np.float32)
    # force ties: several logits share the max value (top_k tie routing)
    logits[0, :3] = logits[0].max() + 1.0
    y = rng.integers(0, 10, 16)
    ref1, ref5 = accuracy(torch.from_numpy(logits), torch.from_numpy(y).long(),
                          topk=(1, 5))
    ours = topk_accuracy(jnp.asarray(logits), jnp.asarray(y))
    assert float(ours["top1"]) == pytest.approx(float(ref1), abs=1e-4)
    assert float(ours["top5"]) == pytest.approx(float(ref5), abs=1e-4)

    # soft-label targets reduce via argmax (helper.py:45-46)
    soft = rng.random((16, 10)).astype(np.float32)
    ref1s, = accuracy(torch.from_numpy(logits), torch.from_numpy(soft),
                      topk=(1,))
    ours_s = topk_accuracy(jnp.asarray(logits), jnp.asarray(soft), ks=(1, 5))
    assert float(ours_s["top1"]) == pytest.approx(float(ref1s), abs=1e-4)


def test_kl_div_batchmean_matches_torch():
    rng = np.random.default_rng(2)
    logits_q = rng.standard_normal((6, 12)).astype(np.float32)
    logits_p = rng.standard_normal((6, 12)).astype(np.float32)
    log_q = torch.log_softmax(torch.from_numpy(logits_q), dim=-1)
    p = torch.softmax(torch.from_numpy(logits_p), dim=-1)
    ref = float(torch.nn.KLDivLoss(reduction="batchmean")(log_q, p))
    ours = float(kl_div_batchmean(jnp.asarray(log_q.numpy()),
                                  jnp.asarray(p.numpy())))
    assert ours == pytest.approx(ref, abs=1e-6)
