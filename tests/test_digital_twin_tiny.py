"""CI-able TinyIN digital twin: the reference's experiments_tinyimagenet.py
train()/validate() loop vs our stack on the headline resnet18_EE_square /
EE_BPDA3_AT_square recipe, same data, same init (tools/digital_twin_tiny.py;
the full-length run lives in docs/TWIN.md / output/twin_tiny/twin.json).

Deterministic assertion first (converted init weights produce identical
eval logits through the full EE front-end + ResNet18), then statistical
ones on shortened trajectories.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
if not os.path.isdir("/root/reference"):  # pragma: no cover
    pytest.skip("reference tree not available", allow_module_level=True)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from digital_twin import _install_reference_shims  # noqa: E402
from digital_twin_tiny import (RECIPE, run_ours, run_reference,  # noqa: E402
                               synth_tiny)

EPOCHS, NTRAIN, NVAL, STEPS = 5, 250, 75, 3

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _converged(hist, k=2):
    return {m: float(np.mean(hist[m][-k:])) for m in ("clean", "adv")}


@pytest.mark.parametrize("twin_dir,has_cross,clean_hi", [
    ("twin_hard", True, 95.0),       # flagship EE_BPDA3_AT_square
    ("twin_hard_tar", False, 95.0),  # targeted family; gaps sit well
                                     # inside the bands so no cross-attacker
                                     # attribution was needed
    ("twin_hard_awp", False, 95.0),  # AWP family (PreActResNet18_EE_BPDA_3
                                     # + EE_AT_AWP); gaps 1.9/0.2 vs bands
                                     # 7.8/8.6
    ("twin_hard_trades", False, 97.0),  # TRADES at the stabilized lr 0.005
                                     # (shipped lr diverges in BOTH stacks);
                                     # equilibrium is higher-clean by recipe
    ("twin_hard_alp", False, 95.0),  # ALP at the stabilized lr 0.005 (same
                                     # matched-divergence story as TRADES);
                                     # gaps 3.6/1.5 vs bands 5.4/4.6
    ("twin_hard_free", False, 98.0),  # free-AT replay family (the actual
                                     # free DDP driver vs our lax.scan step);
                                     # eps 4/255 recipe -> higher equilibrium
                                     # (~95/84); gaps 0.5/0.7 vs bands
                                     # 4.2/3.8 — the tightest of the eight
    ("twin_hard_fast", False, 96.0),  # fast-AT (FGSM-RS + cyclic LR) at the
                                     # stabilized peak 0.005 (shipped-scaled
                                     # peak collapses in BOTH stacks — see
                                     # docs/demo/probe_fast_*); gaps 1.3/1.3
                                     # vs bands 2.0/3.0
    ("twin_hard_fd", False, 96.0),   # feature-denoising model family
                                     # (resnet18_fd + tarFD, the reference's
                                     # own ImageNet driver); gaps 0.5/0.3 vs
                                     # bands 4.4/7.6, values interleave
    ("twin_hard_trick", False, 96.0),  # trick family (tarEE_trick: Bernoulli
                                     # clean-start gate + label smoothing);
                                     # gaps 0.7/0.5 vs bands 3.6/5.4, values
                                     # interleave — completes the dispatched
                                     # training-method matrix
])
def test_twin_hard_artifact(twin_dir, has_cross, clean_hi):
    """Gate on the committed NON-SATURATING twin evidence (docs/TWIN.md v2,
    output/twin_hard*): the round-3 VERDICT's tightened-band item, applied
    where tightness is honest — at convergence. (The trajectory mini below
    keeps its loose tolerance: mid-trajectory spread across the six full
    runs is 47-80 points at ~60 SGD steps; converged values are the
    statistic the band is measured for.)

    Asserts (1) the instrument is mid-band — clean not saturated, robust
    meaningfully below clean, so drift COSTS POINTS here; (2) the
    cross-stack gap of converged means stays within the measured per-side
    seed band (+1pt for the borderline adv case, whose sign is attributed
    below); (3) attacker equivalence: the reference's own validate()/PGD,
    run on our trained weights via the inverse converter
    (tools/twin_cross_eval.py), reproduces our self-reported robust
    accuracy — so the twin's adv numbers are not an artifact of a weak
    evaluator."""
    import json
    p = os.path.join(REPO, "output", twin_dir, "twin_hard.json")
    if not os.path.exists(p):
        pytest.skip("full-run twin_hard artifacts not present")
    d = json.load(open(p))
    seeds = [str(s) for s in d["seeds"]]
    conv = {side: {m: [_converged(d[side][s])[m] for s in seeds]
                   for m in ("clean", "adv")} for side in ("reference",
                                                           "ours")}
    for side in ("reference", "ours"):
        cm = np.mean(conv[side]["clean"])
        am = np.mean(conv[side]["adv"])
        assert 40.0 <= cm <= clean_hi, (side, cm)      # mid-band, not 100/100
        assert am <= cm - 5.0, (side, cm, am)          # attackable
        assert am >= 30.0, (side, am)                  # but learnable

    for m in ("clean", "adv"):
        rv, ov = conv["reference"][m], conv["ours"][m]
        band = max(max(rv) - min(rv), max(ov) - min(ov))
        gap = abs(float(np.mean(rv)) - float(np.mean(ov)))
        assert gap <= band + 1.0, (m, gap, band, rv, ov)

    if not has_cross:
        return
    # (4) order-invariance: re-training all ours-side seeds on the torch
    # DataLoader's exact batch order (tools/twin_order_probe.py) leaves the
    # converged offset unchanged — the shuffle stream is not the cause of
    # the signed offset, and the torch-order run must also sit inside the
    # same band discipline as the native-order run
    op = os.path.join(REPO, "output", twin_dir, "order_probe.json")
    if os.path.exists(op):
        probe = json.load(open(op))["summary"]
        for m in ("clean", "adv"):
            dt = probe[m]["offset_torch_order"]
            dn = probe[m]["offset_native_order"]
            assert abs(dt - dn) <= 2.0, (m, dt, dn)

    cross_adv, self_adv = [], []
    for s in seeds:
        cp = os.path.join(REPO, "output", twin_dir, f"cross_s{s}.json")
        if not os.path.exists(cp):
            pytest.skip("cross-attacker artifacts not present")
        c = json.load(open(cp))
        cross_adv.append(c["reference_attacker_on_our_weights"]["adv"])
        self_adv.append(_converged(d["ours"][s])["adv"])
    assert abs(float(np.mean(cross_adv))
               - float(np.mean(self_adv))) <= 3.0, (cross_adv, self_adv)


@pytest.mark.slow
def test_digital_twin_tiny_mini(tmp_path, monkeypatch):
    # rolled attack loop: numerics-identical to the unrolled one
    # (equivalence pinned in test_attacks.py) but compiles minutes faster
    # on 1-core CPU; scoped to this test via monkeypatch
    monkeypatch.setenv("EE_ATTACK_UNROLL", "1")
    xs_tr, ys_tr = synth_tiny(NTRAIN, seed=0)
    xs_va, ys_va = synth_tiny(NVAL, seed=1)

    ref = run_reference(xs_tr, ys_tr, xs_va, ys_va, str(tmp_path / "ref"),
                        EPOCHS, STEPS, seed=1)

    # deterministic: the converted INIT weights produce identical eval
    # logits through square+HFS+canny+clamp+ResNet18 (the _square random
    # draws differ per framework, so compare the non-square EE twin that
    # shares every learned tensor)
    _install_reference_shims()
    sys.path.insert(0, "/root/reference/Tiny_ImageNet")
    import jax
    import jax.numpy as jnp
    from models_tinyimagenet import resnet18_EE

    from edge_enhancement_tpu.models.registry import build_model
    from edge_enhancement_tpu.train.modelops import ModelOps
    from edge_enhancement_tpu.train.trainer import create_train_state
    from tools.convert_torch_checkpoint import convert, resnet_name_map

    r = RECIPE
    tmodel = resnet18_EE(pretrained=False, cize=r["cize"], r=r["r"],
                         w=r["w"], with_gf=r["gf"], low=r["low"],
                         high=r["high"], alpha=r["alpha"], sigma=r["sigma"],
                         type_canny=r["type_canny"])
    sd = torch.load(ref["init_pth"], map_location="cpu")["state_dict"]
    tmodel.load_state_dict(sd, strict=False)
    tmodel.eval()
    cfg_args = dict(r=r["r"], w=r["w"], gf=r["gf"], low=r["low"],
                    high=r["high"], alpha=r["alpha"], sigma=r["sigma"],
                    type_canny=r["type_canny"])
    ops = ModelOps(build_model("resnet18_EE", cfg_args, 200))
    st = create_train_state(ops, jax.random.PRNGKey(1),
                            jnp.zeros((1, 64, 64, 3)))
    params, stats, matched, _ = convert(sd, resnet_name_map(18), st.params,
                                     st.batch_stats)
    assert matched == 102, matched
    x0 = xs_va[:4].astype(np.float32) / 255.0
    lj = np.asarray(ops.logits_eval(params, stats, jnp.asarray(x0),
                                    jax.random.PRNGKey(0)))
    with torch.no_grad():
        lt = tmodel(torch.from_numpy(
            np.ascontiguousarray(x0.transpose(0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(lj, lt, atol=2e-3)

    ours = run_ours(xs_tr, ys_tr, xs_va, ys_va, ref["init_pth"],
                    EPOCHS, STEPS, seed=1)

    # both sides learn the 10-signal-class task well above the random
    # floors (0.5% over 200 classes), and agree on best-over-epochs
    # capability (stable against per-epoch wobble; ~50 SGD steps is past
    # the chaotic opening — the full run in docs/TWIN.md shows ours at
    # 90.8+ by step 20 and both sides converged by step 60 — while a
    # 3-epoch/18-step variant measured ref 62.7 vs ours 12.0: pure
    # early-AT variance, hence this length)
    ref_best = max(ref["history"]["clean"])
    ours_best = max(ours["history"]["clean"])
    assert ref_best >= 55.0, ref["history"]
    assert ours_best >= 55.0, ours["history"]
    assert max(ref["history"]["adv"]) > 30.0, ref["history"]
    assert max(ours["history"]["adv"]) > 30.0, ours["history"]
    assert abs(ref_best - ours_best) <= 30.0, \
        (ref["history"], ours["history"])
