"""Gate the committed dress-rehearsal artifacts (docs/REHEARSAL.md).

The round-3 VERDICT's item 2 asked for the flagship recipe at production
shape — configs/tiny_imagenet/ee_at_bpda3_square.yml verbatim on a
100k-image synthetic TinyIN with steps_per_dispatch, a deliberate mid-run
kill + --resume, and the full eval battery (reference match:
Tiny_ImageNet/experiments_tinyimagenet.py:246-295 epoch loop at the
utils/data_loader.py:61-94 dataset scale). These tests parse the committed
evidence (docs/demo/rehearsal_*.txt) and pin the properties that make it
a *real* AT run rather than a smoke artifact: robust overfitting with
best-checkpoint tracking, state restore across the kill, and the standard
attack-strength ordering in the eval battery. Pure text parsing — no jax.
"""
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "docs", "demo", "rehearsal_flagship_log.txt")
EVAL = os.path.join(REPO, "docs", "demo", "rehearsal_eval_report.txt")


def _epoch_series(text):
    """[(clean, adv)] per validated epoch, in log order."""
    cleans = [float(m) for m in re.findall(r"\* Clean Prec@1 ([\d.]+)", text)]
    advs = [float(m) for m in re.findall(r"\* Adv Prec@1 ([\d.]+)", text)]
    assert len(cleans) == len(advs)
    return list(zip(cleans, advs))


@pytest.fixture(scope="module")
def log_text():
    if not os.path.exists(LOG):
        pytest.skip("rehearsal artifacts not present")
    with open(LOG) as f:
        return f.read()


@pytest.fixture(scope="module")
def eval_metrics():
    if not os.path.exists(EVAL):
        pytest.skip("rehearsal eval report not present")
    with open(EVAL) as f:
        text = f.read()
    out = {}
    for name, _, adv in re.findall(
            r"([\w-]+): clean Prec@1 ([\d.]+)\s+(?:adv|robust) Prec@1 ([\d.]+)",
            text):
        out[name] = float(adv)
    out["_epoch"] = int(re.search(r"loaded checkpoint \(epoch (\d+)\)",
                                  text).group(1))
    return out


def test_production_shape(log_text):
    """50 scheduled epochs x 1000 steps of bs100 = the reference's TinyIN
    scale, plus the 3 post-resume epochs of the kill/restore leg."""
    series = _epoch_series(log_text)
    assert len(series) >= 53
    assert "Epoch: [49][950/1000]" in log_text  # full epochs at 100k/bs100


def test_robust_overfitting_and_best_tracking(log_text):
    """Long-schedule AT must show robust overfitting (best robust well
    before the end) and the trainer must track it: every '=> done' line
    reports the global max, not the final epoch."""
    series = _epoch_series(log_text)
    advs = [a for _, a in series[:50]]  # the original 50-epoch run
    best = max(advs)
    best_epoch = advs.index(best)
    assert best_epoch < 40, "no robust-overfitting shape — suspicious run"
    assert advs[-1] < best - 1.0
    done = [float(m) for m in
            re.findall(r"=> done\. best robust-eval Prec@1 ([\d.]+)", log_text)]
    assert done, "no completion marker"
    for d in done:
        assert d == pytest.approx(best, abs=0.01), \
            "best-robust metric not preserved (resume must restore it)"


def test_midrun_kill_resume_markers(log_text):
    """The deliberate mid-run kill: a resume from the epoch-50 'last'
    checkpoint, a kill inside epoch 51, and a second resume that restores
    epoch 51 — both restores logged with the right epoch."""
    resumed = [int(m) for m in
               re.findall(r"=> resumed from .* \(epoch (\d+)\)", log_text)]
    assert resumed == [50, 51]
    # post-resume epochs ran to completion and validated
    assert "Epoch: [52][950/1000]" in log_text


def test_nonsaturating_regime(log_text):
    """The run sits in the mid-band the hard task was designed for
    (docs/TWIN.md) — not the 100/100 fixed point the round-3 VERDICT
    flagged as an uninformative instrument."""
    series = _epoch_series(log_text)
    cleans = [c for c, _ in series]
    advs = [a for _, a in series]
    assert max(cleans) < 97.0
    assert max(advs) < max(cleans) - 5.0
    assert min(advs[10:]) > 40.0  # converged, not collapsed


def test_eval_battery_attack_ordering(eval_metrics, log_text):
    """The standard strength ordering of the battery on one model:
    FGSM weakest, PGD monotone in iterations, CW-20 between, AutoAttack
    strongest — and the battery ran on the best (robust-peak) checkpoint."""
    m = eval_metrics
    assert m["FGSM"] > m["PGD-10"] > m["PGD-50"] > m["PGD-100"]
    assert m["PGD-10"] < m["CW-Linf-20"] < m["FGSM"]
    assert m["AutoAttack"] < m["PGD-100"]
    # eval loaded ckpt/best == argmax of the in-training robust series + 1
    advs = [a for _, a in _epoch_series(log_text)[:50]]
    assert m["_epoch"] == advs.index(max(advs)) + 1
    # the two evaluators (in-training validate vs eval.py PGD-10) agree on
    # the same weights up to attack RNG / batch order
    assert abs(m["PGD-10"] - max(advs)) < 3.0


def test_cross_evaluator_agreement():
    """The reference's own validate() (torch, its PGD) scores the
    rehearsal checkpoint within evaluator-RNG noise of our eval stack on
    identical samples (tools/rehearsal_cross_eval.py artifact) — the
    rehearsal numbers are a property of the model, not our evaluator."""
    import json
    p = os.path.join(REPO, "output", "rehearsal", "cross_eval.json")
    if not os.path.exists(p):
        pytest.skip("cross-eval artifact not present")
    with open(p) as f:
        res = json.load(f)
    ours, ref = res["ours_eval"], res["reference_validate_on_our_weights"]
    assert abs(ours["clean"] - ref["clean"]) < 1.0
    assert abs(ours["adv"] - ref["adv"]) < 4.0
    # and the slice is representative of the full-split battery numbers
    assert abs(ours["adv"] - 76.37) < 5.0


def test_free_at_rehearsal_noise_restore():
    """Free-AT replay-family rehearsal (docs/REHEARSAL.md): every resume
    leg restored BOTH the model checkpoint and the persistent replay-noise
    shard, the restored noise is a saturated trained buffer (max |n| ==
    clip_eps 4/255), and training progressed across the kills."""
    p = os.path.join(REPO, "docs", "demo", "rehearsal_free_log.txt")
    if not os.path.exists(p):
        pytest.skip("free-AT rehearsal artifact not present")
    with open(p) as f:
        text = f.read()
    resumed = [int(m) for m in
               re.findall(r"=> resumed from .* \(epoch (\d+)\)", text)]
    noise = re.findall(
        r"=> restored free-AT replay noise shard \((\d+), (\d+), (\d+), "
        r"(\d+)\) \(max \|n\| = ([\d.]+)\)", text)
    assert resumed == [6, 10, 11]       # incl. the mid-epoch-11 kill
    assert len(noise) == len(resumed)   # a noise restore for every resume
    for shape_and_max in noise:
        assert tuple(map(int, shape_and_max[:4])) == (128, 224, 224, 3)
        assert float(shape_and_max[4]) == pytest.approx(4 / 255, abs=2e-4)
    assert "WARNING: free-AT noise" not in text  # no silent reset path
    # training progressed across the kill boundaries
    advs = [float(m) for m in re.findall(r"\* Adv Prec@1 ([\d.]+)", text)]
    assert len(advs) == 14 and advs[-1] > 70.0 > advs[0]
    done = [float(m) for m in
            re.findall(r"=> done\. best robust-eval Prec@1 ([\d.]+)", text)]
    assert done and done[-1] == pytest.approx(max(advs), abs=0.01)


def test_fast_at_phase_chain():
    """Fast-AT 3-phase progressive-resize rehearsal (docs/REHEARSAL.md):
    the cross-config resume chain ran with the shipped configs verbatim —
    each phase restored the previous phase's checkpoint at the right
    epoch while batch size and crop changed (run names pin bs), and the
    evaluate config ran the PGD-50 battery on the phase-3 checkpoint."""
    p = os.path.join(REPO, "docs", "demo", "rehearsal_fast_log.txt")
    if not os.path.exists(p):
        pytest.skip("fast-AT rehearsal artifact not present")
    with open(p) as f:
        text = f.read()
    resumed = re.findall(r"=> resumed from .*/(phase\d|eval)/imagenet/"
                         r"fast_AT/resnet50_EE-(bs\d+)-[^ ]* \(epoch (\d+)\)",
                         text)
    assert [(src, bs, int(e)) for src, bs, e in resumed] == [
        ("phase1", "bs256", 6),   # -> phase 2 @224
        ("phase2", "bs128", 12),  # -> phase 3 @288
        ("phase3", "bs96", 15),   # -> evaluate config
    ]
    assert "=> evaluate num_steps:50" in text
    # the battery produced clean+adv summary lines after the evaluate marker
    tail = text.split("=> evaluate num_steps:50", 1)[1]
    assert re.search(r"\* Clean Prec@1 [\d.]+", tail)
    assert re.search(r"\* Adv Prec@1 [\d.]+", tail)


def test_awp_rehearsal_learned():
    """AWP-family rehearsal (docs/REHEARSAL.md): the proxy-perturb
    objective trained PreActResNet18_EE_BPDA_3 to a mid-band equilibrium
    on the non-saturating task (real AT learning, not chance and not
    saturation)."""
    p = os.path.join(REPO, "docs", "demo", "rehearsal_awp_log.txt")
    if not os.path.exists(p):
        pytest.skip("AWP rehearsal artifact not present")
    with open(p) as f:
        text = f.read()
    assert "method EE_AT_AWP" in text
    series = _epoch_series(text)
    cleans = [c for c, _ in series]
    advs = [a for _, a in series]
    assert len(series) >= 6
    assert cleans[-1] > 75.0 and max(cleans) < 97.0  # learned, mid-band
    assert 50.0 < advs[-1] < cleans[-1]              # robust below clean
    done = [float(m) for m in
            re.findall(r"=> done\. best robust-eval Prec@1 ([\d.]+)", text)]
    assert done and done[-1] == pytest.approx(max(advs), abs=0.01)


def test_tar_rehearsal_learned():
    """Targeted-family rehearsal: tarEE_BPDA3_AT_square converged to a
    mid-band equilibrium on the non-saturating task."""
    p = os.path.join(REPO, "docs", "demo", "rehearsal_tar_log.txt")
    if not os.path.exists(p):
        pytest.skip("tar rehearsal artifact not present")
    with open(p) as f:
        text = f.read()
    assert "method tarEE_BPDA3_AT_square" in text
    series = _epoch_series(text)
    cleans = [c for c, _ in series]
    advs = [a for _, a in series]
    assert len(series) >= 6
    assert cleans[-1] > 85.0 and max(cleans) < 97.0
    assert 60.0 < advs[-1] < cleans[-1]


def test_trades_divergence_is_faithful():
    """TRADES at the shipped TinyIN recipe diverges on synthetic-hard —
    and the REFERENCE's own Trades class diverges on the same trajectory
    (probe_trades_{ours,ref}.txt): geometric logit explosion to NaN
    within <=8 steps in BOTH stacks. A rebuild that 'fixed' this would be
    unfaithful; a rebuild that diverged when the reference did not would
    be buggy."""
    import json
    pours = os.path.join(REPO, "docs", "demo", "probe_trades_ours.txt")
    pref = os.path.join(REPO, "docs", "demo", "probe_trades_ref.txt")
    if not (os.path.exists(pours) and os.path.exists(pref)):
        pytest.skip("TRADES divergence probes not present")

    def trajectory(path):
        rows = []
        with open(path) as f:
            for line in f:
                if line.startswith("{"):
                    rows.append(json.loads(line))
        return rows

    for rows in (trajectory(pours), trajectory(pref)):
        finite = [r for r in rows if r["params_finite"]]
        assert len(finite) < len(rows) <= 9, "no divergence recorded"
        # geometric logit growth while params stay bounded
        lm = [r["logit_max"] for r in finite]
        assert lm[-1] > 100 * lm[0]
        assert all(r["param_max"] < 2.0 for r in finite)
        # both stacks blow up within one step of each other
    ours_step = len([r for r in trajectory(pours) if r["params_finite"]])
    ref_step = len([r for r in trajectory(pref) if r["params_finite"]])
    assert abs(ours_step - ref_step) <= 2


def _divergence_check(pours, pref, max_steps=11):
    import json

    def trajectory(path):
        rows = []
        with open(path) as f:
            for line in f:
                if line.startswith("{"):
                    rows.append(json.loads(line))
        return rows

    steps = []
    for rows in (trajectory(pours), trajectory(pref)):
        finite = [r for r in rows if r["params_finite"]]
        assert len(finite) < len(rows) <= max_steps, "no divergence recorded"
        steps.append(len(finite))
    assert abs(steps[0] - steps[1]) <= 2


def test_alp_divergence_is_faithful():
    """ALP at the shipped TinyIN recipe diverges on synthetic-hard via
    runaway beta*MSE — and the REFERENCE's own ALP class diverges the same
    way within two steps of ours (probe_alp_{ours,ref}.txt)."""
    pours = os.path.join(REPO, "docs", "demo", "probe_alp_ours.txt")
    pref = os.path.join(REPO, "docs", "demo", "probe_alp_ref.txt")
    if not (os.path.exists(pours) and os.path.exists(pref)):
        pytest.skip("ALP divergence probes not present")
    _divergence_check(pours, pref)


def test_avmixup_rehearsal_learned():
    """AVmixup rehearsal: soft-label mixing converges with clean near
    saturation and robust meaningfully below — the expected shape."""
    p = os.path.join(REPO, "docs", "demo", "rehearsal_avmixup_log.txt")
    if not os.path.exists(p):
        pytest.skip("AVmixup rehearsal artifact not present")
    with open(p) as f:
        text = f.read()
    assert "method AVmixup" in text
    series = _epoch_series(text)
    cleans = [c for c, _ in series]
    advs = [a for _, a in series]
    assert len(series) >= 6
    assert cleans[-1] > 95.0
    assert 60.0 < advs[-1] < cleans[-1] - 5.0


def test_u2netp_rehearsal_learned():
    """U2NETP-front-end rehearsal: the learned edge extractor trains
    under attack gradients to a mid-band equilibrium."""
    p = os.path.join(REPO, "docs", "demo", "rehearsal_u2netp_log.txt")
    if not os.path.exists(p):
        pytest.skip("u2netp rehearsal artifact not present")
    with open(p) as f:
        text = f.read()
    series = _epoch_series(text)
    cleans = [c for c, _ in series]
    advs = [a for _, a in series]
    assert len(series) >= 4
    assert cleans[-1] > 85.0
    assert 60.0 < advs[-1] < cleans[-1]
