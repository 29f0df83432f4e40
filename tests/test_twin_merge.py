"""Unit tests for tools/twin_merge.py — the join that assembles twin halves
(reference recovered from its logs, ours run separately) must preserve the
same converged-summary arithmetic digital_twin_tiny.main computes, or the
committed twin evidence could silently disagree with the harness."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from twin_merge import converged, parse_ours_log  # noqa: E402


def test_parse_ours_log_incremental_and_done(tmp_path):
    log = tmp_path / "ours.log"
    log.write_text(
        "[ours seed1] epoch 0: clean 10.00 adv 5.00\n"
        "[ours seed1] epoch 1: clean 20.00 adv 15.00\n"
        "[ours seed2] epoch 0: clean 30.00 adv 25.00\n"
        # a DONE line supersedes seed 1's incremental lines
        'OURS S1 DONE: {"clean": [11.0, 21.0, 31.0], "adv": [6.0, 16.0, 26.0]}\n'
    )
    h = parse_ours_log(str(log))
    assert h["1"]["clean"] == [11.0, 21.0, 31.0]
    assert h["2"] == {"clean": [30.0], "adv": [25.0]}


def test_converged_is_last_k_mean():
    assert converged({"clean": [0, 10, 20], "adv": [0, 4, 8]}) == \
        {"clean": 15.0, "adv": 6.0}


def test_merge_cli_roundtrip(tmp_path):
    twin = {
        "recipe": {"epochs": 2}, "task": "hard", "seeds": [1],
        "reference": {"1": {"clean": [50.0, 60.0], "adv": [40.0, 44.0]}},
        "ours": {},
    }
    tp = tmp_path / "twin_hard.json"
    tp.write_text(json.dumps(twin))
    oj = tmp_path / "ours.json"
    oj.write_text(json.dumps({"1": {"clean": [52.0, 58.0],
                                    "adv": [42.0, 46.0]}}))
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "twin_merge.py"),
         "--twin", str(tp), "--ours-json", str(oj)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    merged = json.load(open(tp))
    assert merged["ours"]["1"]["clean"] == [52.0, 58.0]
    summary = json.load(open(tmp_path / "summary_hard.json"))
    assert summary["clean"]["ref_mean"] == 55.0
    assert summary["clean"]["ours_mean"] == 55.0
    assert summary["adv"]["gap"] == 2.0
