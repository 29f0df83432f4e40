"""eval.py driver coverage: the standalone evaluation entry point runs
end-to-end in CI at scaled-down shapes, chained from a real train.run
checkpoint.

train.py's surface is rot-guarded by the 57-config smoke sweep
(test_config_smoke.py); this is the same guard for eval.py — the
battery/suite plumbing (PGD tiers, FGSM, CW, the AutoAttack path), the
checkpoint handoff between the two drivers, and the dataset construction
(which must honour cize/synthetic_size exactly like train.run so e.g. the
fast-AT phase configs evaluate at their own resolution).
"""

import pathlib

import jax
import pytest

import eval as eval_mod
import train as train_mod
from edge_enhancement_tpu.utils.config import load_config

jax.config.update("jax_compilation_cache_dir", "/tmp/ee_jax_cache_ci")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

CONFIG = str(pathlib.Path(__file__).resolve().parent.parent
             / "edge_enhancement_tpu" / "configs" / "mnist"
             / "ee_at_bpda3_square.yml")


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    out = tmp_path_factory.mktemp("eval_driver")
    cfg = load_config(CONFIG, {
        "data": "synthetic", "epochs": 1, "limit_batches": 1,
        "batch_size": 8, "synthetic_size": 16, "output": str(out),
        "print_freq": 1, "attack_unroll": 1, "steps_per_dispatch": 1,
        "num_steps_1": 1,
    })
    train_mod.run(cfg)
    ckpts = list(out.rglob("ckpt"))
    assert ckpts, "train.run saved no checkpoint"
    return str(ckpts[0])


def _eval_cfg(trained_ckpt, **over):
    base = {
        "data": "synthetic", "synthetic_size": 16, "batch_size": 8,
        "limit_batches": 1, "attack_unroll": 1, "resume": trained_ckpt,
        # shrink every declared PGD tier (the YAML ships 40/50/100)
        "num_steps_1": 1, "step_size_1": 2 / 255,
        "num_steps_2": 1, "step_size_2": 1 / 255,
        "num_steps_3": 1, "step_size_3": 1 / 255,
    }
    base.update(over)
    return load_config(CONFIG, base)


def test_eval_batteries(trained_ckpt, capsys):
    """PGD tiers + FGSM + CW through the real driver on the train.run ckpt."""
    eval_mod.run(_eval_cfg(trained_ckpt, suite="pgd,fgsm,cw", cw_iters=1))
    lines = capsys.readouterr().out
    assert "=> loaded checkpoint" in lines
    # two declared PGD tiers + FGSM + CW, each with clean and adv numbers
    for tag in ("PGD-1", "FGSM", "CW-Linf-1"):
        assert any(tag in ln and "adv Prec@1" in ln
                   for ln in lines.splitlines()), (tag, lines)


def test_eval_autoattack_path(trained_ckpt, capsys):
    """The AA suite plumbing (build_autoattack + accuracy accounting) runs
    through the driver. Tiny budgets: attack arithmetic has its own
    fidelity tests (test_autoattack_fidelity.py)."""
    eval_mod.run(_eval_cfg(
        trained_ckpt, suite="aa", aa_batches=1,
        aa_apgd_steps=2, aa_fab_steps=2, aa_square_queries=2,
        aa_target_classes=1, aa_attacks="apgd-ce,square"))
    lines = capsys.readouterr().out
    aa = [ln for ln in lines.splitlines() if ln.startswith("AutoAttack:")]
    assert aa, lines
    # robust accuracy can never exceed clean on the same samples
    clean = float(aa[0].split("clean Prec@1")[1].split()[0])
    robust = float(aa[0].split("robust Prec@1")[1].split()[0])
    assert 0.0 <= robust <= clean <= 100.0
