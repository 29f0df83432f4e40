#!/usr/bin/env python
"""Generate the experiment config surface.

The reference ships 35+ YAML configs spread over per-dataset dirs; these
define its public experiment surface (hyperparameters per method/arch).
This script regenerates that surface for the TPU framework from a compact
spec table — same hyperparameter values, plus the `dataset:`/`lr_schedule:`
keys our unified train.py needs (the reference hard-codes those per driver).

Run from the repo root:  python tools/gen_configs.py
"""

import os
import yaml

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "edge_enhancement_tpu", "configs")

# ---- per-dataset defaults (reference driver-level constants) -------------
MNIST_BASE = dict(dataset="mnist", lr_schedule="multistep", milestones=[50, 80],
                  start_epoch=0, epochs=100, batch_size=50, lr=0.1, momentum=0.3,
                  weight_decay=0.0001, print_freq=100, seed=1, epsilon=0.3,
                  num_steps_1=40, step_size_1=0.01, num_steps_2=50,
                  step_size_2=0.01, num_steps_3=100, step_size_3=0.01,
                  random=True, cize=28)

TIN_BASE = dict(dataset="tiny_imagenet", lr_schedule="piecewise_50_75",
                start_epoch=0, epochs=50, batch_size=100, lr=0.1, momentum=0.9,
                weight_decay=0.0002, print_freq=50, seed=1,
                epsilon=0.062745098039216, num_steps_1=10,
                step_size_1=0.007843137254902, num_steps_2=50,
                step_size_2=0.003921568627451, num_steps_3=100,
                step_size_3=0.003921568627451, random=True, cize=64)

# attack_unroll 1: at 224px the rolled PGD loop beats the 64px full-unroll
# policy (docs/PERF.md "224px tuning")
IN_BASE = dict(dataset="imagenet", lr_schedule="step30", start_epoch=0,
               attack_unroll=1,
               epochs=90, batch_size=256, lr=0.1, momentum=0.9,
               weight_decay=0.0001, print_freq=100, seed=1,
               epsilon=0.062745098039216, num_steps_1=10,
               step_size_1=0.003921568627451, num_steps_2=50,
               step_size_2=0.003921568627451, num_steps_3=100,
               step_size_3=0.003921568627451, random=True, cize=224)

AWP_TIN_BASE = dict(dataset="tiny_imagenet", lr_schedule="piecewise_50_75",
                    start_epoch=0, epochs=200, batch_size=100, lr=0.1,
                    momentum=0.9, weight_decay=0.0005, print_freq=50, seed=0,
                    epsilon=0.062745098039216, num_steps_1=10,
                    step_size_1=0.007843137254902, num_steps_2=20,
                    step_size_2=0.003921568627451, random=True, cize=64,
                    awp_gamma=0.005, awp_warmup=0, l1=0)

AWP_C100_BASE = dict(AWP_TIN_BASE, dataset="cifar100", cize=32,
                     batch_size=128, weight_decay=0.0002, awp_gamma=0.01,
                     epsilon=0.03137254901960784)

EE_MNIST = dict(alpha=0.3, sigma=1.0, w=1.0, r=4, gf=False, low=25.0, high=51.0)
EE_TIN = dict(alpha=0, sigma=1.0, w=1.0, r=8, gf=False, low=38.0, high=76.0)
EE_IN = dict(alpha=0, sigma=1, w=1.0, r=16, gf=False, low=38.0, high=76.0)

CONFIGS = {
    "mnist": (MNIST_BASE, {
        "standard_training": dict(method_name="ST", arch="Net2"),
        "adversarial_training": dict(method_name="AT", arch="Net2"),
        "alp_training": dict(method_name="ALP", arch="Net2", beta=1.0),
        "trades_training": dict(method_name="TRADES", arch="Net2", beta=1.0,
                                lr=0.01, momentum=0.9, weight_decay=0),
        "avmixup": dict(method_name="AVmixup", arch="Net2"),
        "ee_at_training": dict(method_name="EE_AT", arch="Net2_EE", **EE_MNIST),
        "ee_at_bpda3_square": dict(method_name="EE_BPDA3_AT_square",
                                   arch="Net2_EE_square", n_queries=1,
                                   type_canny="CannyFilter_step125_1", **EE_MNIST),
    }),
    "tiny_imagenet": (TIN_BASE, {
        "standard_training": dict(method_name="ST", arch="resnet18",
                                  step_size_1=0.003921568627451),
        "adversarial_training": dict(method_name="AT", arch="resnet18"),
        "alp_training": dict(method_name="ALP", arch="resnet18", beta=1.0,
                             step_size_1=0.003921568627451),
        "trades_training": dict(method_name="TRADES", arch="resnet18", beta=6.0,
                                step_size_1=0.003921568627451),
        "avmixup_training": dict(method_name="AVmixup", arch="resnet18",
                                 step_size_1=0.003921568627451),
        "targeted_adversarial_training": dict(method_name="tarAT", arch="resnet18",
                                              step_size_1=0.003921568627451),
        "targeted_alp_training": dict(method_name="tarALP", arch="resnet18",
                                      beta=1.0, step_size_1=0.003921568627451),
        "targeted_avmixup_training": dict(method_name="tarAVmixup",
                                          arch="resnet18", beta=1.0,
                                          step_size_1=0.003921568627451),
        "ee_at_training": dict(method_name="EE_AT", arch="resnet18_EE",
                               type_canny="CannyFilter",
                               step_size_1=0.003921568627451, **EE_TIN),
        "targeted_ee_training": dict(method_name="tarEE", arch="resnet18_EE",
                                     type_canny="CannyFilter",
                                     step_size_1=0.003921568627451, **EE_TIN),
        "ee_at_square": dict(method_name="EE_AT_square",
                             arch="resnet18_EE_square", n_queries=1,
                             type_canny="CannyFilter", **EE_TIN),
        "processing_ee_at_square": dict(method_name="Processing_EE_AT_square",
                                        arch="resnet18_EE_square", n_queries=1,
                                        type_canny="CannyFilter", **EE_TIN),
        "ee_at_bpda3_square": dict(method_name="EE_BPDA3_AT_square",
                                   arch="resnet18_EE_square", n_queries=1,
                                   type_canny="CannyFilter_step125_1", **EE_TIN),
        # learned U2-Net edge source in place of Canny (the reference
        # instantiates U2NETP inside ResNet_EE, resnet_EE.py:130-131; no
        # reference YAML selects it — exposed here as a first-class config)
        "ee_at_u2netp": dict(method_name="EE_AT", arch="resnet18_EE",
                             type_canny="u2netp",
                             step_size_1=0.003921568627451, **EE_TIN),
        "ee_at_bpda3_pre_square": dict(method_name="EE_BPDA3_AT_pre_square",
                                       arch="resnet18_EE", n_queries=1,
                                       type_canny="CannyFilter_step125_1", **EE_TIN),
        "targeted_ee_at_bpda3_square": dict(method_name="tarEE_BPDA3_AT_square",
                                            arch="resnet18_EE_square", n_queries=1,
                                            type_canny="CannyFilter_step125_1",
                                            **EE_TIN),
    }),
    "imagenet": (IN_BASE, {
        "standard_training": dict(method_name="ST", arch="resnet18"),
        "adversarial_training": dict(method_name="AT", arch="resnet18",
                                     step_size_1=0.007843137254902),
        "targeted_adversarial_training": dict(method_name="tarAT", arch="resnet18"),
        "targeted_alp_training": dict(method_name="tarALP", arch="resnet18", beta=1.0),
        "at_ee_training": dict(method_name="EE_AT", arch="resnet18_EE",
                               type_canny="CannyFilter_step125_1", **EE_IN),
        "targeted_ee_training": dict(method_name="tarEE", arch="resnet18_EE", **EE_IN),
        "targeted_ee_trick_training": dict(method_name="tarEE_trick",
                                           arch="resnet18_EE", label_smooth=0.1,
                                           prob_start_from_clean=0.2, **EE_IN),
        "ee_at_bpda3_square": dict(method_name="EE_AT_bpda3_square",
                                   arch="resnet18_EE_square", n_queries=1,
                                   type_canny="CannyFilter_step125_1", **EE_IN),
        "targeted_ee_at_bpda3_square": dict(method_name="tarEE_BPDA3_AT_square",
                                            arch="resnet18_EE_square", n_queries=1,
                                            type_canny="CannyFilter_step125_1",
                                            step_size_1=0.007843137254902, **EE_IN),
        "targeted_feature_denoising_training": dict(method_name="tarFD",
                                                    arch="resnet18_fd"),
        "targeted_feature_denoising_trick_training": dict(
            method_name="tarFD_trick", arch="resnet18_fd", label_smooth=0.1,
            prob_start_from_clean=0.2),
    }),
    "awp_tiny_imagenet": (AWP_TIN_BASE, {
        "at_awp": dict(method_name="AT_AWP", arch="PreActResNet18"),
        "ee_at_awp": dict(method_name="EE_AT_AWP", arch="PreActResNet18_EE",
                          **EE_TIN),
        "ee_bpda_at_awp": dict(method_name="EE_AT_AWP",
                               arch="PreActResNet18_EE_BPDA", **EE_TIN),
        "ee_bpda_3_at_awp": dict(method_name="EE_AT_AWP",
                                 arch="PreActResNet18_EE_BPDA_3", **EE_TIN),
    }),
    "awp_cifar100": (AWP_C100_BASE, {
        "at_awp": dict(method_name="AT_AWP", arch="PreActResNet18",
                       dataset_variant="CIFAR100"),
    }),
}

# ---- free-AT (free_imagenet drivers: argparse defaults) ------------------
FREE_BASE = dict(dataset="imagenet", lr_schedule="step30_free", start_epoch=0,
                 attack_unroll=1,
                 epochs=90, batch_size=256, lr=0.1, momentum=0.9,
                 weight_decay=0.0001, print_freq=100, seed=1, cize=224,
                 n_repeats=4, fgsm_step=4.0, clip_eps=4.0,
                 epsilon=0.0157, num_steps_1=10, step_size_1=0.003921568627451,
                 random=True)

CONFIGS["free_imagenet"] = (FREE_BASE, {
    "free_at": dict(method_name="free_AT", arch="resnet50"),
    "free_at_ee": dict(method_name="free_AT", arch="resnet50_EE",
                       alpha=0, sigma=1.0, w=1.0, r=16, gf=False,
                       low=38.0, high=76.0,
                       type_canny="CannyFilter_step125_1"),
})

# ---- fast-AT (fgsm_imagenet 3-phase progressive resize) ------------------
def _fast_phase(eps_px, phase, ee):
    crop = {1: 128, 2: 224, 3: 288}[phase]
    r = {1: 12, 2: 16, 3: 18}[phase]
    # absolute-epoch LR knots spanning the three phases (reference
    # configs_fast_2px_phase*_ee.yml TRAIN.lr_epochs/lr_values)
    knots = {1: ([0, 1, 6], [0.0, 0.4, 0.04]),
             2: ([6, 12], [0.04, 0.004]),
             3: ([12, 15], [0.004, 0.0004])}[phase]
    c = dict(dataset="imagenet", lr_schedule="fast_knots", method_name="fast_AT",
             attack_unroll=1,
             arch="resnet50_EE" if ee else "resnet50",
             start_epoch={1: 0, 2: 6, 3: 12}[phase],
             epochs={1: 6, 2: 12, 3: 15}[phase],
             lr_epochs=knots[0], lr_values=knots[1],
             batch_size={1: 256, 2: 128, 3: 96}[phase],
             lr=0.1, half=True,
             momentum=0.9, weight_decay=0.0001, print_freq=10, seed=1,
             cize=crop, n_repeats=1, fgsm_step=eps_px * 1.25,
             clip_eps=float(eps_px), random_init=True,
             epsilon=eps_px / 255.0, num_steps_1=10,
             step_size_1=0.00392156862, num_steps_2=50,
             step_size_2=0.00392156862, random=True)
    if ee:
        c.update(alpha=0, sigma=1.0, w=1.0, r=r, gf=False, low=38.0,
                 high=76.0, type_canny="CannyFilter_step125_1")
    return c

def _fast_evaluate(eps_px, ee):
    """configs_fast_{2,4}px_evaluate{,_ee}.yml: eval a finished 3-phase run
    — 288 crop, bs128, PGD-50 @ 1/255 with the training clip_eps ball
    (reference fgsm_imagenet/configs*/configs_fast_*_evaluate*.yml)."""
    c = _fast_phase(eps_px, 3, ee)
    c.update(batch_size=128, evaluate=True, fgsm_step=float(eps_px),
             num_steps_1=50, step_size_1=0.00392156862)
    if eps_px == 4:
        c.update(fgsm_step=5.0)
    for k in ("num_steps_2", "step_size_2"):
        c.pop(k, None)
    return c

fast_entries = {}
for eps_px in (2, 4):
    for phase in (1, 2, 3):
        fast_entries[f"fast_{eps_px}px_phase{phase}"] = _fast_phase(eps_px, phase, False)
        fast_entries[f"fast_{eps_px}px_phase{phase}_ee"] = _fast_phase(eps_px, phase, True)
    fast_entries[f"fast_{eps_px}px_evaluate"] = _fast_evaluate(eps_px, False)
    fast_entries[f"fast_{eps_px}px_evaluate_ee"] = _fast_evaluate(eps_px, True)
CONFIGS["fast_imagenet"] = (dict(), fast_entries)


def main():
    for group, (base, entries) in CONFIGS.items():
        gdir = os.path.join(OUT, group)
        os.makedirs(gdir, exist_ok=True)
        for name, overrides in entries.items():
            cfg = dict(base)
            cfg.update(overrides)
            path = os.path.join(gdir, name + ".yml")
            with open(path, "w") as f:
                yaml.safe_dump(cfg, f, sort_keys=True)
            print("wrote", os.path.relpath(path, OUT))


if __name__ == "__main__":
    main()
