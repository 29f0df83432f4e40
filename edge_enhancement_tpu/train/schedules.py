"""Per-epoch learning-rate schedules (reference utils/helper.py:64-100 and
the drivers' scheduler choices). All are host-side functions of the epoch —
the resulting lr enters the jitted step as a traced scalar, so schedule
changes never recompile."""

from __future__ import annotations

import math

import numpy as np


def step30(init_lr: float, epoch: int) -> float:
    """0.1x every 30 epochs (ImageNet driver, utils/helper.py:64-68)."""
    return init_lr * (0.1 ** (epoch // 30))


def step30_free(init_lr: float, epoch: int, n_repeats: int) -> float:
    """Free-AT: decay boundary scaled by replay count (utils/helper.py:71-75)."""
    return init_lr * (0.1 ** (epoch // int(math.ceil(30.0 / n_repeats))))


def piecewise_50_75(init_lr: float, epoch: int, total_epochs: int) -> float:
    """0.1x at 50% and 75% of training (TinyIN/AWP drivers,
    utils/helper.py:78-88; note the reference uses strict >)."""
    if epoch > total_epochs * 0.75:
        return init_lr * 0.01
    if epoch > total_epochs * 0.5:
        return init_lr * 0.1
    return init_lr


def multistep(init_lr: float, epoch: int, milestones=(50, 80), gamma: float = 0.1) -> float:
    """torch MultiStepLR (MNIST driver, experiments_mnist.py:97)."""
    k = sum(1 for m in milestones if epoch >= m)
    return init_lr * (gamma ** k)


def cyclic_interp(lr_min: float, lr_max: float, step: int, total_steps: int) -> float:
    """Symmetric triangular interp (generic cyclic fallback)."""
    return float(np.interp([step], [0, total_steps * 0.5, total_steps],
                           [lr_min, lr_max, lr_min])[0])


def interp_knots(epoch_float: float, lr_epochs, lr_values) -> float:
    """Fast-AT schedule: np.interp over absolute-epoch knots, evaluated at
    epoch + minibatch fraction (fgsm_imagenet/main_fast.py:172,227-230;
    phase configs give knots like [0,1,6] -> [0,0.4,0.04])."""
    return float(np.interp([epoch_float], list(lr_epochs), list(lr_values))[0])


def get_schedule(name: str):
    return {
        "step30": step30,
        "step30_free": step30_free,
        "piecewise_50_75": piecewise_50_75,
        "multistep": multistep,
        "cyclic": cyclic_interp,
    }[name]
