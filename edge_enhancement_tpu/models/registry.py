"""Arch-string -> model constructor registry.

Mirrors the reference drivers' dispatch tables (experiments_mnist.py:60-72,
experiments_tinyimagenet.py:65-105, experiments_imagenet.py:70-121,
experiments_tiny_awp.py:77-96) so every YAML config's `arch:` value resolves
to the same model family here.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import jax.numpy as jnp

from .cnn_mnist import MnistCNN, net2, net2_ee, net2_ee_square
from .ee_frontend import EEConfig
from .resnet import preact_resnet, resnet
from .u2net import U2Net, u2net_full, u2net_small


def _ee_from_args(a: Mapping[str, Any], square: bool,
                  default_type: str = "CannyFilter") -> EEConfig:
    return EEConfig(
        r=int(a.get("r", 16)), w=float(a.get("w", 0.5)),
        with_gf=bool(a.get("gf", False)),
        low=float(a.get("low", 60.0)), high=float(a.get("high", 120.0)),
        alpha=float(a.get("alpha", 0.0)), sigma=float(a.get("sigma", 1.0)),
        type_canny=str(a.get("type_canny", default_type)),
        square=square,
        epsilon=float(a.get("epsilon", 0.05)),
        n_queries=int(a.get("n_queries", 1)),
        fused=bool(a.get("fused_canny", False)))


def _dtype_from_args(a: Mapping[str, Any]):
    """Mixed-precision policy: `dtype: bfloat16` or the reference fast-AT
    key `half: true` select bf16 compute (params stay f32)."""
    if a.get("half") or str(a.get("dtype", "")).lower() in ("bf16", "bfloat16"):
        return jnp.bfloat16
    return None


def build_model(arch: str, args: Mapping[str, Any], num_classes: int):
    """Construct the model for a reference arch string."""
    a = dict(args)
    dtype = _dtype_from_args(a)

    # ---- MNIST family ----------------------------------------------------
    if arch == "Net2":
        return net2()
    if arch == "Net2_EE":
        return MnistCNN(ee=_ee_from_args(a, square=False))
    if arch == "Net2_EE_square":
        return MnistCNN(ee=_ee_from_args(a, square=True,
                                         default_type="CannyFilter"))

    # ---- torchvision-style ResNets --------------------------------------
    m = re.fullmatch(r"resnet(\d+)(_EE_square|_EE|_fd)?", arch)
    if m:
        depth = int(m.group(1))
        suffix = m.group(2) or ""
        remat = bool(a.get("remat_ee", False))
        if suffix == "":
            return resnet(depth, num_classes=num_classes, dtype=dtype)
        if suffix == "_fd":
            return resnet(depth, num_classes=num_classes, denoise=True,
                          dtype=dtype)
        square = suffix == "_EE_square"
        return resnet(depth, num_classes=num_classes,
                      ee=_ee_from_args(a, square=square), dtype=dtype,
                      remat_ee=remat)

    # ---- AWP PreActResNets ----------------------------------------------
    m = re.fullmatch(r"PreActResNet(\d+)(_EE(?:_BPDA(?:_3)?)?)?", arch)
    if m:
        depth = int(m.group(1))
        suffix = m.group(2) or ""
        # our config `dataset:` keys -> the reference PreActResNet switch names
        name_map = {"cifar100": "CIFAR100", "cifar10": "CIFAR10",
                    "tiny_imagenet": "Tiny-ImageNet", "imagenet": "ImageNet"}
        raw = str(a.get("dataset_variant") or a.get("dataset", "Tiny-ImageNet"))
        dataset = name_map.get(raw, raw)
        if suffix == "":
            return preact_resnet(depth, dataset=dataset, dtype=dtype)
        canny_type = {"_EE": "CannyFilter", "_EE_BPDA": "CannyFilter_BPDA",
                      "_EE_BPDA_3": "CannyFilter_step125_1"}[suffix]
        ee = _ee_from_args(a, square=False)
        ee = EEConfig(**{**ee.__dict__, "type_canny": canny_type})
        return preact_resnet(depth, dataset=dataset, ee=ee, dtype=dtype)

    # ---- U2-Net edge extractors (utils/u2net.py) -------------------------
    if arch == "u2net":
        return u2net_full()
    if arch == "u2netp":
        return u2net_small()

    raise NotImplementedError(f"unknown arch {arch!r}")
