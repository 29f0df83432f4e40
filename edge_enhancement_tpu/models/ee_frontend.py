"""The edge-enhancement defense front-end, composable with any backbone.

Reproduces the input transform every `_EE` / `_EE_square` model in the
reference applies before its CNN (e.g. Net2_EE.forward,
MNIST/models_mnist/Net2_EE.py:38-49; ResNet_EE.forward,
Tiny_ImageNet/models_tinyimagenet/resnet_EE.py:176-191):

    x_hfs   = HFS(x)                         # or HFS(add_square(x)) for _square
    x_canny = Canny(x, low, high, hysteresis=True)   # always on the CLEAN x
    x       = clamp(x_hfs + w * x_canny, 0, 1)
    optional: x_canny smoothed by a 3x3 Gaussian first (`with_gf`)

Implemented as a pure function so it jits/fuses into the backbone forward and
differentiates for white-box attacks.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.canny import CANNY_VARIANTS
from ..ops.filters import gaussian_kernel
from ..ops.hfs import high_freq_suppress
from ..ops.square import add_square
from ..ops.stencil import stencil2d


@dataclasses.dataclass(frozen=True)
class EEConfig:
    """Static hyperparameters of the defense front-end (from the YAML configs)."""
    r: int = 8                      # HFS low-pass radius
    w: float = 1.0                  # edge-map weight
    with_gf: bool = False           # Gaussian-smooth the edge map
    low: float = 60.0               # low threshold, in /255 units
    high: float = 120.0             # high threshold, in /255 units
    alpha: float = 0.0              # magnitude mask threshold
    sigma: float = 1.0              # Gaussian blur sigma
    type_canny: str = "CannyFilter"
    # square augmentation (only used when `square=True`)
    square: bool = False
    epsilon: float = 0.05
    n_queries: int = 5000
    # use the fused Pallas kernel for the BPDA-3 variant (TPU hot path)
    fused: bool = False

    @property
    def low_scaled(self) -> float:
        return self.low / 255.0

    @property
    def high_scaled(self) -> float:
        return self.high / 255.0


def ee_frontend(x: jnp.ndarray, cfg: EEConfig,
                square_key: Optional[jax.Array] = None,
                edge_map: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Apply the defense front-end to an NHWC batch in [0, 1].

    `edge_map` supplies a precomputed (B, H, W, 1) edge map in place of the
    Canny variants — used for the learned U2-Net extractor (the reference
    instantiates U2NETP inside ResNet_EE as the alternative edge source,
    resnet_EE.py:130-131)."""
    # fully-fused Pallas path: add_square + HFS + canny + clamp as ONE
    # fwd/adjoint kernel pair (ops/pallas/ee_fused.py); RNG-identical to the
    # unfused path (same add_square draw sequence)
    if (cfg.fused and cfg.type_canny == "CannyFilter_step125_1"
            and not cfg.with_gf and edge_map is None
            and (not cfg.square or cfg.n_queries == 1)):
        from ..ops.pallas.ee_fused import ee_frontend_fused
        return ee_frontend_fused(x, cfg, square_key)

    if cfg.square:
        if square_key is None:
            raise ValueError("EEConfig.square=True requires a PRNG key")
        x_in = add_square(x, square_key, epsilon=cfg.epsilon, n_queries=cfg.n_queries)
    else:
        x_in = x

    x_hfs = high_freq_suppress(x_in, cfg.r)
    # the edge branch always sees the clean input, even in the _square
    # variants (Net2_EE_square.py:49-55, resnet_EE_square forward).
    if edge_map is not None:
        x_canny = edge_map
    elif cfg.fused and cfg.type_canny == "CannyFilter_step125_1":
        from ..ops.pallas.ee_fused import canny_step125_fused
        x_canny = canny_step125_fused(x, cfg.high_scaled, cfg.sigma, cfg.alpha)
    else:
        canny_fn = CANNY_VARIANTS[cfg.type_canny]
        x_canny = canny_fn(x, cfg.low_scaled, cfg.high_scaled, hysteresis=True,
                           sigma=cfg.sigma, alpha=cfg.alpha)
    if cfg.with_gf:
        x_canny = stencil2d(x_canny, gaussian_kernel(3, 0.0, 1.0), pad_mode="zero")
    out = x_hfs + cfg.w * x_canny
    return jnp.clip(out, 0.0, 1.0)
