"""MNIST CNN family (reference MNIST/models_mnist/Net2*.py), in Flax linen.

Net2:           conv5x5(1->32) -> pool/relu -> conv5x5(32->64) + Dropout2d ->
                pool/relu -> fc 1024 -> fc 10 (Net2.py:6-21).
Net2_EE:        same CNN behind the EE front-end (Net2_EE.py:38-49).
Net2_EE_square: EE front-end with Add_Square on the HFS branch
                (Net2_EE_square.py:49-63).

Layout NHWC; 'VALID' convs match torch's default padding=0. Dropout2d drops
whole channels, i.e. broadcast over the spatial dims.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .ee_frontend import EEConfig, ee_frontend


class MnistCNN(nn.Module):
    """The bare Net_2 backbone; optionally with an EE front-end attached."""
    ee: Optional[EEConfig] = None
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.ee is not None:
            square_key = (self.make_rng("square")
                          if self.ee.square else None)
            x = ee_frontend(x, self.ee, square_key)

        x = nn.Conv(32, (5, 5), padding="VALID",
                    kernel_init=nn.initializers.he_normal())(x)
        x = nn.relu(nn.max_pool(x, (2, 2), strides=(2, 2)))
        x = nn.Conv(64, (5, 5), padding="VALID",
                    kernel_init=nn.initializers.he_normal())(x)
        # Dropout2d: drop entire feature maps (broadcast over H, W).
        x = nn.Dropout(0.5, broadcast_dims=(1, 2), deterministic=not train)(x)
        x = nn.relu(nn.max_pool(x, (2, 2), strides=(2, 2)))
        x = x.reshape((x.shape[0], -1))
        x = nn.relu(nn.Dense(1024)(x))
        x = nn.Dense(self.num_classes)(x)
        return x


def net2() -> MnistCNN:
    return MnistCNN(ee=None)


def net2_ee(r=8, w=1.0, with_gf=False, low=60.0, high=120.0, alpha=0.0,
            sigma=1.0) -> MnistCNN:
    return MnistCNN(ee=EEConfig(r=r, w=w, with_gf=with_gf, low=low, high=high,
                                alpha=alpha, sigma=sigma,
                                type_canny="CannyFilter"))


def net2_ee_square(r=8, w=1.0, with_gf=False, low=60.0, high=120.0, alpha=0.0,
                   sigma=1.0, type_canny="CannyFilter", epsilon=0.05,
                   n_queries=5000) -> MnistCNN:
    return MnistCNN(ee=EEConfig(r=r, w=w, with_gf=with_gf, low=low, high=high,
                                alpha=alpha, sigma=sigma, type_canny=type_canny,
                                square=True, epsilon=epsilon,
                                n_queries=n_queries))
