"""ResNet zoo: plain / EE / EE_square / feature-denoising variants.

Parity targets: Tiny_ImageNet/models_tinyimagenet/resnet*.py and
ImageNet/models_imagenet/resnet*.py — torchvision-style ResNet-18/34/50/101/
152 with 7x7 s2 stem, 3x3 s2 maxpool, BasicBlock/Bottleneck, global average
pool, fc; conv init normal(0, sqrt(2/fan_out)), BN gamma=1 beta=0
(resnet.py:119-130 init loop). The TinyIN AdaptiveAvgPool2d(1) and ImageNet
AvgPool2d(7) heads both reduce to a global spatial mean at their native
resolutions; we use the global mean.

The `_EE`/`_EE_square` variants prepend the edge-enhancement front-end
(resnet_EE.py:176-191) — HFS radius/thresholds from the config, Canny on the
clean input, optional Add_Square on the HFS branch.

`ResNet_fd` adds a non-local dot-product denoising block after every layer
group (resnet_fd.py:105-222, embed=False softmax=False): both reference
einsum paths reduce to f = theta * Gram(phi, g) / (H*W) with
theta=phi=g=x, followed by a 1x1 conv + BN residual add — expressed here as
two MXU einsums over the channel Gram matrix.

Layout NHWC; BatchNorm momentum 0.9 (= torch 0.1), eps 1e-5.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .ee_frontend import EEConfig, ee_frontend

conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
Conv = partial(nn.Conv, use_bias=False, kernel_init=conv_init)


class StemConv(nn.Module):
    """The torchvision 7x7 stride-2 padding-3 stem conv, evaluated as a
    4x4 stride-1 conv over a 2x2 space-to-depth input (12 channels).

    Exact algebraic rewrite (MLPerf-style): with i = 2*oy + dy - 3 and
    i = 2*(oy + du - 2) + py one gets dy = 2*du + py - 1, so
    W'[du,dv,(py,px,c),k] = W[2du+py-1, 2dv+px-1, c, k] (zero outside 0..6)
    and asymmetric padding (2,1). Same FLOPs, but the (C=3)-channel tensors
    that cripple MXU lane packing — especially the per-attack-iteration
    input gradient d(conv)/dx of shape [N,H,W,3] — become 12-channel at
    half resolution. The parameter stays a [7,7,C,features] 'kernel' under
    this module's name, so checkpoints/weight-copy parity are unaffected."""
    features: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        kernel = self.param("kernel", conv_init, (7, 7, c, self.features),
                            jnp.float32)
        if h % 2 or w % 2:  # odd extents can't space-to-depth; plain path
            return jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        z = x.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        z = z.reshape(n, h // 2, w // 2, 4 * c)
        wp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        wp = wp.reshape(4, 2, 4, 2, c, self.features)
        wp = wp.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, self.features)
        return jax.lax.conv_general_dilated(
            z, wp.astype(x.dtype), (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


def batch_norm(train: bool, dtype=None, name=None):
    """BN with f32 parameters/stats; `dtype` sets the computation dtype
    (bf16 under the mixed-precision policy, the reference's apex-AMP role)."""
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


# torch-backward-exact max pool (first-max tie routing; see ops/pooling.py —
# the EE front-end's saturated plateaus make pooled ties common)
from ..ops.pooling import max_pool_3x3_s2  # noqa: E402


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = None
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = Conv(self.planes, (3, 3), strides=(self.stride,) * 2, padding=1,
                   dtype=self.dtype)(x)
        out = batch_norm(train, self.dtype)(out)
        out = nn.relu(out)
        out = Conv(self.planes, (3, 3), padding=1, dtype=self.dtype)(out)
        out = batch_norm(train, self.dtype)(out)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                            dtype=self.dtype)(x)
            residual = batch_norm(train, self.dtype)(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = None
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = Conv(self.planes, (1, 1), dtype=self.dtype)(x)
        out = nn.relu(batch_norm(train, self.dtype)(out))
        out = Conv(self.planes, (3, 3), strides=(self.stride,) * 2, padding=1,
                   dtype=self.dtype)(out)
        out = nn.relu(batch_norm(train, self.dtype)(out))
        out = Conv(self.planes * 4, (1, 1), dtype=self.dtype)(out)
        out = batch_norm(train, self.dtype)(out)
        if self.stride != 1 or x.shape[-1] != self.planes * 4:
            residual = Conv(self.planes * 4, (1, 1), strides=(self.stride,) * 2,
                            dtype=self.dtype)(x)
            residual = batch_norm(train, self.dtype)(residual)
        return nn.relu(out + residual)


class DenoisingBlock(nn.Module):
    """Non-local means denoising, dot-product version (embed=False,
    softmax=False): f = x . Gram(x, x) / (H*W) -> 1x1 conv -> BN -> x + f."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        gram = jnp.einsum("nhwi,nhwj->nij", x, x,
                          preferred_element_type=jnp.float32)
        f = jnp.einsum("nhwi,nij->nhwj", x, gram,
                       preferred_element_type=jnp.float32) / (h * w)
        f = f.astype(x.dtype)
        f = nn.Conv(c, (1, 1), use_bias=True, kernel_init=conv_init)(f)
        f = batch_norm(train)(f)
        return x + f


class ResNet(nn.Module):
    """Plain / EE / EE_square / FD ResNet, selected by flags. `dtype`
    selects the computation precision (bf16 = the reference's apex-AMP
    mixed precision); params, EE front-end, and the loss stay f32."""
    block: Any                       # BasicBlock | Bottleneck
    layers: Sequence[int]
    num_classes: int = 200
    ee: Optional[EEConfig] = None
    denoise: bool = False
    dtype: Any = None
    # rematerialize the EE front-end in the backward pass: trades the cheap
    # VPU stencil recompute for not storing its intermediates between the
    # attack loop's fwd and bwd (a bandwidth experiment; see docs/PERF.md)
    remat_ee: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Under the bf16 policy the EE front-end computes in bf16 too (the
        # reference's apex-O1 runs its conv-based EE ops in fp16); the ops
        # are dtype-preserving and accumulate matmuls in f32.
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if self.ee is not None:
            square_key = self.make_rng("square") if self.ee.square else None
            edge_map = None
            if self.ee.type_canny == "u2netp":
                # learned edge extractor (the reference's alternative edge
                # source, resnet_EE.py:130-131; BASELINE north-star)
                from .u2net import U2Net
                edge_map = U2Net(full=False)(x, train)
            fe = (jax.checkpoint(ee_frontend, static_argnums=(1,))
                  if self.remat_ee else ee_frontend)
            x = fe(x, self.ee, square_key, edge_map=edge_map)

        # name 'Conv_0' keeps the param path of the plain 7x7 stem conv
        x = StemConv(64, dtype=self.dtype, name="Conv_0")(x)
        x = nn.relu(batch_norm(train, self.dtype)(x))
        x = max_pool_3x3_s2(x)

        for group, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            for i in range(blocks):
                stride = 2 if (group > 0 and i == 0) else 1
                x = self.block(planes, stride, dtype=self.dtype)(x, train)
            if self.denoise:
                x = DenoisingBlock()(x, train)

        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype)(x).astype(jnp.float32)


_LAYOUTS = {18: (BasicBlock, (2, 2, 2, 2)), 34: (BasicBlock, (3, 4, 6, 3)),
            50: (Bottleneck, (3, 4, 6, 3)), 101: (Bottleneck, (3, 4, 23, 3)),
            152: (Bottleneck, (3, 8, 36, 3))}


def resnet(depth: int, num_classes: int = 200, ee: Optional[EEConfig] = None,
           denoise: bool = False, dtype: Any = None,
           remat_ee: bool = False) -> ResNet:
    if depth not in _LAYOUTS:
        raise NotImplementedError(
            f"resnet depth {depth}; supported: {sorted(_LAYOUTS)}")
    block, layers = _LAYOUTS[depth]
    return ResNet(block=block, layers=layers, num_classes=num_classes,
                  ee=ee, denoise=denoise, dtype=dtype, remat_ee=remat_ee)


class PreActBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = None
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(batch_norm(train, self.dtype)(x))
        needs_proj = self.stride != 1 or x.shape[-1] != self.planes
        # pre-act shortcut projects the POST-activation tensor (preactresnet.py:31-33)
        shortcut = (Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                         dtype=self.dtype)(out)
                    if needs_proj else x)
        out = Conv(self.planes, (3, 3), strides=(self.stride,) * 2, padding=1,
                   dtype=self.dtype)(out)
        out = Conv(self.planes, (3, 3), padding=1, dtype=self.dtype)(
            nn.relu(batch_norm(train, self.dtype)(out)))
        return out + shortcut


class PreActBottleneck(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = None
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = nn.relu(batch_norm(train, self.dtype)(x))
        needs_proj = self.stride != 1 or x.shape[-1] != self.planes * 4
        shortcut = (Conv(self.planes * 4, (1, 1), strides=(self.stride,) * 2,
                         dtype=self.dtype)(out)
                    if needs_proj else x)
        out = Conv(self.planes, (1, 1), dtype=self.dtype)(out)
        out = Conv(self.planes, (3, 3), strides=(self.stride,) * 2, padding=1,
                   dtype=self.dtype)(nn.relu(batch_norm(train, self.dtype)(out)))
        out = Conv(self.planes * 4, (1, 1), dtype=self.dtype)(
            nn.relu(batch_norm(train, self.dtype)(out)))
        return out + shortcut


class PreActResNet(nn.Module):
    """Pre-activation ResNet with the AWP drivers' dataset-specific stems
    (AWP/*/models_*/preactresnet.py:68-155): CIFAR uses a 3x3 stem with no
    BN/pool; ImageNet/Tiny-ImageNet use the 7x7 stem + maxpool. A final
    BN+relu precedes the pool in all variants (preactresnet.py:143-144)."""
    block: Any
    layers: Sequence[int]
    num_classes: int = 200
    dataset: str = "Tiny-ImageNet"   # CIFAR10 | CIFAR100 | ImageNet | Tiny-ImageNet
    ee: Optional[EEConfig] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        if self.ee is not None:
            square_key = self.make_rng("square") if self.ee.square else None
            x = ee_frontend(x, self.ee, square_key)

        if self.dataset.startswith("CIFAR"):
            x = Conv(64, (3, 3), padding=1, dtype=self.dtype)(x)
        else:
            x = StemConv(64, dtype=self.dtype, name="Conv_0")(x)
            x = nn.relu(batch_norm(train, self.dtype)(x))
            x = max_pool_3x3_s2(x)

        for group, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            for i in range(blocks):
                stride = 2 if (group > 0 and i == 0) else 1
                x = self.block(planes, stride, dtype=self.dtype)(x, train)

        x = nn.relu(batch_norm(train, self.dtype)(x))
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, dtype=self.dtype)(x).astype(jnp.float32)


def preact_resnet(depth: int, dataset: str = "Tiny-ImageNet",
                  ee: Optional[EEConfig] = None, dtype: Any = None) -> PreActResNet:
    block_map = {18: (PreActBlock, (2, 2, 2, 2)), 34: (PreActBlock, (3, 4, 6, 3)),
                 50: (PreActBottleneck, (3, 4, 6, 3)),
                 101: (PreActBottleneck, (3, 4, 23, 3)),
                 152: (PreActBottleneck, (3, 8, 36, 3))}
    block, layers = block_map[depth]
    nclass = {"CIFAR10": 10, "CIFAR100": 100, "ImageNet": 1000,
              "Tiny-ImageNet": 200}[dataset]
    return PreActResNet(block=block, layers=layers, num_classes=nclass,
                        dataset=dataset, ee=ee, dtype=dtype)
