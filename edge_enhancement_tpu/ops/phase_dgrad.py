"""Stride-2 convolution with a phase-decomposed input-gradient.

XLA lowers the input-gradient (dgrad) of a stride-2 convolution as an
input-dilated convolution: the incoming cotangent is spread onto a 2x-dilated
grid (every other tap multiplies a structural zero), which the round-2
profile measured at roughly half the forward path's MXU occupancy
(docs/PERF.md: bwd/transposed convs dominate the R50@224 conv fusions at
~29% MXU peak). There is no compiler knob that changes that lowering
(docs/PERF.md round-3 sweep).

This module reformulates the dgrad exactly, with zero extra FLOPs: split
dx by output-pixel parity phase. For stride 2, every dx row-parity class
(i mod 2, j mod 2) receives contributions from a fixed-parity subset of the
kernel taps, and each class is a DENSE stride-1 convolution of the cotangent
with a small sub-kernel. The four phase outputs interleave (depth-to-space)
back into dx. Tap counts per phase sum to exactly kh*kw, so the FLOPs match
the native dgrad while every MAC lands on real data.

The forward pass and the weight gradient are untouched (native XLA); only
the input-gradient path is replaced, via jax.custom_vjp.

Reference workload this targets: the strided bottleneck convolutions of
ResNet-50 at 224px under PGD-AT (reference
ImageNet/fgsm_imagenet/main_fast.py:200-288), where every attack iteration
backpropagates to the pixels through all strided stages.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

_DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                 ("NHWC", "HWIO", "NHWC"))


def _phase_taps(kh, pad_lo, r):
    """Taps of kernel axis `kh` contributing to dx phase `r` (i = 2m + r).

    dx[2m+r] += k[dh] * g[m + o] for every dh with dh === (r+pad_lo) mod 2,
    where o = (r + pad_lo - dh) / 2. Returns (dhs, o_min, o_max) with dhs
    ordered so that tap t of the phase conv (offset o_min + t) uses
    k[dhs[t]]; o steps by 1 as dh steps by -2, so the taps are contiguous.
    """
    dhs = [dh for dh in range(kh) if (dh - r - pad_lo) % 2 == 0]
    if not dhs:
        return [], 0, -1
    offs = [(r + pad_lo - dh) // 2 for dh in dhs]
    order = sorted(range(len(dhs)), key=lambda i: offs[i])
    dhs = [dhs[i] for i in order]
    return dhs, offs[order[0]], offs[order[-1]]


def _phase_dx(g, kernel, x_hw, pad):
    """Exact dgrad of a stride-2 NHWC/HWIO conv as 4 dense stride-1 convs.

    g: cotangent [N, Ho, Wo, F]; kernel: [kh, kw, C, F]; x_hw: (H, W) of the
    primal input (must be even); pad: ((ph, ph), (pw, pw)) of the forward.
    Returns dx [N, H, W, C].
    """
    kh, kw, c, f = kernel.shape
    (h, w) = x_hw
    n, ho, wo = g.shape[0], g.shape[1], g.shape[2]
    mh, mw = h // 2, w // 2
    # kernel transposed for the cotangent contraction: [kh, kw, F, C]
    kt = jnp.swapaxes(kernel, 2, 3)
    phases = []
    for r in (0, 1):
        dhs, oh_min, oh_max = _phase_taps(kh, pad[0][0], r)
        for s in (0, 1):
            dws, ow_min, ow_max = _phase_taps(kw, pad[1][0], s)
            if not dhs or not dws:
                phases.append(jnp.zeros((n, mh, mw, c), g.dtype))
                continue
            sub = kt[jnp.array(dhs)][:, jnp.array(dws)]  # [th, tw, F, C]
            # out[m] = sum_t g[m + o_min + t] * sub[t]: conv with
            # pad_lo = -o_min and pad_hi sized so the output length is M.
            ph_lo = -oh_min
            ph_hi = (mh - 1 + oh_max) - (ho - 1)
            pw_lo = -ow_min
            pw_hi = (mw - 1 + ow_max) - (wo - 1)
            phases.append(lax.conv_general_dilated(
                g, sub, window_strides=(1, 1),
                padding=((ph_lo, ph_hi), (pw_lo, pw_hi)),
                dimension_numbers=_DN,
                preferred_element_type=g.dtype))
    # interleave: dx[n, 2m+r, 2q+s, c] = phases[2r+s][n, m, q, c]
    stacked = jnp.stack(phases, axis=0).reshape(2, 2, n, mh, mw, c)
    dx = jnp.transpose(stacked, (2, 3, 0, 4, 1, 5)).reshape(n, h, w, c)
    return dx


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv2d_s2(x, kernel, pad):
    """Stride-2 conv (NHWC x HWIO), dgrad computed by phase decomposition.

    pad is a static ((ph, ph), (pw, pw)) tuple. Forward and weight gradient
    are XLA-native; only d/dx is replaced. Requires even input H and W.
    """
    return lax.conv_general_dilated(x, kernel, window_strides=(2, 2),
                                    padding=pad, dimension_numbers=_DN,
                                    preferred_element_type=x.dtype)


def _fwd(x, kernel, pad):
    return conv2d_s2(x, kernel, pad), (x, kernel)


def _bwd(pad, res, g):
    x, kernel = res
    dx = _phase_dx(g, kernel, (x.shape[1], x.shape[2]), pad)
    # native weight gradient (the standard patches contraction)
    _, kvjp = jax.vjp(
        lambda k: lax.conv_general_dilated(x, k, window_strides=(2, 2),
                                           padding=pad,
                                           dimension_numbers=_DN,
                                           preferred_element_type=x.dtype),
        kernel)
    (dk,) = kvjp(g)
    return dx, dk


conv2d_s2.defvjp(_fwd, _bwd)
