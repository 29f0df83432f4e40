"""Differentiable edge/defense ops (the L2 layer of the framework)."""

from .canny import CANNY_VARIANTS, canny, canny_bpda, canny_step125
from .filters import gaussian_kernel, hysteresis_kernel, sobel_kernel, thin_kernels
from .hfs import hfs_mask, high_freq_suppress
from .square import add_square, p_selection
from .stencil import shift2d, stencil2d
from .ste import binary_connect, safe_sign, to_compare, to_eq

__all__ = [
    "CANNY_VARIANTS", "canny", "canny_bpda", "canny_step125",
    "gaussian_kernel", "hysteresis_kernel", "sobel_kernel", "thin_kernels",
    "hfs_mask", "high_freq_suppress",
    "add_square", "p_selection",
    "shift2d", "stencil2d",
    "binary_connect", "safe_sign", "to_compare", "to_eq",
]
