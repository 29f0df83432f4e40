"""Static filter-kernel builders for the edge ops.

All kernels are tiny compile-time constants (numpy, computed at trace time) —
nothing here touches the device. Parity targets: the Gaussian/Sobel builders
in the reference (`utils/core.py:58-84`) and the eight directional NMS
kernels (`utils/core.py:87-112`), which the reference constructs by rotating
a 5x5 seed with OpenCV bilinear warps and keeping only exact +/-1 entries.
That construction reduces to "center +1, -1 at the 8-neighbour in the
direction of the angle", so we build them directly.
"""

from __future__ import annotations

import numpy as np


def gaussian_kernel(k: int = 3, mu: float = 0.0, sigma: float = 1.0,
                    normalize: bool = True) -> np.ndarray:
    """k x k Gaussian kernel on a [-1, 1]^2 grid (reference utils/core.py:58)."""
    line = np.linspace(-1, 1, k)
    x, y = np.meshgrid(line, line)
    dist = np.sqrt(x ** 2 + y ** 2)
    g = np.exp(-((dist - mu) ** 2) / (2 * sigma ** 2))
    g = g / (2 * np.pi * sigma ** 2)
    if normalize:
        g = g / g.sum()
    return g.astype(np.float32)


def sobel_kernel(k: int = 3) -> np.ndarray:
    """k x k Sobel-x kernel x / (x^2 + y^2) (reference utils/core.py:75)."""
    line = np.linspace(-(k // 2), k // 2, k)
    x, y = np.meshgrid(line, line)
    denom = x ** 2 + y ** 2
    denom[:, k // 2] = 1.0  # avoid division by zero on the centre column
    return (x / denom).astype(np.float32)


# Offsets (drow, dcol) of the -1 entry for angles 0,45,...,315 degrees in
# image coordinates (row grows downward). Angle 0 points east; positive
# angles rotate counter-clockwise, i.e. toward negative rows.
_DIRECTION_OFFSETS: tuple[tuple[int, int], ...] = (
    (0, 1),    # 0
    (-1, 1),   # 45
    (-1, 0),   # 90
    (-1, -1),  # 135
    (0, -1),   # 180
    (1, -1),   # 225
    (1, 0),    # 270
    (1, 1),    # 315
)


def thin_kernels() -> np.ndarray:
    """The eight 3x3 directional NMS kernels, stacked (8, 3, 3).

    Kernel i computes mag[p] - mag[p + offset_i]: +1 at the centre, -1 at the
    neighbour in direction i*45 degrees. Matches the reference's cv2-rotation
    construction (utils/core.py:87-112) exactly.
    """
    ks = np.zeros((8, 3, 3), dtype=np.float32)
    for i, (dr, dc) in enumerate(_DIRECTION_OFFSETS):
        ks[i, 1, 1] = 1.0
        ks[i, 1 + dr, 1 + dc] = -1.0
    return ks


def hysteresis_kernel() -> np.ndarray:
    """3x3 all-1.25 kernel used for hysteresis voting (utils/core.py:212)."""
    return np.full((3, 3), 1.25, dtype=np.float32)


def direction_offsets() -> tuple[tuple[int, int], ...]:
    return _DIRECTION_OFFSETS
