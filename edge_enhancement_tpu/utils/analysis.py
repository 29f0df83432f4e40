"""Log scraping + paper-figure analysis tools.

Covers the reference's utils/read_log.py (regex-scrape `Epoch:`/`* Clean/Adv
Prec@` lines out of log.txt) and utils/plot_core.py (FFT low/high-frequency
image splits, Canny/HFS visualisation grids, loss-curve plots). The log
format is shared between the reference and our train.py, so these tools work
on either's logs.
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np

from ..ops.canny import CANNY_VARIANTS
from ..ops.hfs import hfs_mask, high_freq_suppress

_EPOCH_RE = re.compile(
    r"Epoch: \[(\d+)\]\[(\d+)/(\d+)\].*?"
    r"Loss ([\d.]+) \(([\d.]+)\).*?"
    r"Prec@1 ([\d.]+) \(([\d.]+)\).*?"
    r"Prec@5 ([\d.]+) \(([\d.]+)\)", re.S)
_CLEAN_RE = re.compile(r"\* Clean Prec@1 ([\d.]+) Prec@5 ([\d.]+)")
_ADV_RE = re.compile(r"\* Adv Prec@1 ([\d.]+) Prec@5 ([\d.]+)")


def parse_train_log(path: str) -> dict:
    """Return {'epochs', 'loss_avg', 'top1_avg', 'clean_top1', 'clean_top5',
    'adv_top1', 'adv_top5'} arrays scraped from a log.txt."""
    text = open(path).read()
    rows = _EPOCH_RE.findall(text)
    clean = _CLEAN_RE.findall(text)
    adv = _ADV_RE.findall(text)
    return {
        "epochs": np.array([int(r[0]) for r in rows]),
        "iters": np.array([int(r[1]) for r in rows]),
        "loss_avg": np.array([float(r[4]) for r in rows]),
        "top1_avg": np.array([float(r[6]) for r in rows]),
        "top5_avg": np.array([float(r[8]) for r in rows]),
        "clean_top1": np.array([float(a) for a, _ in clean]),
        "clean_top5": np.array([float(b) for _, b in clean]),
        "adv_top1": np.array([float(a) for a, _ in adv]),
        "adv_top5": np.array([float(b) for _, b in adv]),
    }


def frequency_split(img_hwc: np.ndarray, r: int) -> tuple[np.ndarray, np.ndarray]:
    """Split an image into its low-/high-frequency parts with the same
    centred-square mask HFS uses (reference utils/plot_core.py:19-70)."""
    h, w = img_hwc.shape[:2]
    mask = hfs_mask(h, w, r)
    f = np.fft.fft2(img_hwc, axes=(0, 1))
    low = np.real(np.fft.ifft2(f * mask[..., None], axes=(0, 1)))
    high = img_hwc - low
    return low, high


def edge_visualization(img_hwc: np.ndarray, *, variant: str = "CannyFilter",
                       low: float = 60 / 255, high: float = 120 / 255,
                       r: int = 8, sigma: float = 1.0,
                       alpha: float = 0.0) -> dict:
    """Compute the HFS image + edge map for a single image (the panels of the
    reference's visualisation grids, utils/plot.py:102-211)."""
    import jax.numpy as jnp
    x = jnp.asarray(img_hwc, jnp.float32)[None]
    canny_fn = CANNY_VARIANTS[variant]
    return {
        "hfs": np.asarray(high_freq_suppress(x, r))[0],
        "edges": np.asarray(canny_fn(x, low, high, hysteresis=True,
                                     sigma=sigma, alpha=alpha))[0],
    }


def loss_landscape(ops, params, batch_stats, x, y, *,
                   span: float = 1.0, resolution: int = 11,
                   seed: int = 0) -> dict:
    """2-D loss landscape over two filter-normalised random directions in
    parameter space (the reference's 3-D loss-landscape figure,
    utils/plot.py:309-395). Returns {'alphas', 'betas', 'loss'} grids."""
    import jax
    import jax.numpy as jnp
    from ..train.modelops import cross_entropy

    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))

    def rand_dir(key):
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(key, len(leaves))
        outs = []
        for leaf, k in zip(leaves, keys):
            d = jax.random.normal(k, leaf.shape, leaf.dtype)
            # filter-wise normalisation: ||d|| scaled to ||w|| per leaf
            n_w = jnp.linalg.norm(leaf.reshape(-1))
            n_d = jnp.linalg.norm(d.reshape(-1)) + 1e-10
            outs.append(d * (n_w / n_d))
        return jax.tree.unflatten(treedef, outs)

    d1, d2 = rand_dir(k1), rand_dir(k2)
    alphas = np.linspace(-span, span, resolution)
    betas = np.linspace(-span, span, resolution)

    @jax.jit
    def loss_at(a, b):
        p = jax.tree.map(lambda w, u, v: w + a * u + b * v, params, d1, d2)
        logits = ops.logits_eval(p, batch_stats, x, jax.random.PRNGKey(1))
        return cross_entropy(logits, y, "mean")

    grid = np.zeros((resolution, resolution))
    for i, a in enumerate(alphas):
        for j, b in enumerate(betas):
            grid[i, j] = float(loss_at(jnp.float32(a), jnp.float32(b)))
    return {"alphas": alphas, "betas": betas, "loss": grid}


def plot_loss_landscape(landscape: dict, out_path: str) -> Optional[str]:
    """Render the loss-landscape surface (utils/plot.py:309-395)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    from mpl_toolkits.mplot3d import Axes3D  # noqa: F401
    a, b = np.meshgrid(landscape["alphas"], landscape["betas"], indexing="ij")
    fig = plt.figure(figsize=(7, 5))
    ax = fig.add_subplot(111, projection="3d")
    ax.plot_surface(a, b, landscape["loss"], cmap="viridis", alpha=0.9)
    ax.set_xlabel("alpha")
    ax.set_ylabel("beta")
    ax.set_zlabel("loss")
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    return out_path


def plot_training_curves(log_paths: dict[str, str], out_path: str,
                         metric: str = "adv_top1") -> Optional[str]:
    """Plot robust/clean accuracy curves from one or more logs
    (reference utils/plot.py:214-307). Returns out_path, or None if
    matplotlib is unavailable."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for label, path in log_paths.items():
        data = parse_train_log(path)
        y = data[metric]
        ax.plot(np.arange(len(y)), y, label=label, linewidth=1.5)
    ax.set_xlabel("epoch")
    ax.set_ylabel(metric)
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    return out_path
