"""RGB metrics: PSNR and SSIM in pure JAX/numpy
(reference: metrics/rgb_metrics.py:13-162 wraps torchmetrics; the math
is standard and reproduced directly)."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy.ndimage import uniform_filter


def psnr(pred, gt, data_range=1.0):
    """Peak signal-to-noise ratio (data_range=1, train_nerf.py:162)."""
    mse = jnp.mean((jnp.asarray(pred) - jnp.asarray(gt)) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def ssim(pred, gt, data_range=1.0, win_size=7, K1=0.01, K2=0.03):
    """Structural similarity, scikit-image-style uniform window
    (the reference computes three SSIM variants incl. scikit's,
    metrics/rgb_metrics.py:60-120; this matches the scikit formulation
    with gaussian_weights=False).

    Args: pred/gt (H, W, C) in [0, data_range].
    """
    pred = np.asarray(pred, np.float64)
    gt = np.asarray(gt, np.float64)
    if pred.ndim == 2:
        pred, gt = pred[..., None], gt[..., None]
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    NP = win_size ** 2
    cov_norm = NP / (NP - 1)
    vals = []
    for c in range(pred.shape[-1]):
        x, y = pred[..., c], gt[..., c]
        ux = uniform_filter(x, win_size)
        uy = uniform_filter(y, win_size)
        uxx = uniform_filter(x * x, win_size)
        uyy = uniform_filter(y * y, win_size)
        uxy = uniform_filter(x * y, win_size)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
        B1, B2 = ux ** 2 + uy ** 2 + C1, vx + vy + C2
        S = (A1 * A2) / (B1 * B2)
        pad = (win_size - 1) // 2
        vals.append(S[pad:-pad, pad:-pad].mean())
    return float(np.mean(vals))
