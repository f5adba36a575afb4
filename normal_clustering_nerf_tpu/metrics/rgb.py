"""RGB metrics: PSNR and the reference's three SSIM variants
(reference: metrics/rgb_metrics.py:13-162 wraps torchmetrics/scikit; the
math is standard and reproduced directly):

  * ssim           — torchmetrics-style gaussian window, data_range=1
                     (SSIMPerImg, rgb_metrics.py:40-71)
  * ssim_norm      — gaussian window, per-image data_range =
                     gt.max()-gt.min() (SSIMPerImgNorm, :73-102)
  * ssim_norm_scikit — scikit uniform 7x7 window, per-image range
                     (SSIMPerImgNormSckit, :104-131)
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy.ndimage import uniform_filter


def psnr(pred, gt, data_range=1.0):
    """Peak signal-to-noise ratio (data_range=1, train_nerf.py:162)."""
    mse = jnp.mean((jnp.asarray(pred) - jnp.asarray(gt)) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel1d(size=11, sigma=1.5):
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return k / k.sum()


def _gaussian_filter2d(img, size=11, sigma=1.5):
    """Separable 'valid' gaussian filter of an (H, W) image."""
    k = _gaussian_kernel1d(size, sigma)
    out = np.apply_along_axis(
        lambda r: np.convolve(r, k, mode="valid"), 1, img)
    return np.apply_along_axis(
        lambda c: np.convolve(c, k, mode="valid"), 0, out)


def ssim_gaussian(pred, gt, data_range=1.0, size=11, sigma=1.5,
                  K1=0.01, K2=0.03):
    """SSIM with a gaussian window and population covariance — the
    torchmetrics StructuralSimilarityIndexMeasure formulation used by
    the reference's SSIMPerImg/SSIMPerImgNorm
    (metrics/rgb_metrics.py:40-102).

    Args: pred/gt (H, W, C) or (H, W); data_range scalar.
    """
    pred = np.asarray(pred, np.float64)
    gt = np.asarray(gt, np.float64)
    if pred.ndim == 2:
        pred, gt = pred[..., None], gt[..., None]
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    vals = []
    for c in range(pred.shape[-1]):
        x, y = pred[..., c], gt[..., c]
        f = lambda z: _gaussian_filter2d(z, size, sigma)
        ux, uy = f(x), f(y)
        vx = f(x * x) - ux * ux
        vy = f(y * y) - uy * uy
        vxy = f(x * y) - ux * uy
        S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
            (ux ** 2 + uy ** 2 + C1) * (vx + vy + C2))
        vals.append(S.mean())
    return float(np.mean(vals))


def ssim_norm(pred, gt):
    """Gaussian-window SSIM with per-image data_range = gt.max()-gt.min()
    (reference SSIMPerImgNorm, metrics/rgb_metrics.py:73-102)."""
    gt_a = np.asarray(gt, np.float64)
    rng = float(gt_a.max() - gt_a.min())
    return ssim_gaussian(pred, gt, data_range=max(rng, 1e-12))


def ssim_norm_scikit(pred, gt):
    """Scikit uniform-window SSIM with per-image data_range
    (reference SSIMPerImgNormSckit, metrics/rgb_metrics.py:104-131)."""
    gt_a = np.asarray(gt, np.float64)
    rng = float(gt_a.max() - gt_a.min())
    return ssim(pred, gt, data_range=max(rng, 1e-12))


def ssim(pred, gt, data_range=1.0, win_size=7, K1=0.01, K2=0.03):
    """Structural similarity, scikit-image-style uniform window
    (matches the scikit formulation with gaussian_weights=False,
    sample covariance; reference SSIMPerImgNormSckit uses this kernel).

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
