"""Image quality metrics.

SSIM matches skimage.metrics.structural_similarity defaults for float images
(gaussian_weights=False, 7x7 uniform window, C1=(0.01*L)^2, C2=(0.03*L)^2,
L=data_range) — skimage is not available in this environment so the reference's
ssim logging (optimizer_nuscenes.py:18,1657-1666) is reproduced here.
"""
from __future__ import annotations

import numpy as np


def _uniform_filter(img, size):
    from scipy.ndimage import uniform_filter

    return uniform_filter(img, size=size, mode="reflect")


def ssim(img1: np.ndarray, img2: np.ndarray, data_range: float = 1.0,
         win_size: int = 7, channel_axis: int | None = None) -> float:
    """Mean structural similarity of two float images (H, W) or (H, W, C)."""
    img1 = np.asarray(img1, np.float64)
    img2 = np.asarray(img2, np.float64)
    if channel_axis is None and img1.ndim == 3:
        channel_axis = -1
    if channel_axis is not None:
        chans = [
            ssim(np.take(img1, c, axis=channel_axis),
                 np.take(img2, c, axis=channel_axis),
                 data_range=data_range, win_size=win_size)
            for c in range(img1.shape[channel_axis])
        ]
        return float(np.mean(chans))

    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    NP = win_size ** img1.ndim
    cov_norm = NP / (NP - 1)

    ux = _uniform_filter(img1, win_size)
    uy = _uniform_filter(img2, win_size)
    uxx = _uniform_filter(img1 * img1, win_size)
    uyy = _uniform_filter(img2 * img2, win_size)
    uxy = _uniform_filter(img1 * img2, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    A1 = 2 * ux * uy + C1
    A2 = 2 * vxy + C2
    B1 = ux ** 2 + uy ** 2 + C1
    B2 = vx + vy + C2
    S = (A1 * A2) / (B1 * B2)
    pad = (win_size - 1) // 2
    crop = tuple(slice(pad, s - pad) for s in S.shape)
    return float(S[crop].mean())


def psnr_from_mse(mse: float) -> float:
    return float(-10.0 * np.log(mse) / np.log(10.0))
