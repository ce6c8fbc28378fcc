"""Image quality metrics: SSIM (pure numpy, vectorized).

Complements the exact-integer PSNR in kernels/png.py: PSNR measures mean
error power, SSIM (Wang et al., IEEE TIP 2004, "Image Quality
Assessment: From Error Visibility to Structural Similarity") measures
local luminance/contrast/structure agreement — the standard pair of
reference metrics a media pipeline reports after any lossy step.

Implementation notes (all-numpy hot path, no Python per-pixel work):
uniform 8x8 windows (the common "SSIM uniform" variant; the paper's
11-tap Gaussian changes absolute values slightly but not ordering) via
2-D summed-area tables, so cost is O(pixels) regardless of window size.
"""

from __future__ import annotations

import numpy as np

_C1 = (0.01 * 255.0) ** 2
_C2 = (0.03 * 255.0) ** 2


def _to_gray(img: np.ndarray) -> np.ndarray:
    """HxW or HxWxC uint8 -> HxW float64 luma (ITU-R BT.601 weights)."""
    a = np.asarray(img, np.float64)
    if a.ndim == 2:
        return a
    if a.shape[2] == 1:
        return a[:, :, 0]
    return (0.299 * a[:, :, 0] + 0.587 * a[:, :, 1]
            + 0.114 * a[:, :, 2])


def _window_sums(a: np.ndarray, k: int) -> np.ndarray:
    """Sum of every k x k window (valid positions) via a summed-area
    table — O(HW) for any k."""
    s = np.zeros((a.shape[0] + 1, a.shape[1] + 1), np.float64)
    np.cumsum(a, axis=0, out=s[1:, 1:])
    np.cumsum(s[1:, 1:], axis=1, out=s[1:, 1:])
    return (s[k:, k:] - s[:-k, k:] - s[k:, :-k] + s[:-k, :-k])


def ssim(a: np.ndarray, b: np.ndarray, window: int = 8) -> float:
    """Mean SSIM between two images (uint8 arrays of the same shape).

    Window shrinks to min(H, W) for tiny images so the metric is defined
    down to 1x1 (where it degenerates to the luminance term)."""
    ga, gb = _to_gray(a), _to_gray(b)
    if ga.shape != gb.shape:
        raise ValueError(f"shape mismatch: {ga.shape} vs {gb.shape}")
    k = max(1, min(window, ga.shape[0], ga.shape[1]))
    n = float(k * k)
    mu_a = _window_sums(ga, k) / n
    mu_b = _window_sums(gb, k) / n
    saa = _window_sums(ga * ga, k) / n
    sbb = _window_sums(gb * gb, k) / n
    sab = _window_sums(ga * gb, k) / n
    var_a = saa - mu_a * mu_a
    var_b = sbb - mu_b * mu_b
    cov = sab - mu_a * mu_b
    num = (2.0 * mu_a * mu_b + _C1) * (2.0 * cov + _C2)
    den = (mu_a ** 2 + mu_b ** 2 + _C1) * (var_a + var_b + _C2)
    return float(np.mean(num / den))
