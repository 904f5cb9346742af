"""Reconstruction quality metrics.

Reference: /root/reference/surfh/ToolsDir/metrics.py:30-109.  SSIM is
implemented directly (gaussian-windowed, standard constants) instead of
delegating to scikit-image, so the metric set is dependency-free.
"""

from __future__ import annotations

import numpy as np


def mse(ref, cmp):
    ref, cmp = np.asarray(ref), np.asarray(cmp)
    return float(np.mean((ref.ravel() - cmp.ravel()) ** 2))


def relative_error(ref, cmp):
    """Percent relative squared error (reference metrics.py:38-44)."""
    ref, cmp = np.asarray(ref), np.asarray(cmp)
    return float(
        100 * np.sum(np.abs(ref.ravel() - cmp.ravel()) ** 2) / np.sum(np.abs(ref.ravel()) ** 2)
    )


def psnr(vref, vcmp, dyn=None):
    """Peak SNR using the actual range of the reference by default."""
    vref, vcmp = np.asarray(vref), np.asarray(vcmp)
    if dyn is None:
        dyn = float(vref.max() - vref.min())
    msev = mse(vref, vcmp)
    if msev == 0:
        return float("inf")
    return float(20.0 * np.log10(dyn / np.sqrt(msev)))


def sam(vref, vcmp):
    """Spectral angle measure."""
    vref, vcmp = np.asarray(vref), np.asarray(vcmp)
    denom = np.sqrt(np.sum(vref**2)) * np.sqrt(np.sum(vcmp**2))
    if denom == 0:
        return 0.0
    return float(np.arccos(np.clip(np.sum(vref * vcmp) / denom, -1.0, 1.0)))


def snr(data, data_wo_noise):
    """SNR of noisy vs clean data lists (reference metrics.py:96-109)."""
    flat = np.concatenate([np.asarray(d).ravel() for d in data])
    clean = np.concatenate([np.asarray(d).ravel() for d in data_wo_noise])
    denom = np.sum((flat - clean) ** 2)
    if denom == 0:
        return float("inf")
    return float(10 * np.log10(np.sum(flat**2) / denom))


def _gaussian_window(size=11, sigma=1.5):
    ax = np.arange(size) - size // 2
    g = np.exp(-0.5 * (ax / sigma) ** 2)
    w = np.outer(g, g)
    return w / w.sum()


def ssim(vref, vcmp, dyn=None):
    """Mean structural similarity of two 2-D images (standard Wang et al.
    constants, gaussian 11×11 window)."""
    from scipy.signal import fftconvolve

    x = np.asarray(vref, np.float64)
    y = np.asarray(vcmp, np.float64)
    if dyn is None:
        dyn = float(x.max() - x.min())
        if dyn == 0:
            dyn = 1.0
    C1, C2 = (0.01 * dyn) ** 2, (0.03 * dyn) ** 2
    w = _gaussian_window()

    def f(a):
        return fftconvolve(a, w, mode="valid")

    mx, my = f(x), f(y)
    mx2, my2, mxy = mx * mx, my * my, mx * my
    sx = f(x * x) - mx2
    sy = f(y * y) - my2
    sxy = f(x * y) - mxy
    s = ((2 * mxy + C1) * (2 * sxy + C2)) / ((mx2 + my2 + C1) * (sx + sy + C2))
    return float(np.mean(s))
