"""Unitary Fourier transforms and transfer-function helpers.

Replaces the reference's twin FFT stacks (`surfh/ToolsDir/jax_utils.py:30-57`
scipy twins `surfh/ToolsDir/python_utils.py:40-71`) and the slivers of the
`udft` companion package the reference relies on (`udft.ir2fr`,
`udft.laplacian`).  Everything here runs under jit on TPU; XLA maps the batched
2-D real FFTs onto fused per-plane kernels.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def dft(inarray):
    """Unitary real DFT over the last two axes."""
    return jnp.fft.rfftn(inarray, axes=(-2, -1), norm="ortho")


def idft(inarray, im_shape: Tuple[int, int]):
    """Unitary inverse real DFT over the last ``len(im_shape)`` axes."""
    return _idft(inarray, tuple(im_shape))


@jax.jit
def dft_mult(a, b):
    """rfft2(a) * b — fused for convenience."""
    return jnp.fft.rfftn(a, axes=(-2, -1), norm="ortho") * b


from functools import partial


@partial(jax.jit, static_argnums=1)
def _idft(inarray, im_shape):
    axes = tuple(range(-len(im_shape), 0))
    return jnp.fft.irfftn(inarray, s=im_shape, axes=axes, norm="ortho")


@partial(jax.jit, static_argnums=2)
def idft_mult(a, b, im_shape):
    return _idft(a * b, tuple(im_shape))


def convolve_freq(cube, otf, im_shape: Tuple[int, int]):
    """Circular convolution of each plane of `cube` with transfer function `otf`.

    `otf` must be a *non-unitary* transfer function from :func:`ir2fr`; with the
    unitary dft/idft pair the result is the plain circular convolution with the
    impulse response (the reference's C operator,
    /root/reference/surfh/Models/spectroModel.py:166).
    """
    return idft(dft(cube) * otf, im_shape)


def ir2fr(imp_resp: np.ndarray, shape: Tuple[int, int], center=None, real: bool = True) -> np.ndarray:
    """Transfer function of an impulse response, centered, non-unitary.

    NumPy/host-side (run once at model construction).  Matches the `udft.ir2fr`
    semantics the reference uses to build `sotf` and `_otf_sr`
    (/root/reference/surfh/Models/spectroModelChannel.py:81-83): pad the
    impulse response to `shape`, roll its center to index (0, 0), and take the
    non-normalized real FFT over the trailing ``len(shape)`` axes.
    """
    imp_resp = np.asarray(imp_resp)
    ndim_s = len(shape)
    if center is None:
        center = [length // 2 for length in imp_resp.shape[-ndim_s:]]
    padded = np.zeros(imp_resp.shape[:-ndim_s] + tuple(shape), dtype=imp_resp.dtype)
    padded[tuple(slice(0, s) for s in imp_resp.shape)] = imp_resp
    for ax, shift in enumerate(center):
        padded = np.roll(padded, -shift, imp_resp.ndim - ndim_s + ax)
    axes = list(range(imp_resp.ndim - ndim_s, imp_resp.ndim))
    if real:
        return np.fft.rfftn(padded, axes=axes)
    return np.fft.fftn(padded, axes=axes)


def laplacian(ndim: int) -> np.ndarray:
    """Discrete Laplacian impulse response (sum of 1-D [-1, 2, -1] stencils)."""
    lapl = np.zeros((3,) * ndim)
    for dim in range(ndim):
        idx = tuple(
            [slice(1, 2)] * dim + [slice(None)] + [slice(1, 2)] * (ndim - dim - 1)
        )
        lapl[idx] += np.array([-1.0, 2.0, -1.0]).reshape(
            [-1 if i == dim else 1 for i in range(ndim)]
        )
    return lapl


def box_otf_sr(srf: int, im_shape: Tuple[int, int], dtype=np.complex64) -> np.ndarray:
    """OTF of the [srf, 1] box used to accumulate `srf` oversampled α rows.

    Reference: `_otf_sr` at /root/reference/surfh/Models/spectroModelChannel.py:81.
    """
    return ir2fr(np.ones((srf, 1)), im_shape)[np.newaxis, ...].astype(dtype)


def half_srf_shift_otf(srf: int, im_shape: Tuple[int, int], dtype=np.complex64) -> np.ndarray:
    """Pure-phase OTF shifting by (srf-1)//2 along α (the `decalf` trick).

    The reference builds a dirac at index [-(srf-1)//2, 0] scaled by
    sqrt(N1·N2) and takes its unitary DFT
    (/root/reference/surfh/Models/spectroModelChannel.py:104-108); the scaling
    makes it a unit-modulus phase ramp.  Computed numerically the same way for
    bit parity.
    """
    decal = np.zeros(im_shape)
    dsi = int((srf - 1) / 2)
    decal[-dsi if dsi else 0, 0] = np.sqrt(im_shape[0] * im_shape[1])
    return np.fft.rfftn(decal, axes=(-2, -1), norm="ortho").astype(dtype)
