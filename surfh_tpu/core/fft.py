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


# ---------------------------------------------------------------------------
# MXU matmul-form DFT convolution (flagship TPU hot path)
#
# XLA's TPU FFT runs ~20x off bandwidth-optimal (measured 65 ms for a
# 466-plane 501^2 rfft2+irfft2 pair, size-independent 501/504/512 — not a
# Bluestein artifact).  Recasting the 2-D DFT as explicit matmuls costs
# ~N/log N more FLOPs but runs on the MXU: measured 31 ms for the same
# workload at f32 (`precision="highest"`, max rel deviation 7.1e-6 vs the
# FFT — float32-class), 2.15x faster end-to-end.  In float64 (CPU tests)
# the matrices are exact to ~1e-13, so parity contracts are unaffected.
#
# Layout: x [W, Na, Nb] real; OTF one-sided [W, Na, Kb] (Kb = Nb//2+1) as a
# (re, im) pair — complex64 cannot be uploaded through the axon tunnel.


def dft_matmul_tables(im_shape: Tuple[int, int], dtype=np.float32) -> dict:
    """Host-side DFT matrices for :func:`conv_otf_matmul` (and transpose).

    Equivalent to the non-unitary rfft2/irfft2 pair used by
    :func:`convolve_freq` (the unitary pair's 1/N factors cancel in the
    forward∘inverse composition).  ~6 N² floats, shared by all channels.
    """
    na, nb = int(im_shape[0]), int(im_shape[1])
    kb = nb // 2 + 1
    a = np.arange(na)
    b = np.arange(nb)
    fb = np.exp(-2j * np.pi * np.outer(np.arange(kb), b) / nb)  # [Kb, Nb]
    fa = np.exp(-2j * np.pi * np.outer(a, a) / na)  # [Na, Na]
    ifa = np.conj(fa) / na
    cb = np.exp(2j * np.pi * np.outer(b, np.arange(kb)) / nb)  # [Nb, Kb]
    wgt = np.ones(kb)
    wgt[1:] = 2.0
    if nb % 2 == 0:
        wgt[-1] = 1.0  # even Nb: the Nyquist bin is not doubled
    # fa_d/fa_s (and ifa_*) support the 3-multiplication Gauss form of the
    # complex α-stage: k1=A(u+v), k2=(B−A)u, k3=(A+B)v → re=k1−k3, im=k1+k2
    # (3 matmuls instead of 4; identical linear map).
    return {
        "fb_re": fb.real.astype(dtype),
        "fb_im": fb.imag.astype(dtype),
        "fa_re": fa.real.astype(dtype),
        "fa_d": (fa.imag - fa.real).astype(dtype),
        "fa_s": (fa.real + fa.imag).astype(dtype),
        "ifa_re": ifa.real.astype(dtype),
        "ifa_d": (ifa.imag - ifa.real).astype(dtype),
        "ifa_s": (ifa.real + ifa.imag).astype(dtype),
        "icb_re": (cb.real * wgt / nb).astype(dtype),
        "icb_im": (cb.imag * wgt / nb).astype(dtype),
    }


def conv_otf_matmul(x, otf_re, otf_im, m: dict, precision: str = "highest"):
    """Circular convolution irfft2(rfft2(x) · otf) as MXU matmuls.

    `m` from :func:`dft_matmul_tables` (device or host).  All arithmetic is
    real-valued (re/im planes), so no complex arrays touch the tunnel.
    """
    es = lambda s, p, q: jnp.einsum(s, p, q, precision=precision)
    yb_re = es("wab,kb->wak", x, m["fb_re"])
    yb_im = es("wab,kb->wak", x, m["fb_im"])
    # α-stage, Gauss 3M: k1=A(u+v), k2=(B−A)u, k3=(A+B)v
    k1 = es("wak,ca->wck", yb_re + yb_im, m["fa_re"])
    za_re = k1 - es("wak,ca->wck", yb_im, m["fa_s"])
    za_im = k1 + es("wak,ca->wck", yb_re, m["fa_d"])
    t_re = za_re * otf_re - za_im * otf_im
    t_im = za_re * otf_im + za_im * otf_re
    k1 = es("wck,ac->wak", t_re + t_im, m["ifa_re"])
    ua_re = k1 - es("wck,ac->wak", t_im, m["ifa_s"])
    ua_im = k1 + es("wck,ac->wak", t_re, m["ifa_d"])
    return es("wak,bk->wab", ua_re, m["icb_re"]) - es("wak,bk->wab", ua_im, m["icb_im"])


def conv_otf_matmul_t(g, otf_re, otf_im, m: dict, precision: str = "highest"):
    """Exact transpose of :func:`conv_otf_matmul` w.r.t. `x` (same OTF).

    Mechanical einsum-by-einsum transposition; validated against
    `jax.linear_transpose` at machine precision (tests/test_kernels.py).
    """
    es = lambda s, p, q: jnp.einsum(s, p, q, precision=precision)
    ua_re = es("wab,bk->wak", g, m["icb_re"])
    ua_im = -es("wab,bk->wak", g, m["icb_im"])
    # conj(M) α-stages in Gauss 3M form: k1=A(p+q);
    # re = k1 + (B−A)q, im = k1 − (A+B)p
    k1 = es("wak,ac->wck", ua_re + ua_im, m["ifa_re"])
    t_re = k1 + es("wak,ac->wck", ua_im, m["ifa_d"])
    t_im = k1 - es("wak,ac->wck", ua_re, m["ifa_s"])
    za_re = t_re * otf_re + t_im * otf_im
    za_im = -t_re * otf_im + t_im * otf_re
    k1 = es("wck,ca->wak", za_re + za_im, m["fa_re"])
    yb_re = k1 + es("wck,ca->wak", za_im, m["fa_d"])
    yb_im = k1 - es("wck,ca->wak", za_re, m["fa_s"])
    return es("wak,kb->wab", yb_re, m["fb_re"]) + es("wak,kb->wab", yb_im, m["fb_im"])
