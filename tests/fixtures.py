"""Hermetic test fixtures mirroring the reference suite's shapes.

The reference fixture (/root/reference/test/global_variable_testing.py) uses a
251×251 image, the chan-2a 970-sample detector λ axis, a ~300-sample coarser
cube λ axis, 4 linear-ramp templates, seeded random maps — but loads its PSF
from an absolute user path.  Here the PSF is generated with `gaussian_psf`.
"""

from functools import lru_cache
from math import ceil

import numpy as np

from surfh_tpu.core.fft import ir2fr
from surfh_tpu.instrument.geometry import FOV, Coord, CoordList
from surfh_tpu.instrument.ifu import IFU
from surfh_tpu.instrument.spectral import SpectralBlur
from surfh_tpu.utils.psf import gaussian_psf

STEP_ARCSEC = 0.025
STEP_DEGREE = STEP_ARCSEC / 3600.0
GRATING_RESOLUTION = float(np.mean([2990, 3110]))


@lru_cache(maxsize=4)
def make(im_size: int = 81, n_lambda: int = 60, n_tpl: int = 4, detector_oversample: int = 2):
    """Build a small self-consistent fixture.

    Returns a dict with maps/templates/axes/sotf and a rotated 2a-like IFU.
    Sizes default far smaller than the reference's (251², 300λ) so the full
    operator ladder dottests run quickly on one CPU core; pass bigger numbers
    for stress runs.
    """
    rng = np.random.default_rng(19940407)
    im_shape = (im_size, im_size)

    # cube λ axis and a finer detector λ axis (ratio ≈ the reference's 2×)
    wavelength_axis = np.linspace(7.51115, 8.75292, n_lambda)
    det_step = (wavelength_axis[1] - wavelength_axis[0]) / detector_oversample
    chan_wavelength_axis = np.arange(
        wavelength_axis[0] - 0.0005, wavelength_axis[-1] + 0.0005, det_step
    )

    templates = np.asarray(
        [[(0.1 * (m + 2)) * x + 11 + 2 * m for x in range(n_lambda)] for m in range(n_tpl)],
        dtype=np.float64,
    )
    maps = rng.random((n_tpl, im_size, im_size))

    spsf = gaussian_psf(wavelength_axis, STEP_ARCSEC)
    sotf = ir2fr(spsf, im_shape)

    alpha_axis = np.arange(im_size) * STEP_DEGREE
    beta_axis = np.arange(im_size) * STEP_DEGREE
    alpha_axis -= np.mean(alpha_axis)
    beta_axis -= np.mean(beta_axis)

    spec_blur = SpectralBlur(GRATING_RESOLUTION)

    # A 2a-like IFU whose FOV fits inside the (small) image.
    fov_width = im_size * STEP_ARCSEC
    ifu = IFU(
        fov=FOV(
            0.35 * fov_width / 3600,
            0.45 * fov_width / 3600,
            origin=Coord(0, 0),
            angle=8.1,
        ),
        det_pix_size=0.196,
        n_slit=5,
        w_blur=spec_blur,
        pce=None,
        wavel_axis=chan_wavelength_axis,
        name="2A",
    )

    pointings = CoordList([Coord(0, 0), Coord(5 * STEP_DEGREE, -3 * STEP_DEGREE)])

    return dict(
        im_shape=im_shape,
        wavelength_axis=wavelength_axis,
        chan_wavelength_axis=chan_wavelength_axis,
        templates=templates,
        maps=maps,
        spsf=spsf,
        sotf=sotf,
        alpha_axis=alpha_axis,
        beta_axis=beta_axis,
        spec_blur=spec_blur,
        ifu=ifu,
        pointings=pointings,
        step_degree=STEP_DEGREE,
    )
