"""Flagship model on real MIRI band tables (degree-unit fusion convention)."""

import jax.numpy as jnp
import numpy as np
import pytest

from surfh_tpu.core.fft import ir2fr
from surfh_tpu.core.linop import dottest
from surfh_tpu.instrument import miri
from surfh_tpu.instrument.geometry import Coord, CoordList, get_step
from surfh_tpu.models.spectro import SpectroSigRLSCT
from surfh_tpu.utils.psf import gaussian_psf


def test_band_tables():
    ch2a = miri.ch2a
    assert ch2a.n_slit == 17 and ch2a.det_pix_size == 0.196
    assert miri.ch4c.n_slit == 12
    assert len(miri.all_chan) == 12
    assert miri.ch2a_dither.alpha_mean == pytest.approx(
        np.mean(np.asarray(miri.dithering)[8:16, 0])
    )


def test_two_real_bands_flagship_dottest():
    instrs = miri.fusion_bands(["1a", "2a"])
    step = get_step([i.det_pix_size for i in instrs])
    step_degree = step / 3600
    N = 31
    alpha = (np.arange(N) - N / 2) * step_degree
    beta = (np.arange(N) - N / 2) * step_degree
    wavel = np.linspace(
        min(i.wavel_min for i in instrs) - 0.1,
        max(i.wavel_max for i in instrs) + 0.1,
        80,
    )
    tpl = np.vstack([np.ones(80), np.linspace(0.5, 2, 80)])
    spsf = gaussian_psf(wavel, step)
    c = (spsf.shape[1] - N) // 2
    spsf = spsf[:, c : c + N, c : c + N]
    spsf /= spsf.sum(axis=(1, 2), keepdims=True)
    sotf = ir2fr(spsf, (N, N))
    pts = CoordList([Coord(0, 0), Coord(3 * step_degree, -2 * step_degree)])
    model = SpectroSigRLSCT(
        sotf, tpl, alpha, beta, wavel, instrs, step_degree, [pts, pts],
        dtype=jnp.float64,
    )
    # ch1a/ch2a share det_pix_size ⇒ the common step equals it (srf = 1)
    assert model.srfs == [1, 1]
    assert dottest(model, num=2, rtol=1e-10)


def test_smallmiri_scaled_resolutions():
    from surfh_tpu.instrument import miri, smallmiri

    small = smallmiri.ch2a
    full = miri.ch2a
    assert small.n_slit == full.n_slit
    assert small.w_blur.grating_resolution == pytest.approx(
        full.w_blur.grating_resolution / 4
    )
    assert len(smallmiri.all_chan) == 12
