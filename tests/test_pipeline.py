"""End-to-end real-data fusion pipeline on a synthesized fusion directory.

Builds a fusion dir (templates / wavel axis / PSF / corrected-slice FITS)
from the model's own forward output on a real MIRI band, then reconstructs
through `pipeline.run_real_fusion` — the flagship real-data entry path
(reference scripts/main_fusion.py) without needing JWST data.
"""

import os

import numpy as np
import pytest

from surfh_tpu import pipeline
from surfh_tpu.core.fft import ir2fr
from surfh_tpu.preprocessing.fits_io import fits_write
from surfh_tpu.utils.psf import gaussian_psf

BAND = "4a"  # smallest band (12 slits)
NPIX = 31
PA_V3 = 12.5
STEP = 0.1  # coarse grid: keeps the XLA-CPU compile of the adjoint test-sized


@pytest.fixture(scope="module", autouse=True)
def small_band():
    """Shrink the 4a detector λ grid (542 → 60 samples) so the XLA-CPU
    compile of the real-data model stays test-sized."""
    import surfh_tpu.pipeline as pl

    orig = pl.get_mrs_wavelength
    full = orig(BAND)
    det = np.linspace(full[0], full[-1], 60)
    pl.get_mrs_wavelength = lambda b: det
    yield
    pl.get_mrs_wavelength = orig


@pytest.fixture(scope="module")
def fusion_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("fusion")
    os.makedirs(root / "Templates")
    os.makedirs(root / "PSF")
    os.makedirs(root / "Filtered_slices")

    step_degree = STEP / 3600.0
    det_wavel = pipeline.get_mrs_wavelength(BAND)
    wavel_axis = np.linspace(det_wavel[0] - 0.05, det_wavel[-1] + 0.05, 60)
    templates = np.vstack([np.ones(60), np.linspace(0.5, 2.0, 60)])
    spsf = gaussian_psf(wavel_axis, STEP)
    c = (spsf.shape[1] - NPIX) // 2
    spsf = spsf[:, c : c + NPIX, c : c + NPIX]
    spsf /= spsf.sum(axis=(1, 2), keepdims=True)

    np.save(root / "Templates" / "templates.npy", templates)
    np.save(root / "Templates" / "wavel_axis.npy", wavel_axis)
    np.save(root / "PSF" / "psf.npy", spsf)

    # two pointings: encode dither in TARG_RA/DEC like the reference
    targets = [(83.83, -5.41), (83.83 + 4 * step_degree, -5.41 - 3 * step_degree)]
    data_dict = {
        "data": {BAND: []},
        "target": {BAND: targets},
        "rotation": {BAND: PA_V3},
    }
    instruments = pipeline.create_instruments(data_dict, [BAND])
    alpha = np.arange(NPIX) * step_degree
    alpha -= alpha.mean()
    sotf = ir2fr(spsf, (NPIX, NPIX))
    model = pipeline.create_model(
        sotf, templates, alpha, alpha.copy(), wavel_axis, instruments,
        step_degree, data_dict,
    )
    rng = np.random.default_rng(0)
    truth = rng.random(model.ishape).astype(np.float32)
    y = np.asarray(model.forward(truth)).reshape(model.instrs_oshape[0])
    for p, (ra, dec) in enumerate(targets):
        flat = y[p].transpose(1, 0, 2).reshape(y.shape[2], -1)
        fits_write(
            str(root / "Filtered_slices" / f"{BAND}_dither{p}.fits"),
            flat.astype(np.float32),
            header={"PA_V3": PA_V3, "TARG_RA": ra, "TARG_DEC": dec, "BAND": BAND.upper()},
        )
    np.save(root / "truth.npy", truth)
    return root


def test_load_corrected_data(fusion_dir):
    d = pipeline.load_corrected_data(str(fusion_dir / "Filtered_slices"), [BAND])
    assert len(d["data"][BAND]) == 2
    assert d["rotation"][BAND] == PA_V3
    assert d["data"][BAND][0].shape[0] == 12  # 4a slit count


def test_run_real_fusion_reconstructs(fusion_dir):
    res, model = pipeline.run_real_fusion(
        str(fusion_dir), [BAND], npix=NPIX, mu=1.0, niter=15,
        output_dir=str(fusion_dir / "Results"), step_arcsec=STEP,
    )
    assert os.path.exists(fusion_dir / "Results" / "res_x.npy")
    assert res.grad_norm[-1] < 0.1 * res.grad_norm[0]
    truth = np.load(fusion_dir / "truth.npy")
    # data synthesized from the model itself: residual must be small
    y_hat = np.asarray(model.forward(res.x))
    y = pipeline.assemble_data_vector(
        model,
        pipeline.load_corrected_data(str(fusion_dir / "Filtered_slices"), [BAND]),
        [BAND],
    )
    rel = np.linalg.norm(y_hat - y) / np.linalg.norm(y)
    assert rel < 0.15
