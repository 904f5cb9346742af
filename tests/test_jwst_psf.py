"""Physics contracts for the native JWST diffraction PSF generator.

These pin the physical-optics invariants the webbpsf-generated stacks obey
(/root/reference/scripts/webbpsf_generation.py:10-50): λ/D core scaling,
'last'-style energy normalization, detector-sampled oversampling, and
drop-in compatibility with the pipeline's PSF-stack consumers.
"""

import os

import numpy as np
import pytest

from surfh_tpu.utils import jwst_psf
from surfh_tpu.pipeline import crop_psf_stack


def _fwhm_px(psf: np.ndarray) -> float:
    """FWHM (px) of the radial profile through the peak row."""
    peak = psf.max()
    row = psf[np.unravel_index(psf.argmax(), psf.shape)[0]]
    above = np.where(row >= peak / 2.0)[0]
    return float(above[-1] - above[0] + 1)


def test_pupil_geometry():
    pup = jwst_psf.jwst_pupil(384)
    assert pup.shape == (384, 384) and pup.dtype == np.float32
    dx = jwst_psf.PUPIL_DIAMETER / 384
    area = pup.sum() * dx * dx
    # 18 hexes = 18·(√3/2)·1.32² ≈ 27.2 m², minus struts → ~25–27 m²
    assert 24.0 < area < 28.0
    # centre segment absent: the exact centre is inside the (removed) centre hex
    assert pup[192, 192] == 0.0
    # the mask is invariant under 120° rotation (6-fold segment rings ∩
    # 3-fold struts); a 45° rotation breaks the hex layout and must NOT match
    def rot_nn(img, deg):
        n = img.shape[0]
        c = (n - 1) / 2.0
        yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        th = np.deg2rad(deg)
        xs = (xx - c) * np.cos(th) + (yy - c) * np.sin(th) + c
        ys = -(xx - c) * np.sin(th) + (yy - c) * np.cos(th) + c
        xi = np.clip(np.rint(xs).astype(int), 0, n - 1)
        yi = np.clip(np.rint(ys).astype(int), 0, n - 1)
        return img[yi, xi]

    # measured: 120° → 0.973 (NN-resampling edge flips only), 45° → 0.798
    agree_120 = float((rot_nn(pup, 120.0) == pup).mean())
    agree_45 = float((rot_nn(pup, 45.0) == pup).mean())
    assert agree_120 > 0.96
    assert agree_45 < 0.90


def test_core_fwhm_matches_lambda_over_d():
    pup = jwst_psf.jwst_pupil(256)
    lam, scale = 10.0, 0.025
    psf = jwst_psf.monochromatic_psf(pup, lam, scale, 201)
    lam_over_d_px = (lam * 1e-6 / 6.5) / jwst_psf.ARCSEC_TO_RAD / scale
    fwhm = _fwhm_px(psf)
    # circular-aperture Airy FWHM is 1.025 λ/D; hex segmented is close
    assert 0.75 * lam_over_d_px < fwhm < 1.35 * lam_over_d_px
    # peak is centred
    assert np.unravel_index(psf.argmax(), psf.shape) == (100, 100)


def test_energy_normalization_last_convention():
    pup = jwst_psf.jwst_pupil(256)
    # wide fov at short λ captures nearly all the energy; never exceeds 1
    psf = jwst_psf.monochromatic_psf(pup, 5.0, 0.05, 301)
    total = float(psf.sum())
    assert 0.75 < total <= 1.0 + 1e-3


def test_wavelength_scaling():
    pup = jwst_psf.jwst_pupil(256)
    f1 = _fwhm_px(jwst_psf.monochromatic_psf(pup, 6.0, 0.025, 201))
    f2 = _fwhm_px(jwst_psf.monochromatic_psf(pup, 12.0, 0.025, 201))
    assert 1.7 < f2 / f1 < 2.3


def test_stack_shape_and_oversample():
    wavels = np.array([8.0, 12.0])
    s1 = jwst_psf.psf_stack(wavels, 0.05, npix=65, oversample=1, n_pupil=128)
    s2 = jwst_psf.psf_stack(wavels, 0.05, npix=65, oversample=2, n_pupil=128)
    assert s1.shape == s2.shape == (2, 65, 65)
    # oversampled-then-binned agrees with detector-sampled at the core
    for a, b in zip(s1, s2):
        assert abs(float(a.max()) - float(b.max())) / float(a.max()) < 0.05
    # numpy path bit-compares structure with the jax path
    s_np = jwst_psf.psf_stack(wavels, 0.05, npix=65, oversample=1, n_pupil=128, use_jax=False)
    assert np.allclose(s1, s_np, rtol=1e-4, atol=1e-9)


def test_device_stack_matches_host():
    """In-graph kernel construction (psf_stack_device) matches the host path."""
    wavels = np.array([8.0, 10.0, 12.0])
    host = jwst_psf.psf_stack(wavels, 0.05, npix=65, n_pupil=128)
    dev = jwst_psf.psf_stack_device(wavels, 0.05, npix=65, n_pupil=128, chunk=2)
    assert dev.shape == host.shape
    # f32 in-graph cos/sin of O(100 rad) phases vs host f64 cos/sin
    assert float(np.abs(dev - host).max() / host.max()) < 1e-3
    # tail-chunk padding path (len % chunk != 0) returns the unpadded stack
    assert np.allclose(dev[-1].sum(), host[-1].sum(), rtol=1e-3)


def test_pipeline_compatibility():
    wavels = np.linspace(5.0, 6.0, 3)
    stack = jwst_psf.psf_stack(wavels, 0.025, npix=81, n_pupil=128)
    cropped = crop_psf_stack(stack, 41)
    assert cropped.shape == (3, 41, 41)
    # normalized per-plane after renorm (what the models consume)
    renorm = cropped / cropped.sum(axis=(1, 2), keepdims=True)
    assert np.allclose(renorm.sum(axis=(1, 2)), 1.0, atol=1e-6)


def test_flagship_setup_diffraction_knob(monkeypatch):
    """SURFH_SIM_PSF=diffraction swaps the simulation PSF for the
    physical-optics stack (reference simulates with webbpsf PSFs)."""
    monkeypatch.setenv("SURFH_SIM_PSF", "diffraction")
    from surfh_tpu.simulation.flagship import make_allband_setup

    s = make_allband_setup(npix=41, bands=["1a"], n_pointings=1, lambda_subsample=16)
    ps = s["psf_stack"]
    assert ps.shape[1:] == (40, 40)
    assert np.allclose(ps.sum(axis=(1, 2)), 1.0, atol=1e-5)
    # diffraction PSFs are NOT gaussian: hex spikes put energy off-axis
    assert float(ps[0].max()) < 0.5


def test_opd_changes_psf_conserves_energy():
    """Synthetic Zernike OPD (VERDICT r2 item 8): a non-zero wavefront map
    must change the PSF while a pure phase screen conserves total energy."""
    n_pup = 128
    pup = jwst_psf.jwst_pupil(n_pup)
    # 1.5 µm defocus (Noll 4) + 0.5 µm astigmatism (Noll 6): ~λ/5 of
    # wavefront error at λ = 8 µm — enough to visibly degrade the core
    # (400 nm at 8 µm is λ/20 ⇒ Strehl ≈ 0.97, only a 2.6% peak change)
    opd = jwst_psf.zernike_opd(n_pup, {4: 1.5e-6, 6: 0.5e-6})
    assert float(np.abs(opd).max()) > 1e-7
    base = jwst_psf.monochromatic_psf(pup, 8.0, 0.05, 301)
    aber = jwst_psf.monochromatic_psf(pup, 8.0, 0.05, 301, opd=opd)
    # the PSF visibly changes (defocus lowers and broadens the core)
    assert float(np.abs(aber - base).max()) > 0.1 * float(base.max())
    assert float(aber.max()) < float(base.max())
    # pure phase screen: energy conserved to the fov-truncation tail
    assert abs(float(aber.sum()) - float(base.sum())) < 0.02
    # zero OPD is exactly the baseline path
    zero = jwst_psf.monochromatic_psf(
        pup, 8.0, 0.05, 301, opd=np.zeros((n_pup, n_pup))
    )
    assert np.allclose(zero, base, rtol=1e-5, atol=1e-12)


def test_opd_stack_host_device_agree():
    """psf_stack and psf_stack_device agree with an OPD screen folded in."""
    n_pup = 128
    opd = jwst_psf.zernike_opd(n_pup, {4: 300e-9})
    wavels = np.array([8.0, 12.0])
    host = jwst_psf.psf_stack(wavels, 0.05, npix=65, n_pupil=n_pup, opd=opd)
    dev = jwst_psf.psf_stack_device(wavels, 0.05, npix=65, n_pupil=n_pup,
                                    chunk=2, opd=opd)
    assert float(np.abs(dev - host).max() / host.max()) < 2e-3
    # numpy path too
    host_np = jwst_psf.psf_stack(wavels, 0.05, npix=65, n_pupil=n_pup,
                                 opd=opd, use_jax=False)
    assert np.allclose(host, host_np, rtol=1e-4, atol=1e-9)


def test_load_opd_roundtrip(tmp_path):
    """load_opd reads .npy and FITS maps, converts units, resamples."""
    from surfh_tpu.preprocessing.fits_io import fits_write

    opd = jwst_psf.zernike_opd(96, {4: 100e-9})
    p_npy = str(tmp_path / "opd.npy")
    np.save(p_npy, opd * 1e9)  # store in nm
    got = jwst_psf.load_opd(p_npy, 96, unit="nm")
    assert np.allclose(got, opd, atol=1e-15)
    # FITS roundtrip with resampling 96 → 128
    p_fits = str(tmp_path / "opd.fits")
    fits_write(p_fits, (opd * 1e6).astype(np.float64))  # µm
    got128 = jwst_psf.load_opd(p_fits, 128, unit="um")
    assert got128.shape == (128, 128)
    # interior values interpolate smoothly (compare at matched centers)
    assert abs(got128[64, 64] - opd[48, 48]) < 5e-9


def test_gen_psf_cli_opd(tmp_path):
    """cli gen-psf --opd produces a stack that differs from the ideal one."""
    from click.testing import CliRunner

    from surfh_tpu.cli import cli

    opd = jwst_psf.zernike_opd(96, {4: 400e-9})
    p_opd = str(tmp_path / "opd.npy")
    np.save(p_opd, opd)
    lam = str(tmp_path / "lam.npy")
    np.save(lam, np.array([8.0]))
    out_i = str(tmp_path / "ideal.npy")
    out_a = str(tmp_path / "aber.npy")
    r = CliRunner().invoke(cli, [
        "gen-psf", "-w", lam, "--npix", "65", "--n-pupil", "96", "-o", out_i])
    assert r.exit_code == 0, r.output
    r = CliRunner().invoke(cli, [
        "gen-psf", "-w", lam, "--npix", "65", "--n-pupil", "96",
        "--opd", p_opd, "-o", out_a])
    assert r.exit_code == 0, r.output
    ideal, aber = np.load(out_i), np.load(out_a)
    assert not np.allclose(ideal, aber, rtol=1e-3)


def test_flagship_sotf_cache_keyed_on_psf_family(monkeypatch, tmp_path):
    """The sotf disk cache must not serve one PSF family's OTF to the other
    (ADVICE r2: key previously omitted the family → stale cross-family load)."""
    from surfh_tpu.simulation.flagship import make_allband_setup

    monkeypatch.setenv("SURFH_CACHE_DIR", str(tmp_path))
    kw = dict(npix=41, bands=["1a"], n_pointings=1, lambda_subsample=64,
              build_sotf=True)
    monkeypatch.setenv("SURFH_SIM_PSF", "gaussian")
    s_g = make_allband_setup(**kw)
    monkeypatch.setenv("SURFH_SIM_PSF", "diffraction")
    s_d = make_allband_setup(**kw)
    # two distinct cache entries, and each sotf matches ITS OWN psf_stack
    assert len(list(tmp_path.glob("sotf_*.npy"))) == 2
    from surfh_tpu.core.fft import ir2fr

    for s in (s_g, s_d):
        expect = ir2fr(np.asarray(s["psf_stack"][:1]), s["im_shape"])
        assert np.allclose(s["sotf"][:1], expect, rtol=1e-5, atol=1e-7)
    assert not np.allclose(np.asarray(s_g["sotf"]), np.asarray(s_d["sotf"]),
                           rtol=1e-3, atol=1e-5)


def test_diffraction_spikes_sixfold():
    """Hex segment gaps/edges imprint 6-fold symmetric diffraction structure."""
    pup = jwst_psf.jwst_pupil(256)
    psf = jwst_psf.monochromatic_psf(pup, 10.0, 0.025, 201)
    # compare energy in 60°-rotated sectors of an annulus outside the core
    yy, xx = np.mgrid[:201, :201]
    r = np.hypot(yy - 100, xx - 100)
    ang = np.arctan2(yy - 100, xx - 100) % (np.pi / 3.0)
    annulus = (r > 30) & (r < 80)
    halves = [
        float(psf[annulus & (ang < np.pi / 6.0)].sum()),
        float(psf[annulus & (ang >= np.pi / 6.0)].sum()),
    ]
    # not a strict symmetry test, just that flux exists in all sectors
    assert min(halves) > 0.0 and max(halves) / min(halves) < 10.0


# ---------------------------------------------------------------------------
# recorded OPD fixture (VERDICT r3 item 7): realistic in-flight wavefront
# ---------------------------------------------------------------------------

OPD_FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "surfh_tpu", "instrument", "data", "jwst_opd_commissioning.json",
)


def _ellipticity(psf: np.ndarray, w: int = 15) -> float:
    """1 - b/a from intensity-weighted second moments of the core window."""
    r, c = np.unravel_index(psf.argmax(), psf.shape)
    win = psf[r - w : r + w + 1, c - w : c + w + 1]
    yy, xx = np.mgrid[-w : w + 1, -w : w + 1]
    tot = win.sum()
    mxx = (win * xx * xx).sum() / tot
    myy = (win * yy * yy).sum() / tot
    mxy = (win * xx * yy).sum() / tot
    tr, det = mxx + myy, mxx * myy - mxy * mxy
    lam1 = tr / 2 + np.sqrt(tr * tr / 4 - det)
    lam2 = tr / 2 - np.sqrt(tr * tr / 4 - det)
    return float(1.0 - np.sqrt(lam2 / lam1))


def test_recorded_opd_is_at_inflight_level():
    """The bundled fixture reproduces the published ~70 nm rms in-flight
    observatory WFE (Rigby et al. 2023) over the illuminated pupil."""
    pup = jwst_psf.jwst_pupil(256)
    opd = jwst_psf.recorded_opd(OPD_FIXTURE, 256)
    rms_nm = float(np.sqrt(np.mean(opd[pup > 0] ** 2))) * 1e9
    assert 60.0 < rms_nm < 80.0
    # per-segment pistons are visible as between-segment jumps: the OPD is
    # not a pure low-order surface
    assert np.ptp(opd[pup > 0]) * 1e9 > 200.0


def test_recorded_opd_strehl_matches_marechal():
    """Peak attenuation under the recorded OPD follows exp(-(2πσ/λ)²) —
    the physical-optics propagation treats the phase screen correctly."""
    pup = jwst_psf.jwst_pupil(256)
    opd = jwst_psf.recorded_opd(OPD_FIXTURE, 256)
    sigma = float(np.sqrt(np.mean(opd[pup > 0] ** 2)))
    for lam_um, scale in ((1.0, 0.008), (5.35, 0.025)):
        p0 = jwst_psf.monochromatic_psf(pup, lam_um, scale, 201)
        p1 = jwst_psf.monochromatic_psf(pup, lam_um, scale, 201, opd=opd)
        strehl = float(p1.max() / p0.max())
        marechal = float(np.exp(-((2 * np.pi * sigma / (lam_um * 1e-6)) ** 2)))
        assert abs(strehl - marechal) < 0.02, (lam_um, strehl, marechal)


def test_recorded_opd_miri_band_psf_change():
    """At MIRI wavelengths the in-flight wavefront barely moves the PSF —
    the diffraction-limited claim, quantified (recorded in PERF.md): at
    band-1a λ=5.35 µm the FWHM shifts <2% and ellipticity <0.005."""
    pup = jwst_psf.jwst_pupil(256)
    opd = jwst_psf.recorded_opd(OPD_FIXTURE, 256)
    p0 = jwst_psf.monochromatic_psf(pup, 5.35, 0.025, 201)
    p1 = jwst_psf.monochromatic_psf(pup, 5.35, 0.025, 201, opd=opd)
    assert abs(_fwhm_px(p1) - _fwhm_px(p0)) <= max(1, 0.02 * _fwhm_px(p0))
    assert abs(_ellipticity(p1) - _ellipticity(p0)) < 0.005
    assert 0.985 < p1.max() / p0.max() < 0.999  # Strehl ≈ 0.993


def test_gen_psf_cli_with_recorded_opd(tmp_path):
    from click.testing import CliRunner

    from surfh_tpu.cli import cli as cli_group

    wav = tmp_path / "wav.npy"
    np.save(wav, np.array([5.3, 5.35], np.float64))
    out = tmp_path / "psf.npy"
    r = CliRunner().invoke(cli_group, [
        "gen-psf", "--wavel-axis", str(wav), "--npix", "61",
        "--n-pupil", "128", "--opd", "commissioning", "-o", str(out),
    ])
    assert r.exit_code == 0, r.output
    import json as _json

    info = _json.loads(r.output.strip().splitlines()[-1])
    assert 55.0 < info["opd_rms_nm"] < 85.0  # full-grid rms (pupil-masked ~70)
    stack = np.load(out)
    assert stack.shape == (2, 61, 61)
    assert np.isfinite(stack).all() and stack.max() > 0
