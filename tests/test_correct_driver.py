"""Full real-data correction chain on a synthesized stage-2 file.

Drives `scripts/correct_mrs_data.py::correct_file` end-to-end — stage-2
cal.fits (headers as the JWST pipeline writes them) → realmiri IFU →
channel model → slit labeling → Shepard distortion correction →
channel-specific slit reorder → median λ-filter → corrected-slice FITS —
with a synthetic detector2world in place of the jwst package's WCS
(injected via the `wcs_loader` hook; reference chain:
/root/reference/scripts/correction_mrs_data.py:92-199).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from correct_mrs_data import SLIT_ORDERS, correct_file, reorder_slits  # noqa: E402


def test_reorder_slits_permutation():
    """reorder_slits scatters detector slit i to sky slit order[i] (+roll)."""
    x = np.arange(12, dtype=float)[:, None, None] * np.ones((12, 3, 4))
    out = reorder_slits(x, "ch4a")
    order, roll = SLIT_ORDERS["ch4"]
    assert roll == 0
    for i in range(12):
        np.testing.assert_array_equal(out[order[i]], x[i])

from surfh_tpu.preprocessing.distortion import median_filter_slices  # noqa: E402
from surfh_tpu.preprocessing.fits_io import fits_open, fits_write  # noqa: E402

BAND = "ch4a"  # 12 slits — the smallest channel
N_SLIT = 12
STRIP_W = 5  # detector columns per slit strip
GAP_W = 3  # NaN gap between strips
N_ROWS = 48  # detector rows (λ direction)
N_LAMBDA = 40  # shrunk 4a λ table (542 → 40) to keep the test fast


@pytest.fixture()
def shrunk_4a_table(monkeypatch):
    """Shrink the real 542-sample 4a detector grid so the Channel build and
    the Shepard regrid stay test-sized."""
    from surfh_tpu.instrument import realmiri, wavelength_mrs

    full = wavelength_mrs.get_mrs_wavelength("4a")
    det = np.linspace(full[0], full[-1], N_LAMBDA)
    monkeypatch.setattr(realmiri, "get_mrs_wavelength", lambda b: det)
    return det


def make_stage2_file(tmp_path):
    """A minimal stage-2-like cal.fits: primary header with CHANNEL/BAND,
    SCI extension with RA_V1/DEC_V1/PA_V3 (what realmiri.get_IFU reads)."""
    from surfh_tpu.preprocessing.fits_io import CARD, _format_card, _pad_block

    def header(cards):
        out = [_format_card(k, v) for k, v in cards]
        out.append(b"END".ljust(CARD))
        return _pad_block(b"".join(out))

    sci = np.zeros((2, 2), np.float32)
    buf = header([
        ("SIMPLE", True), ("BITPIX", 8), ("NAXIS", 0),
        ("CHANNEL", 4), ("BAND", "SHORT"),
    ])
    buf += header([
        ("XTENSION", "IMAGE"), ("BITPIX", -32), ("NAXIS", 2),
        ("NAXIS1", 2), ("NAXIS2", 2), ("EXTNAME", "SCI"),
        ("RA_V1", 83.83), ("DEC_V1", -5.42), ("PA_V3", 100.0),
    ])
    buf += _pad_block(sci.astype(">f4").tobytes(), b"\x00")
    path = tmp_path / "ch4a_ch4b_obs1_dither1_cal.fits"
    path.write_bytes(buf)
    return str(path)


def make_synthetic_detector(lam_table):
    """12 vertical slit strips separated by NaN gaps; α spans each strip's
    width, λ runs along detector rows over the band's range (+ a margin so
    every row lands inside the corrected grid)."""
    n_cols = N_SLIT * (STRIP_W + GAP_W)
    alpha_map = np.full((N_ROWS, n_cols), np.nan)
    lam_lo, lam_hi = float(lam_table[0]), float(lam_table[-1])
    arcsec = 1.0 / 3600.0
    for s in range(N_SLIT):
        x0 = s * (STRIP_W + GAP_W)
        for dx in range(STRIP_W):
            # per-slit α offset so slits tile the FOV like the real detector
            alpha_map[:, x0 + dx] = (s * 0.55 + dx * 0.11) * arcsec
    lam_col = np.linspace(lam_lo, lam_hi, N_ROWS)

    def detector2world(xs, ys):
        xs = np.asarray(xs, int)
        ys = np.asarray(ys, int)
        alpha = alpha_map[ys, xs]
        beta = np.zeros_like(alpha, float)
        lam = lam_col[ys]
        return alpha, beta, lam

    # intensity: constant per slit strip = detector slit index + 1
    data = np.full((N_ROWS, n_cols), np.nan)
    for s in range(N_SLIT):
        x0 = s * (STRIP_W + GAP_W)
        data[:, x0:x0 + STRIP_W] = float(s + 1)
    return data, detector2world


def test_correct_file_full_chain(tmp_path, shrunk_4a_table):
    lam_table = shrunk_4a_table
    path = make_stage2_file(tmp_path)
    data, detector2world = make_synthetic_detector(lam_table)

    wavelength_cube = np.linspace(lam_table[0] - 0.5, lam_table[-1] + 0.5, 80)
    corrected, ifu, targ_ra, targ_dec = correct_file(
        path, BAND, npix=61, wavelength_cube=wavelength_cube, mode=0,
        wcs_loader=lambda p: (data, detector2world),
    )

    assert ifu.name == "4A" and ifu.n_slit == N_SLIT
    assert targ_ra == pytest.approx(83.83) and targ_dec == pytest.approx(-5.42)
    assert corrected.shape[0] == N_SLIT and corrected.shape[1] == N_LAMBDA

    # Each detector strip carried a constant intensity s+1; correct_file
    # already applies the channel-4 slit permutation (reorder_slits), so
    # detector strip s lands at sky slit order[s].
    order, roll = SLIT_ORDERS["ch4"]
    assert roll == 0
    reordered = corrected
    for s in range(N_SLIT):
        sky = reordered[order[s]]
        interior = sky[2:-2, 1:-1]
        filled = interior[interior != 0]
        assert filled.size > 0.5 * interior.size
        np.testing.assert_allclose(filled, s + 1.0, atol=1e-3)

    # median λ-filter is shape-preserving and leaves the constant field
    filtered = median_filter_slices(reordered, size=5)
    assert filtered.shape == reordered.shape
    inner = filtered[:, 5:-5, 1:-1]
    ref = reordered[:, 5:-5, 1:-1]
    np.testing.assert_allclose(inner[ref != 0], ref[ref != 0], atol=1e-3)

    # corrected-slice FITS round trip in the driver's layout
    flat = reordered.transpose(1, 0, 2).reshape(
        reordered.shape[1], reordered.shape[0] * reordered.shape[2])
    out = str(tmp_path / "ch4a_corrected.fits")
    fits_write(out, flat.astype(np.float32), header={
        "PA_V3": 100.0, "TARG_RA": targ_ra, "TARG_DEC": targ_dec,
        "CHANNEL": 4, "BAND": "SHORT"})
    back = fits_open(out)[0].data
    np.testing.assert_allclose(back, flat, rtol=1e-6)
