"""Preprocessing: Shepard interpolation, slit labeling, distortion pipeline,
median filter; simulation data; metrics; template learning."""

import numpy as np
import pytest

from surfh_tpu.learning import fcls, learn_templates_nmf, nfindr, nmf, pca
from surfh_tpu.preprocessing import (
    exponential_modified_shepard,
    generate_label_image,
    median_filter_slices,
    mrs_slices_distortion_correction,
    sort_labels_by_centroid,
)
from surfh_tpu.simulation.data import get_simulation_data
from surfh_tpu.utils import metrics


# ---------------------------------------------------------------------------
def test_shepard_reproduces_linear_field():
    rng = np.random.default_rng(0)
    pts_a = rng.uniform(0, 10, 400)
    pts_l = rng.uniform(0, 5, 400)
    vals = 2 * pts_a + 3 * pts_l
    am, lm = np.meshgrid(np.linspace(1, 9, 12), np.linspace(1, 4, 10))
    out = exponential_modified_shepard(
        pts_a, pts_l, vals, am, lm, pixel_cutoff=3.0, alpha_res=0.5, lambda_res=0.5
    )
    truth = 2 * am + 3 * lm
    # smooth field: Shepard is a weighted average, expect close agreement
    assert np.abs(out - truth).mean() < 0.5


def test_shepard_zero_outside_cutoff():
    out = exponential_modified_shepard(
        np.array([0.0]),
        np.array([0.0]),
        np.array([5.0]),
        np.array([[10.0]]),
        np.array([[10.0]]),
        pixel_cutoff=1.0,
    )
    assert out[0, 0] == 0.0


def test_label_and_sort():
    grid = np.zeros((10, 12))
    grid[:, 8:10] = 1  # right slit first in raw labeling order
    grid[:, 2:4] = 1
    labels = sort_labels_by_centroid(generate_label_image(grid))
    # slit 1 must be the leftmost component
    ys, xs = np.where(labels == 1)
    assert xs.max() < 5
    ys, xs = np.where(labels == 2)
    assert xs.min() >= 8


def test_distortion_correction_identity_field():
    """A constant intensity field must re-interpolate to a constant."""

    class FakeChannel:
        oshape = (1, 2, 16, 8)

    lam_axis = np.linspace(5.0, 6.0, 16)
    grid = np.zeros((20, 24))
    grid[:, 2:6] = 1
    grid[:, 12:16] = 1
    labels = sort_labels_by_centroid(generate_label_image(grid))

    def detector2world(xs, ys):
        alpha = xs * 0.1
        beta = np.zeros_like(xs, float)
        lam = 5.0 + ys * (1.0 / 19.0)
        return alpha, beta, lam

    data = np.full(grid.shape, 7.0)
    out = mrs_slices_distortion_correction(
        FakeChannel(), labels, detector2world, data, lam_axis, mode=0
    )
    assert out.shape == (2, 16, 8)
    # interior of each corrected slit ≈ 7
    assert np.allclose(out[0][2:-2, 2:-2], 7.0, atol=1e-3)


def test_median_filter_removes_spike():
    slices = np.ones((30, 5))
    slices[15, 2] = 100.0
    filtered = median_filter_slices(slices, size=11)
    assert filtered[15, 2] == 1.0


# ---------------------------------------------------------------------------
def test_simulation_data_shapes():
    a, b, w, spsf, maps, tpl = get_simulation_data(
        spatial_subsampling=4, synthetic_kwargs=dict(size=120, n_wavel=240)
    )
    assert maps.ndim == 3 and maps.shape[0] == 4
    assert tpl.shape == (4, len(w))
    assert len(a) == maps.shape[1] and len(b) == maps.shape[2]
    assert spsf.shape[0] == len(w)
    assert np.all(maps >= 0)


def test_simulation_data_margin():
    a1, _, _, _, m1, _ = get_simulation_data(
        spatial_subsampling=4, margin=0, synthetic_kwargs=dict(size=120, n_wavel=120)
    )
    a2, _, _, _, m2, _ = get_simulation_data(
        spatial_subsampling=4, margin=5, synthetic_kwargs=dict(size=120, n_wavel=120)
    )
    assert m2.shape[1] == m1.shape[1] + 10


# ---------------------------------------------------------------------------
def test_metrics_basic():
    x = np.linspace(0, 1, 100).reshape(10, 10)
    assert metrics.mse(x, x) == 0
    assert metrics.relative_error(x, x) == 0
    assert metrics.psnr(x, x) == float("inf")
    assert metrics.sam(x, x) < 1e-6
    y = x + 0.01
    assert metrics.psnr(x, y) > 30
    noisy = x + np.random.default_rng(0).normal(0, 0.05, x.shape)
    s_clean = metrics.ssim(np.tile(x, (3, 3)), np.tile(x, (3, 3)))
    s_noisy = metrics.ssim(np.tile(x, (3, 3)), np.tile(noisy, (3, 3)))
    assert s_clean == pytest.approx(1.0)
    assert s_noisy < s_clean


# ---------------------------------------------------------------------------
def test_nmf_reconstructs_low_rank():
    rng = np.random.default_rng(1)
    W = rng.random((60, 3))
    H = rng.random((3, 40))
    X = W @ H
    W2, H2, err = nmf(X, 3, n_iter=800, seed=2)
    rel = err / np.linalg.norm(X)
    assert rel < 0.02
    assert np.all(W2 >= 0) and np.all(H2 >= 0)


def test_pca_recovers_variance_order():
    rng = np.random.default_rng(3)
    X = rng.normal(size=(200, 5)) * np.array([10, 5, 1, 0.1, 0.01])
    comps, var, scores = pca(X, 3)
    assert var[0] > var[1] > var[2]
    assert comps.shape == (3, 5)
    assert scores.shape == (200, 3)


def test_nfindr_fcls_roundtrip():
    rng = np.random.default_rng(4)
    k, bands = 3, 20
    E = rng.random((k, bands)) + np.eye(k, bands) * 3  # separated endmembers
    A = rng.dirichlet(np.ones(k), size=500)
    # include pure pixels so nfindr can find the vertices
    A[:k] = np.eye(k)
    X = A @ E
    E_hat, idx = nfindr(X, k)
    # each true endmember must be close to one found endmember
    for i in range(k):
        d = np.linalg.norm(E_hat - E[i], axis=1).min()
        assert d < 1e-6
    A_hat = fcls(X, E_hat, n_iter=500)
    np.testing.assert_allclose(A_hat.sum(axis=1), 1.0, atol=1e-5)
    assert np.all(A_hat >= -1e-6)
    np.testing.assert_allclose(A_hat @ E_hat, X, atol=0.02)


def test_learn_templates_nmf_shapes():
    rng = np.random.default_rng(5)
    tpl = rng.random((2, 30))
    maps = rng.random((2, 9, 9))
    cube = np.tensordot(tpl.T, maps, axes=1)
    templates, maps_hat, err = learn_templates_nmf(cube, 2, n_iter=600)
    assert templates.shape == (2, 30)
    assert maps_hat.shape == (2, 9, 9)
    recon = np.tensordot(templates.T, maps_hat, axes=1)
    assert np.linalg.norm(recon - cube) / np.linalg.norm(cube) < 0.05


# ---------------------------------------------------------------------------
def test_fits_scaled_multihdu_roundtrip(tmp_path):
    """A realistic stage-2-style file: empty primary, int16 SCI HDU with
    BSCALE/BZERO/BLANK, float32 ERR HDU, and a BINTABLE — the layout
    `scripts/correct_mrs_data.py` consumes (reference
    correction_mrs_data.py:122-131)."""
    from surfh_tpu.preprocessing.fits_io import (
        BLOCK,
        CARD,
        _format_card,
        _pad_block,
        fits_open,
    )

    rng = np.random.default_rng(0)
    sci_f = rng.uniform(10.0, 20.0, (7, 9))
    bscale, bzero, blank = 0.01, 15.0, -32768
    sci_i = np.round((sci_f - bzero) / bscale).astype(np.int16)
    sci_i[2, 3] = blank
    err = rng.random((7, 9)).astype(np.float32)

    def header(cards):
        out = [_format_card(k, v) for k, v in cards]
        out.append(b"END".ljust(CARD))
        return _pad_block(b"".join(out))

    buf = header([("SIMPLE", True), ("BITPIX", 8), ("NAXIS", 0)])
    buf += header([
        ("XTENSION", "IMAGE"), ("BITPIX", 16), ("NAXIS", 2),
        ("NAXIS1", 9), ("NAXIS2", 7), ("EXTNAME", "SCI"),
        ("BSCALE", bscale), ("BZERO", bzero), ("BLANK", blank),
    ])
    buf += _pad_block(sci_i.astype(">i2").tobytes(), b"\x00")
    buf += header([
        ("XTENSION", "IMAGE"), ("BITPIX", -32), ("NAXIS", 2),
        ("NAXIS1", 9), ("NAXIS2", 7), ("EXTNAME", "ERR"),
    ])
    buf += _pad_block(err.astype(">f4").tobytes(), b"\x00")
    wl = np.linspace(5.0, 7.0, 11)
    buf += header([
        ("XTENSION", "BINTABLE"), ("BITPIX", 8), ("NAXIS", 2),
        ("NAXIS1", 8), ("NAXIS2", 11), ("PCOUNT", 0), ("GCOUNT", 1),
        ("TFIELDS", 1), ("TTYPE1", "WAVELENGTH"), ("TFORM1", "D"),
        ("EXTNAME", "WCS-TABLE"),
    ])
    buf += _pad_block(wl.astype(">f8").tobytes(), b"\x00")

    p = tmp_path / "cal.fits"
    p.write_bytes(buf)

    hdus = fits_open(str(p))
    assert [h.name for h in hdus] == ["", "SCI", "ERR", "WCS-TABLE"]
    sci = hdus[1].data
    assert np.isnan(sci[2, 3])
    good = ~np.isnan(sci)
    np.testing.assert_allclose(sci[good], sci_f[good], atol=bscale / 2 + 1e-9)
    np.testing.assert_array_equal(hdus[2].data, err)
    np.testing.assert_allclose(hdus[3]["WAVELENGTH"], wl)


def test_fits_tile_compressed_raises(tmp_path):
    """Tile-compressed HDUs (ZIMAGE convention) must fail loudly, not parse
    the compressed tiles as data."""
    from surfh_tpu.preprocessing.fits_io import (
        CARD,
        _format_card,
        _pad_block,
        fits_open,
    )

    def header(cards):
        out = [_format_card(k, v) for k, v in cards]
        out.append(b"END".ljust(CARD))
        return _pad_block(b"".join(out))

    buf = header([("SIMPLE", True), ("BITPIX", 8), ("NAXIS", 0)])
    buf += header([
        ("XTENSION", "BINTABLE"), ("BITPIX", 8), ("NAXIS", 2),
        ("NAXIS1", 8), ("NAXIS2", 1), ("PCOUNT", 0), ("GCOUNT", 1),
        ("TFIELDS", 1), ("TTYPE1", "COMPRESSED_DATA"), ("TFORM1", "K"),
        ("ZIMAGE", True), ("ZCMPTYPE", "RICE_1"), ("EXTNAME", "SCI"),
    ])
    buf += _pad_block(np.zeros(1, ">i8").tobytes(), b"\x00")
    p = tmp_path / "comp.fits"
    p.write_bytes(buf)
    with pytest.raises(NotImplementedError, match="RICE_1"):
        fits_open(str(p))


def test_crop_psf_stack_reference_convention():
    """Precomputed webbpsf stacks are windowed with the reference's centering
    rule (simulation_data.py:96-133): start = idx - N//2 (odd N) or
    idx - (N/2 - 1) (even N), clamped — e.g. the 451² stack cropped to 251²
    is exactly the reference's hard-coded [100:351] window."""
    from surfh_tpu.pipeline import crop_psf_stack

    stack = np.arange(2 * 451 * 451, dtype=np.float32).reshape(2, 451, 451)
    out = crop_psf_stack(stack, 251)
    np.testing.assert_array_equal(out, stack[:, 100:351, 100:351])

    # even target size: start = idx - (N/2 - 1)
    out = crop_psf_stack(stack, 250)
    np.testing.assert_array_equal(out, stack[:, 101:351, 101:351])

    # smaller-than-grid stacks pass through untouched
    small = np.ones((3, 64, 64), np.float32)
    assert crop_psf_stack(small, 251) is small
