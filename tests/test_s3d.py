"""s3d ChannelCube ingestion (preprocessing/s3d.py) — the data-converter
step of the reference's generate_real_data_*.py chain, on a synthetic s3d
file written with our own fits_io."""

import subprocess
import sys

import numpy as np
import pytest

from surfh_tpu.preprocessing.fits_io import fits_open, fits_write
from surfh_tpu.preprocessing.s3d import (
    nan_border,
    oversample_plane_cloud,
    read_s3d,
    resample_cube_to_grid,
)


def _write_s3d(path, cube, ra0=83.8, dec0=-5.4, cd=2.0e-5, lam0=5.0, dlam=0.01):
    fits_write(
        str(path),
        cube.astype(np.float32),
        header={
            "CRVAL1": ra0, "CRPIX1": 1.0, "CDELT1": cd,
            "CRVAL2": dec0, "CRPIX2": 1.0, "CDELT2": cd,
            "CRVAL3": lam0, "CRPIX3": 1.0, "CDELT3": dlam,
            "CUNIT3": "um", "CTYPE3": "WAVE",
        },
    )


def test_read_s3d_axes(tmp_path):
    cube = np.arange(3 * 5 * 4, dtype=np.float64).reshape(3, 5, 4)
    _write_s3d(tmp_path / "c.fits", cube)
    got, wavel, ra, dec = read_s3d(str(tmp_path / "c.fits"))
    np.testing.assert_allclose(got, cube)
    np.testing.assert_allclose(wavel, 5.0 + np.arange(3) * 0.01)
    assert ra.shape == dec.shape == (5, 4)
    # RA varies along x (axis 1 of the map), DEC along y
    np.testing.assert_allclose(ra[0], 83.8 + np.arange(4) * 2e-5)
    np.testing.assert_allclose(dec[:, 0], -5.4 + np.arange(5) * 2e-5)


def test_read_s3d_pc_rotation(tmp_path):
    """PC matrix rotates the celestial footprint."""
    cube = np.zeros((1, 3, 3))
    fits_write(
        str(tmp_path / "r.fits"), cube.astype(np.float32),
        header={"CRVAL1": 10.0, "CRPIX1": 2.0, "CDELT1": 1.0,
                "CRVAL2": 20.0, "CRPIX2": 2.0, "CDELT2": 1.0,
                "PC1_1": 0.0, "PC1_2": -1.0, "PC2_1": 1.0, "PC2_2": 0.0},
    )
    _, _, ra, dec = read_s3d(str(tmp_path / "r.fits"))
    # 90° rotation: RA varies along -y, DEC along +x
    np.testing.assert_allclose(ra[:, 1], 10.0 - (np.arange(3) - 1.0))
    np.testing.assert_allclose(dec[1, :], 20.0 + (np.arange(3) - 1.0))


def test_nan_border():
    cube = np.ones((2, 10, 10))
    out = nan_border(cube, width=2)
    assert np.isnan(out[:, :2]).all() and np.isnan(out[:, :, -2:]).all()
    assert np.isfinite(out[:, 2:-2, 2:-2]).all()
    np.testing.assert_array_equal(nan_border(cube, width=0), cube)


def test_oversample_plane_cloud_linear_coords():
    """Block-replicated values; coordinate ramps reproduce a linear WCS
    exactly inside the native extent."""
    ny, nx, of = 5, 6, 3
    yy, xx = np.mgrid[0:ny, 0:nx].astype(float)
    ra = 10.0 + 0.5 * xx + 0.1 * yy
    dec = -3.0 + 0.4 * yy
    cube = np.arange(ny * nx, dtype=float).reshape(1, ny, nx)
    vals, ra_o, dec_o = oversample_plane_cloud(cube, ra, dec, of)
    assert vals.shape == (1, ny * of, nx * of)
    np.testing.assert_array_equal(vals[0, :of, :of], cube[0, 0, 0])
    iy = np.arange(ny * of) / of
    ix = np.arange(nx * of) / of
    # interior: linear field reproduced exactly (bilinear is exact on linear)
    np.testing.assert_allclose(
        ra_o, 10.0 + 0.5 * ix[None, :] + 0.1 * iy[:, None], atol=1e-12
    )
    np.testing.assert_allclose(
        dec_o, np.broadcast_to(-3.0 + 0.4 * iy[:, None], dec_o.shape), atol=1e-12
    )
    same = oversample_plane_cloud(cube, ra, dec, 1)
    assert same[0] is cube and same[1] is ra


def test_resample_recovers_linear_plane():
    """A linear-in-world-coords plane must resample exactly (linear
    interpolation is exact on affine fields)."""
    ny, nx = 14, 12
    yy, xx = np.mgrid[0:ny, 0:nx].astype(float)
    cd = 1.0e-3
    ra = 50.0 + cd * xx
    dec = 10.0 + cd * yy
    nlam = 3
    planes = [2.0 + 100.0 * (ra - 50.0) + 40.0 * (dec - 10.0) + w for w in range(nlam)]
    cube = np.stack(planes)

    alpha_axis = 50.0 + cd * np.linspace(2.2, 8.8, 9)
    beta_axis = 10.0 + cd * np.linspace(2.1, 10.9, 7)
    out = resample_cube_to_grid(cube, ra, dec, alpha_axis, beta_axis,
                                oversample=1, border=1)
    assert out.shape == (nlam, 7, 9)
    expect = (2.0 + 100.0 * (alpha_axis[None, :] - 50.0)
              + 40.0 * (beta_axis[:, None] - 10.0))
    for w in range(nlam):
        np.testing.assert_allclose(out[w], expect + w, rtol=1e-10)

    # oversample>1 block-replicates values (like the reference's stamp +
    # box-conv, generate_real_data_single_fits.py:149-159): no longer exact
    # on a linear field, but bounded by the one-native-pixel variation.
    out2 = resample_cube_to_grid(cube, ra, dec, alpha_axis, beta_axis,
                                 oversample=2, border=1)
    assert np.nanmax(np.abs(out2 - out)) < 100.0 * cd * 1.5


def test_resample_fill_outside():
    ny, nx = 8, 8
    yy, xx = np.mgrid[0:ny, 0:nx].astype(float)
    ra, dec = 1.0 + 0.01 * xx, 2.0 + 0.01 * yy
    cube = np.ones((1, ny, nx))
    alpha_axis = np.array([1.02, 99.0])  # second point far outside
    beta_axis = np.array([2.02, 2.03])
    out = resample_cube_to_grid(cube, ra, dec, alpha_axis, beta_axis,
                                oversample=1, border=1)
    assert np.isfinite(out[0, :, 0]).all()
    assert np.isnan(out[0, :, 1]).all()


def test_convert_s3d_script(tmp_path):
    """End-to-end driver: synthetic s3d → resampled cube + mask + λ axis."""
    ny, nx = 12, 12
    yy, xx = np.mgrid[0:ny, 0:nx].astype(float)
    cd = 0.13 / 3600.0  # native ~0.13" pixels
    cube = np.random.default_rng(0).random((4, ny, nx))
    _write_s3d(tmp_path / "ChannelCube_test_s3d.fits", cube, cd=cd)

    out_dir = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "scripts/convert_s3d.py",
         "--s3d", str(tmp_path / "ChannelCube_test_s3d.fits"),
         "--out-dir", str(out_dir), "--npix", "9", "--step", "0.05",
         "--oversample", "2", "--border", "2"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    got = np.load(out_dir / "ChannelCube_test_s3d.npy")
    mask = np.load(out_dir / "ChannelCube_test_s3d_mask.npy")
    wavel = np.load(out_dir / "ChannelCube_test_s3d_wavel.npy")
    assert got.shape == (4, 9, 9)
    assert mask.shape == (9, 9) and mask.any()
    np.testing.assert_allclose(wavel, 5.0 + np.arange(4) * 0.01)


def test_resample_border_not_zero_blended():
    """Border-NaN'd pixels are excluded from the cloud, not zero-blended:
    a constant-1 field stays exactly 1 right up to the interior edge."""
    ny, nx = 10, 10
    yy, xx = np.mgrid[0:ny, 0:nx].astype(float)
    ra, dec = 1.0 + 0.01 * xx, 2.0 + 0.01 * yy
    cube = np.ones((2, ny, nx))
    # targets hugging the interior edge of the border=2 exclusion zone
    alpha_axis = 1.0 + 0.01 * np.array([2.0, 2.1, 7.0])
    beta_axis = 2.0 + 0.01 * np.array([2.0, 5.0, 7.0])
    out = resample_cube_to_grid(cube, ra, dec, alpha_axis, beta_axis,
                                oversample=1, border=2)
    np.testing.assert_allclose(out, 1.0, rtol=1e-12)
