"""Real-data instrument factory round-trip through our FITS writer."""

import numpy as np
import pytest

from surfh_tpu.instrument.realmiri import get_IFU_from_corrected_data
from surfh_tpu.instrument.wavelength_mrs import get_mrs_wavelength
from surfh_tpu.preprocessing.fits_io import fits_write


@pytest.mark.parametrize(
    "channel,band,n_slit,pix",
    [(1, "SHORT", 21, 0.196), (2, "MEDIUM", 17, 0.196), (3, "LONG", 16, 0.245), (4, "SHORT", 12, 0.273)],
)
def test_get_ifu_from_corrected_data(tmp_path, channel, band, n_slit, pix):
    path = str(tmp_path / f"ch{channel}.fits")
    fits_write(
        path,
        np.zeros((4, 5), np.float32),
        header={
            "PA_V3": 12.5,
            "TARG_RA": 83.8,
            "TARG_DEC": -5.4,
            "CHANNEL": channel,
            "BAND": band,
        },
    )
    ifu, ra, dec = get_IFU_from_corrected_data(path)
    assert ifu.n_slit == n_slit
    assert ifu.det_pix_size == pix
    assert ra == pytest.approx(83.8)
    assert dec == pytest.approx(-5.4)
    letter = {"SHORT": "a", "MEDIUM": "b", "LONG": "c"}[band]
    assert ifu.name == f"{channel}{letter}".upper()
    np.testing.assert_array_equal(
        ifu.wavel_axis, get_mrs_wavelength(f"{channel}{letter}")
    )
    # rotation = channel offset + PA_V3
    assert abs(ifu.fov.angle - 12.5) < 10
    assert ifu.pce is not None and ifu.pce.shape == ifu.wavel_axis.shape
