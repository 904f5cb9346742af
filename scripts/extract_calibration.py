#!/usr/bin/env python3
"""Extract MIRI MRS calibration *data* into surfh_tpu/instrument/data/.

Pulls the numeric instrument-calibration tables (PCE efficiency curves,
detector wavelength axes, recommended dither offsets, real-data wavelength
grids) out of the reference checkout's bundled FITS/dat files and stores them
as one compressed .npz.  This is measured instrument data, not code; it cannot
be re-derived.  Run once when a reference checkout is available:

    python scripts/extract_calibration.py [--reference /root/reference]
"""

import argparse
import importlib.util
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from surfh_tpu.preprocessing.fits_io import fits_open  # noqa: E402

BANDS = ["1a", "1b", "1c", "2a", "2b", "2c", "3a", "3b", "3c", "4a", "4b", "4c"]
_FITS_NAME = {
    "1": "MIRI_FM_MIRIFUSHORT_{n}{L}_PCE_07.00.00.fits",
    "2": "MIRI_FM_MIRIFUSHORT_{n}{L}_PCE_07.00.00.fits",
    "3": "MIRI_FM_MIRIFULONG_{n}{L}_PCE_07.00.00.fits",
    "4": "MIRI_FM_MIRIFULONG_{n}{L}_PCE_07.00.00.fits",
}
_LEN = {"a": "SHORT", "b": "MEDIUM", "c": "LONG"}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reference", default="/root/reference")
    parser.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(__file__), "..", "surfh_tpu", "instrument", "data", "miri_calibration.npz"
        ),
    )
    args = parser.parse_args()

    data_dir = os.path.join(args.reference, "surfh", "data")
    out = {}

    for band in BANDS:
        n, letter = band[0], band[1]
        fname = _FITS_NAME[n].format(n=n, L=_LEN[letter])
        hdus = fits_open(os.path.join(data_dir, fname))
        table = next(h for h in hdus if h.columns is not None)
        out[f"pce_{band}"] = np.asarray(table["EFFICIENCY"], np.float64)
        out[f"wavel_{band}"] = np.asarray(table["WAVELENGTH"], np.float64)

    # Real-data wavelength grids (from JWST stage-2 cube headers, recorded as
    # numeric tables in the reference's global_variables module).
    gv_path = os.path.join(args.reference, "surfh", "Others", "global_variables.py")
    spec = importlib.util.spec_from_file_location("ref_global_variables", gv_path)
    gv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gv)
    for band in BANDS:
        out[f"wavelength_{band}"] = np.asarray(getattr(gv, f"wavelength_{band}"), np.float64)

    dither = np.loadtxt(os.path.join(data_dir, "mrs_recommended_dither.dat"), delimiter=",")
    out["dither"] = dither

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez_compressed(args.out, **out)
    print(f"wrote {args.out}: {len(out)} arrays")
    for band in BANDS:
        print(
            f"  {band}: pce {out[f'pce_{band}'].shape}, wavel {out[f'wavel_{band}'].shape},"
            f" real wavelength {out[f'wavelength_{band}'].shape}"
        )


if __name__ == "__main__":
    main()
