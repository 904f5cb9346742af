#!/usr/bin/env python3
"""Real-data distortion correction driver: stage-2 `cal.fits` → model-aligned
corrected-slice FITS files.

Behavioural reference: /root/reference/scripts/correction_mrs_data.py:60-201
(including the channel-specific slit reorders and rolls, :150-186).  The JWST
WCS (`jwst.datamodels`) is only imported when available; everything else
(labeling, Shepard re-interpolation, FITS I/O) is in-tree.

    python scripts/correct_mrs_data.py --raw-dir RAW --out-dir OUT --npix 501
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Core driver moved into the package (surfh_tpu/preprocessing/
# correction_driver.py) so `cli rehearse` and tests share it; re-exported
# here for backwards compatibility with existing callers.
from surfh_tpu.preprocessing.correction_driver import (  # noqa: E402,F401
    SLIT_ORDERS,
    correct_file,
    corrected_to_fits,
    reorder_slits,
    setup_channel_model,
)


def main():
    from surfh_tpu.preprocessing.fits_io import fits_write

    ap = argparse.ArgumentParser()
    ap.add_argument("--raw-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--npix", type=int, default=501)
    ap.add_argument("--wavel-cube", help=".npy global cube wavelength axis")
    args = ap.parse_args()

    wavelength_cube = (
        np.load(args.wavel_cube) if args.wavel_cube else np.linspace(4.9, 28.3, 3182)
    )
    os.makedirs(args.out_dir, exist_ok=True)
    for fname in sorted(os.listdir(args.raw_dir)):
        if not fname.endswith(".fits"):
            continue
        # filenames like "..._ch1-2_dither3_cal.fits" carry two channels
        stem = os.path.splitext(fname)[0]
        chans = [p for p in stem.replace("-", "_").split("_") if p.startswith("ch")]
        for mode, chan_name in enumerate(chans[:2]):
            sorted_data, ifu, targ_ra, targ_dec = correct_file(
                os.path.join(args.raw_dir, fname), chan_name, args.npix, wavelength_cube, mode
            )
            flat = sorted_data.transpose(1, 0, 2).reshape(
                sorted_data.shape[1], sorted_data.shape[0] * sorted_data.shape[2]
            )
            out = os.path.join(args.out_dir, f"{chan_name}_{stem}_corrected.fits")
            fits_write(
                out,
                flat.astype(np.float32),
                header={
                    "PA_V3": float(ifu.fov.angle),
                    "TARG_RA": float(targ_ra),
                    "TARG_DEC": float(targ_dec),
                    "BAND": ifu.name,
                },
            )
            print(f"wrote {out}")


if __name__ == "__main__":
    main()
