#!/usr/bin/env python3
"""Median-filter corrected slice files along λ (the spectral-line filter).

Reference: scripts/filter_corrected_mrs_data.py (size-11 median along axis 0,
:34), preserving the PA_V3/TARG_RA/TARG_DEC/BAND headers.

    python scripts/filter_slices.py --in-dir Corrected_slices --out-dir Filtered_slices
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--size", type=int, default=11, help="median window along λ")
    ap.add_argument("--match", default="", help="only files containing this substring")
    args = ap.parse_args()

    from surfh_tpu.preprocessing import median_filter_slices
    from surfh_tpu.preprocessing.fits_io import fits_open, fits_write

    os.makedirs(args.out_dir, exist_ok=True)
    n = 0
    for fname in sorted(os.listdir(args.in_dir)):
        if not fname.endswith(".fits") or args.match not in fname:
            continue
        hdus = fits_open(os.path.join(args.in_dir, fname))
        hdr = hdus[0].header
        filtered = median_filter_slices(np.asarray(hdus[0].data), size=args.size)
        out = os.path.join(
            args.out_dir, os.path.splitext(fname)[0] + "_filtered.fits"
        )
        fits_write(
            out,
            filtered.astype(np.float32),
            header={
                k: hdr[k]
                for k in ("PA_V3", "TARG_RA", "TARG_DEC", "BAND")
                if k in hdr
            },
        )
        print(f"wrote {out}")
        n += 1
    if n == 0:
        print("no matching .fits files found", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
