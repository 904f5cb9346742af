#!/usr/bin/env python3
"""Convert JWST s3d ChannelCube FITS products onto the fusion model grid.

The data-converter step of the reference's real-data chain
(scripts/fusion/generate_real_data_single_fits.py:119-233,
convert_fits_to_numpy_slices.py): read each `*_s3d.fits`, NaN the borders,
refine the (RA, DEC) point cloud, scattered-linear-interpolate every λ
plane onto the regular (α, β) model grid, and save `<stem>.npy` (cube),
`<stem>_mask.npy` (finite-coverage mask) and `<stem>_wavel.npy` (λ axis).

Per-slit detector slices are then one library call away:
`Channel.realData_cubeToSlice(cube)` (parity-tested vs the reference).

    python scripts/convert_s3d.py --s3d ChannelCube_ch1a.fits --out-dir out \
        --npix 251 --step 0.025 --oversample 3
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s3d", required=True, nargs="+", help="s3d FITS file(s)")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--npix", type=int, default=251, help="target grid size")
    ap.add_argument("--step", type=float, default=0.025, help="grid step (arcsec)")
    ap.add_argument("--oversample", type=int, default=3,
                    help="point-cloud refinement factor")
    ap.add_argument("--border", type=int, default=4,
                    help="NaN'd s3d border width (resampling artifacts)")
    ap.add_argument("--center", default=None,
                    help="'ra,dec' grid center in degrees (default: cloud mean)")
    args = ap.parse_args()

    from surfh_tpu.preprocessing.s3d import read_s3d, resample_cube_to_grid

    os.makedirs(args.out_dir, exist_ok=True)
    step_deg = args.step / 3600.0
    half = (np.arange(args.npix) - (args.npix - 1) / 2.0) * step_deg

    for path in args.s3d:
        cube, wavel, ra_map, dec_map = read_s3d(path)
        if args.center:
            ra0, dec0 = (float(v) for v in args.center.split(","))
        else:
            ra0, dec0 = float(np.nanmean(ra_map)), float(np.nanmean(dec_map))
        alpha_axis = half + ra0
        beta_axis = half + dec0
        resampled = resample_cube_to_grid(
            cube, ra_map, dec_map, alpha_axis, beta_axis,
            oversample=args.oversample, border=args.border,
        )
        stem = os.path.splitext(os.path.basename(path))[0]
        np.save(os.path.join(args.out_dir, stem + ".npy"),
                np.nan_to_num(resampled).astype(np.float32))
        np.save(os.path.join(args.out_dir, stem + "_mask.npy"),
                np.isfinite(resampled).all(axis=0))
        np.save(os.path.join(args.out_dir, stem + "_wavel.npy"), wavel)
        print(json.dumps({
            "file": stem,
            "cube_shape": list(resampled.shape),
            "coverage_frac": float(np.isfinite(resampled).mean()),
            "lambda_range": [float(wavel[0]), float(wavel[-1])],
        }))


if __name__ == "__main__":
    main()
