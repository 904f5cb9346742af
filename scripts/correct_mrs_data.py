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

# Reference slit orders (correction_mrs_data.py:150-186).
SLIT_ORDERS = {
    "ch1": ([0, 11, 1, 12, 2, 13, 3, 14, 4, 15, 5, 16, 6, 17, 7, 18, 8, 19, 9, 20, 10], 10),
    "ch2": ([8, 0, 9, 1, 10, 2, 11, 3, 12, 4, 13, 5, 14, 6, 15, 7, 16], 9),
    "ch3": ([0, 8, 1, 9, 2, 10, 3, 11, 4, 12, 5, 13, 6, 14, 7, 15], 0),
    "ch4": ([0, 6, 1, 7, 2, 8, 3, 9, 4, 10, 5, 11], 0),
}


def reorder_slits(corrected_slices: np.ndarray, chan_name: str) -> np.ndarray:
    """Apply the channel-specific detector→sky slit permutation and roll."""
    for key, (order, roll) in SLIT_ORDERS.items():
        if key in chan_name:
            out = np.zeros_like(corrected_slices)
            for i in range(corrected_slices.shape[0]):
                out[order[i]] = corrected_slices[i]
            if roll:
                out = np.roll(out, roll, 0)
            return out
    raise NameError(f"unknown channel name {chan_name!r}")


def setup_channel_model(npix, targ_ra, targ_dec, ifu, wavelength_cube, step_arcsec=0.025):
    from surfh_tpu.instrument.geometry import Coord, CoordList, get_srf
    from surfh_tpu.models.channel import Channel

    step_degree = step_arcsec / 3600.0
    alpha_axis = np.arange(npix) * step_degree
    beta_axis = np.arange(npix) * step_degree
    alpha_axis += targ_ra - np.mean(alpha_axis)
    beta_axis += targ_dec - np.mean(beta_axis)
    srf = get_srf([ifu.det_pix_size], step_arcsec)[0]
    pointings = CoordList([Coord(0, 0)]).pix(step_degree)
    return Channel(
        ifu, alpha_axis, beta_axis, np.asarray(wavelength_cube), srf, pointings, step_degree
    )


def _jwst_wcs_loader(path):
    """Default stage-2 loader: (data, detector2world) via jwst.datamodels."""
    try:
        from jwst import datamodels
    except ImportError as exc:  # pragma: no cover - jwst not in the image
        raise RuntimeError(
            "the jwst package is required to read stage-2 WCS transforms"
        ) from exc

    jwst_model = datamodels.open(path)
    return jwst_model.data, jwst_model.meta.wcs.get_transform("detector", "world")


def correct_file(path, chan_name, npix, wavelength_cube, mode, wcs_loader=None):
    """One stage-2 file, one channel: label slits, Shepard-correct, reorder.

    `wcs_loader(path) -> (data, detector2world)` makes the WCS source
    injectable (tests use a synthetic transform; production uses the jwst
    package's stage-2 datamodel — reference correction_mrs_data.py:122-131).
    """
    from surfh_tpu.instrument import realmiri
    from surfh_tpu.preprocessing import (
        generate_label_image,
        mrs_slices_distortion_correction,
        sort_labels_by_centroid,
    )

    ifu, targ_ra, targ_dec = realmiri.get_IFU(path, chan_name=chan_name)
    model_channel = setup_channel_model(npix, targ_ra, targ_dec, ifu, wavelength_cube)

    data, detector2world = (wcs_loader or _jwst_wcs_loader)(path)
    xx, yy = np.meshgrid(np.arange(data.shape[1]), np.arange(data.shape[0]))
    coords = detector2world(xx, yy)
    binary = np.zeros_like(data)
    binary[~np.isnan(coords[0])] = 1

    labels = sort_labels_by_centroid(generate_label_image(binary))
    corrected = mrs_slices_distortion_correction(
        model_channel, labels, detector2world, data, ifu.wavel_axis, mode
    )
    return reorder_slits(corrected, chan_name), ifu, targ_ra, targ_dec


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
