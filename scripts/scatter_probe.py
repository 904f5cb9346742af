"""Probe the composed-transpose scatter structure on the real flagship tables.

For each pointing of a flagship band, reports the per-destination segment
lengths of the sorted-COO transpose (cdst bincount over the bbox patch):
whether a padded gather-form transpose (per-pixel tap lists, the trick
already used for the plain bilinear transpose, core/bilinear.py:141-190)
would be competitive with the scatter, and what a Pallas output-tiled
kernel would have to move.

    python scripts/scatter_probe.py [--band 1c] [--npix 501]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--band", type=str, default="1c")
    ap.add_argument("--npix", type=int, default=501)
    ap.add_argument("--pointings", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from surfh_tpu.simulation.flagship import make_flagship_model

    model, _setup = make_flagship_model(
        bands=[args.band], npix=args.npix, n_pointings=args.pointings,
        conv_impl="matmul",
    )
    chan = model.channels[0]
    stack = chan._composed_stack
    assert stack is not None, "composed plan not active"
    idx, w, csrc, cw, cdst = stack
    ha, wb = chan._tbbox[2], chan._tbbox[3]
    n_patch = ha * wb
    C, n_out = idx.shape[1], idx.shape[2]
    W = chan.wslice.stop - chan.wslice.start
    print(f"band {args.band}: patch {ha}x{wb}={n_patch}, n_out={n_out}, "
          f"C={C}, W={W}")
    for p in range(idx.shape[0]):
        nz = cw[p] != 0
        d = cdst[p][nz]
        nnz = int(nz.sum())
        seg = np.bincount(d, minlength=n_patch)
        touched = int((seg > 0).sum())
        L = int(seg.max())
        # padded gather-form cost: every patch pixel pays L taps
        pad_ratio = n_patch * L / nnz
        # gather over touched pixels only (compact output + final scatter of
        # rows) would pay touched*L
        pad_ratio_t = touched * L / nnz
        qs = np.percentile(seg[seg > 0], [50, 90, 99, 100])
        print(f"  p{p}: nnz={nnz} ({nnz/n_patch:.1f}/px) touched={touched}"
              f"/{n_patch} Lmax={L} segq50/90/99={qs[:3].astype(int)} "
              f"pad_full={pad_ratio:.2f} pad_touched={pad_ratio_t:.2f}")
        # bytes moved by the scatter per application (f32): read contrib
        # (nnz·W) + rmw out (2·n_patch·W) vs gather-form: read vals
        # (nnz·W, cached) + write out (n_patch·W)
        mb = 4 * W * (nnz + 2 * n_patch) / 1e6
        mbg = 4 * W * (n_patch * L + n_patch) / 1e6
        print(f"      scatter-traffic≈{mb:.0f} MB  gather-form≈{mbg:.0f} MB")


if __name__ == "__main__":
    main()
