#!/usr/bin/env python3
"""Learn LMM spectral templates from a reconstructed cube (on device).

Covers the reference's offline notebook pipeline
(notebooks/nmf_orion_allband.ipynb, nmf_orion_3chan.ipynb, pca_orion.ipynb,
nfinder_orion.ipynb): scan NMF component counts by reconstruction error,
or run PCA / N-FINDR+FCLS, then save `templates.npy` + `wavel_axis.npy` for
`surfh_tpu.cli fusion`.

    python scripts/learn_templates.py --cube res_cube.npy --wavel wavel_axis.npy \
        --method nmf --components 4 --scan 2 8 -o ./templates_out
    python scripts/learn_templates.py --demo --method nfindr
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cube", help="reconstructed cube .npy [λ, Nα, Nβ]")
    ap.add_argument("--wavel", help="wavelength axis .npy [λ]")
    ap.add_argument("--mask", help="optional boolean spatial mask .npy [Nα, Nβ]")
    ap.add_argument("--demo", action="store_true", help="run on a synthetic Orion-like cube")
    ap.add_argument("--method", choices=["nmf", "pca", "nfindr"], default="nmf")
    ap.add_argument("--components", "-k", type=int, default=4)
    ap.add_argument("--scan", nargs=2, type=int, metavar=("KMIN", "KMAX"),
                    help="scan NMF reconstruction error over this k range")
    ap.add_argument("--n-iter", type=int, default=500)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--output-dir", "-o", default="./templates_out")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from surfh_tpu.learning import fcls, learn_templates_nmf, nfindr, nmf, pca

    if args.demo:
        from surfh_tpu.simulation.data import synthetic_orion

        maps, tpl, _, wavel = synthetic_orion(size=100, n_wavel=300)
        cube = np.tensordot(tpl.T, maps, axes=1)
        mask = None
    else:
        if not args.cube or not args.wavel:
            ap.error("--cube and --wavel required (or --demo)")
        cube = np.load(args.cube)
        wavel = np.load(args.wavel)
        mask = np.load(args.mask) if args.mask else None

    os.makedirs(args.output_dir, exist_ok=True)
    L = cube.shape[0]
    pixels = cube.reshape(L, -1).T
    if mask is not None:
        pixels = pixels[np.asarray(mask).ravel()]

    report = {"method": args.method}
    if args.method == "nmf":
        if args.scan:
            errs = {}
            for k in range(args.scan[0], args.scan[1] + 1):
                _, _, err = nmf(pixels, k, n_iter=args.n_iter)
                errs[k] = err
                print(f"k={k}: reconstruction error {err:.4e}")
            report["scan"] = errs
        templates, maps_hat, err = learn_templates_nmf(
            cube, args.components, mask=mask, n_iter=args.n_iter
        )
        report["error"] = err
        np.save(os.path.join(args.output_dir, "abundances.npy"), maps_hat)
    elif args.method == "pca":
        comps, var, scores = pca(pixels, args.components)
        templates = comps
        report["explained_variance"] = var.tolist()
    else:  # nfindr + fcls
        endmembers, idx = nfindr(pixels, args.components)
        abund = fcls(pixels, endmembers)
        templates = endmembers
        report["endmember_indices"] = np.asarray(idx).tolist()
        np.save(os.path.join(args.output_dir, "abundances_flat.npy"), abund)

    np.save(os.path.join(args.output_dir, "templates.npy"), templates)
    np.save(os.path.join(args.output_dir, "wavel_axis.npy"), wavel)
    print(json.dumps({k: v for k, v in report.items() if k != "scan"}))


if __name__ == "__main__":
    main()
