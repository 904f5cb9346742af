#!/usr/bin/env python3
"""End-to-end simulated multi-channel fusion (reference
scripts/fusion/fusion_MCMO_SigRLSCT_simulated.py, self-contained).

Synthesizes data from an Orion-like ground truth, reconstructs with CG, and
reports fidelity metrics.  `--quick` runs a tiny configuration in seconds.

    python scripts/run_fusion_simulated.py --quick
    python scripts/run_fusion_simulated.py --npix 251 --channels 4 --niter 200
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="tiny config, CPU-friendly")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--npix", type=int, default=121)
    ap.add_argument("--n-lambda", type=int, default=100)
    ap.add_argument("--channels", type=int, default=4)
    ap.add_argument("--pointings", type=int, default=4)
    ap.add_argument("--n-templates", type=int, default=4)
    ap.add_argument("--niter", type=int, default=50)
    ap.add_argument("--mu", type=float, default=100.0)
    ap.add_argument("--method", choices=["lcg", "mmmg"], default="lcg")
    ap.add_argument("--sharded", action="store_true")
    ap.add_argument("--output-dir", default="./surfh_results")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.quick:
        args.npix, args.n_lambda, args.channels, args.pointings = 41, 24, 2, 2
        args.niter = min(args.niter, 15)

    from surfh_tpu.simulation.synthetic import make_model
    from surfh_tpu.solvers.criterion import QuadCriterion_MRS
    from surfh_tpu.utils import metrics

    print(f"devices: {jax.devices()}")
    model, setup = make_model(
        im_size=args.npix,
        n_lambda=args.n_lambda,
        n_tpl=args.n_templates,
        n_channels=args.channels,
        n_pointings=args.pointings,
    )
    truth = np.asarray(setup["maps"], np.float32)
    y = np.asarray(model.forward(truth))
    print(f"model: ishape={model.ishape} data={y.size} samples")

    t0 = time.perf_counter()
    if args.sharded:
        from surfh_tpu.parallel.fusion import ShardedSpectro, make_mesh

        sh = ShardedSpectro(model, make_mesh())
        res = sh.solve(y, mu_reg=args.mu, max_iter=args.niter, method=args.method)
    else:
        crit = QuadCriterion_MRS(1.0, y, model, args.mu, printing=True)
        res = crit.run_method(args.method, maximum_iterations=args.niter)
    dt = time.perf_counter() - t0

    os.makedirs(args.output_dir, exist_ok=True)
    np.save(os.path.join(args.output_dir, "res_x.npy"), res.x)
    np.save(os.path.join(args.output_dir, "res_cube.npy"), np.asarray(model.mapsToCube(res.x)))
    np.save(os.path.join(args.output_dir, "criterion.npy"), res.grad_norm)

    print(json.dumps({
        "niter": int(res.n_iter),
        "seconds": round(dt, 3),
        "iters_per_s": round(res.n_iter / max(dt, 1e-9), 2),
        "psnr_maps": round(metrics.psnr(truth, res.x), 2),
        "relative_error_pct": round(metrics.relative_error(truth, res.x), 4),
    }))


if __name__ == "__main__":
    main()
