#!/usr/bin/env python3
"""Run any operator of the single-stage ladder on synthetic data.

Covers the reference's per-operator example scripts
(scripts/fusion/fusion_{T,ST,CT,LT,RLT,SigRLT,SigRLCT,SigRLSCT,...}_simulated.py)
with one parametrized entry: build the operator, run forward + exact adjoint,
verify the dot test, and optionally solve the regularized inverse problem.

    python scripts/run_operator_demo.py --op SigRLCT --solve
    python scripts/run_operator_demo.py --list
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OPS = [
    "T", "C", "CT", "ST", "ST_NN", "SCT", "LT", "LST", "MO_ST", "R", "RL",
    "RLT", "SigRLT", "SigRLCT", "SigRLSCT", "SigRLSCT_NN", "MO_SigRLSCT",
    "MO_SigRLSCT_shiftConv", "MCMO_SigRLSCT", "MCMO_SigRLSCT_NN",
]


def build(op_name, fx):
    from surfh_tpu.models import family as F

    a = (fx["sotf"], fx["templates"], fx["alpha_axis"], fx["beta_axis"], fx["wavelength_axis"])
    one = fx["instrs"][0]
    sd = fx["step_degree"]
    pts = fx["pointings"][0]
    table = {
        "T": lambda: F.SpectroT(fx["maps"], fx["templates"], fx["wavelength_axis"]),
        "C": lambda: F.SpectroC(fx["sotf"], fx["maps"], fx["templates"], fx["wavelength_axis"]),
        "CT": lambda: F.SpectroCT(*a),
        "ST": lambda: F.SpectroST(*a, one, sd),
        "ST_NN": lambda: F.SpectroSnearestT(*a, one, sd),
        "SCT": lambda: F.SpectroSCT(*a, one, sd),
        "LT": lambda: F.SpectroLT(*a, one, sd),
        "LST": lambda: F.SpectroLST(*a, one, sd),
        "MO_ST": lambda: F.SpectroMO_ST(*a, one, sd, pts),
        "R": lambda: F.SpectroR(*a, one, sd),
        "RL": lambda: F.SpectroRL(*a, one, sd),
        "RLT": lambda: F.SpectroRLT(*a, one, sd),
        "SigRLT": lambda: F.SpectroSigRLT(*a, one, sd),
        "SigRLCT": lambda: F.SpectroSigRLCT(*a, one, sd),
        "SigRLSCT": lambda: F.SpectroSigRLSCT1C(*a, one, sd),
        "SigRLSCT_NN": lambda: F.SpectroSigRLSCT1C_NN(*a, one, sd),
        "MO_SigRLSCT": lambda: F.MO_SigRLSCT(*a, one, sd, pts),
        "MO_SigRLSCT_shiftConv": lambda: F.MO_SigRLSCT_shiftConv(*a, one, sd, pts),
        "MCMO_SigRLSCT": lambda: F.MCMO_SigRLSCT(*a, fx["instrs"], sd, fx["pointings"]),
        "MCMO_SigRLSCT_NN": lambda: F.MCMO_SigRLSCT_NN(*a, fx["instrs"], sd, fx["pointings"]),
    }
    return table[op_name]()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", default="SigRLSCT", choices=OPS)
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--npix", type=int, default=41)
    ap.add_argument("--n-lambda", type=int, default=30)
    ap.add_argument("--channels", type=int, default=2)
    ap.add_argument("--solve", action="store_true", help="run a 20-iteration CG inverse")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.list:
        print("\n".join(OPS))
        return
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from surfh_tpu.core.linop import dottest
    from surfh_tpu.simulation.synthetic import make_setup

    fx = make_setup(
        im_size=args.npix, n_lambda=args.n_lambda, n_tpl=3,
        n_channels=args.channels, n_pointings=2, n_slit=3,
    )
    op = build(args.op, fx)
    rng = np.random.default_rng(0)
    x = rng.random(op.ishape)
    t0 = time.perf_counter()
    y = np.asarray(op.forward(x))
    t_fwd = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(op.adjoint(np.asarray(y)))
    t_adj = time.perf_counter() - t0
    report = {
        "op": args.op,
        "ishape": list(op.ishape),
        "oshape": list(op.oshape),
        "fwd_s": round(t_fwd, 4),
        "adj_s": round(t_adj, 4),
        "dottest": bool(dottest(op, num=2, rtol=1e-3)),
    }
    if args.solve:
        from surfh_tpu.solvers.cg import lcg

        b = np.asarray(op.adjoint(y))
        res = lcg(lambda v: op.adjoint(op.forward(v)), b, np.zeros(op.ishape, np.float32), max_iter=20)
        report["solve_grad_drop"] = float(res.grad_norm[-1] / res.grad_norm[0])
    print(json.dumps(report))


if __name__ == "__main__":
    main()
