#!/usr/bin/env python3
"""Measure core.scatter_pallas at flagship scale vs the XLA spellings.

Round 4: the tunnel's Mosaic compile works again (round 3's HTTP 500 is
gone), and it now surfaces real diagnostics — the original [TP, L] SMEM
tap-table layout OOMed the 1 MB SMEM (lane-padded to 128); the module
stores tables [L, TP] on the sublane axis.  This times the kernel doing
one pointing's composed transpose against the production sorted-COO
scatter and reports ms + effective GB/s of the algorithmic bytes.

    python scripts/scatter_pallas_flagship.py [--band 4a] [--tp 512]
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
    ap.add_argument("--band", default="4a")
    ap.add_argument("--npix", type=int, default=501)
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tp", type=int, default=512)
    ap.add_argument("--unroll", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/surfh_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from surfh_tpu.core import bilinear
    from surfh_tpu.core.scatter_pallas import (
        build_row_gather_plan,
        gather_rows_pallas,
    )
    from surfh_tpu.simulation.flagship import make_flagship_model
    from surfh_tpu.utils.profiling import chained_time

    interpret = jax.default_backend() == "cpu"

    model, _setup = make_flagship_model(
        bands=[args.band], npix=args.npix, n_pointings=1, conv_impl="matmul",
    )
    chan = model.channels[0]
    _idx, _w, csrc, cw, cdst = (np.asarray(a[0]) for a in chan._composed_stack)
    ha, wb = chan._tbbox[2], chan._tbbox[3]
    P = ha * wb
    n_out = _idx.shape[1]
    W = chan.wslice.stop - chan.wslice.start

    plan = build_row_gather_plan(csrc, cw, cdst, P, n_out, W,
                                 tp=args.tp, unroll=args.unroll)
    # algorithmic bytes: read vals once (they're VMEM-resident), write out,
    # stream the tap tables
    alg_bytes = (n_out * W + P * W) * 4 + plan.tsrc.size * 8
    print(json.dumps({
        "band": args.band, "P": P, "Pp": plan.Pp, "n_out": n_out, "W": W,
        "L": plan.L, "SUB": plan.SUB,
        "vmem_vals_mb": round(plan.vmem_vals_bytes / 2**20, 1),
        "smem_tables_kb": round(2 * plan.L * plan.TP * 4 / 1024, 1),
    }), flush=True)

    rng = np.random.default_rng(0)
    vals = rng.standard_normal((W, n_out)).astype(np.float32)
    j_vals_t = jax.device_put(np.ascontiguousarray(vals.T))
    j_csrc = jax.device_put(csrc.astype(np.int32))
    j_cw = jax.device_put(cw.astype(np.float32))
    j_cdst = jax.device_put(cdst.astype(np.int32))
    j_vals = jax.device_put(vals)

    def f_coo(v):
        return bilinear.apply_composed_plan_t(j_csrc, j_cw, j_cdst, v, P)

    def f_pallas(vt):
        return gather_rows_pallas(vt, plan, interpret=interpret)

    def _mark(m):
        print(f"[{time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
              flush=True)

    _mark("compile+run coo")
    ref = np.asarray(jax.jit(f_coo)(j_vals))  # [W, P]
    _mark("compile+run pallas")
    got = np.asarray(jax.jit(f_pallas)(j_vals_t))  # [P, W]
    _mark("fetch done")
    rel = np.abs(got.T - ref).max() / max(np.abs(ref).max(), 1e-30)
    print(json.dumps({"check_max_rel": float(rel)}), flush=True)

    if not interpret:
        for name, fn, x in (("coo_scatter", f_coo, j_vals),
                            ("pallas_rows", f_pallas, j_vals_t)):
            ms = chained_time(fn, x, chain=args.chain, reps=args.reps) * 1e3
            print(json.dumps({
                "impl": name, "ms": round(ms, 3),
                "alg_gbps": round(alg_bytes / (ms / 1e3) / 1e9, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
