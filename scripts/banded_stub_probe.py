#!/usr/bin/env python3
"""Marginal cost of each banded-transpose sub-op INSIDE the fused win_a stage.

The isolated sub-op probe (win_a_subop_probe.py) charges the final
unpermuting take 0.88 GB per band-4 pointing — but XLA fuses the real
adjoint, so isolated bytes overstate what the fused program pays (the
pointing-summed banded_mp respelling, built on that reading, measured a
1.6× REGRESSION at flagship).  This probe measures what the fused stage
actually spends per sub-op: it recompiles the full win_a stage (all
pointings, tables as args) with ONE sub-op stubbed by a same-shape
no-gather placeholder and reports the wall-time delta.

Stubs (wrong math, right shapes/dtypes — marginal-cost probes only):
  unperm  accz-tile concat instead of take(accz, linv)
  tail    skip the non-local scatter-add
  gather  broadcast of one window instead of take(vt, idx)
  matmul  skip the banded einsum (gather feeds a sum)

    python scripts/banded_stub_probe.py [--band 4a] [--pointings 4]
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
    ap.add_argument("--pointings", type=int, default=4)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chain", type=int, default=10)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/surfh_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from surfh_tpu.core import bilinear
    from surfh_tpu.core.precision import gemm_precision
    from surfh_tpu.simulation.flagship import (
        make_flagship_model,
        make_flagship_setup,
    )

    setup = make_flagship_setup(npix=args.npix, bands=[args.band],
                                n_pointings=args.pointings)
    model, _ = make_flagship_model(setup, conv_impl="matmul")
    tables = model.device_tables()
    t = tables["chan"][0]
    chan = model.channels[0]
    n_tpl = int(model.templates.shape[0])
    q = n_tpl * int(np.asarray(t["cu"]).shape[1])
    K, A = chan.oshape[2], chan.oshape[3]
    P, S = len(chan.pointings), chan.oshape[1]

    real_apply = bilinear.apply_composed_plan_banded_t

    def stubbed(mode):
        def apply(linv, idx, wb, osrc, ow, odst, values):
            w_dim = values.shape[0]
            vt = values.T
            nb, tb, sw = wb.shape
            if mode == "gather":
                g = jnp.broadcast_to(vt[:sw][None], (nb, sw, w_dim))
            else:
                g = jnp.take(vt, idx.reshape(-1), axis=0).reshape(
                    nb, sw, w_dim)
            if mode == "matmul":
                acc = jnp.broadcast_to(
                    jnp.sum(g, axis=1)[:, None, :], (nb, tb, w_dim))
            else:
                acc = jnp.einsum("bts,bsw->btw", wb, g,
                                 precision=gemm_precision())
            acc = acc.reshape(nb * tb, w_dim)
            accz = jnp.concatenate(
                [acc, jnp.zeros((1, w_dim), values.dtype)], axis=0)
            if mode != "tail":
                contrib = jnp.take(vt, osrc, axis=0) * ow[:, None]
                accz = accz.at[odst].add(
                    contrib, indices_are_sorted=True, unique_indices=False)
            if mode == "unperm":
                n_patch = linv.shape[0]
                reps = -(-n_patch // accz.shape[0])
                out = jnp.concatenate([accz] * reps, axis=0)[:n_patch]
            else:
                out = jnp.take(accz, linv, axis=0)
            return out.T

        return apply

    def win_a(yc, t):
        return chan._adjoint_windowed_fast_impl(
            yc, q, t["wpsf_q"], tables=t, bbox_out=True)

    rng = np.random.default_rng(0)
    y0 = jnp.asarray(rng.standard_normal((P, S, K, A)), jnp.float32)
    jsum = jax.jit(lambda v: jnp.sum(v).astype(jnp.float32))

    results = {}
    for mode in ("none", "unperm", "tail", "gather", "matmul"):
        bilinear.apply_composed_plan_banded_t = (
            real_apply if mode == "none" else stubbed(mode))
        try:
            jfn = jax.jit(win_a)
            compiled = jfn.lower(y0, t).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            gb = float(ca.get("bytes accessed", 0.0)) / 2**30
            float(jsum(jfn(y0, t)))  # warm
            times = []
            for _ in range(args.reps):
                tt = time.perf_counter()
                o = None
                for _ in range(args.chain):
                    o = jfn(y0, t)
                float(jsum(o))
                times.append((time.perf_counter() - tt) / args.chain)
            dt = float(np.median(times)) * 1e3
            results[mode] = (dt, gb)
            d = results["none"][0] - dt if mode != "none" else 0.0
            print(json.dumps({
                "stub": mode, "ms": round(dt, 3), "gb": round(gb, 4),
                "marginal_ms": round(d, 3),
                "marginal_gb": round(results["none"][1] - gb, 4)
                if mode != "none" else 0.0,
            }), flush=True)
        finally:
            bilinear.apply_composed_plan_banded_t = real_apply


if __name__ == "__main__":
    main()
