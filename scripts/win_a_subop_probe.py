#!/usr/bin/env python3
"""Sub-op bytes/time breakdown of the banded composed transpose (win_a).

The post-banded per-stage roofline still charges win_a 12.0 of 21.5 GB
(scripts/flagship_stage_bytes.py).  This lowers every sub-expression of
Channel._adjoint_windowed_fast_impl's banded path SEPARATELY (one band,
tables as jit arguments) and reports XLA bytes-accessed + measured time,
to locate the inflation (suspects: the Q-minor [n_out, Q] / [nb*tb, Q]
layouts TPU pads to 128 lanes; the dense wb block re-read).

    python scripts/win_a_subop_probe.py [--band 4a] [--pointings 4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _cost(compiled, key):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get(key, 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--band", default="4a")
    ap.add_argument("--npix", type=int, default=501)
    ap.add_argument("--pointings", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--chain", type=int, default=10)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/surfh_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

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
    S = chan.oshape[1]
    sb = chan.slit_shape[2]
    a0, b0, ha, wb_ = chan._tbbox
    n_out = S * A * sb
    ctab = t["cgrid_t"]  # per-pointing stacked banded tables
    linv_b, idx, wb, osrc, ow, odst = ctab
    wb0 = np.asarray(wb[0])
    nb, tb, sw = wb0.shape
    print(json.dumps({
        "band": args.band, "q": q, "K": K, "A": A, "S": S, "sb": sb,
        "n_out": n_out, "patch": [ha, wb_], "nb": int(nb), "tb": int(tb),
        "sw": int(sw), "tail": int(np.asarray(osrc).shape[1]),
        "wb_mb_per_pt": round(float(np.asarray(wb0).size * 4) / 2**20, 1),
    }), flush=True)

    wp2d_full = t["wpsf_q"]
    Kw = wp2d_full.shape[0]
    wp2d = wp2d_full.reshape(Kw, q * sb)
    slit_w = t["slit_w"]

    # --- sub-ops, one pointing ------------------------------------------
    def gemm(yp):  # wblur_t GEMM + layout moves up to vals [q, n_out]
        y2d = jnp.transpose(yp, (0, 2, 1)).reshape(S * A, Kw)
        win_t = jax.lax.dot_general(
            y2d, wp2d, (((1,), (0,)), ((), ())),
            preferred_element_type=yp.dtype, precision=gemm_precision(),
        ).reshape(S, A, q, sb)
        win_t = jnp.transpose(win_t, (0, 2, 1, 3)) * slit_w[:, None, :, :]
        return jnp.transpose(win_t, (1, 0, 2, 3)).reshape(q, -1)

    p0 = tuple(np.asarray(x)[0] for x in ctab)

    def vt_T(vals):  # the [q, n_out] -> [n_out, q] transpose
        return vals.T

    def gather(vt):  # contiguous-window gather
        return jnp.take(vt, p0[1].reshape(-1), axis=0).reshape(nb, sw, q)

    wb_dev = jnp.asarray(wb0)

    def mm(g):  # the batched MXU matmul
        return jnp.einsum("bts,bsw->btw", wb_dev, g,
                          precision=gemm_precision())

    def tail(acc_flat):  # concat + sorted scatter tail
        accz = jnp.concatenate(
            [acc_flat, jnp.zeros((1, q), acc_flat.dtype)], axis=0)
        contrib = jnp.take(vt0, jnp.asarray(p0[3]), axis=0) \
            * jnp.asarray(p0[4])[:, None]
        return accz.at[jnp.asarray(p0[5])].add(
            contrib, indices_are_sorted=True, unique_indices=False)

    def unperm(accz):  # final permutation take out
        return jnp.take(accz, jnp.asarray(p0[0]), axis=0).T

    rng = np.random.default_rng(0)
    yp = jnp.asarray(rng.standard_normal((S, Kw, A)), jnp.float32)
    vals0 = jax.jit(gemm)(yp)
    vt0 = jax.jit(vt_T)(vals0)
    g0 = jax.jit(gather)(vt0)
    acc0 = jax.jit(mm)(g0).reshape(nb * tb, q)
    accz0 = jax.jit(tail)(acc0)

    subs = [
        ("wblur_t_gemm", gemm, yp),
        ("vt_transpose", vt_T, vals0),
        ("window_gather", gather, vt0),
        ("banded_matmul", mm, g0),
        ("tail_scatter", tail, acc0),
        ("unperm_take", unperm, accz0),
    ]
    total_gb = 0.0
    jsum = jax.jit(lambda v: jnp.sum(v).astype(jnp.float32))
    for name, fn, x0 in subs:
        jfn = jax.jit(fn)
        compiled = jfn.lower(x0).compile()
        b = _cost(compiled, "bytes accessed")
        float(jsum(jfn(x0)))
        times = []
        for _ in range(args.reps):
            tt = time.perf_counter()
            o = None
            for _ in range(args.chain):
                o = jfn(x0)
            float(jsum(o))
            times.append((time.perf_counter() - tt) / args.chain)
        dt = float(np.median(times))
        total_gb += b / 2**30
        print(json.dumps({
            "op": name, "gb": round(b / 2**30, 4), "ms": round(dt * 1e3, 3),
            "gbps": round(b / dt / 1e9, 1),
        }), flush=True)
    print(json.dumps({"sum_gb_one_pointing": round(total_gb, 3),
                      "x_pointings": args.pointings,
                      "sum_gb_all": round(total_gb * args.pointings, 3)}),
          flush=True)


if __name__ == "__main__":
    main()
