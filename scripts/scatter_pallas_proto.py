"""Prototype: Pallas TPU kernel for the composed-transpose row-gather.

SUPERSEDED (round 4) by surfh_tpu/core/scatter_pallas.py +
scripts/scatter_pallas_flagship.py: the kernel now compiles through the
tunnel, but this prototype's [TP, L] SMEM tap-table layout OOMs the 1 MB
SMEM at flagship scale (SMEM windows lane-pad L to 128) — the module
stores the tables [L, TP].  Kept for the kernel-variant history (K1/K2/K3).

Every XLA spelling of the composed transpose (column/row scatter,
gather-form, layered prefix — scripts/scatter_bench.py) lands at
3.5–4.7 ms for band 1c × 1 pointing, ~20× off the ~0.2 ms HBM floor —
they all hit the same slow dynamic-gather lowering.  This kernel does the
gather-form contraction with the window block VMEM-resident:

    out[p, :] = Σ_{l<L} tw[p, l] · vals[tsrc[p, l], :]

- vals [n_src, W] lives entirely in VMEM (≤ 8 MB at flagship scale),
  λ padded to 4·128 lanes and reshaped to [n_src·4, 128] so one source
  row is a [4, 128] tile (4 sublanes instead of 1 — 4× VPU efficiency);
- tap tables tsrc/tw [P, L] ride in SMEM per output block (scalar reads);
- grid over output-row blocks, contiguous [4·TP, 128] writes, no scatter.

    python scripts/scatter_pallas_proto.py [--band 1c]
"""

import argparse
import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--band", default="1c")
    ap.add_argument("--npix", type=int, default=501)
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tp", type=int, default=512)
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from surfh_tpu.core import bilinear
    from surfh_tpu.simulation.flagship import make_flagship_model
    from surfh_tpu.utils.profiling import chained_time

    interpret = jax.default_backend() == "cpu"
    f32 = jnp.float32

    model, _setup = make_flagship_model(
        bands=[args.band], npix=args.npix, n_pointings=1, conv_impl="matmul",
    )
    chan = model.channels[0]
    _idx, _w, csrc, cw, cdst = (np.asarray(a[0]) for a in chan._composed_stack)
    ha, wb = chan._tbbox[2], chan._tbbox[3]
    P = ha * wb
    n_out = _idx.shape[1]
    W = chan.wslice.stop - chan.wslice.start
    nz = cw != 0
    csrc, cw, cdst = csrc[nz], cw[nz], cdst[nz]

    # host prep: gather-form [P, L]
    seg = np.bincount(cdst, minlength=P)
    L = int(seg.max())
    starts = np.concatenate([[0], np.cumsum(seg)])
    TP = args.tp
    Pp = -(-P // TP) * TP
    tsrc = np.zeros((Pp, L), np.int32)
    tw = np.zeros((Pp, L), np.float32)
    for k in range(L):
        has = seg > k
        tsrc[:P][has, k] = csrc[starts[:-1][has] + k]
        tw[:P][has, k] = cw[starts[:-1][has] + k]
    cnt = np.zeros((Pp,), np.int32)
    cnt[:P] = seg
    LANES = 128
    SUB = -(-W // LANES)  # λ chunks of 128 per source row
    Wp = SUB * LANES
    print(f"band {args.band}: P={P}->{Pp} n_out={n_out} W={W}->{Wp} "
          f"L={L} SUB={SUB} vmem vals={n_out*Wp*4/1e6:.1f} MB", flush=True)

    rng = np.random.default_rng(0)
    vals_host = rng.standard_normal((W, n_out)).astype(np.float32)
    # [n_src, Wp] -> [n_src*SUB, 128]
    vals3 = np.zeros((n_out, Wp), np.float32)
    vals3[:, :W] = vals_host.T
    vals3 = vals3.reshape(n_out * SUB, LANES)

    dev = jax.device_put
    j_vals3 = dev(vals3)
    j_tsrc, j_tw, j_cnt = dev(tsrc), dev(tw), dev(cnt.reshape(Pp, 1))
    j_csrc, j_cw, j_cdst = dev(csrc), dev(cw.astype(np.float32)), dev(cdst)
    j_vals = dev(vals_host)

    nblocks = Pp // TP

    # --- K1: static-L row loop ------------------------------------------
    def k1_kernel(tsrc_ref, tw_ref, vals_ref, out_ref):
        def row(p, carry):
            acc = tw_ref[p, 0] * vals_ref[pl.ds(tsrc_ref[p, 0] * SUB, SUB), :]
            for l in range(1, L):
                s = tsrc_ref[p, l]
                acc = acc + tw_ref[p, l] * vals_ref[pl.ds(s * SUB, SUB), :]
            out_ref[pl.ds(p * SUB, SUB), :] = acc
            return carry

        jax.lax.fori_loop(0, TP, row, 0)

    def k1(v3):
        return pl.pallas_call(
            k1_kernel,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((TP, L), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((TP, L), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((n_out * SUB, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TP * SUB, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Pp * SUB, LANES), f32),
            interpret=interpret,
        )(j_tsrc, j_tw, v3)

    # --- K2: dynamic per-row count --------------------------------------
    def k2_kernel(tsrc_ref, tw_ref, cnt_ref, vals_ref, out_ref):
        def row(p, carry):
            n = cnt_ref[p, 0]

            def tap(l, acc):
                s = tsrc_ref[p, l]
                return acc + tw_ref[p, l] * vals_ref[pl.ds(s * SUB, SUB), :]

            acc = jax.lax.fori_loop(
                0, n, tap, jnp.zeros((SUB, LANES), f32)
            )
            out_ref[pl.ds(p * SUB, SUB), :] = acc
            return carry

        jax.lax.fori_loop(0, TP, row, 0)

    def k2(v3):
        return pl.pallas_call(
            k2_kernel,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((TP, L), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((TP, L), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((TP, 1), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((n_out * SUB, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TP * SUB, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Pp * SUB, LANES), f32),
            interpret=interpret,
        )(j_tsrc, j_tw, j_cnt, v3)

    # --- K3: 4-row unroll (ILP), pre-scaled indices ----------------------
    UNROLL = 4
    tsrc_s = tsrc * SUB  # pre-scale on host: tap address is a plain SMEM read

    j_tsrc_s = dev(tsrc_s)

    def k3_kernel(tsrc_ref, tw_ref, vals_ref, out_ref):
        def rows(g, carry):
            p0 = g * UNROLL
            accs = []
            for u in range(UNROLL):
                p = p0 + u
                acc = tw_ref[p, 0] * vals_ref[pl.ds(tsrc_ref[p, 0], SUB), :]
                accs.append(acc)
            for l in range(1, L):
                for u in range(UNROLL):
                    p = p0 + u
                    accs[u] = accs[u] + tw_ref[p, l] * vals_ref[
                        pl.ds(tsrc_ref[p, l], SUB), :
                    ]
            for u in range(UNROLL):
                out_ref[pl.ds((p0 + u) * SUB, SUB), :] = accs[u]
            return carry

        jax.lax.fori_loop(0, TP // UNROLL, rows, 0)

    def k3(v3):
        return pl.pallas_call(
            k3_kernel,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((TP, L), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((TP, L), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((n_out * SUB, LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TP * SUB, LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Pp * SUB, LANES), f32),
            interpret=interpret,
        )(j_tsrc_s, j_tw, v3)

    # --- baseline A (current sorted-COO column scatter) ------------------
    def f_a(v):
        return bilinear.apply_composed_plan_t(j_csrc, j_cw, j_cdst, v, P)

    # correctness
    ref = np.asarray(f_a(j_vals))  # [W, P]
    got1 = np.asarray(k1(j_vals3)).reshape(Pp, Wp)[:P, :W].T
    got2 = np.asarray(k2(j_vals3)).reshape(Pp, Wp)[:P, :W].T
    got3 = np.asarray(k3(j_vals3)).reshape(Pp, Wp)[:P, :W].T
    for name, got in [("K1", got1), ("K2", got2), ("K3", got3)]:
        rel = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-30)
        print(f"  check {name}: max rel {rel:.2e}", flush=True)

    def t(name, fn, x):
        ms = chained_time(fn, x, chain=args.chain, reps=args.reps) * 1e3
        print(f"  {name:30s} {ms:8.2f} ms", flush=True)

    if not interpret:
        t("A  column scatter (current)", f_a, j_vals)
        t("K1 pallas static-L", k1, j_vals3)
        t("K2 pallas dynamic count", k2, j_vals3)
        t("K3 pallas 4-row unroll", k3, j_vals3)
    else:
        print("  (CPU interpret mode: correctness only)")


if __name__ == "__main__":
    main()
