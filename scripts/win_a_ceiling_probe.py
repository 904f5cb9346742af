"""Measure the REAL marginal cost of the composed transpose in the fused
flagship adjoint (the attainable win_a prize).

The XLA cost model charges win_a 18 GB of the app's 36 GB (PERF.md
roofline), but model bytes are not wall time: the fused program overlaps
the gather DMA with MXU stages.  This times the fused 12-band adjoint on
the device twice — with the real bucketed-rows transpose, and with the
transpose stubbed to a near-free broadcast (shapes and downstream
dataflow preserved) — the difference is the true attainable saving of
any smarter transpose spelling.

    python scripts/win_a_ceiling_probe.py [--reps 20] [--cpu]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--bands", default=None)
    ap.add_argument("--npix", type=int, default=501)
    ap.add_argument("--pointings", type=int, default=4)
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/surfh_jax_cache")
    import jax.numpy as jnp

    from surfh_tpu.core import bilinear
    from surfh_tpu.simulation.flagship import make_flagship_setup, make_flagship_model

    bands = args.bands.split(",") if args.bands else None
    setup = make_flagship_setup(
        npix=args.npix, bands=bands, n_pointings=args.pointings,
        build_sotf=False,
    )
    model, _ = make_flagship_model(setup)
    tables = model.device_tables()
    jax.block_until_ready(jax.tree_util.tree_leaves(tables))
    maps = jnp.asarray(np.asarray(setup["maps"], np.float32))

    fwd = jax.jit(model._forward_fn_tabled).lower(maps, tables).compile()
    y = fwd(maps, tables)
    jax.block_until_ready(y)

    sum_c = jax.jit(lambda g: jnp.sum(g))
    chain = 10

    def timed_adjoint(tag):
        t0 = time.time()
        adj = (
            jax.jit(model._adjoint_fn_tabled)
            .lower(jax.ShapeDtypeStruct(model.oshape, jnp.float32), tables)
            .compile()
        )
        compile_s = time.time() - t0

        # axon's block_until_ready does not synchronize remote execution;
        # force a scalar fetch per chained segment (bench.py pattern)
        def run_chain():
            g = None
            for _ in range(chain):
                yy = y if g is None else y + g.reshape(-1)[:1] * 1e-30
                g = adj(yy, tables)
            return float(sum_c(g))

        run_chain()  # warm
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            run_chain()
            ts.append((time.perf_counter() - t0) / chain)
        ms = float(np.median(ts)) * 1e3
        print(json.dumps({tag: {"ms": round(ms, 2),
                                "compile_s": round(compile_s, 1)}}),
              flush=True)
        return ms

    real_ms = timed_adjoint("adjoint_real")

    orig = bilinear.apply_composed_plan_rows_t

    def stub(linv, buckets, values):
        # near-free placeholder with the right shape and a live dependency
        return jnp.broadcast_to(
            values[:, :1], (values.shape[0], linv.shape[0])
        )

    def no_final_take(linv, buckets, values):
        # real bucket gathers + einsum, final permutation gather replaced
        # by a dense pad+transpose: isolates the linv-take term
        w_dim = values.shape[0]
        vt = values.T
        t0 = buckets[0][0].shape[1]
        acc = jnp.zeros((t0, w_dim), values.dtype)
        for src_g, wgt_g in buckets:
            g = jnp.take(vt, src_g.reshape(-1), axis=0)
            g = g.reshape(src_g.shape + (w_dim,))
            part = jnp.einsum("ltw,lt->tw", g, wgt_g)
            acc = acc.at[: src_g.shape[1]].add(part)
        n_patch = linv.shape[0]
        return jnp.pad(acc, ((0, n_patch - t0), (0, 0))).T

    variants = {"adjoint_stub": stub, "adjoint_no_final_take": no_final_take}
    res = {}
    try:
        for tag, fn in variants.items():
            bilinear.apply_composed_plan_rows_t = fn
            res[tag] = timed_adjoint(tag)
    finally:
        bilinear.apply_composed_plan_rows_t = orig

    stub_ms = res["adjoint_stub"]
    print(
        json.dumps(
            {
                "win_a_transpose_marginal_ms": round(real_ms - stub_ms, 2),
                "fraction_of_adjoint": round((real_ms - stub_ms) / real_ms, 3),
                "final_take_marginal_ms": round(
                    real_ms - res["adjoint_no_final_take"], 2
                ),
                "gather_einsum_marginal_ms": round(
                    res["adjoint_no_final_take"] - stub_ms, 2
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
