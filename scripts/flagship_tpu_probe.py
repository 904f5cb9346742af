"""Stepwise flagship-scale TPU probe: build → upload → compile → time.

Runs the reference's real problem size (12 bands × 4 pointings, 501²,
~3879 λ — scripts/main_fusion.py:34-39) through the window-local
tables-as-arguments path on the tunneled TPU, reporting per-stage wall
times as it goes.  Use this before trusting `bench.py`'s flagship preset:
it isolates which stage (host build, HBM upload, XLA compile, runtime)
breaks or dominates.

    python scripts/flagship_tpu_probe.py [--npix 501] [--bands 1a,1b,...]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage(name, t0):
    dt = time.time() - t0
    print(f"[{time.strftime('%H:%M:%S')}] {name}: {dt:.1f}s", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npix", type=int, default=501)
    ap.add_argument("--bands", type=str, default=None,
                    help="comma-separated band subset (default: all 12)")
    ap.add_argument("--pointings", type=int, default=4)
    ap.add_argument("--chain", type=int, default=5)
    ap.add_argument("--skip-normal", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/surfh_jax_cache")
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}", flush=True)

    from surfh_tpu.simulation.flagship import make_flagship_model, make_flagship_setup

    report = {}
    t0 = time.time()
    bands = args.bands.split(",") if args.bands else None
    setup = make_flagship_setup(npix=args.npix, bands=bands,
                                n_pointings=args.pointings)
    report["setup_s"] = stage("setup build", t0)

    t0 = time.time()
    model, _ = make_flagship_model(setup)
    report["model_s"] = stage("model build", t0)
    print(f"cube {model.cube_shape}, y {int(model._idx[-1])}, "
          f"{len(model.channels)} channels", flush=True)

    t0 = time.time()
    tables = model.device_tables()
    jax.block_until_ready(tables)
    report["upload_s"] = stage("HBM upload", t0)

    maps = jax.device_put(jnp.asarray(setup["maps"], jnp.float32))

    # forward
    t0 = time.time()
    fwd = jax.jit(model._forward_fn_tabled)
    y = fwd(maps, tables)
    jax.block_until_ready(y)
    report["fwd_compile_s"] = stage("forward compile+run", t0)

    t0 = time.time()
    y = fwd(maps, tables)
    jax.block_until_ready(y)
    report["fwd_warm_s"] = stage("forward warm", t0)

    # adjoint
    t0 = time.time()
    adj = jax.jit(model._adjoint_fn_tabled)
    g = adj(y, tables)
    jax.block_until_ready(g)
    report["adj_compile_s"] = stage("adjoint compile+run", t0)

    t0 = time.time()
    g = adj(y, tables)
    jax.block_until_ready(g)
    report["adj_warm_s"] = stage("adjoint warm", t0)

    if not args.skip_normal:
        # chained normal op: one dispatch, CHAIN fused fwd+adj applications
        chain = args.chain

        @jax.jit
        def normal_chain(x, tables):
            def body(i, carry):
                x, acc = carry
                out = model._normal_fn_tabled(x + acc * 1e-30, tables)
                return x, acc + jnp.sum(out)

            _, acc = jax.lax.fori_loop(0, chain, body, (x, jnp.float32(0)))
            return acc

        t0 = time.time()
        float(normal_chain(maps, tables))
        report["normal_compile_s"] = stage(f"normal×{chain} compile+run", t0)

        t0 = time.time()
        float(normal_chain(maps, tables))
        dt = stage(f"normal×{chain} warm", t0)
        report["normal_app_s"] = dt / chain
        vox = 2.0 * float(np.prod(model.cube_shape))
        report["gvox_s"] = vox / report["normal_app_s"] / 1e9
        print(f"per-application: {report['normal_app_s']:.3f}s "
              f"= {report['gvox_s']:.2f} GVox/s", flush=True)

    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    sys.exit(main())
