"""Benchmark: fwd+adjoint cube-op throughput of the flagship fusion operator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

* value: GVox/s of one fused forward+adjoint application of the flagship
  `SpectroSigRLSCT` operator (voxels = 2 × cube size per application), jitted
  on the default JAX device (TPU under the driver).
* vs_baseline: speedup over the reference-equivalent CPU path
  (`surfh_tpu.core.numpy_ref`: serial channel/pointing/slit loops, scipy.fft
  workers=-1 — the reference publishes no numbers, BASELINE.md, so the
  baseline is measured empirically on the same problem).  For the synthetic
  presets the baseline is re-measured (medians over ≥3 reps, config recorded
  in the JSON); for the `flagship` preset the baseline is a RECORDED
  measurement of the same numpy_ref path at full scale (see PERF.md), since
  a ~1 h CPU run inside every bench invocation is not viable.
* extras: `flops_per_app` (XLA cost analysis of the compiled programs, with
  an analytic fallback), `tflops` achieved, `mfu_est` vs the v5e bf16 peak
  (197 TFLOP/s — conservative: the pipeline runs f32), `baseline_s`,
  `baseline_config`, `t_app_s`, `preset`.

Presets:
  small/medium/large — synthetic multi-band problems (compile-light).
  flagship — the reference's real problem scale: 12 MIRI bands × 4 dither
  pointings, 501² grid, ~3879-λ cube (scripts/main_fusion.py:34-39), run in
  window-local tables-as-args mode.
"""

import json
import os
import time

import numpy as np

PRESETS = {
    "small": dict(im_size=81, n_lambda=60, n_tpl=4, n_channels=2, n_pointings=2, n_slit=5),
    "medium": dict(im_size=251, n_lambda=250, n_tpl=4, n_channels=2, n_pointings=2, n_slit=11),
    "large": dict(im_size=501, n_lambda=600, n_tpl=4, n_channels=4, n_pointings=4, n_slit=17),
}

# Recorded CPU baselines for one fwd+adjoint application of the
# reference-equivalent numpy path (surfh_tpu.core.numpy_ref), measured on
# this image's CPU (1 vCPU, scipy.fft workers=-1, float64).  Presets without
# an entry are measured in-process.
RECORDED_BASELINES = {
    # filled by scripts/measure_flagship_baseline.py; see PERF.md
}
_BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "baseline_cpu.json")

# TPU v5e peak: 197 TFLOP/s bf16 (the MXU's native mode).  The pipeline runs
# float32, so this denominator is conservative (an f32-peak MFU would be ~2×).
V5E_PEAK_FLOPS = 197e12
V5E_HBM_BW = 819e9  # bytes/s


def _analytic_flops(model) -> float:
    """Analytic FLOP count of one fwd+adjoint application (lower bound).

    Counts the dominant stages (LMM matmul, FFT conv pairs, gridding gather,
    SRF box-sum, spectral-blur matmul) for forward and adjoint alike.
    """
    n_tpl = model.templates.shape[0] if model.lmm else 0
    N2 = float(np.prod(model.imshape))
    total = 0.0
    for chan in model.channels:
        W = float(chan.n_wslice)
        P = len(chan.pointings)
        S, K, A = chan.oshape[1], chan.oshape[2], chan.oshape[3]
        sb = chan.slit_shape[2]
        nl = float(np.prod(chan.local_im_shape))
        if model.lmm:
            total += 2 * n_tpl * W * N2  # T
        total += 2 * 5 * W * N2 * np.log2(max(N2, 2))  # C: rfft2+irfft2 pair
        total += 6 * W * N2 / 2  # OTF multiply (complex, half-spectrum)
        per_pointing = (
            7 * W * nl  # bilinear gather (4 mul + 3 add)
            + W * S * A * chan.srf * sb  # SRF box-sum adds
            + W * S * A * sb  # slit weights
            + 2 * K * W * sb * S * A  # Sig·R matmul
        )
        total += P * per_pointing
    return 2.0 * total  # adjoint mirrors the forward


def main():
    if os.environ.get("SURFH_BENCH_CPU"):
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if os.environ.get("SURFH_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    try:  # persistent compile cache: first bench run pays, reruns are fast
        jax.config.update("jax_compilation_cache_dir", "/tmp/surfh_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from surfh_tpu.core import numpy_ref

    preset = os.environ.get("SURFH_BENCH_PRESET", "flagship")
    reps = int(os.environ.get("SURFH_BENCH_REPS", "5"))
    chain = int(os.environ.get("SURFH_BENCH_CHAIN", "10"))
    wblur_impl = os.environ.get("SURFH_WBLUR_IMPL", "dense")

    if preset == "flagship":
        from surfh_tpu.simulation.flagship import make_flagship_model

        model, setup = make_flagship_model(
            wblur_impl=wblur_impl,
            conv_impl=os.environ.get("SURFH_CONV_IMPL", "auto"),
        )
    else:
        from surfh_tpu.simulation.synthetic import make_model

        model, setup = make_model(
            dtype=jnp.float32, wblur_impl=wblur_impl, **PRESETS[preset]
        )
    maps = jnp.asarray(setup["maps"], jnp.float32)

    # Two timing modes (axon: ~24 ms tunnel RTT per dispatch, and
    # block_until_ready can return before compute finishes — a scalar fetch
    # is the only reliable completion barrier):
    # * "loop": chain CHAIN applications inside one jitted fori_loop and
    #   fetch a scalar — one round trip per sample.  Best when one
    #   application is sub-ms..ms scale (small/medium presets).
    # * "dispatch": compile forward and adjoint as separate programs and
    #   chain K *dependent* dispatches at Python level, fetching one scalar
    #   at the end.  At flagship scale one application is O(seconds), so the
    #   pipelined RTT is <1% — and keeping the loop OUT of the graph
    #   matters: XLA threads every captured table through the while-loop
    #   carry with a private copy (measured +4.7 GB HLO temp → OOM at
    #   16 GB HBM), while the separate fwd/adj programs fit.
    mode = os.environ.get(
        "SURFH_BENCH_MODE", "dispatch" if preset == "flagship" else "loop"
    )
    compile_breakdown = {}
    if model.window_local:
        compile_breakdown["upload_mb"] = round(
            sum(
                np.asarray(l).nbytes
                for l in jax.tree_util.tree_leaves(model.host_tables())
            )
            / 1e6,
            1,
        )
        t0 = time.perf_counter()
        tables = model.device_tables()
        jax.block_until_ready(jax.tree_util.tree_leaves(tables))
        compile_breakdown["tables_upload_materialize_s"] = round(
            time.perf_counter() - t0, 2
        )
        app_args = (tables,)
        fwd_fn, adj_fn = model._forward_fn_tabled, model._adjoint_fn_tabled
    else:
        app_args = ()
        fwd_fn, adj_fn = model._forward_fn, model.adjoint_fn

    if mode == "dispatch":
        # Per-program compile accounting (VERDICT r2 item 4): lower+compile
        # each program ONCE, reuse the compiled executables for both the
        # timing loop and the cost analysis (the old path compiled the fwd
        # and adj programs TWICE each — once via the jit cache, once via
        # .lower().compile() for cost analysis — doubling the cold start).
        t0 = time.perf_counter()
        compiled = jax.jit(fwd_fn).lower(maps, *app_args).compile()
        compile_breakdown["fwd_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        adj_compiled = (
            jax.jit(adj_fn)
            .lower(jax.ShapeDtypeStruct(model.oshape, jnp.float32), *app_args)
            .compile()
        )
        compile_breakdown["adj_s"] = round(time.perf_counter() - t0, 2)
        sum_c = jax.jit(lambda g: jnp.sum(g))

        def run_chain(x0):
            x = x0
            s = None
            for _ in range(chain):
                g = adj_compiled(compiled(x, *app_args), *app_args)
                s = sum_c(g)
                x = x0 + g * 1e-30  # dependent input, stable magnitude
            return float(s)

        t0 = time.perf_counter()
        run_chain(maps)  # warm both programs
        compile_breakdown["warmup_run_s"] = round(time.perf_counter() - t0, 2)
        t_compile = sum(compile_breakdown.values())
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run_chain(maps)
            times.append(time.perf_counter() - t0)
    else:

        @jax.jit
        def fwd_adj_chain(x, *app_args):
            def body(i, carry):
                x, acc = carry
                out = adj_fn(fwd_fn(x + acc * 1e-30, *app_args), *app_args)
                return x, acc + jnp.sum(out)

            _, acc = jax.lax.fori_loop(0, chain, body, (x, jnp.float32(0)))
            return acc

        args = (maps,) + app_args
        t0 = time.perf_counter()
        compiled = fwd_adj_chain.lower(*args).compile()
        t_compile = time.perf_counter() - t0
        float(compiled(*args))  # warm-up run
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(compiled(*args))
            times.append(time.perf_counter() - t0)
    t_jax = float(np.median(times)) / chain

    vox = 2.0 * float(np.prod(model.cube_shape))
    gvox_s = vox / t_jax / 1e9

    # FLOPs: XLA's own cost model of the compiled program(s), analytic
    # fallback.  In dispatch mode one application = the fwd + adj programs;
    # in loop mode the chain program counts `chain` applications.
    def _xla_cost(c, key):
        ca = c.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca[key])

    def _xla_flops(c):
        return _xla_cost(c, "flops")

    bytes_per_app = None
    try:
        if mode == "dispatch":
            flops_per_app = _xla_flops(compiled) + _xla_flops(adj_compiled)
            try:
                bytes_per_app = _xla_cost(compiled, "bytes accessed") + _xla_cost(
                    adj_compiled, "bytes accessed"
                )
            except Exception:
                bytes_per_app = None
        else:
            # XLA's cost model counts a while-loop body ONCE (trip count
            # opaque), so the chain program's flops ≈ one application
            # (validated against dispatch mode: ratio = chain).
            flops_per_app = _xla_flops(compiled)
    except Exception:
        flops_per_app = _analytic_flops(model)
    tflops = flops_per_app / t_jax / 1e12
    mfu = flops_per_app / t_jax / V5E_PEAK_FLOPS
    # This pipeline is gather/bandwidth-bound, not MXU-bound: the roofline
    # that matters is HBM traffic vs the v5e's 819 GB/s, not matmul peak.
    hbm_util = (
        bytes_per_app / t_jax / V5E_HBM_BW if bytes_per_app is not None else None
    )

    # CPU baseline (reference-equivalent NumPy path).
    baseline_s = None
    baseline_cfg = None
    if os.environ.get("SURFH_BENCH_SKIP_BASELINE"):
        vs_baseline = float("nan")
    else:
        recorded = dict(RECORDED_BASELINES)
        if os.path.exists(_BASELINE_FILE):
            with open(_BASELINE_FILE) as fh:
                recorded.update(json.load(fh))
        if preset in recorded:
            rec = recorded[preset]
            baseline_s = float(rec["seconds"])
            baseline_cfg = rec.get("config", "recorded")
            vs_baseline = baseline_s / t_jax
        else:
            x64 = np.asarray(setup["maps"], np.float64)
            bt = []
            for _ in range(max(1, min(3, reps))):
                t0 = time.perf_counter()
                y_np = numpy_ref.spectro_forward(model, x64)
                numpy_ref.spectro_adjoint(model, y_np)
                bt.append(time.perf_counter() - t0)
            baseline_s = float(np.median(bt))
            baseline_cfg = (
                f"numpy_ref float64, scipy.fft workers=-1, 1 vCPU, "
                f"median of {len(bt)}"
            )
            vs_baseline = baseline_s / t_jax

    print(
        json.dumps(
            {
                "metric": f"fwd+adjoint cube-op throughput ({preset})",
                "value": round(gvox_s, 4),
                "unit": "GVox/s",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline == vs_baseline else vs_baseline,
                "preset": preset,
                "t_app_s": round(t_jax, 6),
                "t_compile_s": round(t_compile, 2),
                "compile_breakdown": compile_breakdown or None,
                "flops_per_app": flops_per_app,
                "tflops": round(tflops, 3),
                "mfu_est": round(mfu, 4),
                "bytes_per_app": bytes_per_app,
                "hbm_util_est": round(hbm_util, 4) if hbm_util is not None else None,
                "baseline_s": baseline_s,
                "baseline_config": baseline_cfg,
                "cube_shape": list(model.cube_shape),
                "n_channels": len(model.channels),
                "n_pointings": len(model.pointings[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
