"""Benchmark: fwd+adjoint cube-op throughput of the flagship fusion operator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

* value: GVox/s of one fused forward+adjoint application of the flagship
  `SpectroSigRLSCT` operator (voxels = 2 × cube size per application), jitted
  on the default JAX device (TPU under the driver).
* vs_baseline: speedup over the reference-equivalent CPU path
  (`surfh_tpu.core.numpy_ref`: serial channel/pointing/slit loops, scipy.fft
  workers=-1 — the reference publishes no numbers, BASELINE.md, so the
  baseline is measured empirically on the same problem).
"""

import json
import os
import time

import numpy as np

# Presets trade compile time (≈ channels × pointings × slits unrolled ops —
# expensive through remote-compile tunnels) against arithmetic size.
PRESETS = {
    "small": dict(im_size=81, n_lambda=60, n_tpl=4, n_channels=2, n_pointings=2, n_slit=5),
    "medium": dict(im_size=251, n_lambda=250, n_tpl=4, n_channels=2, n_pointings=2, n_slit=11),
    "large": dict(im_size=501, n_lambda=600, n_tpl=4, n_channels=4, n_pointings=4, n_slit=17),
}


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
    from surfh_tpu.simulation.synthetic import make_model

    preset = os.environ.get("SURFH_BENCH_PRESET", "medium")
    cfg = PRESETS[preset]
    reps = int(os.environ.get("SURFH_BENCH_REPS", "5"))

    wblur_impl = os.environ.get("SURFH_WBLUR_IMPL", "dense")
    model, setup = make_model(dtype=jnp.float32, wblur_impl=wblur_impl, **cfg)
    maps = jnp.asarray(setup["maps"], jnp.float32)

    # Chain CHAIN applications sequentially inside one jitted call (like CG
    # iterations) and fetch a scalar: one host↔device round trip per timing
    # sample, so tunnel latency doesn't pollute the kernel time.
    chain = int(os.environ.get("SURFH_BENCH_CHAIN", "10"))

    @jax.jit
    def fwd_adj_chain(x):
        def body(i, carry):
            x, acc = carry
            out = model.adjoint_fn(model._forward_fn(x + acc * 1e-30))
            return x, acc + jnp.sum(out)

        _, acc = jax.lax.fori_loop(0, chain, body, (x, jnp.float32(0)))
        return acc

    # warm-up / compile
    float(fwd_adj_chain(maps))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fwd_adj_chain(maps))
        times.append(time.perf_counter() - t0)
    t_jax = float(np.median(times)) / chain

    vox = 2.0 * float(np.prod(model.cube_shape))
    gvox_s = vox / t_jax / 1e9

    # CPU baseline (reference-equivalent NumPy path), one timed application.
    if os.environ.get("SURFH_BENCH_SKIP_BASELINE"):
        vs_baseline = float("nan")
    else:
        x64 = np.asarray(setup["maps"], np.float64)
        t0 = time.perf_counter()
        y_np = numpy_ref.spectro_forward(model, x64)
        numpy_ref.spectro_adjoint(model, y_np)
        t_np = time.perf_counter() - t0
        vs_baseline = t_np / t_jax

    print(
        json.dumps(
            {
                "metric": f"fwd+adjoint cube-op throughput ({preset})",
                "value": round(gvox_s, 4),
                "unit": "GVox/s",
                "vs_baseline": round(vs_baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
