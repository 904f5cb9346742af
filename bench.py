"""Benchmark: fwd+adjoint cube-op throughput of the flagship fusion operator.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline",
...extras}.  All progress/heartbeat output goes to stderr.

* value: GVox/s of one fused forward+adjoint application of the flagship
  `SpectroSigRLSCT` operator (voxels = 2 × cube size per application), jitted
  on the default JAX device (TPU under the driver).
* vs_baseline: speedup over the reference-equivalent CPU path
  (`surfh_tpu.core.numpy_ref`: serial channel/pointing/slit loops, scipy.fft
  workers=-1 — the reference publishes no numbers, BASELINE.md, so the
  baseline is measured empirically on the same problem).  Baselines are
  RECORDED measurements (`baseline_cpu.json`, medians of >=3 reps via
  scripts/measure_preset_baselines.py / measure_flagship_baseline.py) — no
  bench invocation re-measures a CPU baseline in-process.
* extras: `flops_per_app` (XLA cost analysis of the compiled programs, with
  an analytic fallback), `tflops` achieved, `mfu_est` vs the v5e bf16 peak
  (197 TFLOP/s — conservative: the pipeline runs f32; `mfu_note` flags the
  pipeline as bandwidth-bound), `bytes_per_app_modeled`/`hbm_util_modeled`
  (static cost model — double-counts shared tables in unrolled graphs,
  see `bytes_note`), and MEASURED `device_ms_per_app` /
  `bytes_per_app_traced` / `hbm_util_measured` from a short profiler trace
  of the timed executables (flagship only; `SURFH_BENCH_NO_TRACE=1`
  disables), plus `baseline_s`, `baseline_config`, `t_app_s`, `preset`.

Presets:
  small/medium/large — synthetic multi-band problems (compile-light).
  flagship — the reference's real problem scale: 12 MIRI bands × 4 dither
  pointings, 501² grid, ~3879-λ cube (scripts/main_fusion.py:34-39), run in
  window-local tables-as-args mode.

Wall-clock guarantee (VERDICT r3 item 1): the default entry is an
ORCHESTRATOR that runs the measurement in a subprocess under a budget
(`SURFH_BENCH_BUDGET_S`, default 780 s) and ALWAYS emits a JSON line:
the flagship result when it lands, else a banked lighter-tier result
tagged `"fallback": <reason>`, else an `"error"` record.  The inner
process banks a medium-preset result early, overlaps the axon tunnel's
per-process slow phase (measured 45-350 s, content-independent — see
PERF.md "Cold start") with a tiny priming program, builds the flagship
host tables in a parallel thread, and heartbeats its stage to stderr.
A hung tunnel/backed init (observed: import-time stalls >600 s) is
detected by the orchestrator's no-progress watchdog and retried.

Env knobs: SURFH_BENCH_PRESET/_CPU/_SKIP_BASELINE/_REPS/_CHAIN/_MODE,
SURFH_BENCH_BUDGET_S, SURFH_BENCH_TIER=medium|none, SURFH_BENCH_NO_ORCH=1
(run the measurement in-process, no budget guarantee),
SURFH_BENCH_NO_TRACE=1 (skip the diagnostics device trace),
SURFH_BENCH_LARGE_MIN_S (opportunistic large-tier upgrade threshold),
SURFH_WBLUR_IMPL.
"""

import json
import os
import sys
import tempfile
import threading
import time

import numpy as np

PRESETS = {
    "small": dict(im_size=81, n_lambda=60, n_tpl=4, n_channels=2, n_pointings=2, n_slit=5),
    "medium": dict(im_size=251, n_lambda=250, n_tpl=4, n_channels=2, n_pointings=2, n_slit=11),
    "large": dict(im_size=501, n_lambda=600, n_tpl=4, n_channels=4, n_pointings=4, n_slit=17),
}

_BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "baseline_cpu.json")

# TPU v5e peak: 197 TFLOP/s bf16 (the MXU's native mode).  The pipeline runs
# float32, so this denominator is conservative (an f32-peak MFU would be ~2×).
V5E_PEAK_FLOPS = 197e12
V5E_HBM_BW = 819e9  # bytes/s

DEFAULT_BUDGET_S = 840.0


def _log(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


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


def _read_json(path):
    try:
        with open(path) as fh:
            return json.load(fh)
    except Exception:
        return None


def _write_json(path, obj):
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(obj, fh)
    os.replace(tmp, path)


# --------------------------------------------------------------------------
# Orchestrator: budget + watchdog + guaranteed single JSON line on stdout.
# --------------------------------------------------------------------------

def _orchestrate():
    import subprocess

    t0 = time.monotonic()
    budget = float(os.environ.get("SURFH_BENCH_BUDGET_S", DEFAULT_BUDGET_S))
    deadline = t0 + budget
    preset = os.environ.get("SURFH_BENCH_PRESET", "flagship")
    rf = os.environ.get("SURFH_BENCH_RESULT_FILE") or os.path.join(
        tempfile.mkdtemp(prefix="surfh_bench_"), "result.json"
    )
    hb = rf + ".hb"
    env = dict(os.environ, SURFH_BENCH_RESULT_FILE=rf)

    def remaining():
        return deadline - time.monotonic()

    fallback_reason = None
    attempts = 0
    while attempts < 3:
        attempts += 1
        slot = remaining() - 15.0  # reserve for emit + child teardown
        if slot < 45:
            break
        env["SURFH_BENCH_INNER_DEADLINE"] = str(time.time() + slot)
        _log(f"attempt {attempts}: inner measurement, slot {slot:.0f}s "
             f"(budget {budget:.0f}s)")
        start = time.monotonic()
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--inner"],
            stdout=sys.stderr, stderr=sys.stderr, env=env,
        )
        killed = None
        stall_s = float(os.environ.get("SURFH_BENCH_STALL_S", "420"))
        stage_token, stage_since = None, time.monotonic()
        while True:
            rc = proc.poll()
            if rc is not None:
                break
            now = time.monotonic()
            if now > deadline - 12:
                killed = "budget exhausted"
                break
            # startup watchdog: no heartbeat file progress within 150 s
            # catches the tunnel's intermittent import/init hangs
            if now - start > 150:
                try:
                    hb_fresh = os.path.getmtime(hb) > time.time() - 150
                except OSError:
                    hb_fresh = False
                if not hb_fresh and _read_json(rf) is None:
                    killed = "startup hang (no heartbeat for 150s)"
                    break
            # stall watchdog: the tunnel's per-process slow phase has a
            # heavy tail (observed: a first execution pending >420 s while
            # heartbeats keep flowing).  A fresh process re-rolls the phase
            # BUT pays it again from zero — so only kill + retry while the
            # remaining budget could still absorb another full stall plus
            # the post-phase work; otherwise riding out the slow attempt
            # dominates (it completes whenever the phase clears, retrying
            # cannot finish sooner).
            try:
                with open(hb, "rb") as fh:
                    last = fh.readlines()[-1].decode().strip()
                tok = last.split(" ", 1)[1] if " " in last else last
            except (OSError, IndexError):
                tok = None
            if tok != stage_token:
                stage_token, stage_since = tok, now
            elif (now - stage_since > stall_s
                  and remaining() > stall_s + 180):
                killed = (f"stalled in stage {stage_token!r} for "
                          f">{stall_s:.0f}s")
                break
            time.sleep(2)
        if killed:
            _log(f"killing inner: {killed}")
            proc.kill()
            try:
                proc.wait(timeout=20)
            except Exception:
                pass
        res = _read_json(rf)
        if res and res.get("final"):
            break
        if killed and killed.startswith("budget"):
            fallback_reason = fallback_reason or (
                "wall-clock budget exhausted before the flagship measurement"
            )
            break
        if killed:  # startup hang: transient tunnel failure — retry
            fallback_reason = f"inner killed: {killed}"
            continue
        fallback_reason = f"inner exited rc={proc.returncode} before finishing"
        if res is not None:
            break  # partial (banked tier) result — take it
        # no result at all: retry if the slot allows

    res = _read_json(rf)
    if res is None:
        res = {
            "metric": f"fwd+adjoint cube-op throughput ({preset})",
            "value": 0.0,
            "unit": "GVox/s",
            "vs_baseline": 0.0,
            "preset": preset,
            "error": fallback_reason or "no inner result produced",
        }
    final = res.pop("final", False)
    if not final and "error" not in res:
        res["fallback"] = res.get("fallback") or fallback_reason or (
            "budget: lighter-tier result"
        )
    res["t_total_s"] = round(time.monotonic() - t0, 1)
    print(json.dumps(res), flush=True)


# --------------------------------------------------------------------------
# Inner measurement process.
# --------------------------------------------------------------------------

class _Stage:
    """Heartbeat: current stage name, mirrored to stderr + the .hb file."""

    def __init__(self, hb_path):
        self.hb_path = hb_path
        self.t0 = time.monotonic()
        self.name = "start"
        self.t_stage = self.t0
        self._stop = threading.Event()
        threading.Thread(target=self._beat, daemon=True).start()

    def set(self, name):
        self.name = name
        self.t_stage = time.monotonic()
        self._touch()
        _log(f"inner +{self.t_stage - self.t0:.0f}s: {name}")

    def _touch(self):
        try:
            with open(self.hb_path, "a") as fh:
                fh.write(f"{time.time():.0f} {self.name}\n")
        except OSError:
            pass

    def _beat(self):
        while not self._stop.wait(15.0):
            self._touch()
            _log(
                f"inner heartbeat: in '{self.name}' for "
                f"{time.monotonic() - self.t_stage:.0f}s "
                f"(elapsed {time.monotonic() - self.t0:.0f}s)"
            )

    def stop(self):
        self._stop.set()


def _start_prime(jax, jnp):
    """Absorb the axon per-process slow phase on a tiny program, in a
    background thread, so it overlaps host-side model/table construction.

    Measured (PERF.md "Cold start", round 4): the first jitted multi-buffer
    consumption in a process pays a content-independent 45-350 s phase;
    after ANY such consumption (even 8×128-float buffers), subsequent first
    executions are seconds.  Compiles and device_put do NOT serialize
    behind the phase, so everything else proceeds while this thread waits.
    """
    done = threading.Event()
    out = {}

    def prime():
        t0 = time.monotonic()
        try:
            bufs = [jax.device_put(np.full((128,), i, np.float32))
                    for i in range(8)]
            f = jax.jit(lambda *ls: sum(jnp.sum(l) for l in ls))
            float(f(*bufs))
            out["prime_s"] = round(time.monotonic() - t0, 1)
            _log(f"prime done in {out['prime_s']}s")
        except Exception as e:  # pragma: no cover - diagnostics only
            out["prime_error"] = repr(e)
            _log(f"prime FAILED: {e!r}")
        finally:
            done.set()

    threading.Thread(target=prime, daemon=True).start()
    out["done"] = done
    return out


def _xla_cost(c, key):
    ca = c.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca[key])


def _attach_baseline(result, preset, t_jax):
    if os.environ.get("SURFH_BENCH_SKIP_BASELINE"):
        result["vs_baseline"] = None
        return
    recorded = _read_json(_BASELINE_FILE) or {}
    if preset in recorded:
        rec = recorded[preset]
        result["baseline_s"] = float(rec["seconds"])
        result["baseline_config"] = rec.get("config", "recorded")
        result["vs_baseline"] = round(result["baseline_s"] / t_jax, 2)
    else:
        # No recorded baseline: report throughput without a speedup claim
        # rather than burning minutes of CPU inside the bench (VERDICT r3
        # item 4).  Record one with scripts/measure_preset_baselines.py.
        result["vs_baseline"] = None
        result["baseline_config"] = (
            f"no recorded baseline for preset {preset!r} in baseline_cpu.json"
        )


def _measure(model, setup, preset, stage, jax, jnp, compile_breakdown=None,
             pre_write=None):
    """Compile + time one fwd+adjoint application; returns the result dict.

    `pre_write(result)` (if given) is called with the COMPLETE timing
    result before the optional diagnostics-only device trace runs, so a
    tunnel hang inside the trace can never destroy a finished
    measurement — the caller banks it first."""
    reps = int(os.environ.get("SURFH_BENCH_REPS", "5"))
    chain = int(os.environ.get("SURFH_BENCH_CHAIN", "10"))
    # dispatch mode for flagship AND large: both graphs are too big for the
    # tunnel's chained loop-mode program (PERF.md "Known environment limits")
    mode = os.environ.get(
        "SURFH_BENCH_MODE",
        "dispatch" if preset in ("flagship", "large") else "loop",
    )
    compile_breakdown = dict(compile_breakdown or {})
    maps = jnp.asarray(setup["maps"], jnp.float32)

    if model.window_local:
        host = model.host_tables()  # memoized — one build, reused by upload
        compile_breakdown["upload_mb"] = round(
            sum(np.asarray(l).nbytes
                for l in jax.tree_util.tree_leaves(host)) / 1e6, 1)
        # dispatch the upload + on-device materialization ASYNC (axon queues
        # transfers lazily) — the fwd/adj lowering below only needs avals,
        # so the compiles overlap the table streaming and the priming phase;
        # the first execution is the completion barrier for all of it.
        stage.set(f"{preset}: table upload+materialize (async)")
        t0 = time.perf_counter()
        tables = model.device_tables()
        compile_breakdown["tables_dispatch_s"] = round(
            time.perf_counter() - t0, 2)
        app_args = (tables,)
        fwd_fn, adj_fn = model._forward_fn_tabled, model._adjoint_fn_tabled
    else:
        app_args = ()
        fwd_fn, adj_fn = model._forward_fn, model.adjoint_fn

    if mode == "dispatch":
        # Lower+compile each program ONCE; reuse the executables for the
        # timing loop and the cost analysis.  fwd/adj compile in parallel
        # threads — the remote-compile tunnel accepts concurrent requests
        # and neither serializes behind the priming phase.
        stage.set(f"{preset}: compile fwd+adj")
        cbox = {}

        def _compile(tag, fn, args):
            t0 = time.perf_counter()
            cbox[tag] = jax.jit(fn).lower(*args).compile()
            compile_breakdown[f"{tag}_s"] = round(time.perf_counter() - t0, 2)

        th = threading.Thread(
            target=_compile, args=("fwd", fwd_fn, (maps,) + app_args))
        th.start()
        _compile("adj", adj_fn,
                 (jax.ShapeDtypeStruct(model.oshape, jnp.float32),) + app_args)
        th.join()
        if "fwd" not in cbox:
            raise RuntimeError("forward compile failed (see stderr)")
        compiled, adj_compiled = cbox["fwd"], cbox["adj"]
        sum_c = jax.jit(lambda g: jnp.sum(g))

        def run_chain(x0):
            x = x0
            s = None
            for _ in range(chain):
                g = adj_compiled(compiled(x, *app_args), *app_args)
                s = sum_c(g)
                x = x0 + g * 1e-30  # dependent input, stable magnitude
            return float(s)

        stage.set(f"{preset}: first execution")
        t0 = time.perf_counter()
        run_chain(maps)  # warm both programs
        compile_breakdown["warmup_run_s"] = round(time.perf_counter() - t0, 2)
        t_compile = sum(v for v in compile_breakdown.values()
                        if isinstance(v, (int, float)))
        stage.set(f"{preset}: timing ({reps} reps x {chain})")
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
        stage.set(f"{preset}: compile chain program")
        t0 = time.perf_counter()
        compiled = fwd_adj_chain.lower(*args).compile()
        t_compile = time.perf_counter() - t0
        stage.set(f"{preset}: first execution")
        float(compiled(*args))  # warm-up run
        stage.set(f"{preset}: timing ({reps} reps x {chain})")
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(compiled(*args))
            times.append(time.perf_counter() - t0)
    t_jax = float(np.median(times)) / chain

    vox = 2.0 * float(np.prod(model.cube_shape))
    gvox_s = vox / t_jax / 1e9

    bytes_per_app = None
    try:
        if mode == "dispatch":
            flops_per_app = (_xla_cost(compiled, "flops")
                             + _xla_cost(adj_compiled, "flops"))
            try:
                bytes_per_app = (_xla_cost(compiled, "bytes accessed")
                                 + _xla_cost(adj_compiled, "bytes accessed"))
            except Exception:
                bytes_per_app = None
        else:
            # XLA's cost model counts a while-loop body ONCE (trip count
            # opaque), so the chain program's flops ≈ one application.
            flops_per_app = _xla_cost(compiled, "flops")
    except Exception:
        flops_per_app = _analytic_flops(model)
    tflops = flops_per_app / t_jax / 1e12
    mfu = flops_per_app / t_jax / V5E_PEAK_FLOPS
    hbm_util = (bytes_per_app / t_jax / V5E_HBM_BW
                if bytes_per_app is not None else None)
    bytes_note = None
    if hbm_util is not None and hbm_util > 1.0:
        # the cost model re-charges shared table arguments per static-slice
        # use in the unrolled-pointing graphs, so "bytes accessed" exceeds
        # what the chip can move in the measured time — modeled, not
        # physical (PERF.md "Per-stage HBM roofline", round-4 notes)
        bytes_note = ("cost-model bytes exceed physical bandwidth "
                      "(unrolled graphs double-count shared table reads)")

    result = {
        "metric": f"fwd+adjoint cube-op throughput ({preset})",
        "value": round(gvox_s, 4),
        "unit": "GVox/s",
        "vs_baseline": None,
        "preset": preset,
        "t_app_s": round(t_jax, 6),
        "t_compile_s": round(t_compile, 2),
        "compile_breakdown": compile_breakdown or None,
        "flops_per_app": flops_per_app,
        "tflops": round(tflops, 3),
        # MFU vs the bf16 MXU peak: reported for completeness only — the
        # pipeline is gather/bandwidth-bound (PERF.md roofline), so matmul
        # peak is not the limiting resource and a low value is expected.
        "mfu_est": round(mfu, 4),
        "mfu_note": "gather/bandwidth-bound pipeline; MXU peak is not the "
                    "limiting resource",
        "bytes_per_app_modeled": bytes_per_app,
        "hbm_util_modeled": (round(hbm_util, 4)
                             if hbm_util is not None else None),
        **({"bytes_note": bytes_note} if bytes_note else {}),
        "cube_shape": list(model.cube_shape),
        "n_channels": len(model.channels),
        "n_pointings": len(model.pointings[0]),
    }

    _attach_baseline(result, preset, t_jax)
    if pre_write is not None:
        try:
            pre_write(result)
        except Exception as e:  # pragma: no cover — diagnostics only
            _log(f"pre_write failed (non-fatal): {e!r}")

    # Measured device-time grounding (VERDICT r4 item 2): a short profiler
    # trace of the same executables yields the DEVICE busy time per
    # application — a physically-true number the modeled bytes cannot
    # exceed-by-67% the way hbm_util_modeled can.  Flagship/dispatch only
    # (the loop-mode chain program cannot be traced per-application, and
    # tier measurements skip it to protect the budget), never on CPU, and
    # always AFTER pre_write banked the timing result.
    if (preset == "flagship" and mode == "dispatch"
            and not os.environ.get("SURFH_BENCH_CPU")
            and not os.environ.get("SURFH_BENCH_NO_TRACE")):
        try:
            stage.set(f"{preset}: device trace (1 app)")
            meas = _trace_device_ms(
                jax, lambda: run_chain(maps), chain)
            if meas:
                result.update(meas)
                result["dispatch_ms_per_app"] = round(
                    max(t_jax * 1e3 - meas["device_ms_per_app"], 0.0), 2)
                result["device_busy_frac"] = round(
                    min(meas["device_ms_per_app"] / (t_jax * 1e3), 1.0), 4)
        except Exception as e:  # pragma: no cover — diagnostics only
            _log(f"device trace failed (non-fatal): {e!r}")
    return result


def _trace_device_ms(jax, run_once, chain):
    """Profile `run_once` (chain applications) and return measured device
    stats: total device busy ms per application, and — when the platform
    exports them — hardware-counter bandwidth stats."""
    import glob
    import gzip

    tdir = tempfile.mkdtemp(prefix="surfh_bench_trace_")
    jax.profiler.start_trace(tdir)
    try:
        run_once()
    finally:
        # an exception mid-run must not leave the profiler session open —
        # the next start_trace would raise "already started"
        jax.profiler.stop_trace()
    traces = sorted(glob.glob(
        os.path.join(tdir, "plugins/profile/*/*.trace.json.gz")))
    if not traces:
        return None
    with gzip.open(traces[-1]) as fh:
        d = json.load(fh)
    ev = d.get("traceEvents", [])
    # the device process exports parallel MODULE and OP lanes that each
    # carry the full device time — sum the "XLA Ops" lane only
    tids = {(e["pid"], e["tid"]): e["args"].get("name", "")
            for e in ev
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    total_us = 0.0
    bw_bytes = 0.0
    for e in ev:
        if (e.get("ph") == "X"
                and tids.get((e["pid"], e["tid"])) == "XLA Ops"):
            total_us += float(e.get("dur", 0.0))
            a = e.get("args") or {}
            try:
                bw_bytes += float(a.get("bytes_accessed", 0.0))
            except (TypeError, ValueError):
                pass
    if total_us <= 0:
        return None
    out = {"device_ms_per_app": round(total_us / 1e3 / max(chain, 1), 2)}
    if bw_bytes > 0:
        # per-op traced bytes (the profiler's hardware-derived accounting;
        # 20.5 GB/app at the round-5 flagship default vs 68.3 GB from the
        # static cost model of the unrolled graphs) against the measured
        # device-busy time — a utilization that can actually be true
        out["bytes_per_app_traced"] = bw_bytes / max(chain, 1)
        out["hbm_util_measured"] = round(
            bw_bytes / (total_us / 1e6) / V5E_HBM_BW, 4)
    return out


def _inner():
    rf = os.environ.get("SURFH_BENCH_RESULT_FILE")
    if not rf:
        rf = os.path.join(tempfile.mkdtemp(prefix="surfh_bench_"), "result.json")
        os.environ["SURFH_BENCH_RESULT_FILE"] = rf
    inner_deadline = float(
        os.environ.get("SURFH_BENCH_INNER_DEADLINE") or (time.time() + 1e9))
    stage = _Stage(rf + ".hb")
    stage.set("import jax")

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

    preset = os.environ.get("SURFH_BENCH_PRESET", "flagship")
    wblur_impl = os.environ.get("SURFH_WBLUR_IMPL", "dense")
    on_cpu = bool(os.environ.get("SURFH_BENCH_CPU"))
    prime = None
    if not on_cpu:
        stage.set("prime thread launched")
        prime = _start_prime(jax, jnp)

    def build_synth(name):
        from surfh_tpu.simulation.synthetic import make_model

        kw = dict(dtype=jnp.float32, wblur_impl=wblur_impl, **PRESETS[name])
        if name == "large":
            # the shipped flagship configuration at mid scale: tables ride
            # as jit ARGUMENTS + PSF stamps + rank conv.  The plain closure
            # build embeds the 501²/600λ tables as HLO constants, and that
            # graph never finishes compiling through the tunnel (round-2
            # "Broken pipe", round-4 >670 s hang — VERDICT r3 item 5).
            kw.update(
                window_local=True, psf_stamps=True,
                conv_rank_rtol=float(
                    os.environ.get("SURFH_CONV_RANK_RTOL", "1e-7")),
            )
        return make_model(**kw)

    if preset != "flagship":
        stage.set(f"build {preset} model")
        model, setup = build_synth(preset)
        res = _measure(model, setup, preset, stage, jax, jnp)
        res["final"] = True
        if prime and "prime_s" in prime:
            res.setdefault("compile_breakdown", {})["prime_s"] = prime["prime_s"]
        _write_json(rf, res)
        stage.stop()
        return

    # ---- flagship: build host tables in a thread, bank a medium tier ----
    box = {}

    def build_flagship():
        t0 = time.perf_counter()
        try:
            from surfh_tpu.simulation.flagship import make_flagship_model

            model, setup = make_flagship_model(
                wblur_impl=wblur_impl,
                conv_impl=os.environ.get("SURFH_CONV_IMPL", "auto"),
            )
            model.host_tables()  # the ~160 s banded build / pickle load
            box["model"] = (model, setup)
            box["host_build_s"] = round(time.perf_counter() - t0, 1)
            _log(f"flagship host build done in {box['host_build_s']}s")
        except Exception as e:
            box["error"] = repr(e)
            _log(f"flagship host build FAILED: {e!r}")

    stage.set("flagship host build (thread) + medium tier")
    bt = threading.Thread(target=build_flagship, daemon=True)
    bt.start()

    tier = os.environ.get("SURFH_BENCH_TIER", "medium")
    if tier != "none":
        try:
            tmodel, tsetup = build_synth(tier)
            tres = _measure(tmodel, tsetup, tier, stage, jax, jnp)
            tres["final"] = False
            tres["fallback"] = (
                f"banked {tier}-tier result; flagship measurement did not "
                f"complete in budget"
            )
            _write_json(rf, tres)
            _log(f"banked {tier} tier: {tres['value']} GVox/s")
        except Exception as e:
            _log(f"{tier} tier failed (continuing to flagship): {e!r}")

    # Opportunistic tier upgrade (VERDICT r4 item 8): while the flagship
    # host build is still running and the slot can absorb it, bank the
    # `large` preset — the shipped flagship configuration at mid scale
    # (18.1 GVox/s round 4) is a far better worst-case record than the
    # medium tier (2.6) when a bad tunnel phase later eats the flagship
    # budget.  The per-process slow phase was already absorbed by the
    # medium tier's first execution, so this is ordinary device work.
    # Only under the orchestrator (a real inner deadline exists): in
    # NO_ORCH mode the deadline defaults to +1e9 s and the guard would be
    # vacuous — an in-process bench must not grow a surprise large-tier
    # measurement.  tier=="large" would measure the same preset twice.
    if (tier not in ("none", "large")
            and os.environ.get("SURFH_BENCH_INNER_DEADLINE")):
        left = inner_deadline - time.time()
        large_min = float(os.environ.get("SURFH_BENCH_LARGE_MIN_S", "300"))
        if bt.is_alive() and left > large_min:
            try:
                stage.set("opportunistic large-tier upgrade")
                lmodel, lsetup = build_synth("large")
                lres = _measure(lmodel, lsetup, "large", stage, jax, jnp)
                lres["final"] = False
                lres["fallback"] = (
                    "banked large-tier result; flagship measurement did "
                    "not complete in budget"
                )
                _write_json(rf, lres)
                _log(f"upgraded banked tier to large: {lres['value']} GVox/s")
            except Exception as e:
                _log(f"large-tier upgrade failed (medium tier stands): {e!r}")
        elif bt.is_alive():
            _log(f"skipping large-tier upgrade ({left:.0f}s left < "
                 f"{large_min:.0f}s)")

    stage.set("join flagship host build")
    bt.join()
    if "model" not in box:
        raise RuntimeError(f"flagship build failed: {box.get('error')}")
    model, setup = box["model"]

    left = inner_deadline - time.time()
    if left < 120:
        _log(f"only {left:.0f}s left — skipping flagship device phase "
             f"(banked tier stands)")
        stage.stop()
        return

    cb = {"host_build_s": box.get("host_build_s")}

    def bank_final(r):
        """Bank the finished flagship timing BEFORE the diagnostics trace:
        a tunnel hang inside the trace then costs only the trace fields,
        not the measurement (the stall watchdog would otherwise kill the
        inner process with the result unwritten)."""
        rr = dict(r)
        if prime is not None and "prime_s" in prime:
            rr.setdefault("compile_breakdown", {})["prime_s"] = prime["prime_s"]
        rr["final"] = True
        _write_json(rf, rr)

    res = _measure(model, setup, "flagship", stage, jax, jnp,
                   compile_breakdown=cb, pre_write=bank_final)
    if prime is not None and "prime_s" in prime:
        # how long the absorbed per-process phase took (overlapped; the
        # first execution was its completion barrier)
        res.setdefault("compile_breakdown", {})["prime_s"] = prime["prime_s"]
    res["final"] = True
    _write_json(rf, res)
    stage.set("done")
    stage.stop()


def main():
    if "--inner" in sys.argv[1:] or os.environ.get("SURFH_BENCH_NO_ORCH"):
        _inner()
    else:
        _orchestrate()


if __name__ == "__main__":
    main()
