"""Command-line entry points.

Mirrors the reference CLI (`scripts/main_fusion.py:215-273`: fusion dir, npix,
hyperparameter µ, niter, n_templates, scale_data, method) and adds what the
reference hard-codes in scripts: a fully simulated end-to-end fusion, the
single-λ 2-D deconvolution, the closed-form expsol path, device-mesh
sharding, and checkpoint/resume.

Usage:
    python -m surfh_tpu.cli fusion --simulated -ni 50 -hp 5e3 -m lcg
    python -m surfh_tpu.cli deconv2d --niter 200
    python -m surfh_tpu.cli info
"""

from __future__ import annotations

import json
import logging
import os
import time

import click
import numpy as np

logger = logging.getLogger("surfh_tpu")


@click.group()
def cli():
    """surfh_tpu — TPU-native JWST MRS super-resolution and fusion.

    Set SURFH_CPU=1 to force the CPU backend (e.g. for local dry runs)."""
    if os.environ.get("SURFH_CPU"):
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")


@cli.command()
@click.option("--fusion-data", "-fd", type=click.Path(exists=True), default=None,
              help="Directory with templates.npy / wavel_axis.npy / psfs_*.npy and slice data (real-data mode).")
@click.option("--simulated", is_flag=True, help="Run a fully simulated fusion (no data files needed).")
@click.option("--npix", "-np", "npix", default=81, show_default=True, help="Spatial grid size.")
@click.option("--n-lambda", default=60, show_default=True, help="Cube λ samples (simulated mode).")
@click.option("--channels", "-nc", default=2, show_default=True, help="Number of bands (simulated mode).")
@click.option("--pointings", default=2, show_default=True, help="Dither pointings (simulated mode).")
@click.option("--hyper-parameter", "-hp", default=5e3, show_default=True, help="Regularization µ.")
@click.option("--niter", "-ni", default=50, show_default=True)
@click.option("--n-templates", "-nt", default=4, show_default=True)
@click.option("--scale-data", "-sd", is_flag=True, help="Apply Jy/SR → Jy flux normalization (real data).")
@click.option("--method", "-m", default="lcg", type=click.Choice(["lcg", "mmmg"]), show_default=True)
@click.option("--noise-snr", default=0.0, show_default=True, help="Add white noise at this SNR (dB) to simulated data.")
@click.option("--sharded", is_flag=True, help="Shard channels over the device mesh.")
@click.option("--checkpoint-every", default=0, show_default=True, help="Checkpoint the solver state every N iterations.")
@click.option("--output-dir", "-o", default="./surfh_results", show_default=True)
@click.option("--verbose", "-v", is_flag=True)
def fusion(fusion_data, simulated, npix, n_lambda, channels, pointings,
           hyper_parameter, niter, n_templates, scale_data, method,
           noise_snr, sharded, checkpoint_every, output_dir, verbose):
    """Multi-channel multi-observation LMM fusion (the flagship run)."""
    from .simulation.synthetic import make_model
    from .solvers.checkpoint import run_checkpointed
    from .solvers.criterion import QuadCriterion_MRS
    from .utils import metrics

    logging.basicConfig(level=logging.DEBUG if verbose else logging.INFO,
                        format="%(asctime)s %(name)s %(levelname)s %(message)s")
    os.makedirs(output_dir, exist_ok=True)

    if not simulated and fusion_data is None:
        raise click.UsageError("provide --fusion-data DIR or --simulated")
    if not simulated:
        from .pipeline import run_real_fusion

        bands = sorted(
            {f.split("_")[0].lower() for f in os.listdir(os.path.join(fusion_data, "Filtered_slices")) if f.endswith(".fits")}
        )
        logger.info("real-data fusion: bands %s", bands)
        res, model = run_real_fusion(
            fusion_data, bands, npix=npix, mu=hyper_parameter, niter=niter,
            method=method, scale_data=scale_data, output_dir=output_dir,
            checkpoint_every=checkpoint_every,
        )
        click.echo(json.dumps({"method": method, "niter": int(res.n_iter),
                               "final_grad_norm": float(res.grad_norm[-1])}))
        return

    logger.info("building simulated model: %d² grid, %dλ, %d bands, %d pointings",
                npix, n_lambda, channels, pointings)
    model, setup = make_model(
        im_size=npix, n_lambda=n_lambda, n_tpl=n_templates,
        n_channels=channels, n_pointings=pointings,
    )
    truth = np.asarray(setup["maps"], np.float32)
    t0 = time.perf_counter()
    y = np.asarray(model.forward(truth))
    if noise_snr > 0:
        rng = np.random.default_rng(0)
        sigma = np.sqrt(np.mean(y**2) / 10 ** (noise_snr / 10))
        y = y + rng.normal(0, sigma, y.shape).astype(y.dtype)
    logger.info("data synthesized in %.2fs (%d samples)", time.perf_counter() - t0, y.size)

    t0 = time.perf_counter()
    if sharded:
        from .parallel.fusion import ShardedSpectro, make_mesh

        sh = ShardedSpectro(model, make_mesh())
        res = sh.solve(y, mu_reg=hyper_parameter, max_iter=niter, method=method)
    else:
        crit = QuadCriterion_MRS(1.0, y, model, hyper_parameter, printing=verbose)
        res = run_checkpointed(
            crit, method=method, niter=niter,
            checkpoint_path=os.path.join(output_dir, "solver_state.npz"),
            checkpoint_every=checkpoint_every,
        )
    dt = time.perf_counter() - t0
    logger.info("%s: %d iterations in %.2fs (%.2f it/s)", method, res.n_iter, dt,
                res.n_iter / max(dt, 1e-9))

    res_cube = np.asarray(model.mapsToCube(res.x))
    np.save(os.path.join(output_dir, "res_x.npy"), res.x)
    np.save(os.path.join(output_dir, "res_cube.npy"), res_cube)
    np.save(os.path.join(output_dir, "criterion.npy"), res.grad_norm)

    report = {
        "method": method,
        "niter": int(res.n_iter),
        "seconds": dt,
        "iters_per_s": res.n_iter / max(dt, 1e-9),
        "psnr_maps": metrics.psnr(truth, res.x),
        "relative_error_pct": metrics.relative_error(truth, res.x),
    }
    click.echo(json.dumps(report))


@cli.command("deconv-cube")
@click.option("--npix", "-np", default=81, show_default=True)
@click.option("--n-lambda", "-nl", default=24, show_default=True,
              help="λ planes in the deconvolved stack.")
@click.option("--hyper-parameter", "-hp", default=5.0, show_default=True)
@click.option("--niter", "-ni", default=100, show_default=True)
@click.option("--pointings", default=2, show_default=True,
              help="Dither pointings (the reference run keeps [P1, P3]).")
@click.option("--rectangle/--rotated", default=True, show_default=True,
              help="Rectangle (no-rotation) or rotated-FOV gridding.")
@click.option("--output-dir", "-o", default="./surfh_results", show_default=True)
def deconv_cube(npix, n_lambda, hyper_parameter, niter, pointings, rectangle,
                output_dir):
    """λ-stack no-rotation cube deconvolution (BASELINE config 2, reference
    scripts/deconvolution_mrs_noRotation.py semantics: rectangle-gridded
    MRSBlurred per λ plane, quadratic criterion, lcg) — all planes batched
    into one vmapped program and solved in a single CG."""
    import jax.numpy as jnp

    from .core.fft import ir2fr
    from .models.blind2d import DeconvCube, MRSBlurred, MRSBlurredRectangle
    from .simulation.synthetic import make_setup
    from .solvers.criterion import QuadCriterion_MRS
    from .utils import metrics

    os.makedirs(output_dir, exist_ok=True)
    setup = make_setup(
        im_size=npix, n_lambda=n_lambda, n_channels=1, n_pointings=pointings
    )
    sotf_stack = np.stack(
        [ir2fr(p, setup["im_shape"]) for p in setup["spsf"][:n_lambda]]
    )
    cls = MRSBlurredRectangle if rectangle else MRSBlurred
    base = cls(
        sotf_stack[0],
        setup["alpha_axis"],
        setup["beta_axis"],
        setup["instrs"][0],
        setup["step_degree"],
        setup["pointings"][0],
    )
    model = DeconvCube(base, sotf_stack)

    rng = np.random.default_rng(1)
    yy, xx = np.mgrid[0:npix, 0:npix]
    img = np.zeros(setup["im_shape"], np.float32)
    for _ in range(6):
        cx, cy = rng.integers(10, npix - 10, 2)
        s = rng.uniform(2, 6)
        img += rng.uniform(0.5, 2) * np.exp(
            -((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s)
        )
    spectra = 0.5 + rng.random(n_lambda).cumsum() / n_lambda
    truth = spectra[:, None, None].astype(np.float32) * img
    y = np.asarray(model.forward(truth))

    t0 = time.perf_counter()
    crit = QuadCriterion_MRS(1.0, y, model, hyper_parameter, gradient="separated")
    res = crit.run_method("lcg", maximum_iterations=niter)
    dt = time.perf_counter() - t0

    np.save(os.path.join(output_dir, "deconv_cube_x.npy"), res.x)
    click.echo(json.dumps({
        "n_lambda": n_lambda,
        "niter": int(res.n_iter),
        "seconds": dt,
        "iters_per_s": res.n_iter / max(dt, 1e-9),
        "psnr": metrics.psnr(truth, res.x.reshape(model.ishape)),
    }))


@cli.command()
@click.option("--npix", "-np", default=81, show_default=True)
@click.option("--hyper-parameter", "-hp", default=500.0, show_default=True)
@click.option("--niter", "-ni", default=200, show_default=True)
@click.option("--rectangle/--rotated", default=True, show_default=True,
              help="Rectangle (no-rotation) or rotated-FOV PSF variant.")
@click.option("--output-dir", "-o", default="./surfh_results", show_default=True)
def deconv2d(npix, hyper_parameter, niter, rectangle, output_dir):
    """Single-wavelength 2-D MRS deconvolution (the minimum end-to-end slice,
    reference scripts/deconvolution_mrs_single_wavelength.py)."""
    from .core.fft import ir2fr
    from .models.blind2d import MRSBlurred, MRSBlurredRectangle
    from .simulation.synthetic import make_setup
    from .solvers.criterion import QuadCriterion_MRS_2D
    from .utils import metrics

    os.makedirs(output_dir, exist_ok=True)
    setup = make_setup(im_size=npix, n_lambda=8, n_channels=1, n_pointings=4)
    psf0 = setup["spsf"][0]
    sotf = ir2fr(psf0, setup["im_shape"])
    cls = MRSBlurredRectangle if rectangle else MRSBlurred
    model = cls(
        sotf,
        setup["alpha_axis"],
        setup["beta_axis"],
        setup["instrs"][0],
        setup["step_degree"],
        setup["pointings"][0],
    )
    rng = np.random.default_rng(1)
    truth = np.zeros(setup["im_shape"], np.float32)
    for _ in range(6):
        cx, cy = rng.integers(10, npix - 10, 2)
        s = rng.uniform(2, 6)
        yy, xx = np.mgrid[0:npix, 0:npix]
        truth += rng.uniform(0.5, 2) * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s))
    y = np.asarray(model.forward(truth))

    t0 = time.perf_counter()
    crit = QuadCriterion_MRS_2D(1.0, y, model, hyper_parameter)
    res = crit.run_method("lcg", maximum_iterations=niter)
    dt = time.perf_counter() - t0

    np.save(os.path.join(output_dir, "deconv2d_x.npy"), res.x)
    click.echo(json.dumps({
        "niter": int(res.n_iter),
        "seconds": dt,
        "psnr": metrics.psnr(truth, res.x),
    }))


@cli.command()
@click.option("--npix", "-np", default=61, show_default=True)
@click.option("--bands", "-b", default=None,
              help="Comma-separated band subset (default: all 12).")
@click.option("--pointings", default=4, show_default=True)
@click.option("--n-templates", "-nt", default=4, show_default=True)
@click.option("--hyper-parameter", "-hp", default=5e3, show_default=True)
@click.option("--niter", "-ni", default=50, show_default=True)
@click.option("--nmf-iter", default=300, show_default=True,
              help="On-device NMF multiplicative-update iterations.")
@click.option("--method", "-m", default="lcg",
              type=click.Choice(["lcg", "mmmg"]), show_default=True)
@click.option("--window-local", is_flag=True,
              help="Tables-as-arguments mode (flagship-scale compiles).")
@click.option("--lambda-subsample", default=1, show_default=True)
@click.option("--output-dir", "-o", default="./surfh_results", show_default=True)
def allband(npix, bands, pointings, n_templates, hyper_parameter, niter,
            nmf_iter, method, window_local, lambda_subsample, output_dir):
    """All-band fusion with on-device NMF templates (BASELINE config 5):
    simulate 12-band data, co-add a dirty hypercube, learn NMF templates on
    device, fuse all bands with them, report metrics + per-stage timings
    (reference chain: notebooks/nmf_orion_allband.ipynb →
    scripts/main_fusion.py:215-273)."""
    from .pipeline import run_allband_simulated

    report = run_allband_simulated(
        npix=npix,
        bands=bands.split(",") if bands else None,
        n_pointings=pointings,
        n_templates=n_templates,
        mu=hyper_parameter,
        niter=niter,
        method=method,
        nmf_iter=nmf_iter,
        output_dir=output_dir,
        window_local=window_local,
        lambda_subsample=lambda_subsample,
    )
    click.echo(json.dumps(report))


@cli.command()
def info():
    """Print device/backend information."""
    import jax

    click.echo(json.dumps({
        "jax": jax.__version__,
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
    }))


if __name__ == "__main__":
    cli()
