"""Composed-transpose row-gather Pallas kernel: interpret-mode correctness.

Keeps the parked kernel alive in CI (VERDICT r3 item 9): the same code
path compiles to a Mosaic kernel on a non-tunneled TPU toolchain; here it
runs in interpreter mode on the CPU mesh against a NumPy oracle and
against `bilinear.apply_composed_plan_t` (the production COO transpose)
on a real composed plan from a synthetic channel.

The Mosaic compile path (SMEM layout, pl.ds addressing) is NOT covered
here — `scripts/scatter_pallas_flagship.py` is the on-TPU check; rerun it
after touching the kernel.
"""

import jax.numpy as jnp
import numpy as np

from surfh_tpu.core import bilinear
from surfh_tpu.core.scatter_pallas import (
    build_row_gather_plan,
    gather_rows_pallas,
    gather_rows_reference,
)
from surfh_tpu.simulation.synthetic import make_model


def _random_coo(rng, n_dst, n_src, n_taps):
    cdst = np.sort(rng.integers(0, n_dst, n_taps))
    csrc = rng.integers(0, n_src, n_taps)
    cw = rng.standard_normal(n_taps)
    cw[rng.random(n_taps) < 0.05] = 0.0  # exercise the zero-tap filter
    return csrc, cw, cdst


def test_gather_rows_matches_oracle_interpret():
    rng = np.random.default_rng(0)
    n_dst, n_src, W = 700, 300, 150
    csrc, cw, cdst = _random_coo(rng, n_dst, n_src, 2500)
    plan = build_row_gather_plan(csrc, cw, cdst, n_dst, n_src, W,
                                 tp=128, unroll=4)
    vals = rng.standard_normal((n_src, W)).astype(np.float32)
    ref = gather_rows_reference(vals, plan)
    out = np.asarray(gather_rows_pallas(jnp.asarray(vals), plan,
                                        interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-6, atol=2e-5)


def test_gather_rows_matches_coo_scatter_interpret():
    # the kernel computes the SAME linear map as the production sorted-COO
    # column scatter (bilinear.apply_composed_plan_t), up to tap-order
    # float reassociation
    rng = np.random.default_rng(1)
    n_dst, n_src, W = 512, 200, 100
    csrc, cw, cdst = _random_coo(rng, n_dst, n_src, 1800)
    vals = rng.standard_normal((W, n_src)).astype(np.float32)
    coo = np.asarray(
        bilinear.apply_composed_plan_t(
            jnp.asarray(csrc.astype(np.int32)),
            jnp.asarray(cw.astype(np.float32)),
            jnp.asarray(cdst.astype(np.int32)),
            jnp.asarray(vals),
            n_dst,
        )
    )  # [W, n_dst]
    plan = build_row_gather_plan(csrc, cw, cdst, n_dst, n_src, W,
                                 tp=256, unroll=2)
    out = np.asarray(gather_rows_pallas(jnp.asarray(vals.T), plan,
                                        interpret=True))  # [n_dst, W]
    np.testing.assert_allclose(out.T, coo, rtol=2e-5, atol=2e-5)


def test_gather_rows_on_real_composed_plan_interpret():
    # a real channel's composed-transpose stack, one pointing
    model, _ = make_model(im_size=41, n_lambda=24, n_tpl=3, n_channels=1,
                          n_pointings=1, n_slit=4)
    chan = model.channels[0]
    assert chan._composed_stack is not None
    idx, w, csrc, cw, cdst = (np.asarray(a[0]) for a in chan._composed_stack)
    ha, wb = chan._tbbox[2], chan._tbbox[3]
    P = ha * wb
    n_src = idx.shape[1]
    W = chan.wslice.stop - chan.wslice.start
    rng = np.random.default_rng(2)
    vals = rng.standard_normal((W, n_src)).astype(np.float32)
    coo = np.asarray(
        bilinear.apply_composed_plan_t(
            jnp.asarray(csrc), jnp.asarray(cw), jnp.asarray(cdst),
            jnp.asarray(vals), P,
        )
    )
    plan = build_row_gather_plan(csrc, cw, cdst, P, n_src, W)
    out = np.asarray(gather_rows_pallas(jnp.asarray(vals.T), plan,
                                        interpret=True))
    np.testing.assert_allclose(out.T, coo, rtol=2e-5, atol=2e-5)
