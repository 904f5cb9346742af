"""The hand-optimized adjoint must equal the derived linear transpose."""

import jax.numpy as jnp
import numpy as np
import pytest

from surfh_tpu.core import bilinear
from surfh_tpu.simulation.synthetic import make_model


@pytest.fixture(scope="module")
def model_setup():
    return make_model(
        im_size=41, n_lambda=30, n_tpl=3, n_channels=2, n_pointings=2,
        n_slit=3, dtype=jnp.float64,
    )


def test_transpose_plan_matches_scatter():
    rng = np.random.default_rng(0)
    axis = np.linspace(0, 1, 9)
    pts = rng.uniform(0.05, 0.95, (40, 2))
    plan = bilinear.bilinear_plan(axis, axis, pts)
    tplan = bilinear.transpose_plan(plan)
    vals = rng.standard_normal((3, 40))
    a = np.asarray(bilinear.scatter_plan(jnp.asarray(plan.idx), jnp.asarray(plan.w), jnp.asarray(vals), plan.shape))
    b = np.asarray(bilinear.apply_transpose_plan(tplan, jnp.asarray(vals)))
    np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-14)


def test_channel_fast_adjoint_matches_derived(model_setup):
    model, _ = model_setup
    chan = model.channels[0]
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.standard_normal(chan.oshape))
    derived = np.asarray(chan.adjoint_windowed(y))
    fast = np.asarray(chan._adjoint_windowed_fast(y))
    np.testing.assert_allclose(fast, derived, rtol=1e-10, atol=1e-12)


def test_spectro_fast_adjoint_matches_derived(model_setup):
    model, _ = model_setup
    rng = np.random.default_rng(2)
    y = rng.standard_normal(model.oshape)
    np.testing.assert_allclose(
        np.asarray(model.adjoint(y)),
        np.asarray(model.adjoint_auto(y)),
        rtol=1e-10,
        atol=1e-12,
    )
