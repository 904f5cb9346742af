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


def test_csr_transpose_matches_dense():
    """Sorted-COO and padded-gather transpose forms are bit-identical,
    including heavy index collisions (the edge-clamping degeneracy that
    drives the dense form's C into the thousands)."""
    rng = np.random.default_rng(3)
    na, nb, P = 13, 17, 600
    # many collisions: indices concentrated on few pixels
    idx = (rng.integers(0, 25, (4, P)) * rng.integers(1, 3, (4, P))).astype(np.int32)
    w = rng.random((4, P))
    w[rng.random((4, P)) < 0.3] = 0.0
    plan = bilinear.BilinearPlan(idx=idx, w=w, shape=(na, nb))
    vals = rng.standard_normal((5, P))
    dense = bilinear.transpose_plan(plan)
    csr = bilinear.csr_transpose_plan(plan)
    a = np.asarray(bilinear.apply_transpose_plan(dense, jnp.asarray(vals)))
    b = np.asarray(bilinear.apply_transpose_plan(csr, jnp.asarray(vals)))
    np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-14)


def test_channel_csr_adjoint_matches_dense(monkeypatch):
    """A channel forced into the CSR transpose layout produces the same
    adjoint as the dense layout (and the same derived transpose)."""
    from surfh_tpu.models import channel as channel_mod

    monkeypatch.setattr(channel_mod, "TPLAN_DENSE_CMAX", 0)
    model_csr, setup = make_model(
        im_size=41, n_lambda=30, n_tpl=3, n_channels=1, n_pointings=2,
        n_slit=3, dtype=jnp.float64,
    )
    chan = model_csr.channels[0]
    assert chan._tplan_kind == "csr"
    rng = np.random.default_rng(4)
    y = jnp.asarray(rng.standard_normal(chan.oshape))
    derived = np.asarray(chan.adjoint_windowed(y))
    fast = np.asarray(chan._adjoint_windowed_fast(y))
    np.testing.assert_allclose(fast, derived, rtol=1e-10, atol=1e-12)
