"""2-D (channel × λ) mesh sharding must match the unsharded model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surfh_tpu.parallel.mesh2d import ShardedSpectro2D, make_mesh_2d
from surfh_tpu.simulation.synthetic import make_model


@pytest.fixture(scope="module")
def setup2d():
    model, setup = make_model(
        im_size=31, n_lambda=24, n_tpl=3, n_channels=2, n_pointings=2,
        n_slit=3, dtype=jnp.float64,
    )
    n = len(jax.devices())
    mesh = make_mesh_2d(2, n // 2)
    return model, setup, ShardedSpectro2D(model, mesh)


def test_mesh2d_forward_matches(setup2d):
    model, setup, sh = setup2d
    y2d = np.asarray(sh.forward(setup["maps"]))
    y_ref = np.asarray(model.forward(setup["maps"]))
    flat = np.zeros_like(y_ref)
    for c in range(len(model.channels)):
        d, s = c % sh.n_c, c // sh.n_c
        npt = model._idx[c + 1] - model._idx[c]
        flat[model._idx[c] : model._idx[c + 1]] = y2d[d * sh.per_dev + s, :npt]
    np.testing.assert_allclose(flat, y_ref, rtol=1e-10, atol=1e-12)


def test_mesh2d_normal_matches(setup2d):
    model, setup, sh = setup2d
    n_ref = np.asarray(model.adjoint(model.forward(setup["maps"])))
    n_2d = np.asarray(sh.normal(setup["maps"]))
    np.testing.assert_allclose(n_2d, n_ref, rtol=1e-9, atol=1e-9)
