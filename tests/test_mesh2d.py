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


def test_mesh2d_dispatch_solve_matches_single_device(setup2d):
    """Production dispatch-mode CG over the 2-D (chan × λ) mesh: converges
    and matches the single-device dispatch solve of the identical
    criterion to 1e-8 relative (the mesh2d per-application parity is
    1e-9-class — λ-partial contractions re-associate — and CG amplifies
    that to the measured 1.8e-9 at convergence), with bit-exact state
    resume — the 2-D-mesh counterpart of
    test_parallel.py::test_sharded_dispatch_cg_matches_single_device."""
    from surfh_tpu.solvers import cg as cg_mod
    from surfh_tpu.solvers.criterion import dtd_separated

    model, setup, sh = setup2d
    y = np.asarray(model.forward(setup["maps"]))
    res_2d = sh.solve(y, mu_reg=1e4, max_iter=250, tol=1e-12, loop="dispatch")

    b = np.asarray(model.adjoint(y))

    def normal_op(x):
        return model.adjoint_fn(model.forward_fn(x)) + 1e4 * dtd_separated(x)

    res_1 = cg_mod.lcg(normal_op, b, jnp.zeros(model.ishape, model.dtype),
                       max_iter=250, tol=1e-12, loop="dispatch")
    assert res_2d.converged and res_1.converged
    scale = np.abs(res_1.x).max()
    np.testing.assert_allclose(res_2d.x, res_1.x, rtol=0, atol=1e-8 * scale)

    r7 = sh.solve(y, mu_reg=1e4, max_iter=7, tol=0.0, loop="dispatch",
                  return_state=True)
    r5 = sh.solve(y, mu_reg=1e4, max_iter=5, tol=0.0, loop="dispatch",
                  state=r7.state)
    r12 = sh.solve(y, mu_reg=1e4, max_iter=12, tol=0.0, loop="dispatch")
    np.testing.assert_array_equal(np.asarray(r5.x), np.asarray(r12.x))
