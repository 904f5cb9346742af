"""λ-sharded channel must match the unsharded channel exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surfh_tpu.parallel.fusion import make_mesh
from surfh_tpu.parallel.lambda_sharded import LambdaShardedChannel
from surfh_tpu.simulation.synthetic import make_model


@pytest.fixture(scope="module")
def setup():
    model, setup = make_model(
        im_size=31, n_lambda=26, n_tpl=3, n_channels=1, n_pointings=2,
        n_slit=3, dtype=jnp.float64,
    )
    chan = model.channels[0]
    mesh = make_mesh(len(jax.devices()), axis_name="lam")
    sharded = LambdaShardedChannel(chan, n_lambda=26, mesh=mesh)
    return model, chan, sharded


def test_lambda_sharded_forward_matches(setup):
    model, chan, sh = setup
    rng = np.random.default_rng(0)
    cube = rng.standard_normal(model.cube_shape)
    y_ref = np.asarray(chan.forward(cube))
    y_sh = np.asarray(sh.forward(sh.shard_cube(cube)))
    np.testing.assert_allclose(y_sh, y_ref, rtol=1e-10, atol=1e-12)


def test_lambda_sharded_adjoint_matches(setup):
    model, chan, sh = setup
    rng = np.random.default_rng(1)
    y = rng.standard_normal(chan.oshape)
    a_ref = np.asarray(chan.adjoint(y))  # full cube
    a_sh = np.asarray(sh.adjoint(y))[: model.cube_shape[0]]
    np.testing.assert_allclose(a_sh, a_ref, rtol=1e-10, atol=1e-12)


def test_lambda_sharded_dot_product_pairing(setup):
    model, chan, sh = setup
    rng = np.random.default_rng(2)
    cube = rng.standard_normal(model.cube_shape)
    y = rng.standard_normal(chan.oshape)
    lhs = np.vdot(np.asarray(sh.forward(sh.shard_cube(cube))), y)
    rhs = np.vdot(cube, np.asarray(sh.adjoint(y))[: model.cube_shape[0]])
    assert abs(lhs - rhs) / abs(lhs) < 1e-10
