"""Mixing models, block-Fourier Hessian algebra, closed-form solver, Huber MM."""

import jax.numpy as jnp
import numpy as np
import pytest

from surfh_tpu.core import blockfourier as bf
from surfh_tpu.core.linop import dottest
from surfh_tpu.models.mixing import MixingST, Model_WCT
from surfh_tpu.solvers.expsol import QuadCriterion3
from surfh_tpu.solvers.huber import (
    diff_axis,
    diff_axis_t,
    lmm_reconstruction,
    mmmg_huber,
)
from surfh_tpu.utils.psf import gaussian_psf


@pytest.fixture(scope="module")
def wct():
    rng = np.random.default_rng(3)
    n_spec, n_lamb = 3, 12
    shape_target = (24, 20)
    wavel = np.linspace(7.5, 8.0, n_lamb)
    psfs = gaussian_psf(wavel, 0.5)
    ca = (psfs.shape[1] - 11) // 2
    psfs = psfs[:, ca : ca + 11, ca : ca + 11]
    psfs /= psfs.sum(axis=(1, 2), keepdims=True)
    specs = rng.random((n_spec, n_lamb)) + 0.5
    pce = rng.random(n_lamb) + 0.5
    model = Model_WCT(psfs, specs, shape_target, pce, di=2, dj=2, dtype=jnp.float64)
    maps = rng.random((n_spec,) + shape_target)
    return model, maps


def test_wct_dottest(wct):
    model, _ = wct
    assert dottest(model, rtol=1e-10)


def test_wct_fwadj_matches_adjoint_forward(wct):
    model, maps = wct
    direct = np.asarray(model.adjoint(model.forward(maps)))
    hess = np.asarray(model.fwadj(maps))
    np.testing.assert_allclose(hess, direct, rtol=1e-8, atol=1e-10)


def test_partition_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.random((3, 12, 8)) + 1j * rng.random((3, 12, 8))
    part = bf.partition(jnp.asarray(x), 3, 2)
    back = np.asarray(bf.unpartition(part, (12, 8), 3, 2))
    np.testing.assert_allclose(back, x)


def test_make_iHtH_inverts():
    rng = np.random.default_rng(1)
    S, D, h, w = 2, 4, 3, 3
    A = rng.random((S, S, D, D, h, w)) + 1j * rng.random((S, S, D, D, h, w))
    # make each per-frequency block well conditioned & hermitian
    M = A.transpose(4, 5, 0, 2, 1, 3).reshape(h * w, S * D, S * D)
    M = M @ M.conj().transpose(0, 2, 1) + 5 * np.eye(S * D)
    A = M.reshape(h, w, S, D, S, D).transpose(2, 4, 3, 5, 0, 1)
    iA = np.asarray(bf.make_iHtH(A))
    # block product must give identity per frequency
    prod = np.einsum("abijhw,bcjkhw->acikhw", A, iA)
    eye = np.zeros_like(prod)
    for s in range(S):
        for d in range(D):
            eye[s, s, d, d] = 1.0
    np.testing.assert_allclose(prod, eye, atol=1e-8)


def test_expsol_solves_normal_equations(wct):
    model, maps = wct
    y = np.asarray(model.forward(maps))
    mu = 1e-4
    crit = QuadCriterion3(y, model, mu, gradient="separated")
    x_hat = crit.run_expsol()
    # x̂ must satisfy (HᵗH + µ DᵗD) x̂ = Hᵗ y
    lhs = np.asarray(model.fwadj(x_hat))
    d_r = np.asarray(bf.idft2(bf.dft2(jnp.asarray(x_hat))))  # noop sanity
    # separated circular-difference prior normal operator
    from surfh_tpu.solvers.criterion import dtd_separated

    lhs = lhs + mu * np.asarray(dtd_separated(jnp.asarray(x_hat)))
    rhs = np.asarray(model.adjoint(y))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5, atol=1e-7)


def test_mixing_st_dottest_and_fwadj():
    rng = np.random.default_rng(5)
    n_tpl, n_lam, n = 3, 10, 12
    templates = rng.random((n_tpl, n_lam))
    sel = rng.random((n_lam, n, n)) > 0.7
    op = MixingST(
        templates,
        np.arange(n),
        np.arange(n),
        np.arange(n_lam),
        selection_arr=sel,
        dtype=jnp.float64,
    )
    assert dottest(op, rtol=1e-10)
    maps = rng.random((n_tpl, n, n))
    direct = np.asarray(op.adjoint(op.forward(maps)))
    np.testing.assert_allclose(np.asarray(op.fwadj(maps)), direct, rtol=1e-8)


def test_diff_axis_adjoint():
    rng = np.random.default_rng(2)
    x = rng.random((4, 6, 5))
    for ax in range(3):
        y = rng.random(tuple(s - (1 if i == ax else 0) for i, s in enumerate(x.shape)))
        lhs = np.vdot(np.asarray(diff_axis(jnp.asarray(x), ax)), y)
        rhs = np.vdot(x, np.asarray(diff_axis_t(jnp.asarray(y), ax, x.shape[ax])))
        assert abs(lhs - rhs) < 1e-10


def test_huber_mmmg_decreases_objective(wct):
    model, maps = wct
    y = np.asarray(model.forward(maps))
    res = lmm_reconstruction(y, model, spat_reg=1e-3, spat_th=0.1, max_iter=30)
    # gradient norms must go down substantially
    assert res.grad_norm[-1] < 0.05 * res.grad_norm[0]


def test_mmmg_huber_dispatch_matches_graph():
    """loop='dispatch' (the flagship-scale mode) runs the same iteration as
    the in-graph fori_loop build — identical iterates, f32 telemetry."""
    import jax.numpy as jnp

    from surfh_tpu.solvers.huber import mmmg_huber

    rng = np.random.default_rng(3)
    H = jnp.asarray(rng.standard_normal((40, 30)))
    y = rng.standard_normal(40)
    fwd = lambda x: H @ x
    adj = lambda r: H.T @ r
    priors = [(lambda x: x, lambda x: x, 0.3, 0.05)]
    a = mmmg_huber(fwd, adj, y, priors, jnp.zeros(30), max_iter=40)
    b = mmmg_huber(fwd, adj, y, priors, jnp.zeros(30), max_iter=40,
                   loop="dispatch")
    np.testing.assert_allclose(b.x, a.x, rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(b.grad_norm, a.grad_norm, rtol=1e-5)
