"""Profiling utilities and the fused-Hessian criterion option."""

import jax.numpy as jnp
import numpy as np

from surfh_tpu.utils.profiling import PhaseTimer, chained_time


def test_phase_timer():
    t = PhaseTimer()
    with t("a"):
        sum(range(1000))
    with t("a"):
        pass
    with t("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert "a" in t.summary()
    t.reset()
    assert not t.totals


def test_chained_time_measures():
    x = jnp.ones((64, 64), jnp.float32)
    dt = chained_time(lambda x: x * 2.0, x, chain=4, reps=2)
    assert 0 < dt < 1.0


def test_criterion_use_fwadj_matches():
    from surfh_tpu.models.mixing import Model_WCT
    from surfh_tpu.solvers.criterion import QuadCriterion_MRS
    from surfh_tpu.utils.psf import gaussian_psf

    rng = np.random.default_rng(0)
    n_spec, n_lamb, shape = 3, 10, (16, 16)
    wavel = np.linspace(7.5, 8.0, n_lamb)
    psfs = gaussian_psf(wavel, 0.5)
    c = (psfs.shape[1] - 9) // 2
    psfs = psfs[:, c : c + 9, c : c + 9]
    psfs /= psfs.sum(axis=(1, 2), keepdims=True)
    specs = rng.random((n_spec, n_lamb)) + 0.5
    model = Model_WCT(psfs, specs, shape, dtype=jnp.float64)
    maps = rng.random((n_spec,) + shape)
    y = np.asarray(model.forward(maps))

    crit_a = QuadCriterion_MRS(1.0, y, model, 1e-3)
    crit_b = QuadCriterion_MRS(1.0, y, model, 1e-3, use_fwadj=True)
    ra = crit_a.run_method("lcg", maximum_iterations=25)
    rb = crit_b.run_method("lcg", maximum_iterations=25)
    np.testing.assert_allclose(rb.x, ra.x, rtol=1e-6, atol=1e-8)
