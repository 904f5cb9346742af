"""Dot tests for the full single-stage operator ladder.

Port of the reference suite /root/reference/test/test_fw_ad.py — every
operator variant must satisfy ⟨Hx, y⟩ = ⟨x, Hᵗy⟩.  Unlike the reference
(which only *prints* the result for the deepest models, test_fw_ad.py:608,
754, 928, 1022), every test here asserts.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from surfh_tpu.core.linop import dottest
from surfh_tpu.models import family
from surfh_tpu.simulation.synthetic import make_setup

RTOL = 1e-10  # float64 on CPU: transposes are exact to rounding


@pytest.fixture(scope="module")
def fx():
    return make_setup(im_size=41, n_lambda=30, n_tpl=3, n_channels=2, n_pointings=2, n_slit=3)


def _ifu(fx):
    return fx["instrs"][0]


def test_T_dottest(fx):
    op = family.SpectroT(fx["maps"], fx["templates"], fx["wavelength_axis"], dtype=jnp.float64)
    assert dottest(op, rtol=RTOL)


def test_C_dottest(fx):
    op = family.SpectroC(
        fx["sotf"], fx["maps"], fx["templates"], fx["wavelength_axis"], dtype=jnp.float64
    )
    assert dottest(op, rtol=RTOL)


def test_CT_dottest(fx):
    op = family.SpectroCT(
        fx["sotf"],
        fx["templates"],
        fx["alpha_axis"],
        fx["beta_axis"],
        fx["wavelength_axis"],
        dtype=jnp.float64,
    )
    assert dottest(op, rtol=RTOL)


def test_ST_dottest(fx):
    op = family.SpectroST(
        fx["sotf"],
        fx["templates"],
        fx["alpha_axis"],
        fx["beta_axis"],
        fx["wavelength_axis"],
        _ifu(fx),
        fx["step_degree"],
        dtype=jnp.float64,
    )
    assert dottest(op, rtol=RTOL)


def test_ST_NN_dottest(fx):
    op = family.SpectroSnearestT(
        fx["sotf"],
        fx["templates"],
        fx["alpha_axis"],
        fx["beta_axis"],
        fx["wavelength_axis"],
        _ifu(fx),
        fx["step_degree"],
        dtype=jnp.float64,
    )
    assert dottest(op, rtol=RTOL)


def test_LT_dottest(fx):
    op = family.SpectroLT(
        fx["sotf"],
        fx["templates"],
        fx["alpha_axis"],
        fx["beta_axis"],
        fx["wavelength_axis"],
        _ifu(fx),
        fx["step_degree"],
        dtype=jnp.float64,
    )
    assert dottest(op, rtol=RTOL)


def test_R_dottest(fx):
    op = family.SpectroR(
        fx["sotf"],
        fx["templates"],
        fx["alpha_axis"],
        fx["beta_axis"],
        fx["wavelength_axis"],
        _ifu(fx),
        fx["step_degree"],
        dtype=jnp.float64,
    )
    assert dottest(op, rtol=RTOL)
    cube = op.mapsToCube(fx["maps"])
    assert cube.shape == op.ishape


def test_RL_dottest(fx):
    op = family.SpectroRL(
        fx["sotf"],
        fx["templates"],
        fx["alpha_axis"],
        fx["beta_axis"],
        fx["wavelength_axis"],
        _ifu(fx),
        fx["step_degree"],
        dtype=jnp.float64,
    )
    assert dottest(op, rtol=RTOL)


def test_RLT_dottest(fx):
    op = family.SpectroRLT(
        fx["sotf"],
        fx["templates"],
        fx["alpha_axis"],
        fx["beta_axis"],
        fx["wavelength_axis"],
        _ifu(fx),
        fx["step_degree"],
        dtype=jnp.float64,
    )
    assert dottest(op, rtol=RTOL)


def test_SigRLT_dottest(fx):
    op = family.SpectroSigRLT(
        fx["sotf"],
        fx["templates"],
        fx["alpha_axis"],
        fx["beta_axis"],
        fx["wavelength_axis"],
        _ifu(fx),
        fx["step_degree"],
        dtype=jnp.float64,
    )
    assert dottest(op, rtol=RTOL)


def test_SigRLCT_dottest(fx):
    op = family.SpectroSigRLCT(
        fx["sotf"],
        fx["templates"],
        fx["alpha_axis"],
        fx["beta_axis"],
        fx["wavelength_axis"],
        _ifu(fx),
        fx["step_degree"],
        dtype=jnp.float64,
    )
    assert dottest(op, rtol=RTOL)


def test_SigRLSCT_dottest(fx):
    op = family.SpectroSigRLSCT1C(
        fx["sotf"],
        fx["templates"],
        fx["alpha_axis"],
        fx["beta_axis"],
        fx["wavelength_axis"],
        _ifu(fx),
        fx["step_degree"],
        dtype=jnp.float64,
    )
    assert dottest(op, rtol=RTOL)


def test_SigRLSCT_NN_dottest(fx):
    op = family.SpectroSigRLSCT1C_NN(
        fx["sotf"],
        fx["templates"],
        fx["alpha_axis"],
        fx["beta_axis"],
        fx["wavelength_axis"],
        _ifu(fx),
        fx["step_degree"],
        dtype=jnp.float64,
    )
    assert dottest(op, rtol=RTOL)


def test_MO_SigRLSCT_dottest(fx):
    op = family.MO_SigRLSCT(
        fx["sotf"],
        fx["templates"],
        fx["alpha_axis"],
        fx["beta_axis"],
        fx["wavelength_axis"],
        _ifu(fx),
        fx["step_degree"],
        fx["pointings"][0],
        dtype=jnp.float64,
    )
    assert dottest(op, rtol=RTOL)


def test_MO_SigRLSCT_shiftConv_dottest(fx):
    op = family.MO_SigRLSCT_shiftConv(
        fx["sotf"],
        fx["templates"],
        fx["alpha_axis"],
        fx["beta_axis"],
        fx["wavelength_axis"],
        _ifu(fx),
        fx["step_degree"],
        fx["pointings"][0],
        dtype=jnp.float64,
    )
    assert dottest(op, rtol=RTOL)


def test_MCMO_SigRLSCT_dottest(fx):
    op = family.MCMO_SigRLSCT(
        fx["sotf"],
        fx["templates"],
        fx["alpha_axis"],
        fx["beta_axis"],
        fx["wavelength_axis"],
        fx["instrs"],
        fx["step_degree"],
        fx["pointings"],
        dtype=jnp.float64,
    )
    assert dottest(op, rtol=RTOL)


def test_MCMO_SigRLSCT_NN_dottest(fx):
    op = family.MCMO_SigRLSCT_NN(
        fx["sotf"],
        fx["templates"],
        fx["alpha_axis"],
        fx["beta_axis"],
        fx["wavelength_axis"],
        fx["instrs"],
        fx["step_degree"],
        fx["pointings"],
        dtype=jnp.float64,
    )
    assert dottest(op, rtol=RTOL)


def test_SCT_dottest(fx):
    op = family.SpectroSCT(
        fx["sotf"],
        fx["templates"],
        fx["alpha_axis"],
        fx["beta_axis"],
        fx["wavelength_axis"],
        _ifu(fx),
        fx["step_degree"],
        dtype=jnp.float64,
    )
    assert dottest(op, rtol=RTOL)


def test_SCT_matches_staged_composition(fx):
    """SCT forward == S applied to the (already-tested) CT model's output.

    S is extracted from SpectroST by passing identity templates, so the
    staging uses the family's own pinned pieces
    (matches /root/reference/scripts/fusion/fusion_SCT_simulated.py:37)."""
    n_lam = len(fx["wavelength_axis"])
    sct = family.SpectroSCT(
        fx["sotf"], fx["templates"], fx["alpha_axis"], fx["beta_axis"],
        fx["wavelength_axis"], _ifu(fx), fx["step_degree"], dtype=jnp.float64,
    )
    ct = family.SpectroCT(
        fx["sotf"], fx["templates"], fx["alpha_axis"], fx["beta_axis"],
        fx["wavelength_axis"], dtype=jnp.float64,
    )
    s_only = family.SpectroST(
        fx["sotf"], np.eye(n_lam), fx["alpha_axis"], fx["beta_axis"],
        fx["wavelength_axis"], _ifu(fx), fx["step_degree"], dtype=jnp.float64,
    )
    staged = np.asarray(s_only.forward(ct.forward(fx["maps"])))
    np.testing.assert_allclose(
        np.asarray(sct.forward(fx["maps"])), staged, rtol=1e-10, atol=1e-12
    )
    cube = sct.mapsToCube(fx["maps"])
    assert cube.shape == (n_lam,) + tuple(fx["maps"].shape[1:])


def test_LST_dottest(fx):
    op = family.SpectroLST(
        fx["sotf"],
        fx["templates"],
        fx["alpha_axis"],
        fx["beta_axis"],
        fx["wavelength_axis"],
        _ifu(fx),
        fx["step_degree"],
        dtype=jnp.float64,
    )
    assert dottest(op, rtol=RTOL)


def test_LST_matches_staged_composition(fx):
    """LST forward == L∘S applied to the mixed cube (identity-template LT
    staging; matches fusion_LST_simulated.py:37)."""
    from surfh_tpu.core import lmm

    n_lam = len(fx["wavelength_axis"])
    lst = family.SpectroLST(
        fx["sotf"], fx["templates"], fx["alpha_axis"], fx["beta_axis"],
        fx["wavelength_axis"], _ifu(fx), fx["step_degree"], dtype=jnp.float64,
    )
    ls_only = family.SpectroLT(
        fx["sotf"], np.eye(n_lam), fx["alpha_axis"], fx["beta_axis"],
        fx["wavelength_axis"], _ifu(fx), fx["step_degree"], dtype=jnp.float64,
    )
    cube = lmm.lmm_maps2cube(
        jnp.asarray(fx["maps"], jnp.float64), np.asarray(fx["templates"], np.float64)
    )
    staged = np.asarray(ls_only.forward(cube))
    np.testing.assert_allclose(
        np.asarray(lst.forward(fx["maps"])), staged, rtol=1e-10, atol=1e-12
    )


def test_MO_ST_dottest(fx):
    op = family.SpectroMO_ST(
        fx["sotf"],
        fx["templates"],
        fx["alpha_axis"],
        fx["beta_axis"],
        fx["wavelength_axis"],
        _ifu(fx),
        fx["step_degree"],
        fx["pointings"][0],
        dtype=jnp.float64,
    )
    assert dottest(op, rtol=RTOL)
    assert op.oshape[0] == len(fx["pointings"][0])


def test_MO_ST_origin_pointing_matches_ST(fx):
    """MO_ST with the zero dither equals the single-pointing ST model
    (matches fusion_MO_ST_simulated.py:44 built on ST semantics)."""
    from surfh_tpu.instrument.geometry import Coord, CoordList

    mo = family.SpectroMO_ST(
        fx["sotf"], fx["templates"], fx["alpha_axis"], fx["beta_axis"],
        fx["wavelength_axis"], _ifu(fx), fx["step_degree"],
        CoordList([Coord(0.0, 0.0)]), dtype=jnp.float64,
    )
    st = family.SpectroST(
        fx["sotf"], fx["templates"], fx["alpha_axis"], fx["beta_axis"],
        fx["wavelength_axis"], _ifu(fx), fx["step_degree"], dtype=jnp.float64,
    )
    np.testing.assert_allclose(
        np.asarray(mo.forward(fx["maps"]))[0],
        np.asarray(st.forward(fx["maps"])),
        rtol=1e-10, atol=1e-12,
    )


def test_SCT_solve_demo(fx):
    """The reference's SCT fusion demo flow (fusion_SCT_simulated.py:58-69):
    simulate y = SCT(maps), run lcg on the quadratic criterion, recover maps."""
    from surfh_tpu.solvers.criterion import QuadCriterion_MRS

    op = family.SpectroSCT(
        fx["sotf"], fx["templates"], fx["alpha_axis"], fx["beta_axis"],
        fx["wavelength_axis"], _ifu(fx), fx["step_degree"], dtype=jnp.float64,
    )
    y = op.forward(fx["maps"])
    crit = QuadCriterion_MRS(1.0, np.asarray(y), op, mu_reg=1e-4)
    res = crit.run_method("lcg", 60, value_init=0.0)
    x = np.asarray(res.x)
    err0 = float(np.linalg.norm(np.asarray(y)))
    resid = float(np.linalg.norm(np.asarray(op.forward(x)) - np.asarray(y)))
    assert resid < 0.05 * err0  # data residual collapses
    assert x.shape == op.ishape


def test_shiftConv_matches_gridding_at_origin(fx):
    """shift-conv with zero dither must equal the regridding MO model."""
    from surfh_tpu.instrument.geometry import Coord, CoordList

    pts = CoordList([Coord(0.0, 0.0)])
    kw = dict(dtype=jnp.float64)
    a = family.MO_SigRLSCT(
        fx["sotf"], fx["templates"], fx["alpha_axis"], fx["beta_axis"],
        fx["wavelength_axis"], _ifu(fx), fx["step_degree"], pts, **kw
    )
    b = family.MO_SigRLSCT_shiftConv(
        fx["sotf"], fx["templates"], fx["alpha_axis"], fx["beta_axis"],
        fx["wavelength_axis"], _ifu(fx), fx["step_degree"], pts, **kw
    )
    ya = np.asarray(a.forward(fx["maps"]))
    yb = np.asarray(b.forward(fx["maps"]))
    np.testing.assert_allclose(ya, yb, rtol=1e-8, atol=1e-10)


def test_reference_name_aliases():
    """Migrated reference code can keep its constructor names: every
    `<X>_Model.spectro<X>` name from the reference dottest suite
    (test_fw_ad.py) resolves in the flat family namespace."""
    from surfh_tpu.models import family

    pairs = [
        ("spectroT", family.SpectroT),
        ("spectroC", family.SpectroC),
        ("spectroCT", family.SpectroCT),
        ("spectroST", family.SpectroST),
        ("spectroSnearestT", family.SpectroSnearestT),
        ("spectroSCT", family.SpectroSCT),
        ("spectroLT", family.SpectroLT),
        ("spectroLST", family.SpectroLST),
        ("spectroMO_ST", family.SpectroMO_ST),
        ("spectroR", family.SpectroR),
        ("spectroRL", family.SpectroRL),
        ("spectroRLT", family.SpectroRLT),
        ("spectroSigRLT", family.SpectroSigRLT),
        ("spectroSigRLCT", family.SpectroSigRLCT),
        ("spectroSigRLSCT_1C", family.SpectroSigRLSCT1C),
        ("spectroSigRLSCT_1C_NN", family.SpectroSigRLSCT1C_NN),
        ("spectroSigRLSCT_MO", family.MO_SigRLSCT),
        ("spectroSigRLSCT_corrected", family.MO_SigRLSCT_shiftConv),
        ("spectroSigRLSCT_MCMO", family.MCMO_SigRLSCT),
        ("spectroSigRLSCT_MCMO_NN", family.MCMO_SigRLSCT_NN),
    ]
    for name, target in pairs:
        assert getattr(family, name) is target, name
