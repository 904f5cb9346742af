"""Optional harness to import reference modules for behavioural parity tests.

The reference checkout (if present at /root/reference) depends on packages not
installed here (udft, xarray, loguru, aljabr...).  We stub just enough of them
to import the pure-geometry modules and cross-check numerics.  All parity
tests must `pytest.importorskip`-style skip when the reference is absent.
"""

import os
import sys
import types

REFERENCE = os.environ.get("SURFH_REFERENCE", "/root/reference")


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE, "surfh"))


def load_reference_instru():
    """Import /root/reference/surfh/Models/instru.py with dependency stubs."""
    if not reference_available():
        return None
    import numpy as np

    class _Logger:
        def __getattr__(self, name):
            return lambda *a, **k: None

    _stub("loguru", logger=_Logger())
    _stub("xarray")

    import surfh_tpu.core.fft as _fft

    _stub("udft", ir2fr=_fft.ir2fr, laplacian=_fft.laplacian)

    # instru imports "scipy.interpolate" and numpy only beyond the stubs.
    # Python ≥3.11 rejects the reference's mutable dataclass default
    # (`origin: Coord = Coord(0, 0)`), so patch that one construct on load.
    path = os.path.join(REFERENCE, "surfh", "Models", "instru.py")
    with open(path) as fh:
        src = fh.read()
    src = "import dataclasses as _dc\n" + src.replace(
        "origin: Coord = Coord(0, 0)",
        "origin: Coord = _dc.field(default_factory=lambda: Coord(0, 0))",
    )
    mod = types.ModuleType("ref_instru")
    mod.__file__ = path
    sys.modules["ref_instru"] = mod
    exec(compile(src, path, "exec"), mod.__dict__)
    return mod


def load_reference_channel(ref_instru):
    """Import the reference Channel (spectroModelChannel.py) with stubs for
    its compiled/absent dependencies, for output-parity tests.

    Stubs: `udft` → our fft helpers; `cython_utils` → scipy bilinear
    interpolation with the same clamped-extrapolation / zero-fill semantics;
    `slicer_new` (absent from the snapshot) → the in-tree reference slicer;
    `aljabr`, `astropy` → minimal shims.
    """
    if ref_instru is None:
        return None
    import importlib.util

    import numpy as np
    from scipy.interpolate import RegularGridInterpolator

    import surfh_tpu.core.fft as _fft

    _stub("udft", ir2fr=_fft.ir2fr, laplacian=_fft.laplacian)

    # astropy shim (only Angle(x, arcsec).degree is ever used)
    class _Angle:
        def __init__(self, value, unit=None):
            self.value = value

        @property
        def degree(self):
            return self.value / 3600.0

    units = _stub("astropy.units", arcsec="arcsec", deg="deg")
    coords = _stub("astropy.coordinates", Angle=_Angle)
    astropy = _stub("astropy", units=units, coordinates=coords)

    class _LinOp:
        def __init__(self, *args, ishape=None, oshape=None, **kwargs):
            if ishape is None and len(args) >= 1:
                ishape = args[0]
            if oshape is None and len(args) >= 2:
                oshape = args[1]
            self.ishape = tuple(ishape) if ishape is not None else None
            self.oshape = tuple(oshape) if oshape is not None else None

    _stub("aljabr", LinOp=_LinOp, dottest=lambda *a, **k: True)
    _stub("aljabr.linop", Shape=tuple)

    # scipy twins of the compiled interpolation entry points
    def interpn_cube2local(wavel_index, alpha_axis, beta_axis, cube, coords, shape):
        rgi = RegularGridInterpolator(
            (alpha_axis, beta_axis),
            np.transpose(cube, (1, 2, 0)),
            method="linear",
            bounds_error=False,
            fill_value=None,  # clamped linear extrapolation
        )
        return rgi(coords).T.reshape(shape)

    def interpn_local2cube(wavel_index, la, lb, cube, coords, shape):
        rgi = RegularGridInterpolator(
            (la, lb),
            np.transpose(cube, (1, 2, 0)),
            method="linear",
            bounds_error=False,
            fill_value=0.0,
        )
        return rgi(coords).T.reshape(shape)

    surfh_pkg = _stub("surfh")
    models_pkg = _stub("surfh.Models", instru=ref_instru)
    surfh_pkg.Models = models_pkg
    sys.modules["surfh.Models.instru"] = ref_instru

    ref_slicer = load_reference_slicer(ref_instru)
    sys.modules["surfh.Models.slicer_new"] = ref_slicer
    models_pkg.slicer_new = ref_slicer

    tools = _stub("surfh.ToolsDir")
    surfh_pkg.ToolsDir = tools
    cy = _stub(
        "surfh.ToolsDir.cython_utils",
        interpn_cube2local=interpn_cube2local,
        interpn_local2cube=interpn_local2cube,
    )
    tools.cython_utils = cy
    for name in ("jax_utils", "python_utils", "utils", "nearest_neighbor_interpolation"):
        path = os.path.join(REFERENCE, "surfh", "ToolsDir", f"{name}.py")
        spec = importlib.util.spec_from_file_location(f"surfh.ToolsDir.{name}", path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"surfh.ToolsDir.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(tools, name, mod)

    path = os.path.join(REFERENCE, "surfh", "Models", "spectroModelChannel.py")
    spec = importlib.util.spec_from_file_location("ref_channel", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def load_reference_spectro(ref_instru):
    """Import the reference flagship `spectroModel.py` with stubs: the
    missing `MCMO_SigRLSCT_Channel_Model` is its in-tree twin
    `spectroModelChannel` (verified signature-identical, SURVEY.md), and the
    unused-on-path numba `matrix_op` is an empty module."""
    ref_channel = load_reference_channel(ref_instru)
    if ref_channel is None:
        return None
    import importlib.util

    tools = sys.modules["surfh.ToolsDir"]
    tools.matrix_op = _stub("surfh.ToolsDir.matrix_op")
    dt = _stub("surfh.DottestModels", MCMO_SigRLSCT_Channel_Model=ref_channel)
    sys.modules["surfh.DottestModels.MCMO_SigRLSCT_Channel_Model"] = ref_channel
    sys.modules["surfh"].DottestModels = dt

    path = os.path.join(REFERENCE, "surfh", "Models", "spectroModel.py")
    spec = importlib.util.spec_from_file_location("ref_spectro", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def load_reference_blind(ref_instru):
    """Import the reference 2-D blind models (spectro_blind.py) — same stub
    set as the flagship."""
    if load_reference_spectro(ref_instru) is None:
        return None
    import importlib.util

    path = os.path.join(REFERENCE, "surfh", "Models", "spectro_blind.py")
    spec = importlib.util.spec_from_file_location("ref_blind", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def reference_npdiff_r(x):
    """NpDiff_r.forward, line-for-line semantics (fusion_CT.py:23-25)."""
    import numpy as np

    return -np.diff(np.pad(x, ((0, 0), (1, 0), (0, 0)), "wrap"), axis=1)


def reference_npdiff_r_t(y):
    import numpy as np

    return np.diff(np.pad(y, ((0, 0), (0, 1), (0, 0)), "wrap"), axis=1)


def reference_npdiff_c(x):
    """NpDiff_c.forward (fusion_CT.py:38-40)."""
    import numpy as np

    return -np.diff(np.pad(x, ((0, 0), (0, 0), (1, 0)), "wrap"), axis=2)


def reference_npdiff_c_t(y):
    import numpy as np

    return np.diff(np.pad(y, ((0, 0), (0, 0), (0, 1)), "wrap"), axis=2)


def reference_crit_val(model, x_hat, y, mu_spectro, mu_reg):
    """QuadCriterion_MRS.get_crit_val, separated gradient
    (fusion_CT.py:242-265): J = (µ_s‖Hx−y‖² + µ_r(‖D_r x‖²+‖D_c x‖²)) / 2."""
    import numpy as np

    data_term = mu_spectro * np.sum(
        (np.asarray(y).ravel() - np.asarray(model.forward(x_hat)).ravel()) ** 2
    )
    regul_term = mu_reg * np.sum(
        reference_npdiff_r(x_hat) ** 2 + reference_npdiff_c(x_hat) ** 2
    )
    return (data_term + regul_term) / 2


def reference_lcg_solve(
    model, y, mu_spectro, mu_reg, niter, value_init=0.5, tol=1e-12
):
    """Stand-in for the reference solve path `QuadCriterion_MRS.run_method(
    'lcg', ...)` (fusion_CT.py:118-238) with qmm absent from this image.

    qmm's `QuadObjective(fwd, adj, data=y, hyper=µ)` represents
    J_k(x) = µ/2·‖H_k x − y_k‖² with gradient µ·H_kᵗ(H_k x − y_k)
    (the reference's own convention comment, fusion_CT.py:263-264), and
    `qmm.lcg(list_obj, init)` is linear conjugate gradient on the summed
    quadratic — i.e. on the normal equations
        (µ_s HᵗH + µ_r (D_rᵗD_r + D_cᵗD_c)) x = µ_s Hᵗ y
    with the separated circular-difference priors D_r/D_c
    (fusion_CT.py:151-162).  This textbook CG in float64 NumPy converges to
    the same unique minimizer, which is the quantity under test.
    """
    import numpy as np

    shape = tuple(model.ishape)
    y = np.asarray(y, np.float64).ravel()

    def adj(v):
        return np.asarray(model.adjoint(v), np.float64).reshape(shape)

    def fwd(x):
        return np.asarray(model.forward(x), np.float64).ravel()

    def normal(x):
        reg = reference_npdiff_r_t(reference_npdiff_r(x)) + reference_npdiff_c_t(
            reference_npdiff_c(x)
        )
        return mu_spectro * adj(fwd(x)) + mu_reg * reg

    if np.isscalar(value_init):
        x = np.full(shape, float(value_init))
    else:
        x = np.array(value_init, np.float64).reshape(shape)
    b = mu_spectro * adj(y)
    r = b - normal(x)
    p = r.copy()
    rs = float(np.vdot(r, r).real)
    for _ in range(niter):
        ap = normal(p)
        alpha = rs / float(np.vdot(p, ap).real)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = float(np.vdot(r, r).real)
        if np.sqrt(rs_new) < tol:
            break
        p = r + (rs_new / rs) * p
        rs = rs_new
    return x


def load_reference_slicer(ref_instru):
    """Import the reference Slicer against the stubbed instru module."""
    if ref_instru is None:
        return None
    import importlib.util

    # slicer.py does "from surfh.Models import instru" and imports ToolsDir
    # helpers it never uses at construction time; provide module aliases.
    surfh_pkg = _stub("surfh")
    models_pkg = _stub("surfh.Models", instru=ref_instru)
    surfh_pkg.Models = models_pkg
    tools_pkg = _stub(
        "surfh.ToolsDir",
        cython_2D_interpolation=_stub("surfh.ToolsDir.cython_2D_interpolation"),
        matrix_op=_stub("surfh.ToolsDir.matrix_op"),
        jax_utils=_stub("surfh.ToolsDir.jax_utils"),
    )
    surfh_pkg.ToolsDir = tools_pkg
    sys.modules["surfh.Models.instru"] = ref_instru

    path = os.path.join(REFERENCE, "surfh", "Models", "slicer.py")
    spec = importlib.util.spec_from_file_location("ref_slicer", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
