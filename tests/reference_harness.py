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
