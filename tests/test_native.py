"""Native (C++/OpenMP) kernel equivalence with the JAX path.

Builds the library on the fly if the toolchain is available; skips otherwise.
"""

import os
import subprocess

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
LIB = os.path.join(NATIVE_DIR, "libsurfh_native.so")


@pytest.fixture(scope="module")
def native_lib():
    if not os.path.exists(LIB):
        try:
            subprocess.run(["make", "-C", NATIVE_DIR], check=True, capture_output=True)
        except Exception:
            pytest.skip("native toolchain unavailable")
    if not os.path.exists(LIB):
        pytest.skip("native library not built")
    return LIB


def test_native_shepard_matches_jax(native_lib):
    from surfh_tpu.preprocessing.shepard import exponential_modified_shepard

    rng = np.random.default_rng(0)
    pa, pl = rng.uniform(0, 10, 300), rng.uniform(0, 5, 300)
    vals = (2 * pa + 3 * pl).astype(np.float32)
    am, lm = np.meshgrid(np.linspace(1, 9, 12), np.linspace(1, 4, 10))
    kw = dict(pixel_cutoff=3.0, alpha_res=0.5, lambda_res=0.5)
    a = exponential_modified_shepard(pa, pl, vals, am, lm, backend="jax", **kw)
    b = exponential_modified_shepard(pa, pl, vals, am, lm, backend="native", **kw)
    np.testing.assert_allclose(a, b, atol=1e-3)
