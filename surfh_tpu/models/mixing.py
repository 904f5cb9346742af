"""Mixing-model operators: λ-dependent PSF convolution + LMM + decimation
(`Model_WCT`) and the masked LMM (`MixingST`).

Behavioural reference: /root/reference/surfh/Models/mixing.py:131-337.  The
`Model_WCT` precomputes the full block-Fourier Hessian so that HᵗH (and its
regularized inverse — see `solvers.expsol`) are closed-form per-frequency
block products.  `MixingST` replaces the reference's Cython sparse-selection
kernels (`c_fast_forward_TST` etc., cythons_files.pyx:377-486) with dense
masked einsums — the mask lives in HBM and XLA fuses it into the contraction.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import blockfourier as bf
from ..core.precision import gemm_precision
from ..core.fft import ir2fr
from ..core.linop import LinOp


class Model_WCT(LinOp):
    """maps [S, H, W] → decimated weighted-convolution cube [L, H/di, W/dj].

    forward: cube[λ] = decimate( psf[λ]·pce[λ] ⊛ Σ_s spec[s,λ]·maps[s] ).
    Reference: mixing.Model_WCT (mixing.py:131-272); the reference hardcodes
    di = dj = 1 but its algebra supports free decimation — kept general here.
    """

    def __init__(
        self,
        psfs_monoch: np.ndarray,
        L_specs: np.ndarray,
        shape_target: Tuple[int, int],
        L_pce: Optional[np.ndarray] = None,
        di: int = 1,
        dj: int = 1,
        dtype=jnp.float32,
    ):
        psfs_monoch = np.asarray(psfs_monoch, np.float64)
        L_specs = np.asarray(L_specs, np.float64)
        n_spec, n_lamb = L_specs.shape
        assert psfs_monoch.shape[0] == n_lamb
        assert psfs_monoch.shape[1] <= shape_target[0]
        assert psfs_monoch.shape[2] <= shape_target[1]
        if L_pce is None:
            L_pce = np.ones(n_lamb)
        L_pce = np.asarray(L_pce, np.float64)

        H, W = shape_target
        # box-sum kernel: flux integrated over the decimated pixel surface
        kernel_sum_freq_r = ir2fr(np.ones((di, dj)), shape_target)  # rfft spectrum
        kernel_sum_freq_f = ir2fr(np.ones((di, dj)), shape_target, real=False)

        # phase shift keeping the box sum anchored at the decimation grid
        # (reference mixing.py:154-161)
        decal = np.zeros(shape_target)
        dsi, dsj = int((di - 1) / 2), int((dj - 1) / 2)
        decal[-dsi if dsi else 0, -dsj if dsj else 0] = np.sqrt(H * W)
        decalf_full = np.fft.fftn(decal, axes=(-2, -1), norm="ortho")
        decalf_r = np.fft.rfftn(decal, axes=(-2, -1), norm="ortho")

        # weighted per-λ transfer functions (full spectrum, for the Hessian)
        psfs_freq_full = (
            ir2fr(psfs_monoch * L_pce[:, None, None], shape_target, real=False)
            * kernel_sum_freq_f[np.newaxis]
        )

        # H (rfft spectrum): [S, L, H, W//2+1]
        H_spec_freq = np.zeros(
            (n_spec, n_lamb, H, W // 2 + 1), dtype=np.complex128
        )
        for lam in range(n_lamb):
            slice_ = (
                psfs_monoch[lam] * L_pce[lam]
            )[np.newaxis, ...] * L_specs[:, lam, np.newaxis, np.newaxis]
            H_spec_freq[:, lam] = ir2fr(slice_, shape_target) * kernel_sum_freq_r
        H_spec_freq = H_spec_freq * decalf_r[np.newaxis, np.newaxis]

        # block Hessian [S, S, D, D, h, w] (reference mixing.py:166-212),
        # built with einsums instead of the λ/k1/k2 Python loops
        part = np.stack(
            [
                np.asarray(
                    bf.partition(
                        jnp.asarray(psfs_freq_full[lam][np.newaxis] * decalf_full),
                        di,
                        dj,
                    )
                )[0]
                for lam in range(n_lamb)
            ]
        )  # [L, D, h, w]
        mat = (1.0 / (di * dj)) * np.einsum("lbhw,lahw->labhw", part, part.conj())
        hess = np.einsum("al,bl,lxyhw->abxyhw", L_specs, L_specs, mat)

        self.hess_spec_freq = hess
        self.H_spec_freq = H_spec_freq
        self.di, self.dj = di, dj
        self.shape_target = tuple(shape_target)
        self.n_lamb, self.n_spec = n_lamb, n_spec

        super().__init__(
            ishape=(n_spec, H, W),
            oshape=(n_lamb, H // di, W // dj),
            dtype=dtype,
        )
        npct = np.complex64 if dtype == jnp.float32 else np.complex128
        self._H_r = np.asarray(H_spec_freq, npct)
        self._hess = np.asarray(hess, npct)

        def fwd(x):
            xf = jnp.fft.rfftn(x, axes=(-2, -1), norm="ortho")
            yf = jnp.einsum("slhw,shw->lhw", self._H_r, xf,
                            precision=gemm_precision())
            cube = jnp.fft.irfftn(yf, s=self.shape_target, axes=(-2, -1), norm="ortho")
            return cube[:, :: self.di, :: self.dj]

        self._fwd = jax.jit(fwd)

        def fwadj(x):
            return bf.apply_hessian(self._hess, self.di, self.dj, self.shape_target, x)

        self._fwadj = jax.jit(fwadj)

    def forward(self, x):
        return self._fwd(jnp.asarray(x, self.dtype).reshape(self.ishape))

    def fwadj(self, x):
        """HᵗH x via the precomputed per-frequency block Hessian."""
        return self._fwadj(jnp.asarray(x, self.dtype).reshape(self.ishape))


class MixingST(LinOp):
    """Masked LMM: cube = S ⊙ (T maps) with a static voxel selection.

    Reference: mixing.MixingST (mixing.py:280-337) — its Cython sparse
    kernels become dense masked einsums; `fwadj` uses the precomputed
    per-pixel TST Gram matrix (reference fast_precompute_TST, :323-331).
    """

    def __init__(
        self,
        templates: np.ndarray,
        alpha_axis: np.ndarray,
        beta_axis: np.ndarray,
        wavel_axis: np.ndarray,
        selection_arr: Optional[np.ndarray] = None,
        dtype=jnp.float32,
    ):
        self.templates = np.asarray(templates, np.float64)
        ishape = (self.templates.shape[0], len(alpha_axis), len(beta_axis))
        oshape = (len(wavel_axis), len(alpha_axis), len(beta_axis))
        super().__init__(ishape, oshape, dtype)
        npdt = np.float32 if dtype == jnp.float32 else np.float64
        S = np.ones(oshape, npdt)
        if selection_arr is not None:
            S[np.asarray(selection_arr)] = 0.0
        self._S = S
        self._tpl = np.asarray(self.templates, npdt)
        # per-pixel Gram matrix TST[m, n, i, j] = Σ_λ S·t_m·t_n
        self.TST = np.einsum("lij,ml,nl->mnij", S, self._tpl, self._tpl)

        self._fwd = jax.jit(
            lambda m: self._S * jnp.einsum("ml,mij->lij", self._tpl, m,
                                           precision=gemm_precision())
        )
        self._fwadj = jax.jit(lambda m: jnp.einsum(
            "mnij,nij->mij", self.TST, m, precision=gemm_precision()))

    def forward(self, x):
        return self._fwd(jnp.asarray(x, self.dtype).reshape(self.ishape))

    def fwadj(self, x):
        return self._fwadj(jnp.asarray(x, self.dtype).reshape(self.ishape))

    def mapsToCube(self, maps):
        return np.sum(
            np.expand_dims(np.asarray(maps), 1)
            * self.templates[..., np.newaxis, np.newaxis],
            axis=0,
        )
