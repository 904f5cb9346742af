"""Closed-form Fourier solver for block-Fourier mixing models.

Reference: `QuadCriterion3.run_expsol` / `Regul_Fusion_Model3` /
`Inv_Regul_Fusion_Model3` (/root/reference/surfh/ToolsDir/fusion_mixing.py:
261-438).  Solves min_x ‖y − Hx‖² + Σ_k µ_k‖D x_k‖² exactly:
x̂ = (HᵗH + µ DᵗD)⁻¹ Hᵗ y, with the regularized Hessian inverted
per-frequency-block (one batched `jnp.linalg.inv` on device).
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core import blockfourier as bf
from ..core.fft import ir2fr, laplacian


class Regul_Fusion_Model:
    """Block Hessian of the data term plus smoothness prior on its diagonal
    (reference Regul_Fusion_Model3, fusion_mixing.py:351-399)."""

    def __init__(self, model, L_mu_reg, gradient: str = "separated"):
        hess = np.asarray(model.hess_spec_freq)
        shape_target = model.shape_target
        di, dj = model.di, model.dj
        L_mu_reg = np.asarray(L_mu_reg, np.float64)

        if gradient == "joint":
            D_freq = ir2fr(laplacian(2), shape=shape_target, real=False)
            part = np.asarray(bf.partition(jnp.asarray(D_freq[np.newaxis]), di, dj))[0]
            diag = np.abs(part) ** 2  # [D, h, w]
        elif gradient == "separated":
            d_row = np.array([-1.0, 1.0])[..., np.newaxis]
            d_col = np.array([-1.0, 1.0])[np.newaxis, ...]
            f_row = ir2fr(d_row, shape=shape_target, real=False)
            f_col = ir2fr(d_col, shape=shape_target, real=False)
            p_row = np.asarray(bf.partition(jnp.asarray(f_row[np.newaxis]), di, dj))[0]
            p_col = np.asarray(bf.partition(jnp.asarray(f_col[np.newaxis]), di, dj))[0]
            diag = np.abs(p_row) ** 2 + np.abs(p_col) ** 2
        else:
            raise ValueError(f"unknown gradient mode {gradient!r}")

        regul = np.copy(hess)
        n_spec, _, dd, _, _, _ = regul.shape
        for k in range(n_spec):
            for i in range(dd):
                regul[k, k, i, i] += L_mu_reg[k] * diag[i]

        self.regul_hess_fusion = regul
        self.di, self.dj = di, dj
        self.shape_target = shape_target
        self.model = model


class Inv_Regul_Fusion_Model:
    """Per-frequency block inverse of the regularized Hessian + the
    reconstruction x̂ = Q⁻¹ Hᵗ y (reference Inv_Regul_Fusion_Model3)."""

    def __init__(self, regul_fusion_model: Regul_Fusion_Model):
        self.inv_hess_fusion = np.asarray(
            bf.make_iHtH(regul_fusion_model.regul_hess_fusion)
        )
        self.model = regul_fusion_model.model
        self.di = regul_fusion_model.di
        self.dj = regul_fusion_model.dj
        self.shape_target = regul_fusion_model.shape_target

        inv = self.inv_hess_fusion
        di, dj, st = self.di, self.dj, self.shape_target
        model = self.model

        def recon(data):
            b = model.adjoint(data)
            bf_freq = bf.dft2(b)
            xf = bf.apply_hessian_freq(inv, di, dj, st, bf_freq)
            return jnp.real(bf.idft2(xf))

        self._recon = jax.jit(recon)

    def map_reconstruction(self, data):
        return self._recon(jnp.asarray(data, self.model.dtype).reshape(self.model.oshape))


class QuadCriterion3:
    """Driver mirroring the reference entry point
    (fusion_mixing.QuadCriterion3, :261-346)."""

    def __init__(
        self,
        data,
        model,
        mu_reg: Union[float, int, list, np.ndarray],
        printing: bool = False,
        gradient: str = "separated",
    ):
        self.data = data
        self.model = model
        self.n_spec = model.n_spec
        self.mu_reg = mu_reg
        self.printing = printing
        self.gradient = gradient
        if isinstance(mu_reg, (list, np.ndarray)):
            assert len(mu_reg) == self.n_spec
            self.L_mu = np.asarray(mu_reg, np.float64)
        else:
            self.L_mu = np.ones(self.n_spec) * float(mu_reg)

    def run_expsol(self):
        import time

        t0 = time.time()
        regul = Regul_Fusion_Model(self.model, self.L_mu, gradient=self.gradient)
        inv = Inv_Regul_Fusion_Model(regul)
        t1 = time.time()
        res = np.asarray(inv.map_reconstruction(self.data))
        if self.printing:
            print(
                f"expsol: preprocess {t1 - t0:.3f}s + solve {time.time() - t1:.3f}s"
            )
        return res
