"""2-D mesh sharding: channel-expert × λ-axis, composed.

For pod-scale runs the two natural decompositions compose: bands spread
over the mesh's "chan" axis (each group replicates the maps and owns its
bands' data blocks) and, within each band, the λ-window spreads over the
"lam" axis (each device computes T and C only on its *slice of the
window*, then contributes a partial spectral contraction).

Communication per application:
* forward:  one `psum` over "lam" (partial detector contractions);
* adjoint:  one `psum` over "chan" ∪ "lam" (maps contributions) — a single
  all-reduce of the small n_tpl×N² maps array over the whole mesh.
"""

from __future__ import annotations

from math import ceil
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import bilinear, fft, lmm
from ..core.precision import gemm_precision


def make_mesh_2d(n_chan: int, n_lam: int, axis_names=("chan", "lam")) -> Mesh:
    devices = np.asarray(jax.devices()[: n_chan * n_lam]).reshape(n_chan, n_lam)
    return Mesh(devices, axis_names)


class ShardedSpectro2D:
    """Flagship model over a ("chan", "lam") mesh; maps replicated."""

    def __init__(self, model, mesh: Mesh):
        assert len(mesh.axis_names) == 2, "expects a 2-D mesh"
        self.model = model
        self.mesh = mesh
        self.ax_c, self.ax_l = mesh.axis_names
        self.n_c = int(mesh.shape[self.ax_c])
        self.n_l = int(mesh.shape[self.ax_l])
        n_ch = len(model.channels)
        self.slots: List[List[int]] = [
            [c for c in range(n_ch) if c % self.n_c == d] for d in range(self.n_c)
        ]
        self.per_dev = max(1, ceil(n_ch / self.n_c))
        self.block = max(int(np.prod(o)) for o in model.instrs_oshape)

        # per (channel, lam-shard): static λ-column span of the window
        self._spans = []
        for chan in model.channels:
            W = chan.n_wslice
            Lp = ceil(W / self.n_l)
            spans = []
            for e in range(self.n_l):
                lo, hi = e * Lp, min((e + 1) * Lp, W)
                spans.append((lo, max(hi - lo, 0)))
            self._spans.append(spans)

        sm = lambda f, i, o: jax.jit(
            jax.shard_map(f, mesh=mesh, in_specs=i, out_specs=o, check_vma=False)
        )
        # forward output: per-channel blocks sharded over "chan", identical
        # (post-psum) across "lam"
        self._forward_sm = sm(self._local_forward, P(), P(self.ax_c))
        self._normal_sm = sm(self._local_normal, P(), P())
        self.x_sharding = NamedSharding(mesh, P())

    # ------------------------------------------------------------------
    def _channel_partial_forward(self, c: int, e: int, x):
        """Channel c's detector block from this device's λ-column slice."""
        model = self.model
        chan = model.channels[c]
        lo, n = self._spans[c][e]
        if n == 0:
            return jnp.zeros(chan.oshape, x.dtype)
        wsl = chan.wslice
        npctype = np.complex64 if model.dtype == jnp.float32 else np.complex128
        sotf_cols = np.asarray(model.sotf[wsl.start + lo : wsl.start + lo + n], npctype)
        tpl_cols = np.asarray(
            model.templates[:, wsl.start + lo : wsl.start + lo + n],
            np.float32 if model.dtype == jnp.float32 else np.float64,
        )
        cube_cols = lmm.lmm_maps2cube(x, tpl_cols)
        blurred = fft.idft(fft.dft(cube_cols) * sotf_cols, model.imshape)
        # per-plane pipeline then partial contraction with wpsf columns
        nla, nlb = chan.local_im_shape
        n_aout = chan.oshape[3]
        srf = chan.srf
        sb = chan.slit_shape[2]
        wcols = chan._wpsf_dev[:, lo : lo + n, :]
        outs = []
        for idx, w in chan._plans_fwd_dev:
            gridded = bilinear.apply_plan(idx, w, blurred).reshape(n, nla, nlb)
            if chan._box_offset is not None:
                off = chan._box_offset
                windows = jnp.stack(
                    [
                        gridded[:, a0 + off : a0 + off + n_aout * srf, b0 : b0 + sb]
                        for a0, b0 in zip(chan.slit_a_starts, chan.slit_b_starts)
                    ]
                ).reshape(-1, n, n_aout, srf, sb).sum(axis=3)
            else:
                summed = fft.idft(fft.dft(gridded) * chan.otf_combined, (nla, nlb))
                windows = jnp.stack(
                    [
                        summed[:, a0 : a0 + n_aout * srf : srf, b0 : b0 + sb]
                        for a0, b0 in zip(chan.slit_a_starts, chan.slit_b_starts)
                    ]
                )
            windows = windows * chan.slit_weights_sub[:, jnp.newaxis, :, :]
            outs.append(jnp.einsum("slab,klb->ska", windows, wcols.astype(x.dtype),
                                   precision=gemm_precision()))
        return jnp.stack(outs)

    def _partial_rows(self, d, x):
        """All of device-row d's per-slot partial forwards, padded and
        stacked [per_dev, block] — one uniform-shape array so the λ-axis
        reduction is a SINGLE psum executed identically by every device
        (empty slots contribute zero rows; they still participate)."""
        dt = self.model.dtype
        e = jax.lax.axis_index(self.ax_l)
        rows = []
        for s in range(self.per_dev):
            if s < len(self.slots[d]):
                c = self.slots[d][s]
                part = jax.lax.switch(
                    e,
                    [
                        (lambda x, c=c, e_=e_: self._channel_partial_forward(c, e_, x))
                        for e_ in range(self.n_l)
                    ],
                    x,
                ).ravel()
                rows.append(jnp.pad(part, (0, self.block - part.size)))
            else:
                rows.append(jnp.zeros((self.block,), dt))
        return jnp.stack(rows)

    def _local_forward(self, x):
        def branch(d):
            # ONE psum over "lam" per application (the structural comm
            # contract, asserted by tests/test_parallel.py's HLO check)
            return lambda x: jax.lax.psum(self._partial_rows(d, x), self.ax_l)

        d = jax.lax.axis_index(self.ax_c)
        return jax.lax.switch(d, [branch(i) for i in range(self.n_c)], x)

    def _local_normal(self, x):
        """HᵗH x with exactly TWO collectives per application (the minimum
        for a 2-D normal: the adjoint needs full detector blocks, so a mid
        λ-reduction is unavoidable): per-device partial forwards stacked →
        ONE psum over "lam" → per-device adjoint of its λ-columns → ONE
        psum over the whole ("lam","chan") mesh."""
        model = self.model

        def branch(d):
            def f(x):
                e = jax.lax.axis_index(self.ax_l)
                y_rows = jax.lax.psum(self._partial_rows(d, x), self.ax_l)
                acc = jnp.zeros(model.ishape, model.dtype)
                for s, c in enumerate(self.slots[d]):
                    oshape = model.channels[c].oshape
                    y_c = y_rows[s, : int(np.prod(oshape))].reshape(oshape)
                    contrib = jax.lax.switch(
                        e,
                        [
                            (lambda y, c=c, e_=e_: self._channel_partial_adjoint(c, e_, y))
                            for e_ in range(self.n_l)
                        ],
                        y_c,
                    )
                    acc = acc + contrib
                return acc

            return f

        d = jax.lax.axis_index(self.ax_c)
        acc = jax.lax.switch(d, [branch(i) for i in range(self.n_c)], x)
        return jax.lax.psum(acc, (self.ax_l, self.ax_c))

    def _channel_partial_adjoint(self, c: int, e: int, y):
        """Maps contribution of channel c's λ-columns owned by shard e."""
        model = self.model
        chan = model.channels[c]
        lo, n = self._spans[c][e]
        if n == 0:
            return jnp.zeros(model.ishape, y.dtype)
        wsl = chan.wslice
        npctype = np.complex64 if model.dtype == jnp.float32 else np.complex128
        sotf_cols = np.asarray(
            model.sotf[wsl.start + lo : wsl.start + lo + n].conj(), npctype
        )
        tpl_cols = np.asarray(
            model.templates[:, wsl.start + lo : wsl.start + lo + n],
            np.float32 if model.dtype == jnp.float32 else np.float64,
        )
        nla, nlb = chan.local_im_shape
        n_aout = chan.oshape[3]
        srf = chan.srf
        sb = chan.slit_shape[2]
        S = chan.oshape[1]
        wcols = chan._wpsf_dev[:, lo : lo + n, :]
        K = wcols.shape[0]
        planes = jnp.zeros((n,) + model.imshape, y.dtype)
        for p_idx, tplan in enumerate(chan._tplans_fwd):
            y2d = jnp.transpose(y[p_idx], (0, 2, 1)).reshape(S * n_aout, K)
            win_t = jax.lax.dot_general(
                y2d, wcols.reshape(K, n * sb), (((1,), (0,)), ((), ())),
                preferred_element_type=y.dtype,
                precision=gemm_precision(),
            ).reshape(S, n_aout, n, sb)
            win_t = jnp.transpose(win_t, (0, 2, 1, 3))
            win_t = win_t * chan.slit_weights_sub[:, jnp.newaxis, :, :]
            if chan._box_offset is not None:
                off = chan._box_offset
                up = jnp.broadcast_to(
                    win_t[:, :, :, jnp.newaxis, :], (S, n, n_aout, srf, sb)
                ).reshape(S, n, n_aout * srf, sb)
                gridded_t = jnp.zeros((n, nla, nlb), y.dtype)
                for s, (a0, b0) in enumerate(
                    zip(chan.slit_a_starts, chan.slit_b_starts)
                ):
                    gridded_t = gridded_t.at[
                        :, a0 + off : a0 + off + n_aout * srf, b0 : b0 + sb
                    ].add(up[s])
            else:
                up = jnp.zeros((S, n, n_aout, srf, sb), y.dtype)
                up = up.at[:, :, :, 0, :].set(win_t).reshape(S, n, n_aout * srf, sb)
                nla_pad = max(
                    nla, max(int(a0) + n_aout * srf for a0 in chan.slit_a_starts)
                )
                summed_t = jnp.zeros((n, nla_pad, nlb), y.dtype)
                for s, (a0, b0) in enumerate(
                    zip(chan.slit_a_starts, chan.slit_b_starts)
                ):
                    summed_t = summed_t.at[
                        :, a0 : a0 + n_aout * srf, b0 : b0 + sb
                    ].add(up[s])
                summed_t = summed_t[:, :nla, :]
                gridded_t = fft.idft(
                    fft.dft(summed_t) * jnp.conj(chan.otf_combined), (nla, nlb)
                )
            planes = planes + bilinear.apply_transpose_plan(
                tplan, gridded_t.reshape(n, -1)
            )
        blurred_t = fft.idft(fft.dft(planes) * sotf_cols, model.imshape)
        return lmm.lmm_cube2maps(blurred_t, tpl_cols)

    # ------------------------------------------------------------------
    def forward(self, x):
        """maps → [n_c·slots, n_l·?]-tiled data (row-padded per-channel blocks)."""
        return self._forward_sm(jnp.asarray(x, self.model.dtype).reshape(self.model.ishape))

    def normal(self, x):
        """HᵗH x over the full 2-D mesh (one big psum of the maps array)."""
        return self._normal_sm(jnp.asarray(x, self.model.dtype).reshape(self.model.ishape))

    def solve(
        self,
        y,
        mu_reg: float,
        x0=None,
        mu_spectro: float = 1.0,
        max_iter: int = 100,
        tol: float = 1e-12,
        method: str = "lcg",
        loop: str = "graph",
        chain_steps: int = 1,
        state=None,
        return_state: bool = False,
    ):
        """Regularized least squares over the 2-D mesh:
        min_x ½µ_s‖y − Hx‖² + ½µ_r‖Dx‖² via CG on the normal equations.

        Each iteration applies the sharded normal (ONE psum of the maps
        array over the whole chan×λ mesh) plus the replicated prior;
        b = µ_s·Hᵗy is evaluated once up front through the model's exact
        adjoint.  `loop`/`chain_steps`/`state`/`return_state` as in
        :meth:`ShardedSpectro.solve` (dispatch mode = the production
        flagship-scale configuration)."""
        from ..solvers import cg as cg_mod
        from ..solvers.criterion import dtd_separated

        model = self.model
        dt = model.dtype
        mu_s = jnp.asarray(mu_spectro, dt)
        mu_r = jnp.asarray(mu_reg, dt)
        b = mu_s * jnp.asarray(model.adjoint(y), dt)
        if x0 is None:
            x0 = jnp.zeros(model.ishape, dt)
        x0 = jnp.asarray(x0, dt).reshape(model.ishape)

        # µ's ride as traced op_args of ONE memoized closure so repeated
        # solves (µ sweeps, resumes) reuse the compiled CG step (the
        # solver cache keys on the closure's identity).
        if getattr(self, "_solve_normal_op", None) is None:
            def normal_op(x, mu_s, mu_r):
                return mu_s * self._normal_sm(x) + mu_r * dtd_separated(x)

            self._solve_normal_op = normal_op

        if method == "lcg":
            return cg_mod.lcg(self._solve_normal_op, b, x0, max_iter=max_iter,
                              tol=tol, op_args=(mu_s, mu_r), loop=loop,
                              chain_steps=chain_steps, state=state,
                              return_state=return_state)
        if state is not None or return_state or chain_steps != 1:
            raise ValueError(
                "state/return_state/chain_steps are lcg-only; mmmg would "
                "silently cold-restart from x0"
            )
        return cg_mod.mmmg(self._solve_normal_op, b, x0, max_iter=max_iter,
                           tol=tol, op_args=(mu_s, mu_r), loop=loop)