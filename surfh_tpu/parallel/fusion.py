"""Multi-chip sharding of the fusion forward/adjoint/solve pipeline.

The reference never parallelized across channels — "Parallelization on
channel" is an explicit TODO (/root/reference/README.md:57-60); its channel
loop is serial Python (/root/reference/surfh/Models/spectroModel.py:167-176).
Here the natural decomposition becomes the mesh layout:

* **channel-expert sharding** (mesh axis ``"chan"``): each device owns a
  static subset of the instrument bands.  The unknown (maps, a few MB) is
  replicated; each device computes T and C *only over its bands' λ-windows*
  (`wslice`), then its bands' S·L·R·Sig pipelines.  The forward needs **no
  communication at all**; the adjoint / normal operator needs exactly one
  `psum` of the maps-shaped contribution per application.  CG state is
  replicated and tiny, so a full CG iteration costs a single all-reduce of
  ~n_tpl·N² floats over ICI.

Because the 12 MRS bands have ragged shapes (different n_slit, λ-counts,
slit widths — scripts/main_fusion.py:34-39), devices run band-specific
programs selected by `lax.switch` on `axis_index` inside one SPMD
`shard_map` body; per-band outputs are zero-padded to a common block so the
sharded data vector is a dense [n_dev·slots, block] array.
"""

from __future__ import annotations

from math import ceil
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import fft, lmm
from ..core import linop as linop_mod
from ..solvers import cg as cg_mod
from ..solvers.criterion import dtd_separated


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "chan") -> Mesh:
    """A 1-D device mesh over the first `n_devices` available devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    return Mesh(np.asarray(devices[:n_devices]), (axis_name,))


class ShardedSpectro:
    """Channel-sharded wrapper of a `SpectroSigRLSCT` model.

    Parameters
    ----------
    model:
        The flagship operator (`surfh_tpu.models.spectro.SpectroSigRLSCT`).
    mesh:
        A 1-D `jax.sharding.Mesh`; its single axis shards the channel list.
    """

    def __init__(self, model, mesh: Mesh, axis_name: Optional[str] = None):
        self.model = model
        self.mesh = mesh
        if axis_name is None:
            axis_name = mesh.axis_names[0]
        self.axis = axis_name
        self.n_dev = int(mesh.shape[axis_name])
        n_ch = len(model.channels)
        self.n_ch = n_ch
        self.per_dev = max(1, ceil(n_ch / self.n_dev))
        self.block = max(int(np.prod(o)) for o in model.instrs_oshape)
        # round-robin: channel c → device c % n_dev, slot c // n_dev
        self.slots: List[List[int]] = [
            [c for c in range(n_ch) if c % self.n_dev == d] for d in range(self.n_dev)
        ]

        sm = lambda f, i, o: jax.jit(
            jax.shard_map(f, mesh=mesh, in_specs=i, out_specs=o, check_vma=False)
        )
        # Flagship (window_local) models pass their tables as shard_map
        # ARGUMENTS, replicated over the mesh: closed-over tables would be
        # inlined as HLO constants, which cannot compile at flagship scale
        # (GB-size programs; see models/spectro.py `window_local`).  Tables
        # are replicated rather than sharded per channel owner — at the
        # 12-band flagship they are ~5.5 GB, which fits each v5e chip's HBM
        # alongside that chip's per-channel temps; compute and temps scale
        # with devices, tables do not (documented trade-off).
        self.window_local = bool(getattr(model, "window_local", False))
        if self.window_local:
            repl = NamedSharding(mesh, P())
            # Stamp-mode tables ship compact PSF stamps; materialize the OTF
            # windows ON DEVICE once here (replicated) so the shard_map
            # forward/adjoint consume bit-identical `sotf_ri` values — the
            # exact-transpose contract needs the OTF pinned, not re-evaluated
            # per program (see SpectroSigRLSCT.materialize_otf).
            self._tables = model.materialize_otf(
                jax.device_put(model.host_tables(), repl), out_sharding=repl
            )
            tspec = jax.tree.map(lambda _: P(), self._tables)
            self._forward_sm = sm(
                self._local_forward_tabled, (P(), tspec), P(self.axis))
            self._adjoint_sm = sm(
                self._local_adjoint_tabled, (P(self.axis), tspec), P())
            self._normal_sm = sm(
                self._local_normal_tabled, (P(), tspec), P())
        else:
            self._tables = None
            self._fwd_fns = [self._make_channel_fwd(c) for c in range(n_ch)]
            self._adj_fns = [self._make_channel_adj(c) for c in range(n_ch)]
            self._forward_sm = sm(self._local_forward, P(), P(self.axis))
            self._adjoint_sm = sm(self._local_adjoint, P(self.axis), P())
            self._normal_sm = sm(self._local_normal, P(), P())

        self.y_sharding = NamedSharding(mesh, P(self.axis))
        self.x_sharding = NamedSharding(mesh, P())

    # ------------------------------------------------------------------
    # per-channel pure functions over the *windowed* cube — each device
    # materializes only its channels' λ-windows.
    def _make_channel_fwd(self, c: int) -> Callable:
        model = self.model
        chan = model.channels[c]
        wsl = chan.wslice
        npctype = np.complex64 if model.dtype == jnp.float32 else np.complex128
        npdtype = np.float32 if model.dtype == jnp.float32 else np.float64
        sotf_w = np.asarray(model.sotf[wsl], npctype)
        imshape = model.imshape
        if model.lmm:
            tpl_w = np.asarray(model.templates[:, wsl], npdtype)

            def fwd(x):
                cube_w = lmm.lmm_maps2cube(x, tpl_w)
                blurred = fft.idft(fft.dft(cube_w) * sotf_w, imshape)
                return chan._forward_windowed(blurred, chan._wpsf_dev)

        else:

            def fwd(x):
                xw = jax.lax.slice_in_dim(x, wsl.start, wsl.stop, axis=0)
                blurred = fft.idft(fft.dft(xw) * sotf_w, imshape)
                return chan._forward_windowed(blurred, chan._wpsf_dev)

        return fwd

    def _make_channel_adj(self, c: int) -> Callable:
        """Hand-written exact transpose of the per-channel windowed forward
        (same fast formulation as SpectroSigRLSCT.adjoint_fn)."""
        model = self.model
        chan = model.channels[c]
        wsl = chan.wslice
        npctype = np.complex64 if model.dtype == jnp.float32 else np.complex128
        npdtype = np.float32 if model.dtype == jnp.float32 else np.float64
        sotf_w_conj = np.asarray(model.sotf[wsl].conj(), npctype)
        imshape = model.imshape
        if model.lmm:
            tpl_w = np.asarray(model.templates[:, wsl], npdtype)

            def adj(y):
                cube_w = chan._adjoint_windowed_fast(y)
                blurred_t = fft.idft(fft.dft(cube_w) * sotf_w_conj, imshape)
                return lmm.lmm_cube2maps(blurred_t, tpl_w)

        else:

            def adj(y):
                cube_w = chan._adjoint_windowed_fast(y)
                blurred_t = fft.idft(fft.dft(cube_w) * sotf_w_conj, imshape)
                out = jnp.zeros(model.ishape, y.dtype)
                return out.at[wsl.start : wsl.stop].add(blurred_t)

        return adj

    # ------------------------------------------------------------------
    # SPMD bodies (run per device under shard_map)
    def _local_forward(self, x):
        dt = self.model.dtype

        def branch(d):
            def f(x):
                rows = []
                for s in range(self.per_dev):
                    if s < len(self.slots[d]):
                        c = self.slots[d][s]
                        y = self._fwd_fns[c](x).ravel()
                        rows.append(jnp.pad(y, (0, self.block - y.size)))
                    else:
                        rows.append(jnp.zeros((self.block,), dt))
                return jnp.stack(rows)

            return f

        d = jax.lax.axis_index(self.axis)
        return jax.lax.switch(d, [branch(i) for i in range(self.n_dev)], x)

    def _local_adjoint(self, y_local):
        model = self.model

        def branch(d):
            def f(y_local):
                acc = jnp.zeros(model.ishape, model.dtype)
                for s, c in enumerate(self.slots[d]):
                    osz = int(np.prod(model.instrs_oshape[c]))
                    yc = y_local[s, :osz].reshape(model.instrs_oshape[c])
                    acc = acc + self._adj_fns[c](yc)
                return acc

            return f

        d = jax.lax.axis_index(self.axis)
        acc = jax.lax.switch(d, [branch(i) for i in range(self.n_dev)], y_local)
        return jax.lax.psum(acc, self.axis)

    def _local_normal(self, x):
        model = self.model

        def branch(d):
            def f(x):
                acc = jnp.zeros(model.ishape, model.dtype)
                for c in self.slots[d]:
                    acc = acc + self._adj_fns[c](self._fwd_fns[c](x))
                return acc

            return f

        d = jax.lax.axis_index(self.axis)
        acc = jax.lax.switch(d, [branch(i) for i in range(self.n_dev)], x)
        return jax.lax.psum(acc, self.axis)

    # ------------------------------------------------------------------
    # SPMD bodies, window-local (tables as replicated shard_map arguments)
    def _local_forward_tabled(self, x, tables):
        model, dt = self.model, self.model.dtype

        def branch(d):
            def f(x):
                rows = []
                for s in range(self.per_dev):
                    if s < len(self.slots[d]):
                        c = self.slots[d][s]
                        y = model._channel_fwd_tabled(x, c, tables).ravel()
                        rows.append(jnp.pad(y, (0, self.block - y.size)))
                    else:
                        rows.append(jnp.zeros((self.block,), dt))
                return jnp.stack(rows)

            return f

        d = jax.lax.axis_index(self.axis)
        return jax.lax.switch(d, [branch(i) for i in range(self.n_dev)], x)

    def _local_adjoint_tabled(self, y_local, tables):
        model = self.model

        def branch(d):
            def f(y_local):
                acc = jnp.zeros(model.ishape, model.dtype)
                for s, c in enumerate(self.slots[d]):
                    osz = int(np.prod(model.instrs_oshape[c]))
                    yc = y_local[s, :osz].reshape(model.instrs_oshape[c])
                    acc = acc + model._channel_adj_tabled(yc, c, tables)
                return acc

            return f

        d = jax.lax.axis_index(self.axis)
        acc = jax.lax.switch(d, [branch(i) for i in range(self.n_dev)], y_local)
        return jax.lax.psum(acc, self.axis)

    def _local_normal_tabled(self, x, tables):
        model = self.model

        def branch(d):
            def f(x):
                acc = jnp.zeros(model.ishape, model.dtype)
                for c in self.slots[d]:
                    acc = acc + model._channel_adj_tabled(
                        model._channel_fwd_tabled(x, c, tables), c, tables
                    )
                return acc

            return f

        d = jax.lax.axis_index(self.axis)
        acc = jax.lax.switch(d, [branch(i) for i in range(self.n_dev)], x)
        return jax.lax.psum(acc, self.axis)

    # ------------------------------------------------------------------
    # public API
    def _sm_args(self):
        return (self._tables,) if self.window_local else ()

    def forward(self, x):
        """maps → packed sharded data [n_dev·slots, block] (no communication)."""
        return self._forward_sm(
            jnp.asarray(x, self.model.dtype).reshape(self.model.ishape),
            *self._sm_args(),
        )

    def adjoint(self, y_packed):
        """packed sharded data → maps (one psum)."""
        return self._adjoint_sm(
            jnp.asarray(y_packed, self.model.dtype), *self._sm_args()
        )

    def normal(self, x):
        """HᵗH x, fused per device (one psum)."""
        return self._normal_sm(
            jnp.asarray(x, self.model.dtype).reshape(self.model.ishape),
            *self._sm_args(),
        )

    # ------------------------------------------------------------------
    # layout conversion host helpers (reference flat vector ↔ packed shards)
    def pack(self, y_flat) -> jax.Array:
        """Reference flat data vector → padded [n_dev·slots, block], placed
        with the sharded layout (row r = device r // slots, slot r % slots)."""
        flat = np.asarray(y_flat).ravel()
        dt = np.float32 if self.model.dtype == jnp.float32 else np.float64
        out = np.zeros((self.n_dev * self.per_dev, self.block), dt)
        for c in range(self.n_ch):
            d, s = c % self.n_dev, c // self.n_dev
            seg = flat[self.model._idx[c] : self.model._idx[c + 1]]
            out[d * self.per_dev + s, : seg.size] = seg
        return jax.device_put(out, self.y_sharding)

    def unpack(self, y_packed) -> np.ndarray:
        """Inverse of :meth:`pack` (returns the reference flat layout)."""
        packed = np.asarray(y_packed)
        flat = np.zeros((int(self.model._idx[-1]),), packed.dtype)
        for c in range(self.n_ch):
            d, s = c % self.n_dev, c // self.n_dev
            n = self.model._idx[c + 1] - self.model._idx[c]
            flat[self.model._idx[c] : self.model._idx[c + 1]] = packed[
                d * self.per_dev + s, :n
            ]
        return flat

    def forward_flat(self, x) -> np.ndarray:
        """Forward returning the reference flat layout (host-side reshuffle)."""
        return self.unpack(self.forward(x))

    # ------------------------------------------------------------------
    def make_train_step(self, mu_spectro: float = 1.0, mu_reg: float = 1.0, lr: float = 1e-6):
        """One jitted gradient step of ½µ_s‖y−Hx‖² + ½µ_r‖Dx‖² over the mesh.

        The whole step is a single compiled SPMD program: sharded forward
        (no comm) → sharded residual → adjoint (one psum) → replicated prior
        and update.  This is the framework's "training step" for multi-chip
        validation and long solves driven step-by-step from the host.
        """

        # tables ride as jit ARGUMENTS (a closed-over device array is inlined
        # as an HLO literal — at flagship scale that blows the program size)
        def step(x, y_packed, *sm_args):
            r = self._forward_sm(x, *sm_args) - y_packed
            g = mu_spectro * self._adjoint_sm(r, *sm_args) + mu_reg * dtd_separated(x)
            return x - lr * g

        jstep = jax.jit(step)
        return lambda x, y_packed: jstep(x, y_packed, *self._sm_args())

    def solve(
        self,
        y,
        mu_reg: float,
        x0=None,
        mu_spectro: float = 1.0,
        max_iter: int = 100,
        tol: float = 1e-12,
        method: str = "lcg",
        packed: bool = False,
    ) -> cg_mod.SolverResult:
        """Sharded regularized least squares:
        min_x ½µ_s‖y − Hx‖² + ½µ_r‖Dx‖² via CG on the normal equations.

        Every iteration does one fused HᵗH (one psum) plus the replicated
        separated-difference prior; CG state is replicated maps.
        """
        model = self.model
        y_packed = y if packed else self.pack(y)
        b = mu_spectro * self._adjoint_sm(y_packed, *self._sm_args())
        if x0 is None:
            x0 = jnp.zeros(model.ishape, model.dtype)
        x0 = jax.device_put(jnp.asarray(x0, model.dtype).reshape(model.ishape), self.x_sharding)

        def normal_op(x, *sm_args):
            return mu_spectro * self._normal_sm(x, *sm_args) + mu_reg * dtd_separated(x)

        solver = cg_mod.lcg if method == "lcg" else cg_mod.mmmg
        return solver(normal_op, b, x0, max_iter=max_iter, tol=tol,
                      op_args=self._sm_args())
