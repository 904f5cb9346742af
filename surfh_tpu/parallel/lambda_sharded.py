"""λ-axis sharding of a channel pipeline (the sequence-parallel analog).

The reference's scaling strategy for the spectral axis is λ-windowing
(SURVEY.md §5: each channel touches only its `wslice` of the ~3182-plane
cube).  For cube-domain models (no LMM compression) the cube itself is the
memory bottleneck (float32 full-scale ≈ 3.2 GB plus activations), so here
the cube's λ axis is sharded across the mesh:

* gridding, SRF convolution and slit windowing are per-λ-plane — fully
  local to each shard;
* the spectral blur contracts over λ, so each device computes the partial
  contraction with its static slice of wpsf columns and one `psum`
  produces the detector data;
* the adjoint is communication-free: each device's cube shard receives
  contributions only from its own wpsf columns (the transpose of
  "local contraction + psum" is "replicated input + local transpose").

Devices intersect the channel λ-window differently, so per-device programs
are selected with `lax.switch` on `axis_index` — same SPMD pattern as the
channel-expert sharding in `parallel.fusion`.
"""

from __future__ import annotations

from math import ceil
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import bilinear, fft
from ..core.precision import gemm_precision


class LambdaShardedChannel:
    """One channel's forward/adjoint over a λ-sharded full cube.

    Parameters
    ----------
    chan: `models.channel.Channel` (provides all static tables).
    n_lambda: length of the global cube λ axis.
    mesh: 1-D mesh; its axis shards the λ dimension in contiguous blocks.
    """

    def __init__(self, chan, n_lambda: int, mesh: Mesh, axis_name: Optional[str] = None):
        self.chan = chan
        self.mesh = mesh
        self.axis = axis_name or mesh.axis_names[0]
        self.n_dev = int(mesh.shape[self.axis])
        self.L = int(n_lambda)
        self.Lp = ceil(self.L / self.n_dev)  # padded shard length
        self.L_pad = self.Lp * self.n_dev

        # per-device intersection of the shard with the channel window
        w0, w1 = chan.wslice.start, chan.wslice.stop
        self._spans = []
        for d in range(self.n_dev):
            s0, s1 = d * self.Lp, (d + 1) * self.Lp
            lo, hi = max(s0, w0), min(s1, w1)
            if lo >= hi:
                self._spans.append(None)
            else:
                # (local start, length, window-column offset)
                self._spans.append((lo - s0, hi - lo, lo - w0))

        sm = lambda f, i, o: jax.jit(
            jax.shard_map(f, mesh=mesh, in_specs=i, out_specs=o, check_vma=False)
        )
        self._forward_sm = sm(self._local_forward, P(self.axis), P())
        self._adjoint_sm = sm(self._local_adjoint, P(), P(self.axis))
        self.cube_sharding = NamedSharding(mesh, P(self.axis))

    # ------------------------------------------------------------------
    def _pipeline_to_windows(self, planes):
        """Per-plane part of the pipeline: grid → SRF conv → slit windows.
        planes [w, Na, Nb] → windows [P, S, w, A, B]."""
        chan = self.chan
        nla, nlb = chan.local_im_shape
        n_aout = chan.oshape[3]
        srf = chan.srf
        sb = chan.slit_shape[2]
        per_pointing = []
        for idx, w in chan._plans_fwd_dev:
            gridded = bilinear.apply_plan(idx, w, planes).reshape(
                planes.shape[0], nla, nlb
            )
            summed = fft.idft(fft.dft(gridded) * chan.otf_combined, (nla, nlb))
            windows = jnp.stack(
                [
                    summed[:, a0 : a0 + n_aout * srf : srf, b0 : b0 + sb]
                    for a0, b0 in zip(chan.slit_a_starts, chan.slit_b_starts)
                ]
            )
            per_pointing.append(windows * chan.slit_weights_sub[:, jnp.newaxis, :, :])
        return jnp.stack(per_pointing)

    def _local_forward(self, shard):
        """shard [Lp, Na, Nb] → full detector block [P, S, K, A] via psum."""
        chan = self.chan
        dt = shard.dtype
        oshape = chan.oshape

        def branch(d):
            span = self._spans[d]
            if span is None:
                return lambda shard: jnp.zeros(oshape, dt)
            s0, n, c0 = span

            def f(shard):
                planes = jax.lax.slice_in_dim(shard, s0, s0 + n, axis=0)
                windows = self._pipeline_to_windows(planes)
                wcols = chan._wpsf_dev[:, c0 : c0 + n, :]  # [K, n, B]
                return jnp.einsum("pslab,klb->pska", windows, wcols.astype(dt),
                                  precision=gemm_precision())

            return f

        d = jax.lax.axis_index(self.axis)
        partial = jax.lax.switch(d, [branch(i) for i in range(self.n_dev)], shard)
        return jax.lax.psum(partial, self.axis)

    def _local_adjoint(self, y):
        """replicated y [P, S, K, A] → this device's cube shard [Lp, Na, Nb]."""
        chan = self.chan
        dt = y.dtype
        shard_shape = (self.Lp,) + chan.imshape

        def branch(d):
            span = self._spans[d]
            if span is None:
                return lambda y: jnp.zeros(shard_shape, dt)
            s0, n, c0 = span

            def f(y):
                wcols = chan._wpsf_dev[:, c0 : c0 + n, :].astype(dt)
                planes = self._adjoint_planes(y, wcols, n)
                out = jnp.zeros(shard_shape, dt)
                return out.at[s0 : s0 + n].add(planes)

            return f

        d = jax.lax.axis_index(self.axis)
        return jax.lax.switch(d, [branch(i) for i in range(self.n_dev)], y)

    def _adjoint_planes(self, y, wcols, n):
        """Exact transpose of the per-plane pipeline for `n` local planes."""
        chan = self.chan
        nla, nlb = chan.local_im_shape
        n_aout = chan.oshape[3]
        srf = chan.srf
        sb = chan.slit_shape[2]
        S = chan.oshape[1]
        K = wcols.shape[0]
        out = jnp.zeros((n,) + chan.imshape, y.dtype)
        for p_idx, tplan in enumerate(chan._tplans_fwd):
            # transpose of the banded column contraction
            y2d = jnp.transpose(y[p_idx], (0, 2, 1)).reshape(S * n_aout, K)
            win_t = jax.lax.dot_general(
                y2d, wcols.reshape(K, n * sb), (((1,), (0,)), ((), ())),
                preferred_element_type=y.dtype,
                precision=gemm_precision(),
            ).reshape(S, n_aout, n, sb)
            win_t = jnp.transpose(win_t, (0, 2, 1, 3))
            win_t = win_t * chan.slit_weights_sub[:, jnp.newaxis, :, :]
            up = jnp.zeros((S, n, n_aout, srf, sb), y.dtype)
            up = up.at[:, :, :, 0, :].set(win_t).reshape(S, n, n_aout * srf, sb)
            nla_pad = max(
                nla, max(int(a0) + n_aout * srf for a0 in chan.slit_a_starts)
            )
            summed_t = jnp.zeros((n, nla_pad, nlb), y.dtype)
            for s, (a0, b0) in enumerate(
                zip(chan.slit_a_starts, chan.slit_b_starts)
            ):
                summed_t = summed_t.at[:, a0 : a0 + n_aout * srf, b0 : b0 + sb].add(
                    up[s]
                )
            summed_t = summed_t[:, :nla, :]
            gridded_t = fft.idft(
                fft.dft(summed_t) * jnp.conj(chan.otf_combined), (nla, nlb)
            )
            out = out + bilinear.apply_transpose_plan(
                tplan, gridded_t.reshape(n, -1)
            )
        return out

    # ------------------------------------------------------------------
    def shard_cube(self, cube) -> jax.Array:
        """Pad the cube λ axis to the shard multiple and place it sharded."""
        cube = np.asarray(cube)
        if cube.shape[0] != self.L:
            raise ValueError(f"cube has {cube.shape[0]} planes, expected {self.L}")
        if self.L_pad != self.L:
            cube = np.concatenate(
                [cube, np.zeros((self.L_pad - self.L,) + cube.shape[1:], cube.dtype)]
            )
        return jax.device_put(cube, self.cube_sharding)

    def forward(self, cube_sharded):
        """λ-sharded cube → detector block [P, S, K, A] (one psum)."""
        return self._forward_sm(cube_sharded)

    def adjoint(self, y):
        """Detector block → λ-sharded cube (communication-free)."""
        out = self._adjoint_sm(jnp.asarray(y).reshape(self.chan.oshape))
        return out
