"""Exponential modified-Shepard scattered-data interpolation, on device.

Replaces the reference's Cython kernel
(/root/reference/surfh/ToolsDir/shepard_interpolation.pyx:76-141), which is a
serial O(grid × points) double loop.  Here the whole weight matrix is one
vectorized masked computation, evaluated in row chunks via `lax.map` to bound
memory — the natural TPU shape for a dense scattered→grid interpolation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def exponential_modified_shepard(
    alpha_coord,
    lambda_coord,
    values,
    alpha_mesh,
    lambda_mesh,
    p: float = 2.0,
    alpha: float = 2.0,
    pixel_cutoff: float = 1.0,
    alpha_res: float = 1.0,
    lambda_res: float = 1.0,
    epsilon: float = 1e-6,
    row_chunk: int = 64,
):
    """Interpolate scattered (α, λ, value) samples onto a regular mesh.

    Matches the reference semantics: pixel-unit distances (axes scaled by
    their resolutions), weights exp(−alpha·dist^p) for dist ≤ pixel_cutoff,
    zero where no point is in range.  Returns an array shaped like the mesh.
    """
    pa = jnp.asarray(alpha_coord, jnp.float32)
    pl = jnp.asarray(lambda_coord, jnp.float32)
    vals = jnp.asarray(values, jnp.float32)
    am = jnp.asarray(alpha_mesh, jnp.float32)
    lm = jnp.asarray(lambda_mesh, jnp.float32)
    inv_ar = jnp.float32(1.0 / alpha_res)
    inv_lr = jnp.float32(1.0 / lambda_res)

    shape = am.shape
    ga = am.ravel()
    gl = lm.ravel()
    # pad the grid to a chunk multiple
    n = ga.size
    n_pad = (-n) % row_chunk
    ga = jnp.pad(ga, (0, n_pad))
    gl = jnp.pad(gl, (0, n_pad))
    ga = ga.reshape(-1, row_chunk)
    gl = gl.reshape(-1, row_chunk)

    def chunk(args):
        ca, cl = args  # [row_chunk]
        da = (pa[jnp.newaxis, :] - ca[:, jnp.newaxis]) * inv_ar
        dl = (pl[jnp.newaxis, :] - cl[:, jnp.newaxis]) * inv_lr
        dist = jnp.sqrt(da * da + dl * dl) + jnp.float32(epsilon)
        w = jnp.where(
            dist <= pixel_cutoff, jnp.exp(-alpha * dist**p), 0.0
        )
        num = w @ vals
        den = jnp.sum(w, axis=1)
        return jnp.where(den != 0, num / jnp.where(den != 0, den, 1.0), 0.0)

    out = jax.lax.map(chunk, (ga, gl))
    return np.asarray(out.ravel()[:n].reshape(shape))
