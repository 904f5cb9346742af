"""Bilinear regridding (the S operator) as precomputed gather / scatter-add.

The reference performs per-λ bilinear resampling between the global sky grid
and each pointing's rotated local FOV grid with a Cython binary-search
interpolator (`surfh/ToolsDir/cythons_files.pyx:20-193`, driver
`surfh/ToolsDir/cython_2D_interpolation.py`).  Grids are static per model
instance, so on TPU the whole interpolation collapses to:

* construction time (host, float64): compute the 4 corner indices and weights
  of every target point once;
* trace time: a 4-term flattened gather, batched over all λ planes
  (`cube[:, flat_idx]`), whose linear transpose is automatically the exact
  4-point scatter-add — no hand-written adjoint needed.

The reference's `interpn_local2cube` "adjoint" is itself a bilinear
interpolation in the reverse direction (`surfh/ToolsDir/cython_utils.py:33-58`)
— an *approximate* transpose under rotation.  :func:`bilinear_plan` +
gather/transpose gives the exact adjoint; the reverse-interp behaviour remains
available for output-parity checks by building a plan in the other direction.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BilinearPlan:
    """Static gather plan: 4 corner flat indices + weights for P target points.

    idx:  int32 [4, P] flat indices into the source grid raveled (Na*Nb).
    w:    float [4, P] corner weights (already zeroed for out-of-bounds points
          when ``fill_value=0`` semantics were requested).
    shape: source grid shape (Na, Nb).
    npoints: P.
    """

    idx: np.ndarray
    w: np.ndarray
    shape: Tuple[int, int]

    @property
    def npoints(self) -> int:
        return self.idx.shape[1]


def _find_interval(grid: np.ndarray, values: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Clamped interval search: i such that grid[i] <= v < grid[i+1].

    Matches `find_interval_ascending(..., extrapolate=1)`
    (/root/reference/surfh/ToolsDir/cythons_files.pyx:20-103): indices clamp to
    [0, n-2] so outside values extrapolate linearly.
    """
    n = grid.shape[0]
    i = np.searchsorted(grid, values, side="right") - 1
    i = np.clip(i, 0, n - 2)
    t = (values - grid[i]) / (grid[i + 1] - grid[i])
    return i.astype(np.int64), t


def bilinear_plan(
    alpha_axis: np.ndarray,
    beta_axis: np.ndarray,
    points: np.ndarray,
    fill_out_of_bounds: bool = False,
) -> BilinearPlan:
    """Build the static plan interpolating grid values at ``points``.

    Parameters
    ----------
    alpha_axis, beta_axis:
        Ascending source-grid axes (Na,), (Nb,).
    points:
        Target coordinates [P, 2] as (alpha, beta) pairs.
    fill_out_of_bounds:
        If True, points outside the source grid produce 0 (the
        ``bounds_error=False, fill_value=0`` mode of the reference's
        local→cube direction).  If False, outside points linearly extrapolate
        (the cube→local direction; model construction guarantees in-bounds).
    """
    alpha_axis = np.asarray(alpha_axis, np.float64)
    beta_axis = np.asarray(beta_axis, np.float64)
    pa = np.asarray(points[:, 0], np.float64)
    pb = np.asarray(points[:, 1], np.float64)

    ia, ta = _find_interval(alpha_axis, pa)
    ib, tb = _find_interval(beta_axis, pb)

    nb = beta_axis.shape[0]
    base = ia * nb + ib
    idx = np.stack([base, base + 1, base + nb, base + nb + 1])
    w = np.stack([(1 - ta) * (1 - tb), (1 - ta) * tb, ta * (1 - tb), ta * tb])

    if fill_out_of_bounds:
        oob = (
            (pa < alpha_axis[0])
            | (pa > alpha_axis[-1])
            | (pb < beta_axis[0])
            | (pb > beta_axis[-1])
        )
        w = np.where(oob[np.newaxis, :], 0.0, w)

    return BilinearPlan(idx.astype(np.int32), w, (alpha_axis.shape[0], nb))


def apply_plan(plan_idx, plan_w, cube):
    """Gather-interpolate every λ plane of ``cube`` at the plan's points.

    cube: [..., Na, Nb] → out [..., P].  Jit-friendly; the transpose of this
    function (via `jax.linear_transpose`) is the exact scatter-add adjoint.
    """
    flat = cube.reshape(cube.shape[:-2] + (-1,))
    out = jnp.zeros(cube.shape[:-2] + (plan_idx.shape[1],), dtype=cube.dtype)
    for c in range(plan_idx.shape[0]):
        out = out + plan_w[c] * jnp.take(flat, plan_idx[c], axis=-1)
    return out


def scatter_plan(plan_idx, plan_w, values, grid_shape: Tuple[int, int]):
    """Explicit exact adjoint of :func:`apply_plan` (4-point scatter-add).

    values: [..., P] → out [..., Na, Nb].
    """
    na, nb = grid_shape
    flat = jnp.zeros(values.shape[:-1] + (na * nb,), dtype=values.dtype)
    for c in range(plan_idx.shape[0]):
        flat = flat.at[..., plan_idx[c]].add(plan_w[c] * values)
    return flat.reshape(values.shape[:-1] + (na, nb))


@dataclass(frozen=True)
class TransposePlan:
    """Transpose-as-gather form of a gather plan's adjoint.

    The exact adjoint of :func:`apply_plan` is a 4-point scatter-add, which is
    slow on TPU (generic scatter / segment reductions).  But each *grid*
    pixel receives contributions from a small bounded set of target points
    (≈ the local/global grid density ratio × 4 corners), so the transpose is
    itself a padded gather: per grid pixel, up to C (source index, weight)
    pairs, zero-padded.  Applying it is the same vectorized weighted-gather
    shape as the forward — no scatter anywhere in the pipeline.
    """

    idx: np.ndarray  # int32 [C, Na·Nb] indices into the P target points
    w: np.ndarray  # float [C, Na·Nb] weights (0 padding)
    shape: Tuple[int, int]


def transpose_plan(plan: BilinearPlan) -> TransposePlan:
    """Build the padded gather-form transpose of a plan (host, once)."""
    ncorner, P = plan.idx.shape
    N = plan.shape[0] * plan.shape[1]
    src = np.tile(np.arange(P, dtype=np.int64), ncorner)
    dst = plan.idx.reshape(-1).astype(np.int64)
    w = plan.w.reshape(-1)
    keep = w != 0
    src, dst, w = src[keep], dst[keep], w[keep]
    order = np.argsort(dst, kind="stable")
    src, dst, w = src[order], dst[order], w[order]
    counts = np.bincount(dst, minlength=N)
    C = int(counts.max()) if counts.size else 1
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    idx_arr = np.zeros((C, N), np.int32)
    w_arr = np.zeros((C, N), plan.w.dtype)
    present = np.flatnonzero(counts)
    for c in range(C):
        sel = present[counts[present] > c]
        idx_arr[c, sel] = src[starts[sel] + c]
        w_arr[c, sel] = w[starts[sel] + c]
    return TransposePlan(idx_arr, w_arr, plan.shape)


@dataclass(frozen=True)
class CSRTransposePlan:
    """Sorted-COO form of a gather plan's adjoint.

    The padded-gather :class:`TransposePlan` stores C = max contributions per
    grid pixel rows; when the local grid is denser than the global one (or
    out-of-FOV points clamp onto edge pixels — small sky grids with the real
    MIRI FOVs) C degenerates into the thousands, exploding both the table
    (C·N) and the unrolled per-row gather graph.  This form stays O(M) with
    M ≈ 4·P: per (corner, point) contribution, a (source, weight,
    destination) triple, sorted by destination, applied as ONE gather + ONE
    sorted scatter-add.
    """

    src: np.ndarray  # int32 [M] source target-point indices
    w: np.ndarray  # float [M] weights (0 = padding)
    dst: np.ndarray  # int32 [M] destination grid indices, ascending
    shape: Tuple[int, int]


def csr_transpose_plan(plan: BilinearPlan) -> CSRTransposePlan:
    """Build the sorted-COO transpose of a plan (host, once)."""
    ncorner, P = plan.idx.shape
    src = np.tile(np.arange(P, dtype=np.int64), ncorner)
    dst = plan.idx.reshape(-1).astype(np.int64)
    w = plan.w.reshape(-1)
    keep = w != 0
    src, dst, w = src[keep], dst[keep], w[keep]
    order = np.argsort(dst, kind="stable")
    return CSRTransposePlan(
        src[order].astype(np.int32), w[order], dst[order].astype(np.int32),
        plan.shape,
    )


def apply_csr_transpose_arrays(tsrc, tw, tdst, values, grid_shape: Tuple[int, int]):
    """Apply a :class:`CSRTransposePlan` from its arrays (traceable args).

    values: [..., P] → out [..., Na, Nb].  One gather + one sorted
    scatter-add, independent of the per-pixel contributor count.
    """
    na, nb = grid_shape
    contrib = jnp.take(values, tsrc, axis=-1) * tw
    out = jnp.zeros(values.shape[:-1] + (na * nb,), values.dtype)
    out = out.at[..., tdst].add(
        contrib, indices_are_sorted=True, unique_indices=False
    )
    return out.reshape(values.shape[:-1] + (na, nb))


def apply_transpose_plan(tplan, values, dtype=None):
    """Exact adjoint of :func:`apply_plan` (either transpose-plan form).

    values: [..., P] → out [..., Na, Nb].
    """
    if isinstance(tplan, CSRTransposePlan):
        return apply_csr_transpose_arrays(
            tplan.src, tplan.w, tplan.dst, values, tplan.shape
        )
    return apply_transpose_plan_arrays(tplan.idx, tplan.w, values, tplan.shape)


def apply_transpose_plan_arrays(tidx, tw, values, grid_shape: Tuple[int, int]):
    """Array-argument form of :func:`apply_transpose_plan`.

    Takes the (idx, w) tables directly so they can be traced values — e.g.
    per-pointing tables fed through `lax.scan` — instead of baked constants.
    """
    na, nb = grid_shape
    out = jnp.zeros(values.shape[:-1] + (na * nb,), values.dtype)
    for c in range(tidx.shape[0]):
        out = out + tw[c] * jnp.take(values, tidx[c], axis=-1)
    return out.reshape(values.shape[:-1] + (na, nb))


def grid_points(alpha_coords: np.ndarray, beta_coords: np.ndarray) -> np.ndarray:
    """Stack 2-D coordinate fields into an [P, 2] point list (row-major)."""
    return np.vstack([alpha_coords.ravel(), beta_coords.ravel()]).T
