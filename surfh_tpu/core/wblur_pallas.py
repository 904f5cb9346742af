"""Pallas TPU kernel: spectral blur as a blocked *banded* matmul.

The spectral response wpsf[λ', λ, β] is band-limited: detector wavelength λ'
only receives flux from cube wavelengths λ in a narrow sinc²-support band
around it (reference SpectralBlur windows + margin, instru.py:499-572).  The
XLA path (`core.wblur`) contracts densely over the whole λ-window; this
kernel exploits the band:

* host side, once: find each λ'-tile's band [start, start+LB) and re-base the
  wpsf into blocks [nT, LB·B, TK] (zero-padded outside the true band);
* device side: grid over λ'-tiles; each program DMAs only its [LB, B, SA]
  slab of the input from HBM into VMEM (scalar-prefetched start) and runs
  one MXU matmul [SA, LB·B] × [LB·B, TK].

FLOP and HBM-read savings vs dense ≈ W / LB (window length over band width).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclass(frozen=True)
class BandPlan:
    """Static banded-contraction plan for one channel's wpsf [K, W, B]."""

    starts: np.ndarray  # int32 [nT] λ-window offset of each λ'-tile's band
    wpsf_blocked: np.ndarray  # f32 [nT, LB·Bp, TK] re-based transfer blocks
    K: int  # true λ' count (output padded to nT·TK then sliced)
    W: int  # λ-window length
    B: int  # β (slit) width
    Bp: int  # β padded to a sublane multiple (VMEM tiling constraint)
    LB: int  # band length (λ samples per tile)
    TK: int  # λ' tile size

    @property
    def n_tiles(self) -> int:
        return self.starts.shape[0]

    @property
    def density(self) -> float:
        """Banded fraction of the dense contraction (lower = more saving)."""
        return self.LB / max(self.W, 1)


def build_band_plan(
    wpsf: np.ndarray, tile_k: int = 128, eps: float = 0.0, rel_eps: float = 0.0
) -> BandPlan:
    """Analyze the wpsf's λ-support and build the blocked banded form.

    `eps` is an absolute support threshold; `rel_eps` is relative to the
    wpsf's global maximum (the sinc² response has algebraic tails that never
    reach exact zero, so a small relative threshold — e.g. 1e-6 — is what
    actually creates a band; the truncation error is of the same order)."""
    wpsf = np.asarray(wpsf)
    K, W, B = wpsf.shape
    nT = -(-K // tile_k)
    K_pad = nT * tile_k

    thresh = max(eps, rel_eps * float(np.abs(wpsf).max()))
    support = np.abs(wpsf).max(axis=2) > thresh  # [K, W]
    lo = np.full(K_pad, W, np.int64)
    hi = np.full(K_pad, 0, np.int64)
    any_k = support.any(axis=1)
    lo[:K][any_k] = support.argmax(axis=1)[any_k]
    hi[:K][any_k] = W - support[:, ::-1].argmax(axis=1)[any_k]

    starts = np.zeros(nT, np.int64)
    LB = 1
    for t in range(nT):
        ks = slice(t * tile_k, (t + 1) * tile_k)
        s = int(lo[ks].min()) if (lo[ks] < W).any() else 0
        e = int(hi[ks].max())
        starts[t] = min(s, max(W - 1, 0))
        LB = max(LB, e - s)
    # round LB up to a sublane multiple for clean VMEM tiling
    LB = min(W, -(-LB // 8) * 8)
    starts = np.minimum(starts, max(W - LB, 0))

    Bp = -(-B // 8) * 8  # β padded to the f32 sublane multiple
    blocked = np.zeros((nT, LB * Bp, tile_k), np.float32)
    for t in range(nT):
        s = int(starts[t])
        span = min(LB, W - s)
        block = np.zeros((tile_k, span, Bp))
        blk = wpsf[min(t * tile_k, K) : min((t + 1) * tile_k, K), s : s + span, :]
        block[: blk.shape[0], :, :B] = blk
        blocked[t, : span * Bp, :] = (
            block.transpose(1, 2, 0).reshape(span * Bp, tile_k).astype(np.float32)
        )
    return BandPlan(starts.astype(np.int32), blocked, K, W, B, Bp, LB, tile_k)


def _banded_kernel(starts_ref, arr_ref, w_ref, out_ref, scratch, sem):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        arr_ref.at[pl.ds(starts_ref[i], scratch.shape[0])], scratch, sem
    )
    dma.start()
    dma.wait()
    lb, b, sa = scratch.shape
    x2d = scratch[:].reshape(lb * b, sa)
    out_ref[:] = jax.lax.dot_general(
        w_ref[0],
        x2d,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _banded_call(arr, plan: BandPlan, interpret: bool):
    """arr [W_pad, Bp, SA] f32 → out [nT·TK, SA] (caller slices to K)."""
    W, B, SA = arr.shape
    nT, LBB, TK = plan.wpsf_blocked.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nT,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, LBB, TK), lambda i, starts: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((TK, SA), lambda i, starts: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((plan.LB, B, SA), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        _banded_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nT * TK, SA), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(plan.starts), arr, jnp.asarray(plan.wpsf_blocked))


def wblur_sum_beta_banded(windows, plan: BandPlan, interpret: bool = False):
    """Banded Pallas version of `wblur.wblur_sum_beta_batched`.

    windows: [S, W, A, B] slit stacks → out [S, K, A]
    (out[s,k,a] = Σ_{l,b} windows[s,l,a,b] · wpsf[k,l,b]).
    """
    S, W, A, B = windows.shape
    assert W == plan.W and B == plan.B
    # fold slits into the matmul N dimension; pad β to the sublane multiple
    # and SA to a lane-friendly size
    arr = jnp.transpose(windows, (1, 3, 0, 2)).reshape(W, B, S * A)
    sa_pad = (-(S * A)) % 128
    if sa_pad or plan.Bp != B:
        arr = jnp.pad(arr, ((0, 0), (0, plan.Bp - B), (0, sa_pad)))
    # pad the λ window so every band slab [start, start+LB) is in range
    w_need = int(plan.starts.max()) + plan.LB
    if w_need > W:
        arr = jnp.pad(arr, ((0, w_need - W), (0, 0), (0, 0)))
    out = _banded_call(arr.astype(jnp.float32), plan, interpret)
    out = out[: plan.K, : S * A].reshape(plan.K, S, A)
    return jnp.transpose(out, (1, 0, 2))


@dataclass(frozen=True)
class BandPlanT:
    """Banded plan for the adjoint direction (λ'-support per λ-tile)."""

    starts: np.ndarray  # int32 [nT] λ' offset of each λ-tile's band
    wpsf_blocked: np.ndarray  # f32 [nT, TL·Bp, KB]
    K: int
    W: int
    B: int
    Bp: int
    TL: int  # λ rows per tile
    KB: int  # λ' band length


def build_band_plan_t(
    wpsf: np.ndarray, eps: float = 0.0, rel_eps: float = 0.0
) -> BandPlanT:
    """Blocked banded form of the transpose contraction
    out[l,b,·] = Σ_k wpsf[k,l,b]·y[k,·]."""
    wpsf = np.asarray(wpsf)
    K, W, B = wpsf.shape
    Bp = -(-B // 8) * 8
    TL = max(1, 128 // Bp)
    nT = -(-W // TL)

    thresh = max(eps, rel_eps * float(np.abs(wpsf).max()))
    support = np.abs(wpsf).max(axis=2) > thresh  # [K, W]
    lo = np.full(W, K, np.int64)
    hi = np.full(W, 0, np.int64)
    any_l = support.any(axis=0)
    lo[any_l] = support.argmax(axis=0)[any_l]
    hi[any_l] = K - support[::-1, :].argmax(axis=0)[any_l]

    starts = np.zeros(nT, np.int64)
    KB = 8
    for t in range(nT):
        ls = slice(t * TL, min((t + 1) * TL, W))
        s = int(lo[ls].min()) if (lo[ls] < K).any() else 0
        e = int(hi[ls].max())
        starts[t] = min(s, max(K - 1, 0))
        KB = max(KB, e - s)
    # KB is the last dim of the blocked transfer (lane axis): 128-align it
    KB = -(-KB // 128) * 128
    starts = np.minimum(starts, max(K - KB, 0))
    starts = np.maximum(starts, 0)

    blocked = np.zeros((nT, TL * Bp, KB), np.float32)
    for t in range(nT):
        s = int(starts[t])
        span = min(KB, K - s)
        ls = slice(t * TL, min((t + 1) * TL, W))
        blk = wpsf[s : s + span, ls, :]  # [span, tl, B]
        tl = blk.shape[1]
        tmp = np.zeros((TL, Bp, span))
        tmp[:tl, :B, :] = blk.transpose(1, 2, 0)
        blocked[t, :, :span] = tmp.reshape(TL * Bp, span).astype(np.float32)
    return BandPlanT(starts.astype(np.int32), blocked, K, W, B, Bp, TL, KB)


def _banded_kernel_2d(starts_ref, arr_ref, w_ref, out_ref, scratch, sem):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        arr_ref.at[pl.ds(starts_ref[i], scratch.shape[0])], scratch, sem
    )
    dma.start()
    dma.wait()
    out_ref[:] = jax.lax.dot_general(
        w_ref[0],
        scratch[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def wblur_sum_beta_t_banded(y, plan: BandPlanT, interpret: bool = False):
    """Banded Pallas transpose of `wblur_sum_beta_batched`.

    y: [S, K, A] detector blocks → out [S, W, A, B]
    (out[s,l,a,b] = Σ_k y[s,k,a]·wpsf[k,l,b])."""
    S, K, A = y.shape
    assert K == plan.K
    y2d = jnp.transpose(y, (1, 0, 2)).reshape(K, S * A)
    sa_pad = (-(S * A)) % 128
    if sa_pad:
        y2d = jnp.pad(y2d, ((0, 0), (0, sa_pad)))
    k_need = int(plan.starts.max()) + plan.KB
    if k_need > K:
        y2d = jnp.pad(y2d, ((0, k_need - K), (0, 0)))
    SA = y2d.shape[1]
    nT, M, KB = plan.wpsf_blocked.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nT,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, M, KB), lambda i, starts: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((M, SA), lambda i, starts: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((plan.KB, SA), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        _banded_kernel_2d,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nT * M, SA), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(plan.starts), y2d.astype(jnp.float32), jnp.asarray(plan.wpsf_blocked))
    out = out.reshape(nT * plan.TL, plan.Bp, SA)[: plan.W, : plan.B, : S * A]
    out = out.reshape(plan.W, plan.B, S, A)
    return jnp.transpose(out, (2, 0, 3, 1))


def wblur_sum_beta_banded_reference(windows, plan: BandPlan):
    """NumPy check implementation of the banded contraction (tests)."""
    S, W, A, B = np.shape(windows)
    nT, LBB, TK = plan.wpsf_blocked.shape
    out = np.zeros((S, nT * TK, A), np.float32)
    arr = np.transpose(np.asarray(windows), (1, 3, 0, 2)).reshape(W, B, S * A)
    if plan.Bp != B:
        arr = np.pad(arr, ((0, 0), (0, plan.Bp - B), (0, 0)))
    if int(plan.starts.max()) + plan.LB > W:
        arr = np.pad(arr, ((0, int(plan.starts.max()) + plan.LB - W), (0, 0), (0, 0)))
    for t in range(nT):
        s = int(plan.starts[t])
        x2d = arr[s : s + plan.LB].reshape(plan.LB * plan.Bp, S * A)
        blk = plan.wpsf_blocked[t].T @ x2d  # [TK, S·A]
        out[:, t * TK : (t + 1) * TK, :] = blk.reshape(TK, S, A).transpose(1, 0, 2)
    return out[:, : plan.K, :]
