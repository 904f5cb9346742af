"""Pallas TPU kernel: composed-transpose row-gather (kept-alive prototype).

The composed window transpose is, in gather form, a fixed-fan-in
gather-weighted-sum over source rows:

    out[p, :] = Σ_{l<L} tw[p, l] · vals[tsrc[p, l], :]

(the same linear map as `bilinear.apply_composed_plan_t`, reference
adjoint semantics per cythons_files.pyx's interpolation transpose).  Every
XLA spelling of this contraction pays a slow dynamic-gather lowering
(~20× off the HBM floor at flagship scale — PERF.md "Negative results");
this kernel keeps the source block VMEM-resident and reads tap tables
from SMEM, writing contiguous output tiles with no scatter anywhere.

Status (round 4): compiles and runs on the tunneled v5e (the round-3
Mosaic HTTP-500 is gone).  Measured at flagship scale
(scripts/scatter_pallas_flagship.py, band 4a × 1 pointing): bit-exact vs
the production sorted-COO scatter and wall-time PARITY with it (7.37 vs
7.38 ms) — the op is issue-bound (per-row scalar loop: ~850k
dynamic-slice VMEM reads), not bandwidth-bound, and the vectorized fix
is the shipped banded-matmul transpose
(`bilinear.apply_composed_plan_banded_t`), which packs the same taps
into dense MXU blocks in plain XLA.  The kernel stays alive (CI
interpret tests: tests/test_scatter_pallas.py) as the escape hatch for
layouts the banded form cannot express.

Layout: λ is padded to SUB·128 lanes and each source row stored as SUB
consecutive [128]-lane rows, so one logical row is a [SUB, 128] tile
(SUB sublanes per tap instead of 1 — SUB× VPU efficiency).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


@dataclass(frozen=True)
class RowGatherPlan:
    """Static gather-form plan: per output row, ≤L (source, weight) taps.

    Tap tables are stored TRANSPOSED, [L, Pp]: SMEM windows pad the minor
    (lane) dimension to 128, so a [TP, L] layout would burn TP·128·4 B of
    SMEM per table per buffering level — at TP=512 that alone exceeds the
    1 MB SMEM (measured compile OOM on v5e).  With L on the sublane axis
    the window is [L≤8k, TP] and costs L·TP·4 B.
    """

    tsrc: np.ndarray  # int32 [L, Pp] source row index, PRE-SCALED by SUB
    tw: np.ndarray  # f32 [L, Pp] tap weights (0 beyond the row's fan-in)
    P: int  # true output row count (padded to Pp = ceil(P/TP)·TP)
    n_src: int  # source row count
    W: int  # payload width (λ); padded to SUB·128
    SUB: int  # 128-lane chunks per logical row
    TP: int  # output rows per grid block
    UNROLL: int  # rows accumulated together per loop step (ILP)

    @property
    def Pp(self) -> int:
        return self.tsrc.shape[1]

    @property
    def L(self) -> int:
        return self.tsrc.shape[0]

    @property
    def Wp(self) -> int:
        return self.SUB * LANES

    @property
    def vmem_vals_bytes(self) -> int:
        """The source block is held fully VMEM-resident per program."""
        return self.n_src * self.Wp * 4


def build_row_gather_plan(
    csrc: np.ndarray,
    cw: np.ndarray,
    cdst: np.ndarray,
    n_dst: int,
    n_src: int,
    W: int,
    tp: int = 512,
    unroll: int = 4,
) -> RowGatherPlan:
    """COO taps (src row, weight, dst row) → padded gather-form [Pp, L] tables.

    Same host prep as the flagship prototype (scripts/scatter_pallas_proto.py);
    taps must be sorted by destination (the `bilinear` composed stacks are).
    """
    csrc = np.asarray(csrc, np.int64)
    cw = np.asarray(cw, np.float64)
    cdst = np.asarray(cdst, np.int64)
    nz = cw != 0
    csrc, cw, cdst = csrc[nz], cw[nz], cdst[nz]
    order = np.argsort(cdst, kind="stable")
    csrc, cw, cdst = csrc[order], cw[order], cdst[order]

    seg = np.bincount(cdst, minlength=n_dst)
    L = max(int(seg.max()) if seg.size else 1, 1)
    starts = np.concatenate([[0], np.cumsum(seg)])
    tp = max(tp - tp % unroll, unroll)
    Pp = -(-n_dst // tp) * tp
    SUB = max(-(-W // LANES), 1)
    tsrc = np.zeros((Pp, L), np.int32)
    tw = np.zeros((Pp, L), np.float32)
    for k in range(L):
        has = seg > k
        tsrc[:n_dst][has, k] = csrc[starts[:-1][has] + k]
        tw[:n_dst][has, k] = cw[starts[:-1][has] + k]
    # pre-scale on host: a tap's VMEM address is then a plain SMEM read;
    # transpose so L rides the (unpadded) sublane axis in SMEM
    return RowGatherPlan(
        np.ascontiguousarray((tsrc * SUB).T),
        np.ascontiguousarray(tw.T),
        n_dst, n_src, W, SUB, tp, unroll,
    )


def pack_vals(vals: np.ndarray | jnp.ndarray, plan: RowGatherPlan):
    """[n_src, W] → [n_src·SUB, 128] f32 (λ padded to SUB·128 lanes)."""
    vals = jnp.asarray(vals, jnp.float32)
    n_src, W = vals.shape
    assert n_src == plan.n_src and W == plan.W
    pad = plan.Wp - W
    if pad:
        vals = jnp.pad(vals, ((0, 0), (0, pad)))
    return vals.reshape(n_src * plan.SUB, LANES)


def _make_kernel(L: int, SUB: int, TP: int, UNROLL: int):
    def kernel(tsrc_ref, tw_ref, vals_ref, out_ref):
        def rows(g, carry):
            p0 = g * UNROLL
            accs = []
            for u in range(UNROLL):
                p = p0 + u
                accs.append(
                    tw_ref[0, p] * vals_ref[pl.ds(tsrc_ref[0, p], SUB), :]
                )
            for l in range(1, L):
                for u in range(UNROLL):
                    p = p0 + u
                    accs[u] = accs[u] + tw_ref[l, p] * vals_ref[
                        pl.ds(tsrc_ref[l, p], SUB), :
                    ]
            for u in range(UNROLL):
                out_ref[pl.ds((p0 + u) * SUB, SUB), :] = accs[u]
            return carry

        jax.lax.fori_loop(0, TP // UNROLL, rows, 0)

    return kernel


def gather_rows_pallas(
    vals, plan: RowGatherPlan, interpret: bool = False
) -> jnp.ndarray:
    """out[p, :] = Σ_l tw[p,l] · vals[tsrc[p,l], :]  →  [P, W] f32.

    `vals` is [n_src, W] (packed internally via `pack_vals`).
    """
    v3 = pack_vals(vals, plan)
    nblocks = plan.Pp // plan.TP
    out = pl.pallas_call(
        _make_kernel(plan.L, plan.SUB, plan.TP, plan.UNROLL),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((plan.L, plan.TP), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((plan.L, plan.TP), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((plan.n_src * plan.SUB, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((plan.TP * plan.SUB, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((plan.Pp * plan.SUB, LANES),
                                       jnp.float32),
        interpret=interpret,
    )(jnp.asarray(plan.tsrc), jnp.asarray(plan.tw), v3)
    return out.reshape(plan.Pp, plan.Wp)[: plan.P, : plan.W]


def gather_rows_reference(vals: np.ndarray, plan: RowGatherPlan) -> np.ndarray:
    """NumPy oracle of the same contraction (tests)."""
    vals = np.asarray(vals, np.float64)
    tsrc = plan.tsrc.T[: plan.P] // plan.SUB
    tw = plan.tw.T[: plan.P].astype(np.float64)
    out = np.einsum("pl,plw->pw", tw, vals[tsrc])
    return out.astype(np.float32)
