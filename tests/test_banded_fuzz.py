"""Seeded geometry fuzz of the banded-transpose builders.

`banded_from_coo` / `banded_cat_from_stack` are exercised elsewhere only
through plans built from real instrument geometry; this fuzz drives them
with adversarial random COO maps — duplicate taps per destination,
destinations with no taps, empty and heavy non-local tails, single-block
and padded-block shapes — and checks the exact-transpose contract
against a plain np.add.at oracle in float64.
"""

import numpy as np
import pytest

from surfh_tpu.core import bilinear


def _random_coo(rng, n_src, n_dst, n_taps, local_frac):
    """COO triples with a controllable local/non-local split: 'local'
    taps read sources near a destination-correlated position (what the
    banded blocks exploit); the rest are uniform (the tail)."""
    cdst = np.sort(rng.integers(0, n_dst, n_taps))
    base = (cdst / max(n_dst - 1, 1) * (n_src - 1)).astype(np.int64)
    local = rng.random(n_taps) < local_frac
    csrc = np.where(
        local,
        np.clip(base + rng.integers(-5, 6, n_taps), 0, n_src - 1),
        rng.integers(0, n_src, n_taps),
    )
    cw = rng.standard_normal(n_taps)
    cw[rng.random(n_taps) < 0.05] = 0.0  # dropped-tap path
    return csrc, cw, cdst


def _oracle(csrc, cw, cdst, values, n_patch):
    """values [W, n_out] → patch [W, n_patch] by plain scatter-add."""
    out = np.zeros((values.shape[0], n_patch))
    np.add.at(out.T, cdst, values.T[csrc] * cw[:, None])
    return out


@pytest.mark.parametrize("seed,local_frac,n_taps", [
    (0, 0.97, 4000),   # realistic: almost-all-local
    (1, 0.5, 4000),    # heavy non-local tail
    (2, 1.0, 4000),    # EMPTY tail (osrc placeholder path)
    (3, 0.9, 37),      # tiny: single partial block
    (4, 0.0, 1000),    # fully non-local (degenerate banded blocks)
])
def test_banded_from_coo_fuzz(seed, local_frac, n_taps):
    rng = np.random.default_rng(seed)
    n_src, n_patch, W = 512, 300, 7
    csrc, cw, cdst = _random_coo(rng, n_src, n_patch, n_taps, local_frac)
    plan = bilinear.banded_from_coo(csrc, cw, cdst, n_patch, n_src,
                                    tb=64, sw=96)
    values = rng.standard_normal((W, n_src))
    got = np.asarray(
        bilinear.apply_composed_plan_banded_t(*plan, values))
    want = _oracle(csrc, cw, cdst, values, n_patch)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12 *
                               max(np.abs(want).max(), 1.0))


@pytest.mark.parametrize("seed,P", [(5, 2), (6, 4)])
def test_banded_cat_from_stack_fuzz(seed, P):
    """The pointing-concatenated spelling sums P independent random maps;
    matches P oracle applications summed, including with non-finite
    values in the data (padding must stay on the discarded zero row)."""
    rng = np.random.default_rng(seed)
    n_src, n_patch, W = 256, 200, 5
    coos, raws = [], []
    for _ in range(P):
        coo = _random_coo(rng, n_src, n_patch, 1500, 0.9)
        coos.append(coo)
        raws.append(bilinear.banded_from_coo(*coo, n_patch, n_src,
                                             tb=64, sw=96))
    nb_max = max(r[2].shape[0] for r in raws)
    k_max = max(r[3].shape[0] for r in raws)
    parts = [[] for _ in range(6)]
    for coo, r in zip(coos, raws):
        if r[2].shape[0] < nb_max:
            r = bilinear.banded_from_coo(*coo, n_patch, n_src,
                                         tb=64, sw=96, nb_total=nb_max)
        linv, idx, wb, osrc, ow, odst = r
        pad = k_max - osrc.shape[0]
        parts[0].append(linv)
        parts[1].append(idx)
        parts[2].append(wb)
        parts[3].append(np.pad(osrc, (0, pad)))
        parts[4].append(np.pad(ow, (0, pad)))
        parts[5].append(np.pad(odst, (0, pad),
                               constant_values=nb_max * 64))
    stack = tuple(np.stack(p) for p in parts)
    cat = bilinear.banded_cat_from_stack(*stack, n_src)

    values = rng.standard_normal((P, W, n_src))
    got = np.asarray(bilinear.apply_composed_plan_banded_cat_t(
        *cat, values))
    want = sum(_oracle(*coo, values[p], n_patch)
               for p, coo in enumerate(coos))
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=1e-12 * np.abs(want).max())
    # Non-finite semantics note: the whole banded family (per-pointing
    # and cat alike) propagates NaN BLOCK-wise — a dense [tb, sw] weight
    # block multiplies every source row its window covers, so 0 x NaN
    # contaminates all destinations of a covering block, not just actual
    # taps.  That is inherent to the dense-window matmul respelling (mask
    # non-finite data upstream, as the real pipeline does); the cat
    # builder additionally keeps its padding on the discarded zero row so
    # it introduces no EXTRA cross-pointing leak path.
