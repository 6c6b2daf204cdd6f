"""Hirschberg bisection: alignment optimality and validity vs the oracle.

The invariant is optimality, not tie order: the recovered alignment must (a)
reduce to the original sequences when gaps are stripped, and (b) score
exactly the DP optimum (co-optimal paths may differ from the oracle's
diag>up>left string)."""

import numpy as np
import pytest

from tpualign.config import ScoringConfig
from tpualign.io.bdna import BASES, random_pair
from tpualign.ops import hirschberg, oracle

# interpreted-Pallas heavyweight: runs in the full tier only (see pyproject markers)
pytestmark = pytest.mark.slow

UNIT = ScoringConfig()


def _strip(a: str) -> str:
    return a.replace("-", "")


def _decode(seq) -> str:
    return "".join(BASES[int(c)] for c in np.asarray(seq))


def _check(m, n, seed, cfg=UNIT, base_cells=512):
    s1, s2 = random_pair(m, n, seed=seed)
    sc, a1, a2 = hirschberg.align(
        s1, s2, cfg, interpret=True, base_cells=base_cells
    )
    assert len(a1) == len(a2)
    assert _strip(a1) == _decode(s1)
    assert _strip(a2) == _decode(s2)
    assert not any(x == "-" and y == "-" for x, y in zip(a1, a2))
    want = oracle.score(s1, s2, cfg)
    assert sc == want, (m, n, seed, sc, want)


@pytest.mark.parametrize(
    "m,n", [(8, 8), (40, 37), (64, 100), (150, 90), (200, 210)]
)
def test_optimal_and_valid(m, n):
    _check(m, n, seed=m + n)


def test_deep_recursion_tiny_base():
    # force several bisection levels
    _check(120, 130, seed=1, base_cells=64)


def test_scaled_scoring():
    _check(90, 80, seed=2, cfg=ScoringConfig(match=3, mismatch=0, gap=-3))


def test_degenerate_lengths():
    _check(1, 50, seed=3)
    _check(50, 1, seed=4)


def test_matches_exact_traceback_score():
    from tpualign.ops import traceback_diag  # noqa: F401  (parity neighbor)

    s1, s2 = random_pair(70, 75, seed=5)
    sc, a1, a2 = hirschberg.align(s1, s2, UNIT, interpret=True, base_cells=128)
    want_sc, w1, w2 = oracle.traceback(s1, s2, UNIT)
    assert sc == want_sc
    assert oracle.alignment_score(w1, w2, UNIT) == want_sc


def test_unsupported_cfg():
    s1, s2 = random_pair(10, 10, seed=0)
    with pytest.raises(ValueError):
        hirschberg.align(s1, s2, ScoringConfig(match=1, mismatch=1, gap=-1))


def test_generalized_gap_alignment():
    # g=2 and g=3 families route through the generalized chunk kernel
    for cfg in (ScoringConfig(gap=-2), ScoringConfig(match=3, mismatch=2, gap=-1)):
        _check(130, 140, seed=11, cfg=cfg, base_cells=256)


@pytest.mark.parametrize("m,n", [(400, 12), (12, 400), (350, 31)])
def test_extreme_aspect_ratios(m, n):
    _check(m, n, seed=m * 7 + n, base_cells=256)


def test_kway_row_split(monkeypatch):
    # force the k-way splitter (normally >= 8k rows) onto a test-sized pair:
    # one dispatch yields many crossing rows, incl. the delta = n mod 31
    # bridge between the forward and reverse capture grids
    monkeypatch.setattr(hirschberg, "KWAY_MIN_ROWS", 1200)
    monkeypatch.setattr(hirschberg, "KWAY_LEAF_ROWS", 310)
    _check(90, 1300, seed=99, base_cells=4096)


def test_kway_bridge_free(monkeypatch):
    # n = 0 mod 31: the forward/reverse grids coincide (no bridge rows)
    monkeypatch.setattr(hirschberg, "KWAY_MIN_ROWS", 1200)
    monkeypatch.setattr(hirschberg, "KWAY_LEAF_ROWS", 310)
    _check(80, 31 * 42, seed=17, base_cells=4096)


def test_sharded_alignment_8dev_mesh():
    # verdict r1 item #5: bit-exact alignment recovery with the column
    # scores computed by the multi-chip word-band pipeline (8-device
    # virtual mesh)
    from tpualign.parallel.mesh import make_mesh

    s1, s2 = random_pair(220, 400, seed=12)
    sc, a1, a2 = hirschberg.align_sharded(
        s1, s2, UNIT, mesh=make_mesh(8), chunk_cols=64, interpret=True,
        base_cells=10_000,
    )
    assert sc == oracle.score(s1, s2, UNIT)
    assert _strip(a1) == _decode(s1)
    assert _strip(a2) == _decode(s2)


def test_sharded_compile_count_bounded(monkeypatch):
    # verdict r2 item #6: the sharded bisection's solver builds must be
    # O(log nodes), not O(nodes) — text lengths come from exact halving
    # ({floor,ceil}(m0/2^k)) and query lengths land in 1/8-octave buckets
    from tpualign.parallel import bitpal_strips
    from tpualign.parallel.mesh import make_mesh

    keys = []
    real = bitpal_strips.col_deltas_fn

    def counting(m, n, *a, **kw):
        keys.append((m, n))
        return real(m, n, *a, **kw)

    monkeypatch.setattr(bitpal_strips, "col_deltas_fn", counting)
    s1, s2 = random_pair(512, 480, seed=5)
    sc, a1, a2 = hirschberg.align_sharded(
        s1, s2, UNIT, mesh=make_mesh(4), chunk_cols=64, interpret=True,
        base_cells=1024,
    )
    assert sc == oracle.score(s1, s2, UNIT)
    assert _strip(a1) == _decode(s1)
    # ~60+ split-node col_scores calls land on a handful of solver shapes
    assert len(keys) == len(set(keys)), "solver cache missed a repeat key"
    assert len(set(keys)) <= 24, sorted(set(keys))
