"""Banded strip kernel (ops/band.py) vs the oracle.

The analog of the reference's cross-implementation score agreement (SURVEY.md
§4): every case runs the interpreted Pallas kernel against the scalar DP
oracle.  Strip/lane geometry cases use rows=8 (R = 1024) so multi-strip and
multi-lane hand-offs are exercised at test-size inputs.
"""

import numpy as np
import pytest

from tpualign.config import AlignMode, ScoringConfig
from tpualign.ops import band, oracle

# interpreted-Pallas heavyweight: runs in the full tier only (see pyproject markers)
pytestmark = pytest.mark.slow

UNIT = ScoringConfig()
SW = ScoringConfig(match=2, mismatch=-1, gap=-2, mode=AlignMode.LOCAL)


def random_pair(m, n, seed):
    r = np.random.default_rng(seed)
    return (
        r.integers(1, 5, m).astype(np.int8),
        r.integers(1, 5, n).astype(np.int8),
    )


@pytest.mark.parametrize(
    "m,n,cfg",
    [
        (30, 20, UNIT),
        (57, 40, ScoringConfig(match=3, mismatch=-2, gap=-4)),
        (40, 57, ScoringConfig(match=2, mismatch=1, gap=-2)),
        (1, 1, UNIT),
        (1, 300, UNIT),
        (300, 1, ScoringConfig(match=5, mismatch=-3, gap=-1)),
    ],
)
def test_nw_small(m, n, cfg):
    s1, s2 = random_pair(m, n, m * 1000 + n)
    assert band.score(s1, s2, cfg, rows=8, interpret=True) == oracle.score(
        s1, s2, cfg
    )


def test_multi_lane_handoff():
    # n > NR crosses lane columns: the aged lane-roll hand-off path
    s1, s2 = random_pair(100, 40, 1)
    assert band.score(s1, s2, UNIT, rows=8, interpret=True) == oracle.score(
        s1, s2, UNIT
    )


@pytest.mark.parametrize("n", [1500, 2200])
def test_multi_strip_boundary_row(n):
    # n > R = 1024 forces strips coupled through the SMEM boundary row
    s1, s2 = random_pair(60, n, n)
    cfg = ScoringConfig(match=2, mismatch=0, gap=-3)
    assert band.score(s1, s2, cfg, rows=8, interpret=True) == oracle.score(
        s1, s2, cfg
    )


def test_swap_orientation():
    # strips land on s1 via the internal swap (score is symmetric)
    s1, s2 = random_pair(1500, 60, 3)
    assert band.score(s1, s2, UNIT, rows=8, interpret=True) == oracle.score(
        s1, s2, UNIT
    )


@pytest.mark.parametrize(
    "m,n",
    [(50, 30), (80, 200), (40, 1300)],
)
def test_smith_waterman(m, n):
    s1, s2 = random_pair(m, n, m + n)
    assert band.score(s1, s2, SW, rows=8, interpret=True) == oracle.score(
        s1, s2, SW
    )


def test_sw_no_positive_cell():
    # all-mismatch pair: the empty local alignment (score 0) must win
    s1 = np.full(40, 1, np.int8)
    s2 = np.full(40, 2, np.int8)
    cfg = ScoringConfig(match=1, mismatch=-5, gap=-5, mode=AlignMode.LOCAL)
    assert band.score(s1, s2, cfg, rows=8, interpret=True) == 0


def test_empty_inputs():
    s1, s2 = random_pair(10, 10, 0)
    empty = np.empty(0, np.int8)
    assert band.score(empty, s2, UNIT) == -10
    assert band.score(s1, empty, UNIT) == -10
    assert band.score(empty, s2, SW) == 0


def test_fuzz_vs_oracle():
    rng = np.random.default_rng(7)
    for trial in range(12):
        m = int(rng.integers(1, 260))
        n = int(rng.integers(1, 260))
        cfg = ScoringConfig(
            match=int(rng.integers(1, 6)),
            mismatch=int(rng.integers(-4, 3)),
            gap=int(rng.integers(-5, 0)),
            mode=AlignMode.LOCAL if trial % 3 == 0 else AlignMode.GLOBAL,
        )
        s1, s2 = random_pair(m, n, 9000 + trial)
        got = band.score(s1, s2, cfg, rows=8, interpret=True)
        want = oracle.score(s1, s2, cfg)
        assert got == want, (trial, m, n, cfg, got, want)


def test_envelope_guard():
    s1, s2 = random_pair(4, 4, 0)
    with pytest.raises(ValueError):
        band._orient(band.MAX_BOUNDARY + 1, band.MAX_BOUNDARY + 1)


def test_int32_fallback_path():
    # weights big enough that the score bound exceeds float32's 24-bit
    # integer exactness: the kernel must take the int32 value path
    cfg = ScoringConfig(match=200_000, mismatch=-90_000, gap=-80_000)
    s1, s2 = random_pair(90, 70, 11)
    assert not band._wants_f32(cfg, 90, 70)
    assert band.score(s1, s2, cfg, rows=8, interpret=True) == oracle.score(
        s1, s2, cfg
    )


def test_sw_positive_mismatch_masked_path():
    # mismatch > 0 disables the unmasked running max; the masked branch
    # must still agree with the oracle
    cfg = ScoringConfig(match=3, mismatch=1, gap=-2, mode=AlignMode.LOCAL)
    s1, s2 = random_pair(120, 300, 13)
    assert band.score(s1, s2, cfg, rows=8, interpret=True) == oracle.score(
        s1, s2, cfg
    )
