"""K-way band alignment (ops/band_align.py) vs the oracle.

Covers the NW double-fill crossing machinery (forward strips + bottom-aligned
reverse strips), the SW locate-and-walk passes, orientation swaps, and the
native local traceback parity that the SW window walk depends on.
"""

import numpy as np
import pytest

from tpualign.config import AlignMode, ScoringConfig
from tpualign.ops import band_align, oracle

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
        (300, 2600, ScoringConfig()),
        (900, 5000, ScoringConfig(match=3, mismatch=-2, gap=-4)),
        (500, 3000, ScoringConfig(match=2, mismatch=1, gap=-2)),
    ],
)
def test_nw_kway(m, n, cfg):
    s1, s2 = random_pair(m, n, m + n)
    sc, a1, a2 = band_align.align_global(s1, s2, cfg, rows=8, interpret=True)
    assert sc == oracle.score(s1, s2, cfg)
    assert oracle.alignment_score(a1, a2, cfg) == sc
    # the strings reproduce the inputs when gaps are removed
    assert a1.replace("-", "") == "".join("-ATGC"[c] for c in s1)
    assert a2.replace("-", "") == "".join("-ATGC"[c] for c in s2)


def test_nw_kway_swapped_orientation():
    # m > n: align_global recurses with swapped arguments
    s1, s2 = random_pair(2600, 300, 5)
    pushed = band_align.MAX_BOUNDARY
    try:
        band_align.MAX_BOUNDARY = 1000  # force the swap path at test size
        sc, a1, a2 = band_align.align_global(
            s1, s2, ScoringConfig(), rows=8, interpret=True
        )
    finally:
        band_align.MAX_BOUNDARY = pushed
    assert sc == oracle.score(s1, s2, ScoringConfig())
    assert oracle.alignment_score(a1, a2, ScoringConfig()) == sc


@pytest.mark.parametrize("m,n,seed", [(300, 2600, 9), (900, 5000, 11)])
def test_sw_locate_walk(m, n, seed):
    s1, s2 = random_pair(m, n, seed)
    sc, a1, a2 = band_align.align_local(s1, s2, SW, rows=8, interpret=True)
    assert sc == oracle.score(s1, s2, SW)
    # local strings are a genuine alignment of substrings scoring sc
    assert oracle.alignment_score(a1, a2, SW) >= sc  # no internal zeros hit
    assert "-ATGC"[0] not in (a1[:1], a2[:1]) or sc == 0


def test_sw_small_direct():
    s1, s2 = random_pair(40, 60, 2)
    assert band_align.align_local(s1, s2, SW, interpret=True)[
        0
    ] == oracle.score(s1, s2, SW)


def test_sw_rejects_masked_configs():
    s1, s2 = random_pair(40, 60, 2)
    bad = ScoringConfig(match=2, mismatch=1, gap=-1, mode=AlignMode.LOCAL)
    with pytest.raises(ValueError):
        band_align.align_local(s1, s2, bad)


def test_native_local_traceback_matches_oracle():
    from tpualign.utils import native

    if not native.available():
        pytest.skip("no native toolchain")
    r = np.random.default_rng(5)
    for t in range(15):
        m = int(r.integers(1, 100))
        n = int(r.integers(1, 100))
        s1 = r.integers(1, 5, m).astype(np.int8)
        s2 = r.integers(1, 5, n).astype(np.int8)
        assert native.traceback(s1, s2, SW) == oracle.traceback(s1, s2, SW)


def test_rowscan_np_matches_oracle_rows():
    s1, s2 = random_pair(80, 50, 7)
    # brute rows
    H = np.zeros((51, 81), np.int64)
    for i in range(1, 51):
        for j in range(1, 81):
            H[i, j] = max(
                H[i - 1, j - 1] + (2 if s1[j - 1] == s2[i - 1] else -1),
                H[i - 1, j] - 2,
                H[i, j - 1] - 2,
                0,
            )
    row = band_align._rowscan_np(np.zeros(81, np.int64), s1, s2, SW)
    assert np.array_equal(row, H[50])
