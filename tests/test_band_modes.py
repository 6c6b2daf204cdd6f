"""Band kernel: substitution-matrix scoring and ends-free modes.

Round-4 capability tests: the banded strip kernel's per-strip profile
planes (``matrix[w][s2cm]`` select trees) and the ends-free extraction
machinery (zero boundaries, last-row running max, j = m column capture)
against the scalar oracle.  Everything runs the interpreted Pallas kernel
on CPU; geometry knobs (``rows``) shrink R so strip/lane boundaries are
crossed at test sizes.  The reference has neither matrices nor these modes
(``needleman-wunsch.hpp:11-13``; global-only ``serial.cpp``).
"""

import numpy as np
import pytest

from tpualign import matrices
from tpualign.config import AlignMode, ScoringConfig
from tpualign.ops import band, oracle

# interpreted-Pallas heavyweight: runs in the full tier only (see pyproject markers)
pytestmark = pytest.mark.slow

MAT = matrices.dna(2, -1, -3)
SG = AlignMode.SEMIGLOBAL
IX = AlignMode.INFIX


def random_pair(m, n, seed):
    r = np.random.default_rng(seed)
    return (
        r.integers(1, 5, m).astype(np.int8),
        r.integers(1, 5, n).astype(np.int8),
    )


def check(m, n, cfg, rows=8, seed=None):
    s1, s2 = random_pair(m, n, seed if seed is not None else m * 1000 + n)
    got = band.score(s1, s2, cfg, rows=rows, interpret=True)
    want = oracle.score(s1, s2, cfg)
    assert got == want, (cfg.mode, m, n, got, want)


@pytest.mark.parametrize("mode", [SG, IX], ids=["sg", "infix"])
@pytest.mark.parametrize("mat", [None, MAT], ids=["pair", "mat"])
@pytest.mark.parametrize("m,n", [(50, 40), (40, 50)])
def test_ends_free_small(mode, mat, m, n):
    kw = dict(mode=mode, matrix=mat, gap=-2)
    if mat is None:
        kw.update(match=2, mismatch=-1)
    check(m, n, ScoringConfig(**kw))


@pytest.mark.parametrize("mode", [AlignMode.GLOBAL, AlignMode.LOCAL],
                         ids=["nw", "sw"])
def test_matrix_classic_modes(mode):
    check(61, 44, ScoringConfig(gap=-2, matrix=MAT, mode=mode))


def test_uniform_matrix_equals_pair():
    u = matrices.uniform(2, -1)
    for mode in AlignMode:
        pair = ScoringConfig(match=2, mismatch=-1, gap=-2, mode=mode)
        mat = ScoringConfig(gap=-2, matrix=u, mode=mode)
        s1, s2 = random_pair(45, 52, 5)
        a = band.score(s1, s2, pair, rows=8, interpret=True)
        b = band.score(s1, s2, mat, rows=8, interpret=True)
        assert a == b == oracle.score(s1, s2, pair)


def test_multi_strip_ends_free_matrix():
    # strips axis > R = 256 forces the boundary-row hand-off + the
    # per-strip j = m capture reduce across strips
    check(700, 300, ScoringConfig(gap=-2, matrix=MAT, mode=SG), rows=2)


@pytest.mark.parametrize("m,n", [(700, 300), (300, 700)])
def test_infix_both_orientations(m, n):
    # infix is asymmetric: (m > n) and (m < n) land the query on the
    # strip axis vs the boundary axis (the _ends_flags swap path)
    check(m, n, ScoringConfig(match=2, mismatch=-1, gap=-2, mode=IX),
          rows=2)


@pytest.mark.parametrize("mode", [SG, IX], ids=["sg", "infix"])
def test_kstar_zero_row_on_scalar_chain(mode):
    # (n-1) % R == 0: DP row n IS the last strip's scalar top row, so the
    # last-row max rides the c0s carry instead of the vrow plane
    cfg = ScoringConfig(match=2, mismatch=-1, gap=-2, mode=mode)
    check(500, 257, cfg, rows=2)  # R = 256, two strips, k* = 0
    check(300, 1, cfg, rows=2)  # degenerate single-row strip axis


def test_matrix_int32_fallback():
    # magnitudes past the 24-bit f32 bound take the int32 value path
    # ((m + n + 2) * 65536 >= 2^24 needs m + n >= 254)
    big = matrices.uniform(65536, -65536)
    cfg = ScoringConfig(gap=-3, matrix=big, mode=SG)
    assert not band._wants_f32(cfg, 150, 120)
    check(150, 120, cfg)


def test_asymmetric_matrix_both_orientations():
    # matrix[a][b] scores s1-code a vs s2-code b; the internal orientation
    # swap must transpose it (regression: round-4 swap path)
    rows_ = [[0, -9, -9, -9, -9],
             [-9, 3, -4, 1, -6],
             [-9, -2, 3, -5, 1],
             [-9, 1, -7, 3, -4],
             [-9, -5, 2, -3, 3]]
    mat = matrices.from_rows(rows_)
    for mode in (AlignMode.GLOBAL, AlignMode.LOCAL, SG, IX):
        cfg = ScoringConfig(gap=-2, matrix=mat, mode=mode)
        check(60, 35, cfg, seed=101)  # boundary on s1 (no swap)
        check(35, 60, cfg, seed=102)  # boundary on s2 (swap + transpose)


def test_matrix_local_positive_gap_masked():
    # gap > 0 defeats the decay guarantee: the masked running max path
    cfg = ScoringConfig(gap=1, matrix=MAT, mode=AlignMode.LOCAL)
    check(40, 30, cfg)


def test_ends_free_empty_inputs():
    e = np.zeros(0, np.int8)
    s = np.asarray([1, 2, 3, 4], np.int8)
    for mode in (SG, IX):
        cfg = ScoringConfig(match=2, mismatch=-1, gap=-2, mode=mode)
        for a, b in ((e, e), (s, e), (e, s)):
            assert band.score(a, b, cfg) == oracle.score(a, b, cfg)


def test_supports_gate():
    assert band.supports(ScoringConfig(gap=-2, matrix=MAT, mode=SG))
    # any K <= 16 alphabet fits since round 5 (sentinels share code K)
    assert band.supports(ScoringConfig(gap=-2, matrix=matrices.iupac()))
    # ends-free affine gained boundary-F forms in round 5: supported too
    assert band.supports(
        ScoringConfig(match=2, mismatch=-1, gap=-2, gap_open=-4,
                      gap_extend=-1, mode=SG))


def wide_pair(m, n, k, seed, lo=1):
    r = np.random.default_rng(seed)
    return (
        r.integers(lo, k, m).astype(np.int8),
        r.integers(lo, k, n).astype(np.int8),
    )


@pytest.mark.parametrize("mode", [AlignMode.GLOBAL, AlignMode.LOCAL, SG, IX],
                         ids=["nw", "sw", "sg", "infix"])
@pytest.mark.parametrize("m,n", [(60, 35), (35, 60)])
def test_wide_alphabet_iupac16(mode, m, n):
    # K = 16 (full 4-bit pack range): live codes 0..15, both sentinels at
    # code 16 injected post-unpack / in the unpacked strip planes
    cfg = ScoringConfig(gap=-2, matrix=matrices.iupac(2, -1), mode=mode)
    s1, s2 = wide_pair(m, n, 16, 7 * m + n)
    got = band.score(s1, s2, cfg, rows=8, interpret=True)
    assert got == oracle.score(s1, s2, cfg)


def test_wide_alphabet_asymmetric_multi_strip():
    # K = 7 asymmetric matrix, multi-strip both orientations (transpose
    # rides the swap), ends-free extraction across strip boundaries
    r = np.random.default_rng(11)
    mat = matrices.from_rows(r.integers(-5, 4, (7, 7)))
    mat = tuple(tuple(row[:i] + (3,) + row[i + 1:]) for i, row in
                enumerate(mat))  # positive diagonal keeps SW interesting
    for mode in (AlignMode.GLOBAL, AlignMode.LOCAL, SG, IX):
        cfg = ScoringConfig(gap=-2, matrix=mat, mode=mode)
        for (m, n) in ((600, 280), (280, 600)):
            s1, s2 = wide_pair(m, n, 7, m + 13 * n, lo=0)
            got = band.score(s1, s2, cfg, rows=2, interpret=True)
            assert got == oracle.score(s1, s2, cfg), (mode, m, n)


def test_matrix_affine():
    # Gotoh + matrix: the profile path composes with the affine planes
    cfg = ScoringConfig(gap=-2, matrix=MAT, gap_open=-5, gap_extend=-1)
    check(55, 38, cfg)
    sw = ScoringConfig(gap=-2, matrix=MAT, gap_open=-5, gap_extend=-1,
                       mode=AlignMode.LOCAL)
    check(38, 55, sw)
