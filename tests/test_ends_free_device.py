"""Round-5 device paths for matrix / ends-free alignment.

The round-4 ``ends_free.align_large`` located end/start cells with the
native C++ serial scanner (minutes at corpus scale); round 5 moves the
locate passes and the matrix-global core recovery onto the band strip
machinery (``band_align.locate_flex_device`` / ``align_global`` with
profile planes).  These tests run the interpreted kernels on CPU and pin
them against the native scanner and the oracle.  The reference computes
no alignment in any mode (``driver.cpp:35``).
"""

import numpy as np
import pytest

from tpualign.config import AlignMode, EngineConfig, ScoringConfig
from tpualign.matrices import dna
from tpualign.ops import band_align, ends_free, oracle
from tpualign.utils import native

# interpreted-Pallas heavyweight: runs in the full tier only (see pyproject markers)
pytestmark = pytest.mark.slow

MAT = dna(2, -1, -3)
SG, IX = AlignMode.SEMIGLOBAL, AlignMode.INFIX


def pair(m, n, seed):
    r = np.random.default_rng(seed)
    return (r.integers(1, 5, m).astype(np.int8),
            r.integers(1, 5, n).astype(np.int8))


def _cfg(mode, mat):
    kw = dict(mode=mode, gap=-2)
    if mat is None:
        kw.update(match=2, mismatch=-1)
    else:
        kw["matrix"] = mat
    return ScoringConfig(**kw)


def test_align_global_matrix_kway():
    # multi-strip k-way recovery with substitution profile planes and the
    # matrix-aware native leaf walks
    s1, s2 = pair(600, 700, 1)
    cfg = ScoringConfig(gap=-2, matrix=MAT)
    sc, a1, a2 = band_align.align_global(s1, s2, cfg, rows=2,
                                         interpret=True)
    want = oracle.score(s1, s2, cfg)
    assert sc == want
    assert oracle.alignment_score(a1, a2, cfg) == want
    assert a1.replace("-", "") == "".join("-ATGC"[c] for c in s1)
    assert a2.replace("-", "") == "".join("-ATGC"[c] for c in s2)


@pytest.mark.parametrize("mode", [SG, IX], ids=["sg", "infix"])
@pytest.mark.parametrize("mat", [None, MAT], ids=["pair", "mat"])
@pytest.mark.parametrize("m,n", [(300, 700), (700, 300)])
def test_locate_device_matches_native(mode, mat, m, n):
    # forward end-locate and anchored start-locate: cell-exact parity with
    # the native scanner's argmax conventions (multi-strip, rows=2)
    cfg = _cfg(mode, mat)
    s1, s2 = pair(m, n, m * 7 + n)
    got = band_align.locate_flex_device(s1, s2, cfg, rows=2, interpret=True)
    assert got == native.locate_flex(s1, s2, cfg)
    r1, r2 = s1[::-1].copy(), s2[::-1].copy()
    ga = band_align.locate_flex_device(r1, r2, cfg, anchored=True, rows=2,
                                       interpret=True)
    assert ga == native.locate_flex(r1, r2, cfg, anchored=True)


@pytest.mark.parametrize(
    "mode", [SG, IX, AlignMode.LOCAL, AlignMode.GLOBAL],
    ids=["sg", "infix", "sw", "nw"])
@pytest.mark.parametrize("mat", [None, MAT], ids=["pair", "mat"])
def test_align_large_device_path(mode, mat, monkeypatch):
    # the full align_large reduction through the device (interpreted)
    # locate + core machinery; LEAF_CELLS shrunk so small pairs take it
    if mat is None and mode is AlignMode.GLOBAL:
        pytest.skip("plain global pair scoring routes through api.align")
    monkeypatch.setattr(ends_free, "LEAF_CELLS", 2000)
    cfg = _cfg(mode, mat)
    s1, s2 = pair(160, 140, 99)
    sc, a1, a2 = ends_free.align_large(s1, s2, cfg, EngineConfig(interpret=True))
    assert sc == oracle.score(s1, s2, cfg)
    if a1:  # returned strings cover the aligned core, scored as global
        gcfg = cfg.with_mode(AlignMode.GLOBAL)
        assert oracle.alignment_score(a1, a2, gcfg) == sc


def test_align_global_wide_alphabet():
    # K = 16 alignment end to end: strip-kernel profile planes at the full
    # 4-bit code range, matrix-aware native leaf walks, 16-symbol BASES
    from tpualign.matrices import iupac

    r = np.random.default_rng(41)
    s1 = r.integers(1, 16, 600).astype(np.int8)
    s2 = r.integers(1, 16, 650).astype(np.int8)
    cfg = ScoringConfig(gap=-2, matrix=iupac(2, -1))
    sc, a1, a2 = band_align.align_global(s1, s2, cfg, rows=2,
                                         interpret=True)
    assert sc == oracle.score(s1, s2, cfg)
    assert oracle.alignment_score(a1, a2, cfg) == sc


def test_align_local_matrix():
    # matrix-SW on the band locate + k-way machinery
    s1, s2 = pair(650, 600, 4)
    cfg = ScoringConfig(gap=-2, matrix=MAT, mode=AlignMode.LOCAL)
    sc, a1, a2 = band_align.align_local(s1, s2, cfg, rows=2, interpret=True)
    assert sc == oracle.score(s1, s2, cfg)
    gcfg = ScoringConfig(gap=-2, matrix=MAT)
    assert oracle.alignment_score(a1, a2, gcfg) == sc


def test_tiny_n_matrix_leaf_no_full_table():
    # ADVICE r4: an n <= 2 leaf with huge m must not allocate an O(m)-GB
    # table — the transposed recursion splits the long axis instead
    r = np.random.default_rng(3)
    s1 = r.integers(1, 5, 3000).astype(np.int8)
    s2 = r.integers(1, 5, 2).astype(np.int8)
    cfg = ScoringConfig(gap=-2, matrix=MAT)
    old = ends_free.LEAF_CELLS
    try:
        ends_free.LEAF_CELLS = 500  # force the bisection machinery
        a1, a2 = ends_free._align_global_matrix(s1, s2, cfg)
    finally:
        ends_free.LEAF_CELLS = old
    assert oracle.alignment_score(a1, a2, cfg) == oracle.score(s1, s2, cfg)
