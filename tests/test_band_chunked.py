"""Column-block chunked band scorer (ops/band_chunked.py) vs the oracle.

The chunked driver lifts ``band.MAX_BOUNDARY`` — the SMEM cap on the
boundary-row axis — by scanning column blocks coupled through captured /
injected boundary COLUMNS (the analog of the reference's cache-blocked fill,
``blocked-serial.cpp:42-48``, but against SMEM capacity instead of L2).
Every case runs the interpreted Pallas kernel against the scalar oracle at
tiny block geometry so multi-block hand-offs dominate; multi-strip cases
couple the SMEM boundary ROW inside each block as well.
"""

import numpy as np
import pytest

from tpualign.config import AlignMode, ScoringConfig
from tpualign.ops import band_chunked, oracle

# interpreted-Pallas heavyweight: runs in the full tier only (see pyproject markers)
pytestmark = pytest.mark.slow

UNIT = ScoringConfig()
GEN = ScoringConfig(match=2, mismatch=-3, gap=-4)
SW = ScoringConfig(match=3, mismatch=-2, gap=-1, mode=AlignMode.LOCAL)


def random_pair(m, n, seed, lo=0):
    # lo=0 includes the gap code 0: pad text columns (sentinel 6) must
    # never match it
    r = np.random.default_rng(seed)
    return (
        r.integers(lo, 5, m).astype(np.int8),
        r.integers(lo, 5, n).astype(np.int8),
    )


@pytest.mark.parametrize("cfg", [UNIT, GEN, SW], ids=["unit", "gen", "sw"])
@pytest.mark.parametrize(
    "m,n,block,rows",
    [
        (500, 600, 128, 2),  # swap path (n > m), 5 blocks x 2 strips
        (300, 700, 128, 3),  # swap, 6 ragged blocks, bottom-aligned strip
        (650, 200, 256, 2),  # no swap, ragged final block
    ],
)
def test_multi_block_vs_oracle(m, n, block, rows, cfg):
    s1, s2 = random_pair(m, n, m * 1000 + n)
    got = band_chunked.score(s1, s2, cfg, rows=rows, block=block,
                             interpret=True)
    assert got == oracle.score(s1, s2, cfg)


def test_single_block_degenerates_to_band():
    # block >= m: one block, pure strip scan — must still be exact
    s1, s2 = random_pair(260, 300, 7)
    got = band_chunked.score(s1, s2, GEN, rows=2, block=264, interpret=True)
    assert got == oracle.score(s1, s2, GEN)


@pytest.mark.parametrize(
    "mode", [AlignMode.GLOBAL, AlignMode.LOCAL, AlignMode.SEMIGLOBAL,
             AlignMode.INFIX], ids=["nw", "sw", "sg", "infix"])
@pytest.mark.parametrize("mat", [False, True], ids=["pair", "mat"])
@pytest.mark.parametrize("m,n", [(700, 520), (520, 700)])
def test_chunked_modes(mode, mat, m, n):
    # round-5 composition: matrix scoring and the ends-free modes across
    # block boundaries — per-block last-row folds, the final block's
    # true-column capture feeding the last-column extraction
    from tpualign import matrices

    kw = dict(mode=mode, gap=-2)
    if mat:
        kw["matrix"] = matrices.dna(2, -1, -3)
    else:
        kw.update(match=2, mismatch=-1)
    cfg = ScoringConfig(**kw)
    s1, s2 = random_pair(m, n, m + n, lo=1)
    got = band_chunked.score(s1, s2, cfg, rows=2, block=256, interpret=True)
    assert got == oracle.score(s1, s2, cfg)


@pytest.mark.parametrize(
    "mode", [AlignMode.GLOBAL, AlignMode.LOCAL, AlignMode.SEMIGLOBAL,
             AlignMode.INFIX], ids=["nw", "sw", "sg", "infix"])
@pytest.mark.parametrize("mat", [False, True], ids=["pair", "mat"])
def test_chunked_affine_modes(mode, mat):
    # round 5: Gotoh gaps across block boundaries — the E (left-gap) chain
    # crosses blocks through captured/injected E columns, the F (up-gap)
    # chain crosses strips through a second SMEM boundary row
    from tpualign import matrices

    kw = dict(mode=mode, gap_open=-5, gap_extend=-2, gap=-2)
    if mat:
        kw["matrix"] = matrices.dna(2, -1, -3)
    else:
        kw.update(match=2, mismatch=-1)
    cfg = ScoringConfig(**kw)
    # orientation alternates across the parametrization (both swap paths
    # covered without doubling the interpreted-kernel wall)
    m, n = (300, 260) if mat == (mode.value in ("nw", "sg")) else (260, 300)
    s1, s2 = random_pair(m, n, m + n, lo=1)
    got = band_chunked.score(s1, s2, cfg, rows=2, block=96,
                             interpret=True)
    assert got == oracle.score(s1, s2, cfg), (mode, mat, m, n)


def test_sw_max_in_middle_block():
    # the SW running max must survive blocks after the one that set it:
    # plant a strong match region in an early block, then noise
    r = np.random.default_rng(11)
    s1 = r.integers(1, 5, 520).astype(np.int8)
    s2 = r.integers(1, 5, 300).astype(np.int8)
    s1[140:170] = s2[40:70]  # block 1 of 4 (block=128) holds the max
    got = band_chunked.score(s1, s2, SW, rows=2, block=128, interpret=True)
    assert got == oracle.score(s1, s2, SW)


def test_sg_last_column_ragged_final_block():
    # regression (400k silicon native gate): captures in a RAGGED final
    # block fire at t = m_rem + phase, which can precede the static
    # block-width capture gate — the last-column extraction then silently
    # missed early rows.  Overlap pair: s1's suffix matches s2's prefix
    # (disjoint alphabets elsewhere), so the sg optimum sits on the last
    # column at a small row index whose capture fires earliest.
    r = np.random.default_rng(13)
    s1 = r.integers(1, 3, 808).astype(np.int8)   # codes {1, 2}
    s2 = r.integers(3, 5, 700).astype(np.int8)   # codes {3, 4}
    s2[:50] = s1[-50:]  # the overlap
    cfg = ScoringConfig(match=2, mismatch=-1, gap=-2,
                        mode=AlignMode.SEMIGLOBAL)
    got = band_chunked.score(s1, s2, cfg, rows=2, block=256, interpret=True)
    assert got == oracle.score(s1, s2, cfg) == 100


def test_block_width_validation():
    s1, s2 = random_pair(100, 100, 3)
    with pytest.raises(ValueError):
        band_chunked.score(s1, s2, UNIT, block=100, interpret=True)


def test_api_routes_past_boundary_cap(monkeypatch):
    # verdict r2 item #2 done-criterion: when BOTH axes exceed the band
    # engine's SMEM boundary cap, align_score must route to the chunked
    # engine, not silently fall back to the slow flat kernel
    import tpualign.api as api
    from tpualign.config import EngineConfig
    from tpualign.ops import band, pallas_diag

    monkeypatch.setattr(band, "MAX_BOUNDARY", 256)
    hits = []
    real = band_chunked.score
    monkeypatch.setattr(
        band_chunked, "score",
        lambda *a, **kw: hits.append(1) or real(*a, **kw),
    )
    monkeypatch.setattr(
        pallas_diag, "score",
        lambda *a, **kw: pytest.fail("fell back to the flat kernel"),
    )
    s1, s2 = random_pair(300, 280, 21)
    got = api.align_score(
        s1, s2, GEN, EngineConfig(impl="band", interpret=True)
    )
    assert hits and got == oracle.score(s1, s2, GEN)
