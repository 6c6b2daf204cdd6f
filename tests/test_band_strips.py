"""Sharded band fill (parallel/band_strips.py) vs the oracle on the virtual
CPU mesh.

The engine puts the banded strip kernel inside every shard — the
``hybrid-vert`` successor (best kernel inside each rank,
``hybrid-vert.cpp:6``) for general scoring and Smith-Waterman — with the
captured right columns moving chip-to-chip by ``ppermute``.  These tests pin
exactness on 1-8 device meshes at tiny strip geometry so both the chip halo
hand-off and the in-chip SMEM boundary-row hand-off are crossed many times.
"""

import numpy as np
import pytest
import jax

from tpualign.config import AlignMode, ScoringConfig
from tpualign.ops import oracle
from tpualign.parallel import band_strips
from tpualign.parallel.mesh import make_mesh

# interpreted-Pallas heavyweight: runs in the full tier only (see pyproject markers)
pytestmark = pytest.mark.slow

UNIT = ScoringConfig()
GEN = ScoringConfig(match=2, mismatch=-3, gap=-4)
SW = ScoringConfig(match=3, mismatch=-2, gap=-1, mode=AlignMode.LOCAL)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def random_pair(m, n, seed, lo=0):
    # lo=0 includes the gap code 0: pad text columns (sentinel 6) must
    # never match it
    r = np.random.default_rng(seed)
    return (
        r.integers(lo, 5, m).astype(np.int8),
        r.integers(lo, 5, n).astype(np.int8),
    )


@pytest.mark.parametrize("cfg", [UNIT, GEN, SW], ids=["unit", "gen", "sw"])
def test_mesh8_vs_oracle(mesh8, cfg):
    # 8 chips x ~75-col blocks, 3 strips of R=256: every halo edge crossed
    s1, s2 = random_pair(600, 700, 42)
    got = band_strips.score(
        s1, s2, cfg, mesh=mesh8, rows=2, interpret=True)
    assert got == oracle.score(s1, s2, cfg)


def test_mesh_size_invariance():
    # same score on 1, 2, 4, 8 shards (the reference's rank-count sweep)
    s1, s2 = random_pair(500, 400, 7)
    want = oracle.score(s1, s2, GEN)
    for p in (1, 2, 4, 8):
        got = band_strips.score(
            s1, s2, GEN, mesh=make_mesh(p), rows=2, interpret=True)
        assert got == want, p


MAT5 = None  # built lazily (tpualign.matrices import at module scope is fine)


@pytest.mark.parametrize(
    "mode,mat,m,n",
    [
        (AlignMode.GLOBAL, True, 900, 600),
        (AlignMode.LOCAL, True, 900, 600),
        (AlignMode.SEMIGLOBAL, False, 900, 600),
        (AlignMode.SEMIGLOBAL, True, 600, 900),  # swap + matrix transpose
        (AlignMode.INFIX, False, 600, 900),  # swapped infix: ec-only flags
        (AlignMode.INFIX, True, 900, 600),
    ],
    ids=["nw-mat", "sw-mat", "sg", "sg-mat-swap", "infix-swap", "infix-mat"],
)
def test_mesh8_modes(mesh8, mode, mat, m, n):
    # round-5 composition: matrix scoring and the ends-free modes through
    # the chip pipeline (per-chip capture columns feed the last-column
    # extraction; the final b rows feed the last-row extraction)
    from tpualign import matrices

    kw = dict(mode=mode, gap=-2)
    if mat:
        kw["matrix"] = matrices.dna(2, -1, -3)
    else:
        kw.update(match=2, mismatch=-1)
    cfg = ScoringConfig(**kw)
    s1, s2 = random_pair(m, n, m + 3 * n, lo=1)
    got = band_strips.score(s1, s2, cfg, mesh=mesh8, rows=2, interpret=True)
    assert got == oracle.score(s1, s2, cfg)


def test_sg_last_column_early_row(mesh8):
    # regression (400k silicon native gate): the owner chip's capture
    # column is its true text end (< W when ragged), firing before the
    # static W-based gate — early rows of the last column were missed.
    # Disjoint alphabets outside a 6-row overlap pin the sg optimum there.
    r = np.random.default_rng(23)
    s1 = r.integers(1, 3, 808).astype(np.int8)
    s2 = r.integers(3, 5, 700).astype(np.int8)
    s2[:6] = s1[-6:]
    cfg = ScoringConfig(match=2, mismatch=-1, gap=-2,
                        mode=AlignMode.SEMIGLOBAL)
    got = band_strips.score(s1, s2, cfg, mesh=mesh8, rows=2, interpret=True)
    assert got == oracle.score(s1, s2, cfg) == 12


def test_mesh_size_invariance_modes():
    # P in {1, 2, 4, 8} exactness for a matrix-semiglobal config
    from tpualign import matrices

    cfg = ScoringConfig(gap=-2, matrix=matrices.dna(2, -1, -3),
                        mode=AlignMode.SEMIGLOBAL)
    s1, s2 = random_pair(500, 400, 17, lo=1)
    want = oracle.score(s1, s2, cfg)
    for p in (1, 2, 4, 8):
        got = band_strips.score(
            s1, s2, cfg, mesh=make_mesh(p), rows=2, interpret=True)
        assert got == want, p


def test_swap_path_and_ragged(mesh8):
    # n > m puts the strips on s1; lengths indivisible by 8*P and R
    for m, n in ((333, 901), (901, 333), (130, 131)):
        s1, s2 = random_pair(m, n, m * 7 + n)
        got = band_strips.score(
            s1, s2, UNIT, mesh=mesh8, rows=2, interpret=True)
        assert got == oracle.score(s1, s2, UNIT), (m, n)


def test_sw_max_on_interior_chip(mesh8):
    # the SW max must fold correctly across chips: plant the optimum in
    # the middle of the text axis (an interior chip's block)
    r = np.random.default_rng(3)
    s1 = r.integers(1, 5, 640).astype(np.int8)
    s2 = r.integers(1, 5, 300).astype(np.int8)
    s1[300:340] = s2[100:140]
    got = band_strips.score(s1, s2, SW, mesh=mesh8, rows=2, interpret=True)
    assert got == oracle.score(s1, s2, SW)


def test_masked_sw_rejected(mesh8):
    s1, s2 = random_pair(100, 100, 5)
    bad = ScoringConfig(match=1, mismatch=1, gap=-1, mode=AlignMode.LOCAL)
    with pytest.raises(ValueError):
        band_strips.score(s1, s2, bad, mesh=mesh8, rows=2, interpret=True)
