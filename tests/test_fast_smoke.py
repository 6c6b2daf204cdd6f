"""Fast-tier engine smokes: one small case per engine surface.

The interpreted-Pallas heavyweights are marked ``slow`` (round-5 verdict
item: the full suite passed 55 minutes); this file keeps every engine
surface covered in the <10-minute ``pytest -m "not slow"`` inner-loop
gate.  Small single-strip shapes compile-and-run in seconds each.
"""

import numpy as np
import pytest

from tpualign.config import AlignMode, EngineConfig, ScoringConfig
from tpualign import matrices
from tpualign.ops import band, band_batch, band_chunked, oracle
from tpualign.parallel import band_strips
from tpualign.parallel.mesh import make_mesh

MAT = matrices.dna(2, -1, -3)


def pair(m, n, seed):
    r = np.random.default_rng(seed)
    return (r.integers(1, 5, m).astype(np.int8),
            r.integers(1, 5, n).astype(np.int8))


def cfg_of(name):
    return {
        "nw": ScoringConfig(match=2, mismatch=-1, gap=-2),
        "sw": ScoringConfig(match=2, mismatch=-1, gap=-2,
                            mode=AlignMode.LOCAL),
        "sg": ScoringConfig(match=2, mismatch=-1, gap=-2,
                            mode=AlignMode.SEMIGLOBAL),
        "infix": ScoringConfig(match=2, mismatch=-1, gap=-2,
                               mode=AlignMode.INFIX),
        "mat": ScoringConfig(gap=-2, matrix=MAT),
        "mat-sg": ScoringConfig(gap=-2, matrix=MAT,
                                mode=AlignMode.SEMIGLOBAL),
        "affine": ScoringConfig(match=2, mismatch=-1, gap_open=-5,
                                gap_extend=-2),
        "affine-sg": ScoringConfig(match=2, mismatch=-1, gap_open=-5,
                                   gap_extend=-2,
                                   mode=AlignMode.SEMIGLOBAL),
    }[name]


@pytest.mark.parametrize(
    "name", ["sw", "infix", "mat-sg", "affine-sg"])
def test_band_small(name):
    # four configs that jointly touch every kernel branch: the SW floor +
    # running max, the ends-free extractions both flag shapes, the matrix
    # profile planes, and the affine E/F machinery
    cfg = cfg_of(name)
    s1, s2 = pair(50, 40, hash(name) % 1000)
    got = band.score(s1, s2, cfg, rows=2, interpret=True)
    assert got == oracle.score(s1, s2, cfg)


@pytest.mark.parametrize("name", ["sw", "mat-sg", "affine-sg"])
def test_band_chunked_small(name):
    cfg = cfg_of(name)
    s1, s2 = pair(150, 40, 7)
    got = band_chunked.score(s1, s2, cfg, rows=2, block=64, interpret=True)
    assert got == oracle.score(s1, s2, cfg)


@pytest.mark.parametrize("name", ["sg"])
def test_band_strips_small(name):
    cfg = cfg_of(name)
    s1, s2 = pair(120, 40, 11)
    got = band_strips.score(s1, s2, cfg, mesh=make_mesh(2), rows=2,
                            interpret=True)
    assert got == oracle.score(s1, s2, cfg)


def test_band_batch_small():
    cfg = cfg_of("mat-sg")
    texts, queries = zip(*(pair(30 + i, 25, 40 + i) for i in range(3)))
    got = band_batch.score_batch(list(texts), list(queries), cfg,
                                 interpret=True)
    want = [oracle.score(t, q, cfg) for t, q in zip(texts, queries)]
    assert got.tolist() == want


def test_locate_device_small():
    from tpualign.ops import band_align
    from tpualign.utils import native

    cfg = cfg_of("sg")
    s1, s2 = pair(90, 60, 13)
    got = band_align.locate_flex_device(s1, s2, cfg, rows=2, interpret=True)
    if native.available():
        assert got == native.locate_flex(s1, s2, cfg)
    assert got[0] == oracle.score(s1, s2, cfg)


def test_bitpal_small():
    # the flagship bit-parallel kernel, interpreted, one small unit case
    from tpualign.ops import bitpal

    s1, s2 = pair(300, 200, 17)
    got = bitpal.score(s1, s2, ScoringConfig(), interpret=True)
    assert got == oracle.score(s1, s2, ScoringConfig())


def test_hirschberg_small():
    # bit-parallel k-way alignment recovery, one small case
    from tpualign.ops import hirschberg

    s1, s2 = pair(400, 300, 19)
    sc, a1, a2 = hirschberg.align(s1, s2, ScoringConfig(), interpret=True)
    assert sc == oracle.score(s1, s2, ScoringConfig())
    assert oracle.alignment_score(a1, a2, ScoringConfig()) == sc


def test_affine_xla_small():
    # Gotoh scoring + Myers-Miller alignment, portable scans
    from tpualign.ops import affine_align, xla

    cfg = cfg_of("affine")
    s1, s2 = pair(140, 120, 23)
    want = oracle.score(s1, s2, cfg)
    assert xla.score(s1, s2, cfg) == want
    sc, a1, a2 = affine_align.align(s1, s2, cfg)
    assert sc == want
    assert oracle.alignment_score(a1, a2, cfg) == sc
