"""Sharded bit-parallel pipeline vs the scalar oracle on the virtual mesh.

Exercises the word-band decomposition, the 2-bit boundary-stream splice, the
pipeline bubble masking, and the cross-chunk state resume — the multi-chip
analog the reference only ever tested with real ``mpirun`` (SURVEY.md §4)."""

import jax
import numpy as np
import pytest

from tpualign.config import ScoringConfig
from tpualign.io.bdna import random_pair
from tpualign.ops import bitpal, oracle
from tpualign.parallel import bitpal_strips
from tpualign.parallel.mesh import make_mesh

UNIT = ScoringConfig()


def _check(m, n, P, chunk, seed=0):
    s1, s2 = random_pair(m, n, seed=seed)
    mesh = make_mesh(P)
    got = bitpal_strips.score(
        s1, s2, UNIT, mesh=mesh, chunk_cols=chunk, interpret=True
    )
    want = oracle.score(s1, s2, UNIT)
    assert got == want, (m, n, P, chunk, got, want)


@pytest.mark.parametrize("P", [1, 2, 4, 8])
def test_small_all_mesh_sizes(P):
    # 80 query rows -> 3 words; every chip count exercises pad words
    _check(m=70, n=80, P=P, chunk=16, seed=P)


def test_multiword_bands_and_chunks():
    # 8 chips x 2+ words per chip, many chunks: splice crosses every boundary
    _check(m=300, n=31 * 17 + 5, P=8, chunk=32, seed=3)


def test_single_chunk_pipeline():
    _check(m=40, n=200, P=4, chunk=4096, seed=4)


def test_uneven_last_band():
    # last chip holds only pad words (nw < P * nw_local)
    _check(m=90, n=31 * 5, P=4, chunk=16, seed=5)


def test_scaled_scoring_and_guard():
    s1, s2 = random_pair(50, 60, seed=6)
    mesh = make_mesh(4)
    cfg = ScoringConfig(match=2, mismatch=0, gap=-2)
    got = bitpal_strips.score(s1, s2, cfg, mesh=mesh, chunk_cols=16,
                              interpret=True)
    assert got == oracle.score(s1, s2, cfg)
    # (2, 1, -2) is genuinely outside the (1, 0, -g) family (family() is None)
    with pytest.raises(ValueError):
        bitpal_strips.score(
            s1, s2, ScoringConfig(match=2, mismatch=1, gap=-2), mesh=mesh
        )


def test_matches_single_chip_kernel():
    s1, s2 = random_pair(150, 140, seed=7)
    mesh = make_mesh(8)
    got = bitpal_strips.score(s1, s2, UNIT, mesh=mesh, chunk_cols=32,
                              interpret=True)
    assert got == bitpal.score(s1, s2, UNIT, interpret=True)


def test_generalized_gap_sharded():
    from tpualign.ops import oracle as _oracle

    for cfg in (ScoringConfig(gap=-2), ScoringConfig(match=3, mismatch=2, gap=-1),
                ScoringConfig(gap=-3)):
        s1, s2 = random_pair(140, 170, seed=13)
        got = bitpal_strips.score(s1, s2, cfg, mesh=make_mesh(4),
                                  chunk_cols=32, interpret=True)
        assert got == _oracle.score(s1, s2, cfg), cfg
