"""Sharded strip-pipeline fill vs. oracle, on a virtual 8-device CPU mesh.

The reference could only validate its MPI decomposition with a real ``mpirun``
(SURVEY.md §4); here the same wavefront pipeline runs under ``shard_map`` on
host-platform virtual devices, so multi-chip correctness is a unit test.
"""

import numpy as np
import pytest
import jax

from tpualign.config import AlignMode, ScoringConfig
from tpualign.ops import oracle
from tpualign.parallel import strips
from tpualign.parallel.mesh import make_mesh

from conftest import reference_pair


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


@pytest.fixture(scope="module")
def mesh4():
    return make_mesh(4)


def test_matches_oracle_various_chunks(mesh8, scoring):
    rng = np.random.default_rng(17)
    s1 = rng.integers(1, 5, size=333, dtype=np.int8)
    s2 = rng.integers(1, 5, size=257, dtype=np.int8)
    want = oracle.score(s1, s2, scoring)
    for chunk in (8, 64, 512):
        got = strips.score(s1, s2, scoring, mesh=mesh8, chunk_rows=chunk)
        assert got == want, chunk


def test_ragged_shapes(mesh8):
    """Shapes not divisible by shard count or chunk depth."""
    cfg = ScoringConfig()
    rng = np.random.default_rng(23)
    for l1, l2 in ((7, 300), (300, 7), (129, 65), (1000, 999)):
        s1 = rng.integers(1, 5, size=l1, dtype=np.int8)
        s2 = rng.integers(1, 5, size=l2, dtype=np.int8)
        assert strips.score(s1, s2, cfg, mesh=mesh8, chunk_rows=64) == oracle.score(
            s1, s2, cfg
        )


def test_mesh_size_invariance(mesh4, mesh8):
    """Same score on 1, 4, and 8 shards (the reference's rank-count sweep)."""
    rng = np.random.default_rng(29)
    s1 = rng.integers(1, 5, size=400, dtype=np.int8)
    s2 = rng.integers(1, 5, size=350, dtype=np.int8)
    cfg = ScoringConfig()
    want = oracle.score(s1, s2, cfg)
    assert strips.score(s1, s2, cfg, mesh=make_mesh(1), chunk_rows=100) == want
    assert strips.score(s1, s2, cfg, mesh=mesh4, chunk_rows=100) == want
    assert strips.score(s1, s2, cfg, mesh=mesh8, chunk_rows=100) == want


def test_reference_pairs_sharded(mesh8, scoring):
    for name in ("debug", "t"):
        s1, s2 = reference_pair(name)
        want = oracle.score(s1, s2, scoring)
        assert strips.score(s1, s2, scoring, mesh=mesh8, chunk_rows=16) == want


def test_smid_sharded_nw(mesh8):
    s1, s2 = reference_pair("smid")
    want = oracle.score(s1, s2)
    assert strips.score(s1, s2, mesh=mesh8, chunk_rows=512) == want


@pytest.mark.parametrize("mode", [AlignMode.GLOBAL, AlignMode.LOCAL])
def test_affine_sharded(mesh8, mode):
    # Gotoh sharding: the (H, E) halo pair crosses chips, F carries
    # chip-locally — vs the oracle across chunk depths and ragged shapes
    cfg = ScoringConfig(match=2, mismatch=-3, gap_open=-5, gap_extend=-2,
                        mode=mode)
    rng = np.random.default_rng(47)
    s1 = rng.integers(1, 5, size=333, dtype=np.int8)
    s2 = rng.integers(1, 5, size=257, dtype=np.int8)
    want = oracle.score(s1, s2, cfg)
    for chunk in (16, 128):
        assert strips.score(s1, s2, cfg, mesh=mesh8,
                            chunk_rows=chunk) == want, chunk


def test_affine_sharded_mesh_invariance(mesh4, mesh8):
    cfg = ScoringConfig(match=1, mismatch=-1, gap_open=0, gap_extend=-1)
    rng = np.random.default_rng(53)
    s1 = rng.integers(1, 5, size=300, dtype=np.int8)
    s2 = rng.integers(1, 5, size=280, dtype=np.int8)
    want = oracle.score(s1, s2, cfg)
    for mesh in (make_mesh(1), mesh4, mesh8):
        assert strips.score(s1, s2, cfg, mesh=mesh, chunk_rows=64) == want


def test_affine_sharded_ragged(mesh8):
    cfg = ScoringConfig(match=3, mismatch=-2, gap_open=-11, gap_extend=-1)
    rng = np.random.default_rng(59)
    for l1, l2 in ((7, 300), (300, 7), (129, 65)):
        s1 = rng.integers(1, 5, size=l1, dtype=np.int8)
        s2 = rng.integers(1, 5, size=l2, dtype=np.int8)
        assert strips.score(s1, s2, cfg, mesh=mesh8,
                            chunk_rows=64) == oracle.score(s1, s2, cfg)
