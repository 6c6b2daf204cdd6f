"""Pure-XLA scorer vs. the NumPy oracle (score-exact on every case)."""

import numpy as np

from tpualign.config import AlignMode, ScoringConfig
from tpualign.ops import oracle, xla

from conftest import reference_pair


def cases(n=12, max_len=60, seed=21):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        l1 = int(rng.integers(1, max_len))
        l2 = int(rng.integers(1, max_len))
        yield (
            rng.integers(1, 5, size=l1, dtype=np.int8),
            rng.integers(1, 5, size=l2, dtype=np.int8),
        )


def test_score_matches_oracle(scoring):
    for s1, s2 in cases():
        assert xla.score(s1, s2, scoring) == oracle.score(s1, s2, scoring)


def test_score_reference_pairs(scoring):
    for name in ("small", "debug", "t"):
        s1, s2 = reference_pair(name)
        assert xla.score(s1, s2, scoring) == oracle.score(s1, s2, scoring)


def test_score_smid_nw():
    s1, s2 = reference_pair("smid")
    assert xla.score(s1, s2) == oracle.score(s1, s2)


def test_nonuniform_scoring():
    cfg = ScoringConfig(match=5, mismatch=-4, gap=-3)
    for s1, s2 in cases(8, 40, seed=2):
        assert xla.score(s1, s2, cfg) == oracle.score(s1, s2, cfg)
    cfg = ScoringConfig(match=5, mismatch=-4, gap=-3, mode=AlignMode.LOCAL)
    for s1, s2 in cases(8, 40, seed=4):
        assert xla.score(s1, s2, cfg) == oracle.score(s1, s2, cfg)


def test_empty_sequences():
    cfg = ScoringConfig()
    assert xla.score(np.array([], np.int8), np.array([1, 2], np.int8), cfg) == -2
    assert xla.score(np.array([1], np.int8), np.array([], np.int8), cfg) == -1


def test_last_row_matches_table():
    rng = np.random.default_rng(9)
    s1 = rng.integers(1, 5, size=33, dtype=np.int8)
    s2 = rng.integers(1, 5, size=47, dtype=np.int8)
    cfg = ScoringConfig()
    table = oracle.score_table(s1, s2, cfg)
    np.testing.assert_array_equal(np.asarray(xla.last_row(s1, s2, cfg)), table[-1])
    # reverse mode = last row of the fully reversed problem
    table_r = oracle.score_table(s1[::-1], s2[::-1], cfg)
    np.testing.assert_array_equal(
        np.asarray(xla.last_row(s1, s2, cfg, reverse=True)), table_r[-1]
    )
