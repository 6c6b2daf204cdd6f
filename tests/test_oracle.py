"""Oracle validation: the vectorized NumPy oracle vs. an independent scalar DP.

The scalar DP below is a direct, unoptimized transcription of the recurrence
semantics (``serial.cpp:23-31``) — deliberately written differently from the
oracle's cummax formulation so the two can cross-check each other.
"""

import numpy as np
import pytest

from tpualign.config import AlignMode, ScoringConfig
from tpualign.io.bdna import encode
from tpualign.ops import oracle

from conftest import reference_pair


def scalar_dp(s1, s2, cfg: ScoringConfig):
    M, N = len(s1), len(s2)
    H = [[0] * (M + 1) for _ in range(N + 1)]
    local = cfg.is_local
    if not local:
        for j in range(M + 1):
            H[0][j] = j * cfg.gap
        for i in range(N + 1):
            H[i][0] = i * cfg.gap
    best = 0
    for i in range(1, N + 1):
        for j in range(1, M + 1):
            sub = cfg.match if s1[j - 1] == s2[i - 1] else cfg.mismatch
            v = max(H[i - 1][j - 1] + sub, H[i - 1][j] + cfg.gap, H[i][j - 1] + cfg.gap)
            if local:
                v = max(v, 0)
            H[i][j] = v
            best = max(best, v)
    return (best if local else H[N][M]), np.array(H, dtype=np.int32)


def random_cases(n_cases=20, max_len=40, seed=7):
    rng = np.random.default_rng(seed)
    for _ in range(n_cases):
        l1 = int(rng.integers(1, max_len))
        l2 = int(rng.integers(1, max_len))
        yield (
            rng.integers(1, 5, size=l1, dtype=np.int8),
            rng.integers(1, 5, size=l2, dtype=np.int8),
        )


def test_table_matches_scalar_dp(scoring):
    for s1, s2 in random_cases():
        want_score, want_table = scalar_dp(s1, s2, scoring)
        got = oracle.score_table(s1, s2, scoring)
        np.testing.assert_array_equal(got, want_table)
        assert oracle.score(s1, s2, scoring) == want_score


def test_nonuniform_scoring():
    cfg = ScoringConfig(match=3, mismatch=-2, gap=-4)
    for s1, s2 in random_cases(10, 30, seed=11):
        want, _ = scalar_dp(s1, s2, cfg)
        assert oracle.score(s1, s2, cfg) == want
    cfg_sw = ScoringConfig(match=3, mismatch=-2, gap=-4, mode=AlignMode.LOCAL)
    for s1, s2 in random_cases(10, 30, seed=13):
        want, _ = scalar_dp(s1, s2, cfg_sw)
        assert oracle.score(s1, s2, cfg_sw) == want


def test_known_small_values():
    cfg = ScoringConfig()
    # identical sequences: all matches
    s = encode("ATGCATGC")
    assert oracle.score(s, s, cfg) == 8
    # single base vs single different base: mismatch (0) beats two gaps (-2)
    assert oracle.score(encode("A"), encode("T"), cfg) == 0
    # empty-ish: one base vs itself
    assert oracle.score(encode("A"), encode("A"), cfg) == 1


def test_reference_corpus_pairs(scoring):
    """Score the tiny reference pairs; table oracle and row oracle must agree."""
    for name in ("small", "debug", "t"):
        s1, s2 = reference_pair(name)
        t = oracle.score_table(s1, s2, scoring)
        if scoring.is_local:
            assert oracle.score(s1, s2, scoring) == int(t.max())
        else:
            assert oracle.score(s1, s2, scoring) == int(t[-1, -1])


def test_traceback_validity(scoring):
    for s1, s2 in random_cases(15, 30, seed=3):
        sc, a1, a2 = oracle.traceback(s1, s2, scoring)
        assert sc == oracle.score(s1, s2, scoring)
        assert oracle.alignment_score(a1, a2, scoring) == sc
        # aligned strings reproduce the inputs when gaps are stripped
        from tpualign.io.bdna import decode

        if not scoring.is_local:
            assert a1.replace("-", "") == decode(s1)
            assert a2.replace("-", "") == decode(s2)
        else:
            assert a1.replace("-", "") in decode(s1)
            assert a2.replace("-", "") in decode(s2)


def test_sw_score_nonnegative_and_geq_nw():
    for s1, s2 in random_cases(10, 25, seed=5):
        nw = oracle.score(s1, s2, ScoringConfig())
        sw = oracle.score(s1, s2, ScoringConfig(mode=AlignMode.LOCAL))
        assert sw >= 0
        assert sw >= nw
