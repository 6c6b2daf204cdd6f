"""Pallas anti-diagonal kernel vs. oracle — interpreter mode on CPU.

On TPU hardware the same kernel compiles natively; these tests exercise the
identical kernel body through the Pallas interpreter so correctness is checked
in CI without chips (the testing layer the reference lacked, SURVEY.md §4).

Interpret-mode compiles cost seconds per distinct shape, so cases vary the
*content* at a small set of fixed shapes (every distinct (len1, len2) pair is
a fresh trace).
"""

import numpy as np
import pytest

from tpualign.config import AlignMode, ScoringConfig
from tpualign.ops import oracle, pallas_diag

from conftest import reference_pair


def content_cases(l1, l2, n=6, seed=31):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        yield (
            rng.integers(1, 5, size=l1, dtype=np.int8),
            rng.integers(1, 5, size=l2, dtype=np.int8),
        )


def test_score_matches_oracle(scoring):
    for s1, s2 in content_cases(41, 37):
        want = oracle.score(s1, s2, scoring)
        got = pallas_diag.score(s1, s2, scoring, interpret=True)
        assert got == want


def test_reference_pairs(scoring):
    for name in ("small", "debug", "t"):
        s1, s2 = reference_pair(name)
        want = oracle.score(s1, s2, scoring)
        assert pallas_diag.score(s1, s2, scoring, interpret=True) == want


def test_lane_boundary_lengths():
    """Lengths straddling the 128-lane tile edge."""
    cfg = ScoringConfig()
    rng = np.random.default_rng(5)
    for n in (1, 127, 128, 129):
        s2 = rng.integers(1, 5, size=n, dtype=np.int8)
        s1 = rng.integers(1, 5, size=n + 3, dtype=np.int8)
        assert pallas_diag.score(s1, s2, cfg, interpret=True) == oracle.score(
            s1, s2, cfg
        )


def test_swap_orientation():
    """Kernel swaps to put the shorter sequence on the buffer axis."""
    rng = np.random.default_rng(6)
    s1 = rng.integers(1, 5, size=20, dtype=np.int8)
    s2 = rng.integers(1, 5, size=90, dtype=np.int8)
    for cfg in (ScoringConfig(), ScoringConfig(mode=AlignMode.LOCAL)):
        assert pallas_diag.score(s1, s2, cfg, interpret=True) == oracle.score(
            s1, s2, cfg
        )


def test_nonuniform_scoring():
    for cfg in (
        ScoringConfig(match=4, mismatch=-3, gap=-2),
        ScoringConfig(match=4, mismatch=-3, gap=-2, mode=AlignMode.LOCAL),
    ):
        for s1, s2 in content_cases(33, 29, n=3, seed=8):
            assert pallas_diag.score(s1, s2, cfg, interpret=True) == oracle.score(
                s1, s2, cfg
            )


def test_smid_pair_nw():
    """10 KB pair — exercises thousands of wavefront steps in one shape."""
    s1, s2 = reference_pair("smid")
    got = pallas_diag.score(s1, s2, interpret=True)
    assert got == oracle.score(s1, s2)
