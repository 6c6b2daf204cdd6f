"""Diagonal-checkpoint traceback (TPU fast path) vs. oracle — interpret mode.

Uses a tiny checkpoint stride so band crossings, window clipping, and the
synthetic band-0 seeds are all exercised on small inputs.
"""

import numpy as np
import pytest

from tpualign.config import AlignMode, ScoringConfig
from tpualign.ops import oracle, traceback_diag


def test_identical_to_oracle(scoring):
    rng = np.random.default_rng(71)
    for l1, l2 in ((60, 50), (50, 60), (33, 3)):
        s1 = rng.integers(1, 5, size=l1, dtype=np.int8)
        s2 = rng.integers(1, 5, size=l2, dtype=np.int8)
        want = oracle.traceback(s1, s2, scoring)
        got = traceback_diag.align_diag(
            s1, s2, scoring, k_stride=16, interpret=True
        )
        assert got == want, (l1, l2)


def test_multiple_strides():
    rng = np.random.default_rng(73)
    s1 = rng.integers(1, 5, size=90, dtype=np.int8)
    s2 = rng.integers(1, 5, size=70, dtype=np.int8)
    cfg = ScoringConfig()
    want = oracle.traceback(s1, s2, cfg)
    for k in (8, 24, 64):
        got = traceback_diag.align_diag(s1, s2, cfg, k_stride=k, interpret=True)
        assert got == want, k


def test_sw_zero_score():
    """All-mismatch SW (negative mismatch) -> empty local alignment."""
    cfg = ScoringConfig(match=1, mismatch=-2, gap=-2, mode=AlignMode.LOCAL)
    s1 = np.full(40, 1, dtype=np.int8)
    s2 = np.full(40, 2, dtype=np.int8)
    assert traceback_diag.align_diag(s1, s2, cfg, k_stride=16, interpret=True) == (
        0, "", "",
    )
