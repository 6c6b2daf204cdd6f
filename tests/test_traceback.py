"""Checkpointed block traceback vs. the full-table oracle — identical strings.

Every refilled block cell is bit-identical to the full table, so the recovered
alignment must match the oracle's *exactly* (same tie order), not merely in
score.
"""

import numpy as np
import pytest

from tpualign.config import AlignMode, ScoringConfig
from tpualign.ops import oracle, traceback as tb


def pairs(seed, cases):
    rng = np.random.default_rng(seed)
    for l1, l2 in cases:
        yield (
            rng.integers(1, 5, size=l1, dtype=np.int8),
            rng.integers(1, 5, size=l2, dtype=np.int8),
        )


SHAPES = [(300, 257), (64, 64), (63, 65), (128, 1), (1, 128), (500, 120)]


def test_identical_to_oracle(scoring):
    for s1, s2 in pairs(41, SHAPES):
        want = oracle.traceback(s1, s2, scoring)
        got = tb.align_checkpointed(s1, s2, scoring, k=64)
        assert got == want, (len(s1), len(s2))


def test_various_strides():
    cfg = ScoringConfig()
    (s1, s2), = pairs(43, [(515, 700)])
    want = oracle.traceback(s1, s2, cfg)
    for k in (32, 128, 512, 1024):
        assert tb.align_checkpointed(s1, s2, cfg, k=k) == want


def test_larger_pair_nw_and_sw():
    for mode in (AlignMode.GLOBAL, AlignMode.LOCAL):
        cfg = ScoringConfig(mode=mode)
        (s1, s2), = pairs(47, [(1500, 1300)])
        want = oracle.traceback(s1, s2, cfg)
        got = tb.align_checkpointed(s1, s2, cfg, k=128)
        assert got == want


def test_nonuniform_scoring_traceback():
    cfg = ScoringConfig(match=3, mismatch=-1, gap=-2)
    (s1, s2), = pairs(53, [(400, 380)])
    assert tb.align_checkpointed(s1, s2, cfg, k=64) == oracle.traceback(s1, s2, cfg)
    cfg = ScoringConfig(match=3, mismatch=-1, gap=-2, mode=AlignMode.LOCAL)
    assert tb.align_checkpointed(s1, s2, cfg, k=64) == oracle.traceback(s1, s2, cfg)


def test_alignment_reproduces_inputs():
    from tpualign.io.bdna import decode

    (s1, s2), = pairs(59, [(700, 650)])
    cfg = ScoringConfig()
    sc, a1, a2 = tb.align_checkpointed(s1, s2, cfg, k=128)
    assert a1.replace("-", "") == decode(s1)
    assert a2.replace("-", "") == decode(s2)
    assert oracle.alignment_score(a1, a2, cfg) == sc == oracle.score(s1, s2, cfg)
