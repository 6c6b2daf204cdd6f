"""API-level dispatch to the sharded engines (verdict r1 item #4).

The reference's distributed fills are first-class drivers
(``mpi-vert-driver.cpp``); here ``impl='strips'/'bitpal-strips'`` must be
reachable through the public ``align_score`` on a multi-device process —
exercised on the 8-virtual-device CPU mesh (conftest).
"""

import numpy as np
import pytest

from tpualign.api import align_score, resolve_impl
from tpualign.config import AlignMode, EngineConfig, ScoringConfig
from tpualign.io.bdna import random_pair
from tpualign.ops import oracle


def test_align_score_bitpal_strips():
    s1, s2 = random_pair(96, 320, seed=1)
    got = align_score(
        s1, s2, ScoringConfig(),
        EngineConfig(impl="bitpal-strips", chunk_rows=32, interpret=True),
    )
    assert got == oracle.score(s1, s2, ScoringConfig())


def test_align_score_strips_general():
    s1, s2 = random_pair(200, 90, seed=2)
    cfg = ScoringConfig(match=3, mismatch=-1, gap=-2)
    got = align_score(s1, s2, cfg, EngineConfig(impl="strips", chunk_rows=64))
    assert got == oracle.score(s1, s2, cfg)


def test_align_score_strips_sw():
    s1, s2 = random_pair(150, 80, seed=3)
    cfg = ScoringConfig(match=2, mismatch=-1, gap=-2, mode=AlignMode.LOCAL)
    got = align_score(s1, s2, cfg, EngineConfig(impl="strips", chunk_rows=64))
    assert got == oracle.score(s1, s2, cfg)


def test_bitpal_strips_falls_back_outside_family():
    # non-family scoring through the bit-parallel sharded engine falls back
    # to the general sharded engine rather than erroring
    s1, s2 = random_pair(100, 60, seed=4)
    cfg = ScoringConfig(match=2, mismatch=1, gap=-2)
    got = align_score(
        s1, s2, cfg, EngineConfig(impl="bitpal-strips", chunk_rows=32,
                                  interpret=True)
    )
    assert got == oracle.score(s1, s2, cfg)


def test_resolve_impl_sharded_gates(monkeypatch):
    # on a simulated multi-device TPU process, big shapes resolve sharded
    import tpualign.api as api

    monkeypatch.setattr(api, "_platform", lambda: "tpu")
    n_dev = 8
    unit = ScoringConfig()
    sw = ScoringConfig(mode=AlignMode.LOCAL)
    big = 4096 * n_dev
    assert resolve_impl(EngineConfig(), unit, (big, big)) == "bitpal-strips"
    # non-family sharded problems get the band kernel inside every shard
    # (round 3 — the hybrid-vert successor), not the portable row scan
    assert resolve_impl(EngineConfig(), sw, (big, big)) == "band-strips"
    # small problems stay single-chip
    assert resolve_impl(EngineConfig(), unit, (5000, 5000)) == "bitpal"
    assert resolve_impl(EngineConfig(), sw, (5000, 5000)) == "band"
    # explicit impl always wins
    assert resolve_impl(
        EngineConfig(impl="xla"), unit, (big, big)
    ) == "xla"
