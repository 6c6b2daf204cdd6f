"""Batched band scoring (ops/band_batch.py) vs the oracle."""

import numpy as np
import pytest

from tpualign.config import AlignMode, ScoringConfig
from tpualign.ops import band_batch, oracle

GEN = ScoringConfig(match=3, mismatch=-2, gap=-4)  # outside the bit family
SW = ScoringConfig(match=2, mismatch=-1, gap=-2, mode=AlignMode.LOCAL)


def _pairs(n, seed, tmax=80, qmax=160):
    r = np.random.default_rng(seed)
    texts = [r.integers(1, 5, int(r.integers(1, tmax))).astype(np.int8)
             for _ in range(n)]
    queries = [r.integers(1, 5, int(r.integers(1, qmax))).astype(np.int8)
               for _ in range(n)]
    return texts, queries


@pytest.mark.parametrize("cfg", [GEN, SW], ids=["nw-general", "sw"])
def test_batch_vs_oracle(cfg):
    texts, queries = _pairs(4, 17)
    texts.append(np.empty(0, np.int8))
    queries.append(np.asarray([1, 2, 3], np.int8))
    got = band_batch.score_batch(texts, queries, cfg, interpret=True)
    want = np.asarray(
        [oracle.score(t, q, cfg) for t, q in zip(texts, queries)]
    )
    assert np.array_equal(got, want), (got, want)


def test_batch_envelope_guards():
    texts, queries = _pairs(2, 1)
    bad = ScoringConfig(match=2, mismatch=1, gap=-1, mode=AlignMode.LOCAL)
    with pytest.raises(ValueError):
        band_batch.score_batch(texts, queries, bad)
    with pytest.raises(ValueError):
        band_batch.score_batch(
            texts, [np.ones(2000, np.int8)] * 2, GEN, rows=8
        )
