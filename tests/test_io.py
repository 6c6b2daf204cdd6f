"""IO round-trip and corpus-format tests."""

import numpy as np
import pytest

from tpualign.io import bdna


def test_roundtrip(tmp_path):
    s1, s2 = bdna.random_pair(100, 200, seed=42)
    p = tmp_path / "x.bdna"
    bdna.write_bdna(p, s1)
    got = bdna.read_bdna(p)
    np.testing.assert_array_equal(got, s1)
    assert got.dtype == np.int8


def test_encode_decode():
    text = "ATGC-ATGC"
    seq = bdna.encode(text)
    assert bdna.decode(seq) == text
    with pytest.raises(ValueError):
        bdna.encode("ATGX")


def test_validation(tmp_path):
    p = tmp_path / "bad.bdna"
    p.write_bytes(bytes([1, 2, 9]))
    with pytest.raises(ValueError):
        bdna.read_bdna(p)
    assert bdna.read_bdna(p, validate=False).size == 3


def test_random_pair_range():
    s1, s2 = bdna.random_pair(1000, 1000, seed=0)
    assert s1.min() >= 1 and s1.max() <= 4
    assert s2.min() >= 1 and s2.max() <= 4
    # deterministic
    t1, _ = bdna.random_pair(1000, 1000, seed=0)
    np.testing.assert_array_equal(s1, t1)


def test_pair_lengths_for_gb():
    l1, l2 = bdna.pair_lengths_for_gb(64.0)
    assert abs(bdna.table_gb(l1, l2) - 64.0) < 0.01


def test_reference_corpus_readable_if_present():
    import os

    path = "/root/reference/bdna/small1.bdna"
    if not os.path.exists(path):
        pytest.skip("reference corpus not mounted")
    seq = bdna.read_bdna(path)
    assert seq.size == 6
    assert set(np.unique(seq)).issubset({1, 2, 3, 4})
