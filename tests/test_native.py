"""Native (C++/ctypes) support library vs. the NumPy oracle."""

import numpy as np
import pytest

from tpualign.config import AlignMode, ScoringConfig
from tpualign.ops import oracle
from tpualign.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no native toolchain"
)


def test_scores_match_oracle(scoring):
    rng = np.random.default_rng(61)
    for _ in range(10):
        s1 = rng.integers(1, 5, size=int(rng.integers(1, 80)), dtype=np.int8)
        s2 = rng.integers(1, 5, size=int(rng.integers(1, 80)), dtype=np.int8)
        assert native.score(s1, s2, scoring) == oracle.score(s1, s2, scoring)


def test_nonuniform_scoring():
    cfg = ScoringConfig(match=7, mismatch=-5, gap=-3)
    rng = np.random.default_rng(67)
    s1 = rng.integers(1, 5, size=150, dtype=np.int8)
    s2 = rng.integers(1, 5, size=140, dtype=np.int8)
    assert native.score(s1, s2, cfg) == oracle.score(s1, s2, cfg)


def test_generate_and_validate():
    seq = native.generate(10000, seed=3)
    assert seq.min() >= 1 and seq.max() <= 4
    assert native.validate(seq) == -1
    bad = seq.copy()
    bad[1234] = 9
    assert native.validate(bad) == 1234
    # deterministic
    np.testing.assert_array_equal(native.generate(10000, seed=3), seq)


def test_reference_smid_score():
    import os

    p = "/root/reference/bdna"
    if not os.path.isdir(p):
        pytest.skip("corpus not mounted")
    from tpualign.io.bdna import read_bdna

    s1 = read_bdna(os.path.join(p, "smid1.bdna"))
    s2 = read_bdna(os.path.join(p, "smid2.bdna"))
    assert native.score(s1, s2) == 5839  # golden from compiled reference


def test_native_traceback_matches_oracle():
    import numpy as np
    import pytest

    from tpualign.config import ScoringConfig
    from tpualign.io.bdna import random_pair
    from tpualign.ops import oracle
    from tpualign.utils import native

    if not native.available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(9)
    for _ in range(25):
        m, n = int(rng.integers(1, 200)), int(rng.integers(1, 200))
        s1, s2 = random_pair(m, n, seed=int(rng.integers(1 << 30)))
        assert native.traceback(s1, s2) == oracle.traceback(
            s1, s2, ScoringConfig()
        )
    cfg = ScoringConfig(match=2, mismatch=-1, gap=-3)
    s1, s2 = random_pair(90, 70, seed=4)
    assert native.traceback(s1, s2, cfg) == oracle.traceback(s1, s2, cfg)


def test_native_traceback_degenerate():
    import numpy as np
    import pytest

    from tpualign.ops import oracle
    from tpualign.utils import native

    if not native.available():
        pytest.skip("no native toolchain")
    a = np.asarray([1, 2, 3], np.int8)
    e = np.empty(0, np.int8)
    for s1, s2 in [(a, e), (e, a), (e, e), (a, a)]:
        assert native.traceback(s1, s2) == oracle.traceback(s1, s2)
