"""Golden scores pinned from the compiled C++ reference.

Provenance: ``g++ -O2 -std=c++11 src/serial/serial.cpp helper.cpp`` from
/root/reference, run on the committed ``bdna/`` pairs (2026-08-16):

    small: 2    debug: 27    t: 17    smid: 5839
    2gb: 12958  64gb: 73888  (big pairs: not re-run in CI, used by bench.py)

These pin the exact serial-kernel semantics (``serial.cpp:16-31``) as the
cross-implementation oracle the reference itself used (SURVEY.md §4).
"""

import os

import pytest

from tpualign.io.bdna import read_bdna
from tpualign.ops import oracle, xla

GOLDEN = {"small": 2, "debug": 27, "t": 17, "smid": 5839}
#: big pairs, verified 2026-08-16 against the compiled reference (not in CI)
GOLDEN_BIG = {"2gb": 12958, "64gb": 73888}
CORPUS = "/root/reference/bdna"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CORPUS), reason="reference corpus not mounted"
)


@pytest.mark.parametrize("name,want", sorted(GOLDEN.items()))
def test_golden_nw_scores(name, want):
    s1 = read_bdna(os.path.join(CORPUS, f"{name}1.bdna"))
    s2 = read_bdna(os.path.join(CORPUS, f"{name}2.bdna"))
    assert oracle.score(s1, s2) == want
    assert xla.score(s1, s2) == want
