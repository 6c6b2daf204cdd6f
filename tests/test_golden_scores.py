"""Golden scores pinned from the compiled C++ reference.

Provenance: ``g++ -O2 -std=c++11 src/serial/serial.cpp helper.cpp`` from
/root/reference, run on the committed ``bdna/`` pairs (tiny pairs 2026-08-16;
every benched gb size re-run 2026-08-17 with full in-RAM tables).  The pin
table lives in :mod:`tpualign.golden` (shared with ``cli.py bench``'s score
cross-check); this suite asserts the tiny pairs end-to-end and, for the big
pairs, that the fast engines' *recorded benchmark scores* in ``results/``
match the pins — the CI-cheap analog of re-running a 64 GB table fill.
"""

import csv
import os

import pytest

from tpualign.golden import GOLDEN_NW_UNIT
from tpualign.io.bdna import read_bdna
from tpualign.ops import oracle, xla

GOLDEN = {k: GOLDEN_NW_UNIT[k] for k in ("small", "debug", "t", "smid")}
CORPUS = "/root/reference/bdna"
RESULTS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "results")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CORPUS), reason="reference corpus not mounted"
)


@pytest.mark.parametrize("name,want", sorted(GOLDEN.items()))
def test_golden_nw_scores(name, want):
    s1 = read_bdna(os.path.join(CORPUS, f"{name}1.bdna"))
    s2 = read_bdna(os.path.join(CORPUS, f"{name}2.bdna"))
    assert oracle.score(s1, s2) == want
    assert xla.score(s1, s2) == want


def _recorded_scoring(tsv: str):
    """The scoring config a committed sweep ran (from the sibling bench
    JSON's meta, recorded by ``cli.py bench`` since round 5)."""
    import json

    path = os.path.join(RESULTS, tsv.replace(".tsv", ".json"))
    if not os.path.exists(path):
        return None
    return json.load(open(path)).get("meta", {}).get("scoring")


@pytest.mark.parametrize(
    "tsv", ["sizes-nw-v5e1.tsv", "sizes-nw-band-v5e1.tsv"]
)
def test_recorded_bench_scores_match_reference_pins(tsv):
    """NW bench rows committed under results/ must carry the score the
    reference binary printed for that pair — when the sweep ran the
    reference's unit scoring.  Non-unit sweeps (e.g. the band 2/-3/-4
    rows, which the bench native-gates at run time) must at least record
    their config so the archive stays self-describing."""
    path = os.path.join(RESULTS, tsv)
    if not os.path.exists(path):
        pytest.skip(f"{tsv} not present")
    sc = _recorded_scoring(tsv)
    unit = dict(match=1, mismatch=0, gap=-1, mode="nw", matrix=None,
                gap_open=None, gap_extend=None)
    if sc != unit:
        assert sc is not None, f"{tsv}: sweep config not recorded"
        pytest.skip(f"{tsv} ran {sc}, not the pinned unit config")
    rows = list(csv.DictReader(open(path), delimiter="\t"))
    assert rows, "empty results file"
    checked = 0
    for row in rows:
        name = row["label"]
        if name in GOLDEN_NW_UNIT:
            assert int(row["score"]) == GOLDEN_NW_UNIT[name], (tsv, name)
            checked += 1
    assert checked >= 4


@pytest.mark.parametrize(
    "name,want",
    sorted(
        (k, v)
        for k, v in __import__(
            "tpualign.golden", fromlist=["GOLDEN_SW_2_1_2"]
        ).GOLDEN_SW_2_1_2.items()
        if k in ("small", "debug", "t", "smid")
    ),
)
def test_golden_sw_scores(name, want):
    """SW pins are self-pinned from the independent C++ scorer (the
    reference has no SW); the tiny pairs re-verify end-to-end here."""
    from tpualign.config import AlignMode, ScoringConfig

    sw = ScoringConfig(match=2, mismatch=-1, gap=-2, mode=AlignMode.LOCAL)
    s1 = read_bdna(os.path.join(CORPUS, f"{name}1.bdna"))
    s2 = read_bdna(os.path.join(CORPUS, f"{name}2.bdna"))
    assert oracle.score(s1, s2, sw) == want


def test_recorded_sw_bench_scores_match_pins():
    from tpualign.golden import GOLDEN_SW_2_1_2

    path = os.path.join(RESULTS, "sizes-sw-v5e1.tsv")
    if not os.path.exists(path):
        pytest.skip("sizes-sw-v5e1.tsv not present")
    sc = _recorded_scoring("sizes-sw-v5e1.tsv")
    pinned = dict(match=2, mismatch=-1, gap=-2, mode="sw", matrix=None,
                  gap_open=None, gap_extend=None)
    if sc != pinned:
        assert sc is not None, "sw sweep config not recorded"
        pytest.skip(f"sw sweep ran {sc}, not the pinned 2/-1/-2 config")
    rows = list(csv.DictReader(open(path), delimiter="\t"))
    checked = 0
    for row in rows:
        if row["label"] in GOLDEN_SW_2_1_2:
            assert int(row["score"]) == GOLDEN_SW_2_1_2[row["label"]]
            checked += 1
    assert checked >= 4
