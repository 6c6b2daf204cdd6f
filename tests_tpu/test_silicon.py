"""Compiled-on-silicon validation of every engine surface (pytest -m tpu).

Successor of ``tools/tpu_smoke.py`` (verdict r1 item #6: nothing prevented a
regression that passes the interpreted CPU suite and breaks on Mosaic).  Each
test compiles the real kernel on the chip and checks scores against the
oracle / golden pins / the independent native scorer.
"""

import numpy as np
import pytest

CORPUS = "/root/reference/bdna"


@pytest.fixture(scope="module")
def corpus_pair():
    from tpualign.io.bdna import read_bdna

    def load(name):
        return (
            read_bdna(f"{CORPUS}/{name}1.bdna"),
            read_bdna(f"{CORPUS}/{name}2.bdna"),
        )

    return load


@pytest.mark.parametrize("impl", ["bitpal", "band", "pallas", "xla"])
def test_golden_corpus_every_engine(corpus_pair, impl):
    from tpualign import align_score
    from tpualign.config import EngineConfig
    from tpualign.golden import GOLDEN_NW_UNIT

    for name in ("debug", "small", "t", "smid"):
        s1, s2 = corpus_pair(name)
        got = align_score(s1, s2, engine=EngineConfig(impl=impl))
        assert got == GOLDEN_NW_UNIT[name], (name, impl)


@pytest.mark.parametrize(
    "cfg_args",
    [
        {},
        {"match": 1, "mismatch": -2, "gap": -4},
        {"gap": -2},  # generalized-g kernel
        {"match": 3, "mismatch": 2, "gap": -1},
        {"mode": "local"},
        {"match": 2, "mismatch": 1, "gap": -2},  # non-family -> band
        {"match": 2, "mismatch": -1, "gap": -2, "mode": "local"},
    ],
)
def test_random_pairs_vs_oracle(cfg_args):
    from tpualign import align_score
    from tpualign.config import AlignMode, ScoringConfig
    from tpualign.io.bdna import random_pair
    from tpualign.ops import oracle

    kw = dict(cfg_args)
    if kw.pop("mode", None):
        kw["mode"] = AlignMode.LOCAL
    cfg = ScoringConfig(**kw)
    s1, s2 = random_pair(3001, 2777, seed=sum(map(abs, map(hash, kw))) % 997)
    assert align_score(s1, s2, cfg) == oracle.score(s1, s2, cfg)


def test_lean_and_base_flagship_schedules():
    # the round-3 lean schedule and the round-2 base schedule must compile
    # on Mosaic and agree on silicon (the CPU suite already pins exactness
    # in interpret mode; this catches schedule-specific Mosaic regressions)
    import jax.numpy as jnp

    from tpualign.io.bdna import random_pair
    from tpualign.ops import bitpal

    s1, s2 = random_pair(40_000, 38_000, seed=33)
    d1, d2 = jnp.asarray(s1, jnp.int32), jnp.asarray(s2, jnp.int32)
    scores = []
    for lean in (True, False):
        fn = bitpal.score_fn(len(s1), len(s2), lean=lean)
        scores.append(int(fn(d1, d2)))
    assert scores[0] == scores[1]


def test_band_engine_multi_strip():
    # n > R forces the SMEM boundary-row hand-off between strips on silicon
    from tpualign.config import ScoringConfig
    from tpualign.io.bdna import random_pair
    from tpualign.ops import band, oracle

    s1, s2 = random_pair(2000, 9000, seed=3)
    cfg = ScoringConfig(match=2, mismatch=-3, gap=-2)
    assert band.score(s1, s2, cfg, rows=8) == oracle.score(s1, s2, cfg)


def test_chunked_text_vs_native():
    from tpualign.io.bdna import random_pair
    from tpualign.ops import bitpal
    from tpualign.utils import native

    s1, s2 = random_pair(3_000_000, 5_000, seed=1)
    got = bitpal.score(s1, s2)  # auto: rc=4 resumable chunk kernel
    if native.available():
        assert got == native.score(s1, s2)
    fn1 = bitpal.score_fn(len(s1), len(s2), cols_per_step=1)
    import jax.numpy as jnp

    assert int(fn1(jnp.asarray(s1, jnp.int32), jnp.asarray(s2, jnp.int32))) \
        == got


def test_sharded_pipeline_p1():
    from tpualign.config import ScoringConfig
    from tpualign.io.bdna import random_pair
    from tpualign.ops import oracle
    from tpualign.parallel import bitpal_strips
    from tpualign.parallel.mesh import make_mesh

    s1, s2 = random_pair(3000, 2900, seed=11)
    got = bitpal_strips.score(s1, s2, mesh=make_mesh(1), chunk_cols=512)
    assert got == oracle.score(s1, s2, ScoringConfig())


def test_batch_api():
    from tpualign import align_score_batch
    from tpualign.config import ScoringConfig
    from tpualign.io.bdna import random_pair
    from tpualign.ops import oracle

    texts, queries, want = [], [], []
    for i in range(4):
        a, b = random_pair(200 + i, 150 + i, seed=i)
        texts.append(a)
        queries.append(b)
        want.append(oracle.score(a, b, ScoringConfig()))
    assert align_score_batch(texts, queries).tolist() == want


def test_chunked_band_multi_block():
    # column blocks narrower than the text force the captured/injected
    # boundary-COLUMN hand-off on silicon (the 200k-cap lift, round 3);
    # small rows also crosses the in-block SMEM boundary-row hand-off
    from tpualign.config import AlignMode, ScoringConfig
    from tpualign.io.bdna import random_pair
    from tpualign.ops import band_chunked, oracle

    s1, s2 = random_pair(9000, 2000, seed=5)
    gen = ScoringConfig(match=2, mismatch=-3, gap=-2)
    sw = ScoringConfig(match=3, mismatch=-2, gap=-1, mode=AlignMode.LOCAL)
    for cfg in (gen, sw):
        got = band_chunked.score(s1, s2, cfg, rows=4, block=2048)
        assert got == oracle.score(s1, s2, cfg), cfg.mode


def test_band_strips_p1():
    # sharded band fill compiles on the chip (P=1: the halo ppermute is
    # identity but the chunked-mode kernel + pipeline scan are real)
    from tpualign.config import ScoringConfig
    from tpualign.io.bdna import random_pair
    from tpualign.ops import oracle
    from tpualign.parallel import band_strips
    from tpualign.parallel.mesh import make_mesh

    s1, s2 = random_pair(4000, 3000, seed=9)
    cfg = ScoringConfig(match=2, mismatch=-3, gap=-4)
    got = band_strips.score(s1, s2, cfg, mesh=make_mesh(1), rows=4)
    assert got == oracle.score(s1, s2, cfg)


def test_mid_alignment_valid(corpus_pair):
    from tpualign import align
    from tpualign.ops import bitpal, oracle

    s1, s2 = corpus_pair("mid")
    sc, a1, a2 = align(s1, s2)
    assert sc == oracle.alignment_score(a1, a2)
    assert sc == bitpal.score(s1, s2)
    assert a1.replace("-", "") == "".join("-ATGC"[c] for c in s1)
    assert a2.replace("-", "") == "".join("-ATGC"[c] for c in s2)


def test_affine_scoring_on_chip():
    # affine (Gotoh) configs: the band kernel's Gotoh mode (the auto
    # engine on TPU) and the XLA scan both compile on Mosaic/XLA and
    # agree with the oracle
    from tpualign import align_score
    from tpualign.config import AlignMode, ScoringConfig
    from tpualign.io.bdna import random_pair
    from tpualign.ops import band, oracle, xla

    for mode in (AlignMode.GLOBAL, AlignMode.LOCAL):
        cfg = ScoringConfig(match=2, mismatch=-3, gap_open=-5,
                            gap_extend=-2, mode=mode)
        s1, s2 = random_pair(3000, 2800, seed=17)
        want = oracle.score(s1, s2, cfg)
        assert align_score(s1, s2, cfg) == want  # auto -> band on TPU
        assert band.score(s1, s2, cfg) == want
        assert xla.score(s1, s2, cfg) == want


def test_affine_alignment_on_chip():
    # Myers-Miller bisection rides the device scans on the chip
    from tpualign import align
    from tpualign.config import ScoringConfig
    from tpualign.io.bdna import random_pair
    from tpualign.ops import affine_align, oracle

    cfg = ScoringConfig(match=2, mismatch=-3, gap_open=-5, gap_extend=-2)
    s1, s2 = random_pair(2000, 2100, seed=18)
    sc, a1, a2 = affine_align.align(s1, s2, cfg)
    assert oracle.alignment_score(a1, a2, cfg) == sc
    assert sc == oracle.score(s1, s2, cfg)


def test_matrix_and_ends_free_on_chip():
    # round-4 scoring shapes: the band kernel's profile planes and the
    # ends-free extraction compile on Mosaic and agree with the oracle
    from tpualign import align_score
    from tpualign.config import AlignMode, ScoringConfig
    from tpualign.io.bdna import random_pair
    from tpualign.matrices import dna
    from tpualign.ops import band, oracle

    MAT = dna(2, -1, -3)
    s1, s2 = random_pair(3000, 2800, seed=19)
    for cfg in (
        ScoringConfig(gap=-2, matrix=MAT),
        ScoringConfig(gap=-2, matrix=MAT, mode=AlignMode.LOCAL),
        ScoringConfig(match=2, mismatch=-1, gap=-2,
                      mode=AlignMode.SEMIGLOBAL),
        ScoringConfig(match=2, mismatch=-1, gap=-2, mode=AlignMode.INFIX),
        ScoringConfig(gap=-2, matrix=MAT, mode=AlignMode.SEMIGLOBAL),
        ScoringConfig(gap=-2, matrix=MAT, gap_open=-5, gap_extend=-2),
        # round 5: affine ends-free boundary-F forms
        ScoringConfig(match=2, mismatch=-1, gap=-2, gap_open=-5,
                      gap_extend=-2, mode=AlignMode.SEMIGLOBAL),
    ):
        want = oracle.score(s1, s2, cfg)
        assert band.score(s1, s2, cfg) == want, cfg
        assert align_score(s1, s2, cfg) == want, cfg  # auto -> band


def test_wide_alphabet_on_chip():
    # round 5: a 16-code IUPAC ambiguity matrix on the band kernel (both
    # sentinels at code K, injected post-unpack)
    import numpy as np

    from tpualign.config import ScoringConfig
    from tpualign.matrices import iupac
    from tpualign.ops import band
    from tpualign.utils import native

    rng = np.random.default_rng(29)
    s1 = rng.integers(1, 16, 3000).astype(np.int8)
    s2 = rng.integers(1, 16, 2800).astype(np.int8)
    cfg = ScoringConfig(gap=-2, matrix=iupac(2, -1))
    got = band.score(s1, s2, cfg)
    if native.available():
        assert got == native.score(s1, s2, cfg)


def test_chunked_modes_on_chip():
    # round 5: matrix / ends-free / affine through the chunked tier's
    # block coupling (E columns, F boundary rows) on Mosaic
    from tpualign.config import AlignMode, ScoringConfig
    from tpualign.io.bdna import random_pair
    from tpualign.matrices import dna
    from tpualign.ops import band_chunked, oracle

    s1, s2 = random_pair(5000, 4600, seed=31)
    for cfg in (
        ScoringConfig(gap=-2, matrix=dna(2, -1, -3),
                      mode=AlignMode.SEMIGLOBAL),
        ScoringConfig(match=2, mismatch=-1, gap=-2, gap_open=-5,
                      gap_extend=-2, mode=AlignMode.INFIX),
        ScoringConfig(gap=-2, matrix=dna(2, -1, -3), gap_open=-5,
                      gap_extend=-2),
    ):
        got = band_chunked.score(s1, s2, cfg, rows=8, block=1024)
        assert got == oracle.score(s1, s2, cfg), cfg


def test_ends_free_locate_on_chip():
    # round 5: the device locate fills (bottom-aligned boundary rows +
    # right-column capture) against the native scanner
    from tpualign.config import AlignMode, ScoringConfig
    from tpualign.io.bdna import random_pair
    from tpualign.ops import band_align
    from tpualign.utils import native

    s1, s2 = random_pair(4000, 3700, seed=37)
    for mode in (AlignMode.SEMIGLOBAL, AlignMode.INFIX):
        cfg = ScoringConfig(match=2, mismatch=-1, gap=-2, mode=mode)
        got = band_align.locate_flex_device(s1, s2, cfg)
        if native.available():
            assert got == native.locate_flex(s1, s2, cfg), mode
