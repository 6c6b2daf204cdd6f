"""On-hardware validation sweep: every engine surface on the real chip.

The CPU test suite (``pytest tests/``) runs Pallas interpreted; this script
is the compiled-on-silicon counterpart — run it after kernel changes, before
trusting a bench number.  Exits nonzero on any mismatch.

Usage: python tools/tpu_smoke.py            (~4-6 min incl. compiles)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CORPUS = "/root/reference/bdna"
FAILURES = []


def check(name, got, want):
    ok = got == want
    print(f"{name}: {got} {'ok' if ok else f'!= {want}  FAIL'}")
    if not ok:
        FAILURES.append(name)


def main():
    import jax

    from tpualign import align, align_score, align_score_batch
    from tpualign.config import AlignMode, EngineConfig, ScoringConfig
    from tpualign.io.bdna import random_pair, read_bdna
    from tpualign.ops import bitpal, hirschberg, oracle
    from tpualign.parallel import bitpal_strips
    from tpualign.parallel.mesh import make_mesh

    print("backend:", jax.default_backend())

    # 1. golden corpus scores through every engine
    golden = {"debug": 27, "small": 2, "t": 17, "smid": 5839}
    for name, want in golden.items():
        s1 = read_bdna(f"{CORPUS}/{name}1.bdna")
        s2 = read_bdna(f"{CORPUS}/{name}2.bdna")
        for impl in ("bitpal", "pallas", "xla"):
            check(f"{name}/{impl}",
                  align_score(s1, s2, engine=EngineConfig(impl=impl)), want)

    # 2. random pairs vs oracle: unit + affine-family + SW
    rng = np.random.default_rng(7)
    for cfg in (ScoringConfig(),
                ScoringConfig(match=1, mismatch=-2, gap=-4),
                ScoringConfig(gap=-2),  # generalized-g kernel
                ScoringConfig(match=3, mismatch=2, gap=-1),
                ScoringConfig(mode=AlignMode.LOCAL)):
        s1, s2 = random_pair(3001, 2777, seed=int(rng.integers(1 << 30)))
        want = oracle.score(s1, s2, cfg)
        check(f"random/{cfg.match},{cfg.mismatch},{cfg.gap},{cfg.mode.value}",
              align_score(s1, s2, cfg), want)

    # 3. chunked-text path (beyond the SMEM budget)
    s1, s2 = random_pair(3_000_000, 5_000, seed=1)
    got = bitpal.score(s1, s2)
    # cross-check against the independent native C++ scorer
    from tpualign.utils import native

    if native.available():
        check("chunked-3M-text vs native", got, native.score(s1, s2))

    # 4. sharded pipeline, compiled, P=1 mesh
    s1, s2 = random_pair(3000, 2900, seed=11)
    check("bitpal_strips P=1",
          bitpal_strips.score(s1, s2, mesh=make_mesh(1), chunk_cols=512),
          oracle.score(s1, s2, ScoringConfig()))

    # 5. batch API
    texts, queries, want = [], [], []
    for i in range(4):
        a, b = random_pair(200 + i, 150 + i, seed=i)
        texts.append(a)
        queries.append(b)
        want.append(oracle.score(a, b, ScoringConfig()))
    check("batch", align_score_batch(texts, queries).tolist(), want)

    # 6. alignment: hirschberg on the mid pair, validity + score
    s1 = read_bdna(f"{CORPUS}/mid1.bdna")
    s2 = read_bdna(f"{CORPUS}/mid2.bdna")
    t0 = time.perf_counter()
    sc, a1, a2 = align(s1, s2)
    print(f"mid alignment: {time.perf_counter() - t0:.1f}s")
    check("mid align score", sc, oracle.alignment_score(a1, a2))
    check("mid align score vs bitpal", sc, bitpal.score(s1, s2))

    print("\n" + ("ALL OK" if not FAILURES else f"FAILURES: {FAILURES}"))
    return 1 if FAILURES else 0


if __name__ == "__main__":
    sys.exit(main())
