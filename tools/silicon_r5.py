"""Round-5 silicon queue: every new-capability measurement of the round,
re-runnable end to end on the chip.

Stages (each independently timed, native-gated where feasible; the
measured rows of the original run are committed in
``results/large-scale-v5e1.json`` + ``results/roofline.md``):

1. iupac16      — 16-code matrix on the band kernel at the 64gb shape
2. align64      — 64gb semiglobal/infix/matrix-NW/matrix-SW alignments
                  (device locate + k-way band recovery), native-checked
3. large_modes  — matrix/sg scores through band_chunked at 400k
                  (native-checked) and 2.5M scale
4. affine32     — band-affine and affine-semiglobal on the 32gb pair
5. op_account   — the flagship per-group cycle account

Usage: python tools/silicon_r5.py [stage ...]   (default: all)
"""

import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _bench(fn_builder, s1, s2, label):
    import jax
    import jax.numpy as jnp

    from tpualign.bench.harness import time_device_fn

    fn = jax.jit(fn_builder(int(s1.size), int(s2.size)))
    d1 = jnp.asarray(np.asarray(s1), jnp.int32)
    d2 = jnp.asarray(np.asarray(s2), jnp.int32)
    return time_device_fn(fn, (d1, d2), label=label,
                          cells=int(s1.size) * int(s2.size))


def stage_iupac16():
    from tpualign.config import ScoringConfig
    from tpualign.matrices import iupac
    from tpualign.ops import band
    from tpualign.utils import native

    rng = np.random.default_rng(9)
    cfg = ScoringConfig(gap=-2, matrix=iupac(2, -1))
    s1 = rng.integers(1, 16, 126440).astype(np.int8)
    s2 = rng.integers(1, 16, 127240).astype(np.int8)
    r = _bench(lambda m, n: band.score_fn(m, n, cfg), s1, s2, "iupac16")
    want = native.score(s1, s2, cfg)
    assert r.score == want, (r.score, want)
    print(f"iupac16 64gb-shape: {r.gcups_best:.1f} GCUPS "
          f"score {r.score} (native OK)", flush=True)


def stage_align64():
    from tpualign import align
    from tpualign.config import AlignMode, ScoringConfig
    from tpualign.io.bdna import read_bdna
    from tpualign.matrices import dna
    from tpualign.ops import oracle
    from tpualign.utils import native

    s1 = read_bdna("/root/reference/bdna/64gb-1.bdna")
    s2 = read_bdna("/root/reference/bdna/64gb-2.bdna")
    cases = [
        ("semiglobal", ScoringConfig(match=2, mismatch=-1, gap=-2,
                                     mode=AlignMode.SEMIGLOBAL)),
        ("infix", ScoringConfig(match=2, mismatch=-1, gap=-2,
                                mode=AlignMode.INFIX)),
        ("matrix-NW", ScoringConfig(gap=-2, matrix=dna(2, -1, -3))),
        ("matrix-SW", ScoringConfig(gap=-2, matrix=dna(2, -1, -3),
                                    mode=AlignMode.LOCAL)),
    ]
    for name, cfg in cases:
        t0 = time.perf_counter()
        sc, a1, a2 = align(s1, s2, cfg)
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        sc2, _, _ = align(s1, s2, cfg)
        warm = time.perf_counter() - t0
        want = native.score(s1, s2, cfg)
        gcfg = cfg.with_mode(AlignMode.GLOBAL)
        valid = (not a1) or oracle.alignment_score(a1, a2, gcfg) == sc
        assert sc == sc2 == want and valid, (name, sc, want)
        print(f"{name}: cold {cold:.1f} s warm {warm:.1f} s score {sc} "
              f"(native OK, valid)", flush=True)


def stage_large_modes():
    from tpualign.config import AlignMode, ScoringConfig
    from tpualign.matrices import dna
    from tpualign.ops import band_chunked
    from tpualign.utils import native

    MAT_NW = ScoringConfig(gap=-2, matrix=dna(2, -1, -3))
    SG = ScoringConfig(match=2, mismatch=-1, gap=-2,
                       mode=AlignMode.SEMIGLOBAL)
    for (m, n, check) in ((400_000, 398_000, True),
                          (2_500_000, 2_480_000, False)):
        s1 = np.asarray(native.generate(m, seed=21), np.int8)
        s2 = np.asarray(native.generate(n, seed=22), np.int8)
        for name, cfg in (("chunked-matrix-nw", MAT_NW), ("chunked-sg", SG)):
            r = _bench(lambda mm, nn, c=cfg: band_chunked.score_fn(mm, nn, c),
                       s1, s2, name)
            line = f"{name} {m//1000}k: {r.gcups_best:.0f} GCUPS score {r.score}"
            if check:
                want = native.score(s1, s2, cfg)
                assert r.score == want, (name, r.score, want)
                line += " (native OK)"
            print(line, flush=True)


def stage_affine32():
    from tpualign.config import AlignMode, ScoringConfig
    from tpualign.io.bdna import read_bdna
    from tpualign.ops import band
    from tpualign.utils import native

    s1 = read_bdna("/root/reference/bdna/32gb-1.bdna")
    s2 = read_bdna("/root/reference/bdna/32gb-2.bdna")
    for name, cfg in (
        ("band-affine", ScoringConfig(match=2, mismatch=-3, gap_open=-5,
                                      gap_extend=-2, gap=-2)),
        ("band-affine-sg", ScoringConfig(match=2, mismatch=-1, gap_open=-5,
                                         gap_extend=-2, gap=-2,
                                         mode=AlignMode.SEMIGLOBAL)),
    ):
        r = _bench(lambda m, n, c=cfg: band.score_fn(m, n, c), s1, s2, name)
        want = native.score(s1, s2, cfg)
        assert r.score == want, (name, r.score, want)
        print(f"{name} 32gb: {r.gcups_best:.1f} GCUPS score {r.score} "
              f"(native OK)", flush=True)


def stage_op_account():
    r = subprocess.run([sys.executable, "tools/op_account.py"])
    assert r.returncode == 0


STAGES = {
    "iupac16": stage_iupac16,
    "align64": stage_align64,
    "large_modes": stage_large_modes,
    "affine32": stage_affine32,
    "op_account": stage_op_account,
}


def main(argv):
    names = argv or list(STAGES)
    for name in names:
        t0 = time.perf_counter()
        print(f"=== {name} ===", flush=True)
        try:
            STAGES[name]()
            print(f"=== {name} done in {time.perf_counter()-t0:.0f} s ===",
                  flush=True)
        except Exception as e:  # keep the queue going
            print(f"=== {name} FAILED: {e} ===", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
