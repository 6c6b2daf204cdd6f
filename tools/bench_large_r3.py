"""Round-3 large-scale silicon runs: the unbounded-boundary chunked band
engine at >MAX_BOUNDARY scale, plus the refreshed 64gb headline and the
round-3 SW/general alignment walls — feeds ``results/large-scale-v5e1.json``.

Run on the real chip (sequentially — the tunnel serializes anyway):
    python tools/bench_large_r3.py [--quick]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="skip the 2.5M rows (for a fast smoke)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpualign.bench.harness import time_device_fn
    from tpualign.config import AlignMode, ScoringConfig
    from tpualign.io.bdna import random_pair, read_bdna
    from tpualign.ops import band_chunked, bitpal

    assert jax.default_backend() == "tpu", "silicon runs only"

    GEN = ScoringConfig(match=2, mismatch=-3, gap=-4)
    SW = ScoringConfig(match=3, mismatch=-2, gap=-1, mode=AlignMode.LOCAL)
    out = []

    # --- 64gb headline, unified recipe (verdict #8/#9) ---
    s1 = read_bdna("/root/reference/bdna/64gb-1.bdna")
    s2 = read_bdna("/root/reference/bdna/64gb-2.bdna")
    if len(s2) > len(s1):
        s1, s2 = s2, s1
    cells = len(s1) * len(s2)
    fn = jax.jit(bitpal.score_fn(len(s1), len(s2), ScoringConfig()))
    d1, d2 = jnp.asarray(s1, jnp.int32), jnp.asarray(s2, jnp.int32)
    r = time_device_fn(fn, (d1, d2), label="64gb-bitpal", cells=cells)
    out.append({"pair": "64gb corpus", "engine": "bitpal",
                "wall_s": round(r.wall_s_best, 5),
                "gcups": round(r.gcups_best), "score": r.score})
    print(json.dumps(out[-1]), flush=True)

    # --- A/B: round-2 base schedule vs the round-3 lean flagship ---
    fn_base = jax.jit(
        bitpal.score_fn(len(s1), len(s2), ScoringConfig(), lean=False)
    )
    r = time_device_fn(fn_base, (d1, d2), label="64gb-bitpal-base",
                       cells=cells)
    out.append({"pair": "64gb corpus", "engine": "bitpal-base-sched",
                "wall_s": round(r.wall_s_best, 5),
                "gcups": round(r.gcups_best), "score": r.score})
    print(json.dumps(out[-1]), flush=True)

    # --- 64gb band engines under the same recipe (NW-general + SW) ---
    from tpualign.ops import band

    for cfg, name in ((GEN, "nw-gen"), (SW, "sw")):
        fnb = jax.jit(band.score_fn(len(s1), len(s2), cfg))
        r = time_device_fn(fnb, (d1, d2), label=f"64gb-band-{name}",
                           cells=cells)
        out.append({"pair": "64gb corpus", "engine": f"band-{name}",
                    "wall_s": round(r.wall_s_best, 5),
                    "gcups": round(r.gcups_best), "score": r.score})
        print(json.dumps(out[-1]), flush=True)

    # --- affine (Gotoh) scoring walls: mid corpus, band kernel vs XLA ---
    a1 = read_bdna("/root/reference/bdna/mid1.bdna")
    a2 = read_bdna("/root/reference/bdna/mid2.bdna")
    AFF = ScoringConfig(match=2, mismatch=-3, gap_open=-5, gap_extend=-2)
    from tpualign.ops import band as band_ops
    from tpualign.ops import xla as xla_ops

    da1, da2 = jnp.asarray(a1, jnp.int32), jnp.asarray(a2, jnp.int32)
    from tpualign.utils import native

    aff_want = native.score(a1, a2, AFF) if native.available() else None
    for eng, fn in (
        ("band-affine", jax.jit(band_ops.score_fn(len(a1), len(a2), AFF))),
        ("xla-affine", jax.jit(xla_ops.score_fn(AFF))),
    ):
        r = time_device_fn(fn, (da1, da2), label=f"mid-{eng}",
                           cells=len(a1) * len(a2))
        if aff_want is not None:
            assert r.score == aff_want, (eng, r.score, aff_want)
        out.append({"pair": "mid corpus", "engine": f"{eng}(2/-3,-5/-2)",
                    "wall_s": round(r.wall_s_best, 4),
                    "gcups": round(r.gcups_best, 1), "score": r.score,
                    "checked": "native" if aff_want is not None else "none"})
        print(json.dumps(out[-1]), flush=True)

    # --- 400k x 398k: beyond MAX_BOUNDARY on BOTH axes -> chunked engine ---
    t1, t2 = random_pair(400_000, 398_000, seed=400)
    dt1, dt2 = jnp.asarray(t1, jnp.int32), jnp.asarray(t2, jnp.int32)
    for cfg, name in ((GEN, "nw-gen"), (SW, "sw")):
        fnc = jax.jit(band_chunked.score_fn(len(t1), len(t2), cfg))
        r = time_device_fn(fnc, (dt1, dt2), label=f"400k-chunked-{name}",
                           cells=len(t1) * len(t2))
        out.append({"pair": "synthetic 400k x 398k",
                    "engine": f"band-chunked-{name}",
                    "wall_s": round(r.wall_s_best, 4),
                    "gcups": round(r.gcups_best), "score": r.score})
        print(json.dumps(out[-1]), flush=True)

    if not args.quick:
        # --- 2.5M x 2.48M: the flagship-scale pair, general scoring + SW ---
        u1, u2 = random_pair(2_500_000, 2_480_000, seed=25)
        du1, du2 = jnp.asarray(u1, jnp.int32), jnp.asarray(u2, jnp.int32)
        for cfg, name in ((GEN, "nw-gen"), (SW, "sw")):
            fnc = jax.jit(band_chunked.score_fn(len(u1), len(u2), cfg))
            t0 = time.perf_counter()
            sc = int(fnc(du1, du2).block_until_ready())
            cold = time.perf_counter() - t0
            t0 = time.perf_counter()
            sc2 = int(fnc(du1, du2).block_until_ready())
            warm = time.perf_counter() - t0
            assert sc == sc2
            out.append({"pair": "synthetic 2.5M x 2.48M",
                        "engine": f"band-chunked-{name}",
                        "wall_s": round(warm, 3),
                        "gcups": round(len(u1) * len(u2) / warm / 1e9),
                        "score": sc, "cold_s": round(cold, 1)})
            print(json.dumps(out[-1]), flush=True)

    with open("/tmp/bench_large_r3.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote /tmp/bench_large_r3.json")


if __name__ == "__main__":
    main()
