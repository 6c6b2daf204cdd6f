"""Multi-chip scaling study for the bit-parallel word-band pipeline.

Hardware reality: this machine exposes ONE physical TPU chip, so multi-chip
behavior is validated two ways (the reference repo, by contrast, only ever
ran `mpirun` on one box, SURVEY.md §4):

1. **Exactness on emulated meshes** — the full sharded program (shard_map +
   ppermute + chunk kernels) runs on 1/2/4/8 virtual CPU devices and must
   reproduce the scalar oracle's score bit-exactly.
2. **Analytic pipeline efficiency** — the engine's only departures from
   perfect weak scaling are (a) the pipeline fill/drain bubble
   ``2(P-1)/(K + 2(P-1))`` and (b) the per-super-step halo, which is
   ``T/16`` int32 words (2-bit deltas): at T=1024 that is 256 B per
   neighbor per super-step against ~45 us of chunk compute on a v5e —
   around 1e-3 of ICI bandwidth-time, i.e. invisible.

Emits ``results/scaling-emulated.json``.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 python
tools/scaling_study.py  (conftest-style CPU forcing is applied here).
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from tpualign.config import ScoringConfig  # noqa: E402
from tpualign.io.bdna import random_pair  # noqa: E402
from tpualign.ops import oracle  # noqa: E402
from tpualign.parallel import bitpal_strips  # noqa: E402
from tpualign.parallel.mesh import make_mesh  # noqa: E402


def weak_scaling_model(nq_per_chip: int, mt: int, chunk_cols: int, P: int):
    """Efficiency = useful super-steps / total, for query scaled with P."""
    import tpualign.ops.bitpal as bp

    nw_local = -(-nq_per_chip // bp.WORD)
    delta = 2 * (nw_local - 1)
    T = max(chunk_cols, delta + 1)
    K = -(-(mt + delta) // T)
    bubble = 2 * (P - 1) / (K + 2 * (P - 1))
    return {
        "P": P,
        "chunk_cols_T": T,
        "super_steps_K": K,
        "bubble": round(bubble, 4),
        "weak_efficiency": round(1 - bubble, 4),
        "halo_bytes_per_superstep": T // 16 * 4,
    }


def main():
    out = {"exactness": [], "weak_scaling_model_64gb_class": []}
    cfg = ScoringConfig()
    for P in (1, 2, 4, 8):
        mesh = make_mesh(P)
        m, n = 260, 37 * P + 200  # query grows with the mesh
        s1, s2 = random_pair(m, n, seed=P)
        got = bitpal_strips.score(
            s1, s2, cfg, mesh=mesh, chunk_cols=32, interpret=True
        )
        want = oracle.score(s1, s2, cfg)
        ok = got == want
        print(f"P={P}: score {got} oracle {want} {'ok' if ok else 'FAIL'}")
        out["exactness"].append({"P": P, "m": m, "n": n, "exact": ok})
        assert ok

    # weak scaling: fixed per-chip band = the 64gb pair's query split 16 ways
    # (7,903 rows/chip), full corpus text — P=16 is exactly "the 64gb pair on
    # a v5e-16"
    for P in (1, 4, 16, 64):
        row = weak_scaling_model(
            nq_per_chip=7_903, mt=127_240, chunk_cols=1024, P=P
        )
        print("weak", row)
        out["weak_scaling_model_64gb_class"].append(row)

    # strong scaling: the whole 64gb pair split over P chips
    out["strong_scaling_model_64gb"] = []
    for P in (1, 2, 4, 8, 16):
        row = weak_scaling_model(
            nq_per_chip=-(-126_440 // P), mt=127_240, chunk_cols=1024, P=P
        )
        print("strong", row)
        out["strong_scaling_model_64gb"].append(row)

    # MEASURED pipeline-overhead shape on the virtual CPU mesh (verdict r1
    # item #9, successor of benchmark-threads.sh).  EMULATION, not
    # hardware scaling: all P virtual devices share one host core, so
    # wall(P)/wall(1) isolates exactly the pipeline's extra super-steps —
    # the serialized-host model is (K + P - 1)/K for the strips engine's
    # (P-1)-chunk fill.  The compiled (non-interpret) general engine is
    # used so walls are real XLA executions.
    import time

    from tpualign.parallel import strips
    from tpualign.parallel.mesh import AXIS

    out["measured_pipeline_overhead_cpu_mesh"] = {
        "note": (
            "virtual 8-device CPU mesh on ONE physical core: wall(P)/wall(1)"
            " is an emulation diagnostic, not hardware speedup. Model "
            "(K+P-1)/K counts the pipeline fill's extra super-steps; the "
            "measured excess beyond it is per-device program launch + "
            "collective overhead, which the single core serializes but a "
            "real mesh runs concurrently. The validated claim is the "
            "monotone fill-bubble shape, not the magnitude."
        ),
        "rows": [],
    }
    m0, n0, chunk = 1536, 4096, 256
    K = -(-n0 // chunk)
    base = None
    for P in (1, 2, 4, 8):
        mesh = make_mesh(P)
        fn, (m_pad, n_pad) = strips.score_fn(
            m0, n0, cfg, mesh=mesh, chunk_rows=chunk
        )
        s1, s2 = random_pair(m0, n0, seed=21)
        import numpy as _np

        p1 = _np.zeros(m_pad, _np.int32)
        p1[:m0] = s1
        p2 = _np.zeros(n_pad, _np.int32)
        p2[:n0] = s2
        spec = jax.sharding.PartitionSpec
        d1 = jax.device_put(
            p1, jax.sharding.NamedSharding(mesh, spec(AXIS))
        )
        d2 = jax.device_put(p2, jax.sharding.NamedSharding(mesh, spec()))
        jf = jax.jit(fn)
        got = int(_np.asarray(jf(d1, d2))[0])
        want = oracle.score(s1, s2, cfg)
        assert got == want, (P, got, want)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            jf(d1, d2).block_until_ready()
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        if base is None:
            base = wall
        row = {
            "P": P,
            "wall_ms": round(wall * 1e3, 2),
            "overhead_measured": round(wall / base, 3),
            "overhead_model": round((K + P - 1) / K, 3),
        }
        print("measured", row)
        out["measured_pipeline_overhead_cpu_mesh"]["rows"].append(row)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "results",
        "scaling-emulated.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
