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
