"""Headline benchmark: NW score GCUPS on the 64gb corpus pair, single chip.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": "GCUPS", "vs_baseline": N}

Baseline: the reference repo's best 64gb number — the hybrid MPI x OpenMP fill
at 2,996 ms = 5.37 GCUPS (``data/multi.tsv:6``, see BASELINE.md).  The same
pair (126,440 x 127,240 bases, 16.09e9 cells) is loaded from the reference
corpus when mounted, otherwise regenerated at identical lengths.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_GCUPS = 5.37  # reference best: hybrid, 64gb pair (data/multi.tsv:6)
PAIR_LENGTHS = (126440, 127240)  # bdna/64gb-{1,2}.bdna
CORPUS = "/root/reference/bdna"


def load_pair():
    from tpualign.io.bdna import random_pair, read_bdna

    p1 = os.path.join(CORPUS, "64gb-1.bdna")
    p2 = os.path.join(CORPUS, "64gb-2.bdna")
    if os.path.exists(p1) and os.path.exists(p2):
        return read_bdna(p1), read_bdna(p2)
    return random_pair(*PAIR_LENGTHS, seed=64)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpualign.config import ScoringConfig
    from tpualign.ops import bitpal, xla as xla_ops

    s1, s2 = load_pair()
    if len(s2) > len(s1):
        s1, s2 = s2, s1
    cells = len(s1) * len(s2)

    if jax.default_backend() == "tpu":
        # flagship engine: bit-parallel wavefront, 31 DP cells per lane word
        fn = jax.jit(bitpal.score_fn(len(s1), len(s2), ScoringConfig()))
    else:  # degraded environment: portable engine so the bench still reports
        fn = jax.jit(xla_ops.score_fn(ScoringConfig()))

    d1 = jnp.asarray(s1, jnp.int32)
    d2 = jnp.asarray(s2, jnp.int32)
    score = int(fn(d1, d2).block_until_ready())  # compile + warmup

    # Per-run time is measured by iterating the kernel K times inside ONE
    # dispatch: host<->device round-trip latency (~30 ms through the axon
    # tunnel) would otherwise dominate a ~25 ms kernel.  The scan carry
    # perturbs the first input char of every iteration after the first, so
    # no iteration can be CSEd or hoisted; iteration 0 computes the true
    # score, which is checked against the golden value.
    K = 12
    sentinel = jnp.int32(-(2**30))

    @jax.jit
    def fn_k(a, b):
        def body(carry, _):
            a2 = a.at[0].set(
                jnp.where(carry == sentinel, a[0], (carry & 3) + 1)
            )
            s = fn(a2, b)
            return s, s

        _, scores = jax.lax.scan(body, sentinel, None, length=K)
        return scores

    scores = fn_k(d1, d2)
    scores.block_until_ready()  # compile + warmup
    assert int(scores[0]) == score

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn_k(d1, d2).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / K)

    gcups = cells / best / 1e9
    print(
        json.dumps(
            {
                "metric": "NW score GCUPS, 64gb pair (16.09e9 cells), 1 chip",
                "value": round(gcups, 2),
                "unit": "GCUPS",
                "vs_baseline": round(gcups / BASELINE_GCUPS, 2),
                "wall_ms": round(best * 1e3, 1),
                "score": score,
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
