"""Benchmark harness: timing, GCUPS accounting, TSV/JSON emitters.

Successor of the reference's zsh harness (``src/benchmark-*.sh``,
``block-tune.sh``, ``buf-tune.sh``) and its TSV conventions (``data/*.tsv``):
repeated runs, best/avg statistics, tab-separated rows keyed by input size.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class BenchResult:
    label: str
    cells: int
    wall_s_best: float
    wall_s_avg: float
    wall_s_all: List[float]
    score: int

    @property
    def gcups_best(self) -> float:
        return self.cells / self.wall_s_best / 1e9

    @property
    def gcups_avg(self) -> float:
        return self.cells / self.wall_s_avg / 1e9

    def row(self) -> Dict[str, object]:
        return {
            "label": self.label,
            "cells": self.cells,
            "ms_best": round(self.wall_s_best * 1e3, 2),
            "ms_avg": round(self.wall_s_avg * 1e3, 2),
            "gcups_best": round(self.gcups_best, 3),
            "gcups_avg": round(self.gcups_avg, 3),
            "score": self.score,
            "samples_ms": [round(s * 1e3, 2) for s in self.wall_s_all],
        }


def amortized(fn: Callable, iters: int) -> Callable:
    """Wrap ``(seq1, seq2) -> score`` to run ``iters`` times in ONE dispatch.

    Host<->device round-trip latency (tens of ms through a tunneled chip) can
    dwarf a fast kernel; iterating on-device amortizes it.  The scan carry
    perturbs the first input char of every iteration after the first so no
    iteration can be CSEd or hoisted; iteration 0 returns the true score.
    """
    import jax
    import jax.numpy as jnp

    sentinel = jnp.int32(-(2**30))

    @jax.jit
    def fn_k(a, b):
        def body(carry, _):
            a2 = a.at[0].set(
                jnp.where(carry == sentinel, a[0], (carry & 3) + 1)
            )
            s = fn(a2, b)
            return s, s

        _, scores = jax.lax.scan(body, sentinel, None, length=iters)
        return scores[0]

    return fn_k


def time_device_fn(
    fn: Callable,
    args: Sequence,
    *,
    label: str,
    cells: int,
    runs: int = 3,
    target_s: float = 2.0,
    max_iters: int = 8192,
) -> BenchResult:
    """Best/avg-of-N timing of a jitted device function (after one warmup).

    Mirrors the reference's statistical hygiene: ``block-tune.sh`` best-of-2,
    ``benchmark-threads.sh`` 3-run average, raw samples kept for error bars
    (``data/multi-werror.tsv``).  Runs that finish well under ``target_s``
    are re-dispatched with on-device iteration (:func:`amortized`) so
    round-trip latency does not masquerade as kernel time; reported samples
    are per-iteration.

    This is THE headline timing recipe (round-3 verdict #8): ``target_s``
    sizes the in-dispatch iteration count so the ~30 ms tunnel round trip is
    amortized below ~2% even for ms-scale kernels; ``bench.py``, the size
    sweeps, and the large-scale runs all call this function, so the same
    point reads the same number (±ordinary run variance) on every surface.
    Sweeps that only need *relative* ordering (``cli.py tune``) may pass a
    smaller ``target_s``.
    """
    out = fn(*args)
    score = int(np.asarray(jax_block(out)))
    t0 = time.perf_counter()
    jax_block(fn(*args))
    t1 = time.perf_counter() - t0
    # Amortize the host<->device round trip below ~1% of the kernel: the
    # tunnel's dispatch floor is measured directly and the in-dispatch
    # iteration count sized so floor/iters <= 1% of the estimated kernel
    # time (bounded by max_iters and by ~2*target_s of wall per sample).
    floor = _dispatch_floor()
    kernel_est = max(t1 - floor, t1 / 4, 1e-6)
    want = floor / (0.01 * kernel_est)
    budget = 2.0 * target_s / kernel_est
    iters = int(min(max_iters, max(1, round(min(want, budget)))))
    if iters > 1:
        fn = amortized(fn, iters)
        got = int(np.asarray(jax_block(fn(*args))))  # compile + check
        assert got == score, f"amortized wrapper broke the score: {got}"
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        jax_block(fn(*args))
        samples.append((time.perf_counter() - t0) / iters)
    return BenchResult(
        label=label,
        cells=cells,
        wall_s_best=min(samples),
        wall_s_avg=sum(samples) / len(samples),
        wall_s_all=samples,
        score=score,
    )


def jax_block(x):
    return x.block_until_ready() if hasattr(x, "block_until_ready") else x


_FLOOR_CACHE: List[float] = []


def _dispatch_floor() -> float:
    """Measured per-dispatch host<->device round trip (min of 3): ~30 ms
    through the axon tunnel, ~100 us on a local backend."""
    if _FLOOR_CACHE:
        return _FLOOR_CACHE[0]
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    x = jnp.int32(1)
    f(x).block_until_ready()  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        f(x).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    _FLOOR_CACHE.append(best)
    return best


def write_tsv(path: str, results: Sequence[BenchResult]) -> None:
    cols = ["label", "cells", "ms_best", "ms_avg", "gcups_best", "gcups_avg", "score"]
    with open(path, "w") as f:
        f.write("\t".join(cols) + "\n")
        for r in results:
            row = r.row()
            f.write("\t".join(str(row[c]) for c in cols) + "\n")


def write_json(path: str, results: Sequence[BenchResult], meta: Optional[dict] = None) -> None:
    payload = {"meta": meta or {}, "results": [r.row() for r in results]}
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)
