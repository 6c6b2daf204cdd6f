"""Linear-space alignment recovery at bit-parallel speed: Hirschberg bisection.

The reference computes only the final score (``driver.cpp:35``); alignment
recovery is a new capability of this framework.  ``ops/traceback_diag.py``
recovers the exact reference-tie-order path from checkpointed diagonals of
the general wavefront kernel; this module recovers an (equally optimal)
alignment 1-2 orders of magnitude faster for the bit-parallel scoring family
by classic divide and conquer (Hirschberg 1975):

1. Split the text at ``mid``.  One forward bit-parallel fill of
   ``text[:mid]`` yields the whole score column ``F(i) = H(i, mid)`` — the
   final-column vertical deltas the kernel already produces, prefix-summed.
   One fill of the *reversed* right half yields
   ``R(i) = best score of aligning text[mid:] with query[i:]``.
2. The crossing row is ``argmax_i F(i) + R(i)``; recurse on the two halves.
3. Segments under ``base_cells`` use the exact full-table traceback
   (``ops/oracle.py``), which also fixes the intra-segment tie order.

Total device work ~= 2x one score fill per bisection node; memory is
O(query) — no O(nm) table ever exists.  Every segment is padded to ONE
root-sized shape bucket with the true text length dynamic
(``bitpal._chunk_kernel_body``), and each node's forward/reverse fills are
vmapped into a single dispatch: the whole recursion costs exactly one kernel
compilation (cached across calls) plus one device round-trip per node —
compilation and host-link latency, not the fill, would otherwise dominate.

The recovered alignment is optimal (its score equals the DP optimum — the
invariant the tests check); the global tie order among co-optimal paths may
differ from the reference's diag>up>left convention, which
``traceback_diag`` provides when exact-tie parity matters.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

from ..config import ScoringConfig
from . import bitpal, oracle
from .bitpal import LANES, UNROLL, UNROLL_INTERPRET, WORD, _round_up

#: segments at or under this many DP cells drop to the exact full-table
#: traceback (fast in NumPy, and fixes the intra-segment tie order)
BASE_CELLS = 1 << 22


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1)).bit_length()


@functools.lru_cache(maxsize=None)
def _col_scores_call(nw_cap: int, t_cap: int, g: int, interpret: bool):
    """Jitted ``(query_pads, text_pads, mts) -> H(:, mt)`` pair for one
    shape bucket, vmapped over a leading batch axis (the bisection's forward
    and reverse fills ride one dispatch).

    ``query_pad`` rows are ``(nw_cap * 31,)`` (pad rows = char 0 never match
    and sit after every real row, so the H prefix is exact); text rows are
    ``(t_cap,)`` with the true length ``mt`` dynamic.
    """
    import jax
    import jax.numpy as jnp

    unroll = UNROLL_INTERPRET if interpret else UNROLL
    rows = _round_up(nw_cap, bitpal.GRAIN) // LANES
    nq_cap = nw_cap * WORD
    # texts beyond the SMEM budget scan the chunk kernel over slices (state
    # carried on-device), exactly like bitpal._score_chunked_fn
    slice_cap = bitpal.TEXT_SMEM_CAP // 2
    t_steps = _round_up(min(t_cap + 2 * nw_cap, slice_cap), max(unroll, 16))
    n_chunks = -(-(t_cap + 2 * nw_cap) // t_steps)
    B = 2 if g == 1 else max(1, (2 * g + 1).bit_length())
    u_words = -(-t_steps // (32 // B))

    def fn(query_pad: jax.Array, text_pad: jax.Array, mt: jax.Array):
        eq = bitpal._eq_planes(query_pad, nq_cap, nw_cap, rows)
        tfull = jnp.zeros((n_chunks * t_steps,), jnp.int32)
        tfull = jax.lax.dynamic_update_slice(tfull, text_pad, (0,))
        shifts8 = jnp.arange(8, dtype=jnp.int32) * 4
        tpacked = jnp.sum(
            tfull.reshape(n_chunks, t_steps // 8, 8) << shifts8[None, None, :],
            axis=2, dtype=jnp.int32,
        )
        ustream = jnp.zeros((u_words,), jnp.int32)

        def chunk(state, x):
            q, tchunk = x
            new_state, _ = bitpal.chunk_call(
                jnp.stack([q * t_steps, mt.astype(jnp.int32)]),
                tchunk,
                ustream,
                eq,
                state,
                rows=rows,
                t_steps=t_steps,
                r_star=None,
                unroll=unroll,
                interpret=interpret,
                g=g,
            )
            return new_state, None

        state, _ = jax.lax.scan(
            chunk,
            bitpal.init_chunk_state(rows, g),
            (jnp.arange(n_chunks, dtype=jnp.int32), tpacked),
        )

        def bits(plane):
            words = plane.T.reshape(-1)[:nw_cap]  # column-major word order
            return (words[:, None] >> jnp.arange(WORD, dtype=jnp.int32)) & 1

        # per-row delta = enc - g
        v = sum((1 << b) * bits(state[b]) for b in range(B)) - g
        v = v.reshape(nq_cap)
        return jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(v, dtype=jnp.int32)]
        ) - g * mt.astype(jnp.int32)

    @jax.jit
    def pair(query_pads, text_pads, mts):
        # static batch of 2 (forward + reverse) in one dispatch; vmap would
        # batch the kernel's SMEM operands into shapes Mosaic rejects
        return jnp.stack(
            [fn(query_pads[i], text_pads[i], mts[i]) for i in range(2)]
        )

    return pair


def _col_scores_pair(
    texts, queries, nw_cap: int, t_cap: int, g: int, interpret: bool
):
    """Batched ``H(i, len(text))`` columns under ``(1, 0, -g)``, one per
    (text, query) pair; all pairs share the root-sized shape bucket."""
    import jax.numpy as jnp

    b = len(texts)
    qpad = np.zeros((b, nw_cap * WORD), np.int32)
    tpad = np.zeros((b, t_cap), np.int32)
    mts = np.zeros((b,), np.int32)
    for i, (t, q) in enumerate(zip(texts, queries)):
        qpad[i, : len(q)] = q
        tpad[i, : len(t)] = t
        mts[i] = len(t)
    fn = _col_scores_call(nw_cap, t_cap, g, interpret)
    out = np.asarray(fn(jnp.asarray(qpad), jnp.asarray(tpad), jnp.asarray(mts)))
    return [out[i, : len(q) + 1] for i, q in enumerate(queries)]


def align(
    s1,
    s2,
    cfg: ScoringConfig = ScoringConfig(),
    *,
    interpret: bool = False,
    base_cells: int = BASE_CELLS,
) -> Tuple[int, str, str]:
    """Score plus aligned strings, Hirschberg bisection over the bit-parallel
    engine.  ``s1`` = text (columns), ``s2`` = query (rows), matching
    :func:`tpualign.api.align`."""
    fam = bitpal.family(cfg)
    if fam is None:
        raise ValueError(
            "hirschberg alignment requires a bit-parallel scoring family "
            "(affinely reducible to (1,0,-g)); use the checkpointed "
            "traceback otherwise"
        )
    g = fam[1]
    s1 = np.asarray(s1, np.int32)
    s2 = np.asarray(s2, np.int32)
    nw_cap = _next_pow2(max(1, -(-len(s2) // WORD)))
    t_cap = _next_pow2(max(16, (len(s1) + 1) // 2))
    parts1: List[str] = []
    parts2: List[str] = []

    from ..utils import native

    use_native = native.available()

    def leaf(text, query):
        if use_native:
            try:  # C++ full-table walk: same strings, ~50x the NumPy oracle
                return native.traceback(text, query, cfg)
            except RuntimeError:
                pass
        return oracle.traceback(text, query, cfg)

    def rec(text: np.ndarray, query: np.ndarray) -> None:
        m, n = len(text), len(query)
        if (m + 1) * (n + 1) <= base_cells or m < 2 or n < 2:
            _, a1, a2 = leaf(text, query)
            parts1.append(a1)
            parts2.append(a2)
            return
        mid = m // 2
        F, R = _col_scores_pair(
            [text[:mid], text[mid:][::-1]],
            [query, query[::-1]],
            nw_cap, t_cap, g, interpret,
        )
        split = int(np.argmax(F + R[::-1]))
        rec(text[:mid], query[:split])
        rec(text[mid:], query[split:])

    rec(s1, s2)
    a1 = "".join(parts1)
    a2 = "".join(parts2)
    return oracle.alignment_score(a1, a2, cfg), a1, a2
