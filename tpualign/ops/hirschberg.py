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
def _split_call(nw_cap: int, t_cap: int, g: int, interpret: bool):
    """Jitted bisection-node solver for one root-sized shape bucket:
    ``(q, rq, t, rt, qa, qb, ta, mid, tb) -> argmax_i F(i) + R(i)``.

    The root query/text (and their reversals) stay device-resident; each
    node passes only integer offsets, runs the forward fill over
    ``text[ta:mid]`` and the reverse fill over ``rev(text[mid:tb])`` against
    ``query[qa:qb]`` / its reversal (dynamic slices, padded into the bucket,
    pad rows masked to char 0), and reduces both final-column delta sets to
    the crossing row on device — one scalar comes back per node, so host
    link traffic is O(1) regardless of problem size.
    """
    import jax
    import jax.numpy as jnp

    unroll = UNROLL_INTERPRET if interpret else UNROLL
    rows = _round_up(nw_cap, bitpal.GRAIN) // LANES
    nq_cap = nw_cap * WORD
    slice_cap = bitpal.TEXT_SMEM_CAP // 2
    t_steps = _round_up(min(t_cap + 2 * nw_cap, slice_cap), max(unroll, 16))
    n_chunks = -(-(t_cap + 2 * nw_cap) // t_steps)
    B = 2 if g == 1 else max(1, (2 * g + 1).bit_length())
    u_words = -(-t_steps // bitpal.stream_epw(B))

    def col_scores(query_slice, text_slice, q_len, t_len):
        qiota = jnp.arange(nq_cap, dtype=jnp.int32)
        qpad = jnp.where(qiota < q_len, query_slice, 0)
        tiota = jnp.arange(n_chunks * t_steps, dtype=jnp.int32)
        tpad = jnp.where(
            tiota < t_len,
            jax.lax.dynamic_update_slice(
                jnp.zeros((n_chunks * t_steps,), jnp.int32), text_slice, (0,)
            ),
            0,
        )
        eq = bitpal._eq_planes(qpad, nq_cap, nw_cap, rows)
        shifts8 = jnp.arange(8, dtype=jnp.int32) * 4
        tpacked = jnp.sum(
            tpad.reshape(n_chunks, t_steps // 8, 8) << shifts8[None, None, :],
            axis=2, dtype=jnp.int32,
        )
        ustream = jnp.zeros((u_words,), jnp.int32)

        def chunk(state, x):
            q_, tchunk = x
            new_state, _ = bitpal.chunk_call(
                jnp.stack([q_ * t_steps, t_len.astype(jnp.int32)]),
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

        v = sum((1 << b) * bits(state[b]) for b in range(B)) - g
        v = v.reshape(nq_cap)
        return jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(v, dtype=jnp.int32)]
        ) - g * t_len.astype(jnp.int32)

    @jax.jit
    def node(q, rq, t, rt, qa, qb, ta, mid, tb):
        nroot = q.shape[0]
        mroot = t.shape[0]
        q_len = qb - qa
        qs = jax.lax.dynamic_slice(
            jnp.pad(q, (0, nq_cap)), (qa,), (nq_cap,)
        )
        rqs = jax.lax.dynamic_slice(
            jnp.pad(rq, (0, nq_cap)), (nroot - qb,), (nq_cap,)
        )
        tcap_arr = n_chunks * t_steps
        ts = jax.lax.dynamic_slice(
            jnp.pad(t, (0, tcap_arr)), (ta,), (tcap_arr,)
        )
        rts = jax.lax.dynamic_slice(
            jnp.pad(rt, (0, tcap_arr)), (mroot - tb,), (tcap_arr,)
        )
        F = col_scores(qs, ts, q_len, mid - ta)
        R = col_scores(rqs, rts, q_len, tb - mid)
        # the crossing row maximizes F(i) + R(q_len - i), where R was
        # computed over the reversed suffix pair; flip+roll aligns the
        # reversed column so index i reads R[q_len - i] (no wrap for
        # 0 <= i <= q_len)
        i = jnp.arange(nq_cap + 1, dtype=jnp.int32)
        Rr = jnp.roll(jnp.flip(R), q_len - nq_cap)
        tot = jnp.where(i <= q_len, F + Rr, -(2**30))
        return jnp.argmax(tot).astype(jnp.int32)

    return node


def _next_bucket(x: int) -> int:
    return _next_pow2(max(16, x))
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
    import jax.numpy as jnp

    s1 = np.asarray(s1, np.int32)
    s2 = np.asarray(s2, np.int32)
    nw_cap = _next_pow2(max(1, -(-len(s2) // WORD)))
    t_cap = _next_pow2(max(16, (len(s1) + 1) // 2))
    node = _split_call(nw_cap, t_cap, g, interpret)
    # root sequences (and reversals) live on device for the whole recursion;
    # every bisection node ships 5 integers down and 1 integer back
    q_dev = jnp.asarray(s2, jnp.int32)
    rq_dev = jnp.flip(q_dev)
    t_dev = jnp.asarray(s1, jnp.int32)
    rt_dev = jnp.flip(t_dev)
    leaves: List[Tuple[int, int, int, int]] = []  # in path order

    from ..utils import native

    use_native = native.available()

    def leaf(ta, tb, qa, qb):
        text, query = s1[ta:tb], s2[qa:qb]
        if use_native:
            try:  # C++ full-table walk: same strings, ~50x the NumPy oracle
                return native.traceback(text, query, cfg)
            except RuntimeError:
                pass
        return oracle.traceback(text, query, cfg)

    # breadth-first with async dispatch: JAX returns node results as
    # futures, so while the oldest node's scalar crosses the host link the
    # newer (independent-subtree) nodes are already computing — the
    # round-trip latency pipelines away.  Leaves tile the text axis, so
    # sorting by (ta, qa) restores path order.
    from collections import deque

    pending = deque()

    def submit(ta: int, tb: int, qa: int, qb: int) -> None:
        m, n = tb - ta, qb - qa
        if (m + 1) * (n + 1) <= base_cells or m < 2 or n < 2:
            leaves.append((ta, tb, qa, qb))
            return
        fut = node(q_dev, rq_dev, t_dev, rt_dev,
                   jnp.int32(qa), jnp.int32(qb), jnp.int32(ta),
                   jnp.int32(ta + m // 2), jnp.int32(tb))
        pending.append((ta, tb, qa, qb, fut))

    submit(0, len(s1), 0, len(s2))
    while pending:
        ta, tb, qa, qb, fut = pending.popleft()
        split = qa + int(fut)
        mid = ta + (tb - ta) // 2
        submit(ta, mid, qa, split)
        submit(mid, tb, split, qb)
    leaves.sort(key=lambda r: (r[0], r[2]))
    # leaf segments are independent; the native walk releases the GIL, so a
    # thread pool fills host cores while preserving path order
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(lambda r: leaf(*r), leaves))
    a1 = "".join(r[1] for r in results)
    a2 = "".join(r[2] for r in results)
    return oracle.alignment_score(a1, a2, cfg), a1, a2
