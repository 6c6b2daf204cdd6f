"""Multi-chip bit-parallel NW fill: query-sharded word pipeline.

The fast successor of the reference's distributed decomposition
(``src/mpi/mpi-horz.cpp``: rank r owns a contiguous band of DP *rows*, halo
rows pipelined rank-to-rank in ``COMMBUF_SIZE`` chunks).  Here chip ``c`` owns
a contiguous band of the query's 31-row words, holds its band's bit-parallel
state (``ops/bitpal.py``) resident in VMEM for the whole run, and the only
inter-chip traffic is the stream of **B-bit horizontal deltas** (B = 2 for
the unit family, up to 4 for reduced gap weights g <= 7) crossing the band
boundary — 2-4 bits per DP column, against the reference's one int32 per
column (``mpi-horz.cpp:41``): the delta compression that makes the kernel
fast also makes the halo 8-16x smaller.

Pipeline: the text is cut into K chunks of T columns.  At global super-step
``s``, chip ``c`` runs chunk ``q = s - 2c`` of its band through the resumable
chunk kernel (``bitpal.chunk_call``) and ships the boundary stream one chip
rightward with ``lax.ppermute`` (ICI in-slice, DCN across hosts).  The
per-chip delay is 2 super-steps, not 1, because the in-band word stagger
(2 steps per word) tilts each chunk's boundary output window by
``delta = 2 * (words_per_chip - 1)`` columns: the stream chip ``c`` needs for
chunk ``q`` is spliced from its neighbor's chunk-``q`` and chunk-``q+1``
outputs, both already in hand.  Pipeline bubble: ``2(P-1) / (K + 2(P-1))``.
``chunk_cols`` (T) succeeds the reference's ``COMMBUF_SIZE`` knob
(``nw-mpi.hpp:18``, swept by ``src/buf-tune.sh``).

Scope: global NW with any scoring affinely reducible to ``(1, 0, -g)``
(see ``bitpal.family``); other scoring and Smith-Waterman shard via
``parallel/strips.py``.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
import numpy as np

from ..config import ensure_pair_modes, ScoringConfig
from ..ops import bitpal
from ..ops.bitpal import (
    ALPHABET,
    LANES,
    MASK31,
    UNROLL,
    UNROLL_INTERPRET,
    WORD,
    _round_up,
)
from .mesh import AXIS, make_mesh


def _geometry(nq: int, mt: int, P: int, chunk_cols: int, unroll: int):
    """Uniform per-chip layout: words per chip, slot rows, chunk steps."""
    nw = -(-nq // WORD)
    nw_local = -(-nw // P)
    rows = _round_up(nw_local, bitpal.GRAIN) // LANES
    delta = 2 * (nw_local - 1)
    t_steps = _round_up(max(chunk_cols, delta + 1, 16), max(unroll, 16))
    n_chunks = -(-(mt + delta) // t_steps)  # last word must pass column mt
    return nw, nw_local, rows, delta, t_steps, n_chunks


def _pack_bits(vals: jax.Array, B: int) -> jax.Array:
    """(T,) B-bit values -> int32 words of stream_epw(B) entries for SMEM."""
    epw = bitpal.stream_epw(B)
    t = vals.shape[0]
    words = -(-t // epw)
    vpad = jnp.zeros((words * epw,), jnp.int32)
    vpad = jax.lax.dynamic_update_slice(
        vpad, vals.astype(jnp.int32) & ((1 << B) - 1), (0,)
    )
    shifts = jnp.arange(epw, dtype=jnp.int32) * B
    return jnp.sum(
        vpad.reshape(words, epw) << shifts[None, :], axis=1, dtype=jnp.int32
    )


def _pipeline_body(
    cfg: ScoringConfig,
    g: int,
    nq: int,
    mt: int,
    nw: int,
    nw_local: int,
    rows: int,
    delta: int,
    t_steps: int,
    n_chunks: int,
    interpret: bool,
    emit_deltas: bool,
    eq_local: jax.Array,  # (1, ALPHABET, rows, LANES) this chip's match planes
    text_packed: jax.Array,  # (n_chunks, t_steps//8) replicated chunk chars
) -> jax.Array:
    P = jax.lax.axis_size(AXIS)
    c = jax.lax.axis_index(AXIS)
    eq_planes = eq_local[0]
    r_star = (nw_local - 1) % rows
    l_star = (nw_local - 1) // rows
    B = 2 if g == 1 else max(1, (2 * g + 1).bit_length())

    def superstep(carry, s):
        state, prev1, prev2 = carry
        q = s - 2 * c
        active = (q >= 0) & (q < n_chunks)
        qc = jnp.clip(q, 0, n_chunks - 1)
        d0_mt = jnp.stack([qc * t_steps, jnp.int32(mt)])
        tchunk = jax.lax.dynamic_slice(
            text_packed, (qc, 0), (1, t_steps // 8)
        )[0]
        # word-0 h_top stream for columns (q*T, (q+1)*T]: chip 0 sits on the
        # DP boundary row (h = gap -> u = 0); others splice the neighbor's
        # chunk-q / chunk-q+1 boundary windows (offset by the band stagger)
        spliced = jnp.concatenate([prev2[delta:], prev1[:delta]])
        packed = _pack_bits(spliced, B)
        ustream = jnp.where(c == 0, jnp.zeros_like(packed), packed)
        new_state, tail = bitpal.chunk_call(
            d0_mt.astype(jnp.int32),
            tchunk,
            ustream,
            eq_planes,
            state,
            rows=rows,
            t_steps=t_steps,
            r_star=r_star,
            interpret=interpret,
            g=g,
            nw=nw_local,
        )
        state = tuple(
            jnp.where(active, ns, os) for ns, os in zip(new_state, state)
        )
        # my last real word's h_out stream for this chunk, to my right neighbor
        out_vals = tail[:, l_star] & ((1 << B) - 1)
        perm = [(i, i + 1) for i in range(P - 1)]
        received = jax.lax.ppermute(out_vals, AXIS, perm)
        return (state, received, prev1), None

    init_state = bitpal.init_chunk_state(rows, g)
    zeros_t = jnp.zeros(t_steps, jnp.int32)
    steps = jnp.arange(n_chunks + 2 * (P - 1), dtype=jnp.int32)
    (state, _, _), _ = jax.lax.scan(
        superstep, (init_state, zeros_t, zeros_t), steps
    )

    if emit_deltas:
        # this chip's band of final-column v-deltas, row-ordered: the
        # sharded Hirschberg bisection consumes the whole column-score
        # vector (F or R), not just the final score
        B2 = B

        def word_bits(plane):
            words = plane.T.reshape(-1)[: nw_local]  # column-major order
            return (words[:, None] >> jnp.arange(WORD, dtype=jnp.int32)) & 1

        enc = sum((1 << b) * word_bits(state[b]) for b in range(B2))
        return (enc - g).reshape(nw_local * WORD).astype(jnp.int32)

    # score = -g * mt + sum over valid query rows of the final-column
    # deltas; per row the delta is enc - g
    row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    lword = row_i + rows * lane_i  # local word index in this chip's band
    gword = c * nw_local + lword
    # a pad slot past the band (lword >= nw_local) can alias a *later chip's*
    # global word index — it must be masked by band membership, not just nq
    nbits = jnp.where(
        lword < nw_local, jnp.clip(nq - WORD * gword, 0, WORD), 0
    )
    valid = jnp.where(
        nbits >= WORD, jnp.int32(MASK31), (jnp.int32(1) << nbits) - 1
    )
    pc = lambda x: jnp.sum(jax.lax.population_count(x & valid))  # noqa: E731
    enc = sum((1 << b) * pc(state[b]) for b in range(B))
    part = enc - g * jnp.sum(jax.lax.population_count(valid))
    return (jax.lax.psum(part, AXIS) - g * mt)[None]


def score_fn(
    m: int,
    n: int,
    cfg: ScoringConfig = ScoringConfig(),
    *,
    mesh=None,
    chunk_cols: int = 2048,
    interpret: bool = False,
):
    """Jittable sharded ``(s1, s2) -> score``; ``s1`` = text (columns),
    ``s2`` = query (rows, sharded as 31-row words over the mesh)."""
    ensure_pair_modes(cfg, "bitpal_strips")
    fam = bitpal.family(cfg)
    if fam is None:
        raise ValueError(
            "bitpal_strips requires a bit-parallel scoring family "
            "(affinely reducible to (1,0,-g)); use parallel.strips otherwise"
        )
    g = fam[1]
    if mesh is None:
        mesh = make_mesh()
    P = int(mesh.devices.size)
    unroll = UNROLL_INTERPRET if interpret else UNROLL
    nw, nw_local, rows, delta, t_steps, n_chunks = _geometry(
        n, m, P, chunk_cols, unroll
    )
    body = functools.partial(
        _pipeline_body, cfg, g, n, m, nw, nw_local, rows, delta,
        t_steps, n_chunks, interpret, False,
    )
    Spec = jax.sharding.PartitionSpec
    # check_vma=False: pallas_call output avals carry no varying-mesh-axes
    # annotation, which the checker would reject
    sharded = jax.shard_map(
        body, mesh=mesh, in_specs=(Spec(AXIS), Spec()),
        out_specs=Spec(AXIS), check_vma=False,
    )

    @jax.jit
    def fn(s1: jax.Array, s2: jax.Array) -> jax.Array:
        eq = _eq_planes_sharded(s2, n, nw, nw_local, rows, P)
        text = _pack_text_chunks(s1, m, t_steps, n_chunks)
        return bitpal._from_unit(cfg, m + n, sharded(eq, text)[0])

    return fn


def col_deltas_fn(
    m: int,
    n: int,
    cfg: ScoringConfig = ScoringConfig(),
    *,
    mesh=None,
    chunk_cols: int = 2048,
    interpret: bool = False,
):
    """Jitted sharded ``(s1, s2) -> (ceil(n/31)*31,)`` final-column v-deltas
    (reduced scheme).  The sharded Hirschberg bisection's column scores:
    ``H(i, m) = -g*m + cumsum(deltas)[i]``.  Rows beyond ``n`` carry pad
    deltas the caller slices off."""
    fam = bitpal.family(cfg)
    if fam is None:
        raise ValueError("requires a bit-parallel scoring family")
    g = fam[1]
    if mesh is None:
        mesh = make_mesh()
    P = int(mesh.devices.size)
    unroll = UNROLL_INTERPRET if interpret else UNROLL
    nw, nw_local, rows, delta, t_steps, n_chunks = _geometry(
        n, m, P, chunk_cols, unroll
    )
    body = functools.partial(
        _pipeline_body, cfg, g, n, m, nw, nw_local, rows, delta,
        t_steps, n_chunks, interpret, True,
    )
    Spec = jax.sharding.PartitionSpec
    sharded = jax.shard_map(
        body, mesh=mesh, in_specs=(Spec(AXIS), Spec()),
        out_specs=Spec(AXIS), check_vma=False,
    )

    @jax.jit
    def fn(s1: jax.Array, s2: jax.Array) -> jax.Array:
        eq = _eq_planes_sharded(s2, n, nw, nw_local, rows, P)
        text = _pack_text_chunks(s1, m, t_steps, n_chunks)
        return sharded(eq, text)

    return fn


def _eq_planes_sharded(
    query: jax.Array, nq: int, nw: int, nw_local: int, rows: int, P: int
) -> jax.Array:
    """(P, ALPHABET, rows, LANES): chip ``c``'s match planes for its words."""
    qpad = jnp.zeros((P * nw_local * WORD,), jnp.int32)
    qpad = jax.lax.dynamic_update_slice(qpad, query.astype(jnp.int32), (0,))
    bits = qpad.reshape(P, nw_local, WORD)
    weights = jnp.asarray([1 << b for b in range(WORD)], jnp.int32)
    planes = []
    for cch in range(1, ALPHABET + 1):
        words = jnp.sum(
            jnp.where(bits == cch, weights[None, None, :], 0),
            axis=2,
            dtype=jnp.int32,
        )  # (P, nw_local)
        pad = jnp.zeros((P, rows * LANES), jnp.int32)
        pad = jax.lax.dynamic_update_slice(pad, words, (0, 0))
        planes.append(pad.reshape(P, LANES, rows).transpose(0, 2, 1))
    return jnp.stack(planes, axis=1)  # (P, ALPHABET, rows, LANES)


def _pack_text_chunks(
    text: jax.Array, mt: int, t_steps: int, n_chunks: int
) -> jax.Array:
    tpad = jnp.zeros((n_chunks * t_steps,), jnp.int32)
    tpad = jax.lax.dynamic_update_slice(tpad, text.astype(jnp.int32), (0,))
    shifts = jnp.arange(8, dtype=jnp.int32) * 4
    return jnp.sum(
        tpad.reshape(n_chunks, t_steps // 8, 8) << shifts[None, None, :],
        axis=2,
        dtype=jnp.int32,
    )


def score(
    s1,
    s2,
    cfg: ScoringConfig = ScoringConfig(),
    *,
    mesh=None,
    chunk_cols: int = 2048,
    interpret: bool = False,
) -> int:
    """Sharded bit-parallel NW score (see module docstring)."""
    ensure_pair_modes(cfg, "bitpal_strips")
    if mesh is None:
        mesh = make_mesh()
    s1 = jnp.asarray(np.asarray(s1), jnp.int32)
    s2 = jnp.asarray(np.asarray(s2), jnp.int32)
    m, n = int(s1.shape[0]), int(s2.shape[0])
    if m == 0 or n == 0:
        return cfg.gap * (m + n)
    fn = score_fn(m, n, cfg, mesh=mesh, chunk_cols=chunk_cols,
                  interpret=interpret)
    return int(fn(s1, s2))
