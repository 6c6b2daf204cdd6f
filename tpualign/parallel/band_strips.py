"""Sharded band fill: the band kernel inside every shard — the true
``hybrid-vert`` successor for general scoring and Smith-Waterman.

Round 2's ``parallel/strips.py`` shards the table's column axis but fills
each shard with the portable XLA row scan — a correctness path.  Here every
chip runs the banded strip kernel (``ops/band_align._strip_call`` in its
chunked mode) on its own column block, matching the reference's structure of
putting its *best* threaded kernel inside each MPI rank
(``hybrid-vert.cpp:6`` + the blocked-sentinel inner fill at
``hybrid-vert.cpp:62-111``) — but with the column-halo pipeline expressed as
``lax.ppermute`` under ``shard_map`` so XLA lays it on ICI.

Decomposition: chip ``c`` owns text columns ``[c*W, (c+1)*W)``; the query
axis is cut into K strips of ``R = rows*128`` DP rows (the last strip
bottom-aligned, as in ``ops/band_chunked.py``).  At superstep ``t`` chip
``c`` fills strip ``h = t - c`` of its block: it consumes its own boundary
row (carried chip-locally strip to strip, exactly the single-chip hand-off)
and the left neighbor's captured right column, which arrived by ``ppermute``
at the end of superstep ``t-1``; its own right-column capture moves one chip
right.  ``K + P - 1`` supersteps total — the same wavefront ramp as the
reference's rank pipeline (SURVEY.md §3.3).

The ``rows`` knob (default 28) is this engine's ``COMMBUF_SIZE`` successor:
bigger strips amortize the kernel's per-step scalar work across more vector
sublanes but deepen both the per-strip wavefront drain
(``p_max ~ 127*(rows+2)`` steps) and the P-chip pipeline bubble
``(P-1)/(K+P-1)``; smaller strips shorten both but leave the VPU
underoccupied.  Sweep with ``cli.py tune``.

Scores are exact for every config in the band envelope (NW any params, SW
with ``mismatch<=0>=gap``); exactness on 1-8 device meshes is pinned by
``tests/test_band_strips.py`` on the virtual CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

import dataclasses

from ..config import ScoringConfig
from ..ops.pallas_diag import LANES, _round_up
from ..ops.band import (
    NEG_INF,
    MAX_BOUNDARY,
    _empty_score,
    _ends_flags,
    _min0,
    _sentinels,
    _wants_f32,
)
from ..ops.band_align import _strip_call
from ..ops.band_chunked import heads_init, pack_query, strip_geometry
from .mesh import AXIS, make_mesh


def _pipeline_body(
    cfg: ScoringConfig,
    ends,  # kernel-coordinate (zr, zc, er, ec) ends-free flags
    mb: int,  # true boundary-axis length (text chars)
    ns: int,  # true strip-axis length (query rows)
    W: int,  # columns per chip
    nr: int,
    K: int,
    t_steps: int,
    unroll: int,
    vdt,
    interpret: bool,
    s1p_local: jax.Array,  # (W//8,) this chip's packed text columns
    scs: jax.Array,  # (K, 5) replicated strip scalars
    s2cm_all: jax.Array,  # (K*nr, LANES) replicated strip chars
    heads0: jax.Array,  # (K, nr, LANES) replicated analytic left columns
) -> jax.Array:
    P = jax.lax.axis_size(AXIS)
    c = jax.lax.axis_index(AXIS)
    local = cfg.is_local
    zr, zc, er, ec = ends
    neg = vdt(NEG_INF)
    # the owner chip captures at its true text end (< W when ragged)
    own_end = max(1, min(W, mb - ((mb - 1) // W) * W))
    call = _strip_call(W, nr, t_steps, unroll, cfg, vdt, interpret,
                       chunked=True, cap_min=own_end)
    s2cm_strips = s2cm_all.reshape(K, nr, LANES)
    if cfg.has_matrix:
        # replicated per-strip top-row profiles matrix[ch][s2_first]
        kk = len(cfg.matrix)
        mat = jnp.asarray(cfg.matrix, vdt)
        prof0s = jnp.full((K, kk + 1), vdt(_min0(cfg)))
        prof0s = prof0s.at[:, :kk].set(
            mat[:, jnp.minimum(scs[:, 2], kk - 1)].T)

    # initial boundary row of this chip's block: H(0, c*W + jj), corner in [0]
    jj = jnp.arange(W + 3, dtype=jnp.int32)
    if local or zr:
        b0 = jax.lax.pcast(jnp.zeros((W + 3,), vdt), AXIS, to="varying")
    else:
        b0 = ((c * W + jj) * cfg.gap).astype(vdt)

    # score tap: global column mb lives on chip (mb-1)//W at local index
    # mb - c*W (boundary-row indices are 1-based past the corner)
    c_own = jnp.int32((mb - 1) // W)
    sel = jnp.where(c == c_own, jnp.int32(mb) - c_own * W, jnp.int32(0))
    # this chip's true text end (1..W): the kernel captures its right
    # column there and reads post-text sentinel chars beyond it — W on
    # every full chip, so the halo pipeline is unchanged; the ragged final
    # chip captures at the TRUE last column (feeding the ends-free
    # last-column extraction), and wholly-beyond-text chips only decay
    mb_loc = jnp.clip(jnp.int32(mb) - c * W, 1, W)
    k_flat = (
        jax.lax.broadcasted_iota(jnp.int32, (nr, LANES), 1) * nr
        + jax.lax.broadcasted_iota(jnp.int32, (nr, LANES), 0)
    )

    def superstep(carry, t):
        b, head_in, vbest, cbest = carry
        h = t - c  # my strip index this superstep
        active = (h >= 0) & (h < K)
        hc = jnp.clip(h, 0, K - 1)
        sc = jax.lax.dynamic_slice(scs, (hc, 0), (1, 5))[0]
        sc = sc.at[4].set(mb_loc)
        s2cm_s = jax.lax.dynamic_slice(
            s2cm_strips, (hc, 0, 0), (1, nr, LANES))[0]
        h0 = jax.lax.dynamic_slice(heads0, (hc, 0, 0), (1, nr, LANES))[0]
        # chip 0 sits on the global left boundary: analytic H(i, 0) column;
        # interior chips inject the halo column from their left neighbor
        head = jnp.where(c == 0, h0, head_in)
        extra = ()
        if cfg.has_matrix:
            extra = (jax.lax.dynamic_slice(
                prof0s, (hc, 0), (1, prof0s.shape[1]))[0],)
        b_out, vmax, _, cap = call(s1p_local, sc, b, s2cm_s, *extra, head)
        b = jnp.where(active, b_out, b)
        if local:
            vbest = jnp.where(
                active, jnp.maximum(vbest, vmax[0, 0]), vbest)
        elif ec:
            # last-column extraction: this strip's capture on the owner
            # chip is H(i, mb) in slot layout — fold its live slots
            live = jnp.logical_and(k_flat >= sc[1], k_flat < sc[3])
            cmax = jnp.max(jnp.where(live, cap, neg))
            cbest = jnp.where(
                active & (c == c_own), jnp.maximum(cbest, cmax), cbest)
        # halo: my captured right column H(i, (c+1)*W) becomes my right
        # neighbor's injected left column for the SAME strip next superstep
        head_next = jax.lax.ppermute(
            cap, AXIS, [(i, i + 1) for i in range(P - 1)])
        return (b, head_next, vbest, cbest), None

    init = (
        b0,
        jax.lax.pcast(jnp.full((nr, LANES), neg, vdt), AXIS, to="varying"),
        jax.lax.pcast(neg, AXIS, to="varying"),
        jax.lax.pcast(neg, AXIS, to="varying"),
    )
    steps = jnp.arange(K + P - 1, dtype=jnp.int32)
    (b, _, vbest, cbest), _ = jax.lax.scan(superstep, init, steps)

    if local:
        out = jnp.maximum(jax.lax.pmax(vbest, AXIS), vdt(0))
    elif er or ec:
        out = neg
        if er:
            # last DP row: b = H(n, c*W + jj) — each chip folds its true
            # columns (jj in [1, mb_loc] on live chips)
            live_row = jnp.logical_and(
                jj >= 1,
                jnp.logical_and(jj <= mb_loc, c * W < jnp.int32(mb)),
            )
            out = jnp.maximum(
                out, jnp.max(jnp.where(live_row, b, neg)))
            out = jnp.maximum(out, vdt(0 if zc else ns * cfg.gap))  # H(n, 0)
        if ec:
            out = jnp.maximum(out, cbest)
            out = jnp.maximum(out, vdt(0 if zr else mb * cfg.gap))  # H(0, m)
        out = jax.lax.pmax(out, AXIS)
    else:
        # the final strip is bottom-aligned: b is H(n, c*W + .) — tap the
        # true last column on its owner, fold with pmax
        out = jax.lax.pmax(jnp.where(c == c_own, b[sel], neg), AXIS)
    return out.astype(jnp.int32)[None]


def score_fn(
    m: int,
    n: int,
    cfg: ScoringConfig = ScoringConfig(),
    *,
    mesh=None,
    rows: int = 28,
    interpret: bool = False,
):
    """Jittable sharded ``(s1_packed, scs, s2cm, heads0) -> score`` builder;
    returns ``(fn, prep)`` where ``prep(s1, s2)`` builds the device operands
    (``fn = jit(fn)``-able; ``prep`` runs host-side packing + device_put).
    Serves pair and matrix scoring (any K <= 16) in all four alignment
    modes (round 5)."""
    if mesh is None:
        mesh = make_mesh()
    P = int(mesh.devices.size)
    if cfg.is_affine:  # before ANY scoring, degenerate lengths included
        raise ValueError(
            "affine gaps are outside the sharded band engine's envelope; "
            "use impl='xla' (or 'oracle')")
    if m == 0 or n == 0:
        base = _empty_score(m, n, cfg)
        return (lambda *a: jnp.int32(base)), (lambda s1, s2: ())
    if (cfg.is_local and not cfg.has_matrix
            and (cfg.mismatch > 0 or cfg.gap > 0)):
        raise ValueError(
            "masked SW configs are outside the band engine's envelope")
    swapped = n > m  # boundary axis on the longer side (strips cut the other)
    mb, ns = (n, m) if swapped else (m, n)
    ends = _ends_flags(cfg, swapped)
    kcfg = cfg
    if swapped and cfg.has_matrix:
        # the kernel scores matrix[text char][strip char]; swapping puts
        # s2 on the text axis, so an asymmetric matrix must transpose
        kcfg = dataclasses.replace(cfg, matrix=tuple(zip(*cfg.matrix)))
    W = _round_up(-(-mb // P), 8)
    if W > MAX_BOUNDARY:
        raise ValueError(
            "per-chip column block exceeds the boundary-row budget; "
            "use ops.band_chunked per shard or more devices")
    R = rows * LANES
    K = -(-ns // R)
    use_f32 = _wants_f32(cfg, mb, ns)
    vdt = jnp.float32 if use_f32 else jnp.int32
    p_max = (rows - 1) + (LANES - 1) * (rows + 2)
    unroll = 16
    t_steps = _round_up(W + p_max + 132, unroll)
    scs_np, idx_np = strip_geometry(ns, R)
    scs_np[:, 4] = W  # overridden per chip in the body (true text end)
    pad_char, post_text = _sentinels(kcfg)
    tx_pad = min(post_text, 15)  # beyond each chip's true end the kernel's
    #                              dynamic guard substitutes the sentinel

    shard = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(AXIS))
    repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())

    def prep(s1, s2):
        b_seq, s_seq = (s2, s1) if swapped else (s1, s2)
        b_seq = jnp.asarray(np.asarray(b_seq, np.int32))
        s_seq = jnp.asarray(np.asarray(s_seq, np.int32))
        scs, s2cm_all = pack_query(s_seq, scs_np, idx_np, K, rows, pad_char)
        heads0 = heads_init(scs, rows, kcfg, vdt, zero_col=ends[1])
        tx = jnp.full((P * W,), tx_pad, jnp.int32)
        tx = jax.lax.dynamic_update_slice(tx, b_seq, (0,))
        shifts = jnp.arange(8, dtype=jnp.int32) * 4
        s1p = jnp.sum(
            tx.reshape(P * W // 8, 8) << shifts[None, :],
            axis=1, dtype=jnp.int32,
        )
        return (
            jax.device_put(s1p, shard),
            jax.device_put(scs, repl),
            jax.device_put(s2cm_all, repl),
            jax.device_put(heads0, repl),
        )

    body = functools.partial(
        _pipeline_body, kcfg, ends, mb, ns, W, rows, K, t_steps, unroll,
        vdt, interpret
    )
    PS = jax.sharding.PartitionSpec
    # check_vma=False: pallas_call output avals carry no varying-mesh-axes
    # info (as in bitpal_strips)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(PS(AXIS), PS(), PS(), PS()),
        out_specs=PS(AXIS),
        check_vma=False,
    )
    return fn, prep


def score(
    s1,
    s2,
    cfg: ScoringConfig = ScoringConfig(),
    *,
    mesh=None,
    rows: int = 28,
    interpret: bool = False,
) -> int:
    """Alignment score with the text axis sharded over the mesh and the band
    kernel filling each shard (NW any params, SW, matrix, semiglobal/
    infix)."""
    s1 = np.asarray(s1)
    s2 = np.asarray(s2)
    m, n = int(s1.size), int(s2.size)
    if m == 0 or n == 0:
        if cfg.is_affine:
            raise ValueError(
                "affine gaps are outside the sharded band engine's "
                "envelope; use impl='xla'")
        return _empty_score(m, n, cfg)
    fn, prep = score_fn(
        m, n, cfg, mesh=mesh, rows=rows, interpret=interpret)
    out = fn(*prep(s1, s2))
    return int(np.asarray(out)[0])
