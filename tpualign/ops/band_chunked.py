"""Unbounded-boundary band scoring: column-block chunking of the strip
engine (round-3 verdict item #2 — lifts ``band.MAX_BOUNDARY``).

The band kernel keeps its boundary row in SMEM, capping the boundary axis
at ~200k chars; when BOTH sequences exceed that, round 2 silently fell back
to the ~96-GCUPS flat kernel.  This driver processes the DP table in
**column blocks** of ``block`` columns: within a block the usual strip scan
runs top-to-bottom (boundary row carried strip-to-strip through SMEM), and
blocks couple through **boundary columns** — each strip's right column is
captured in slot layout (``cap_ref``) and injected as the next block's
wavefront head (``head_ref``), exactly where the analytic ``H(i, 0)``
boundary enters on a fresh table.  Everything runs inside ONE jitted
``scan(blocks) x scan(strips)`` nest; the column planes stay in HBM between
blocks (n x 4 B per edge) and stream through VMEM per strip.

The decomposition mirrors the reference's cache-blocked fill
(``blocked-serial.cpp:42-48``, vertical strips of the table) and its
``COMMBUF_SIZE`` pipelining — but on one chip, against the SMEM capacity
instead of L2, with no cap on EITHER axis beyond HBM.

Scores stay exact: the same recurrence crosses block edges through the
injected columns, and the f32 fast path obeys the usual 24-bit bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

import dataclasses

from ..config import ScoringConfig
from .pallas_diag import LANES, _round_up
from .band import (
    NEG_INF,
    PAD_CHAR,
    _empty_score,
    _ends_flags,
    _min0,
    _sentinels,
    _wants_f32,
)
from .band_align import _strip_call

#: default column-block width (chars); B row (block+3 scalars) must sit in
#: SMEM beside the packed block text
DEFAULT_BLOCK = 131072

#: HBM guard for the char/column-plane buffers (~12 B per strip-axis char)
MAX_AXIS = 1 << 27


def strip_geometry(ns: int, R: int):
    """Static per-strip scalars and the query gather map for a strip axis of
    ``ns`` rows cut into strips of ``R``: returns ``(scs_np, idx_np)`` where
    ``scs_np`` is (K, 5) ``[i0, klo, s2_first, k_hi, cap_col]`` (bottom-aligned
    partial strips, so the final boundary row is exactly row ``ns``) and
    ``idx_np`` maps slot-layout position -> query index (-1 = pad).

    The kernel's boundary-row write cursor trails the top live row's read
    cursor by ``p_max - p_klo`` steps, which is positive only when a strip
    has >= 2 live rows — a 1-live-row strip reads back its own output
    (caught by the interpret sweep in ``tests/test_band_chunked.py``).  When
    the remainder strip would be too thin, rows are borrowed from the
    strip before it: both end up partial (klo > 0) but comfortably live.
    """
    if ns < 2:
        raise ValueError("single-row strip axes are outside the band "
                         "kernel's boundary-hazard envelope")
    K = -(-ns // R)
    counts = [R] * (K - 1) + [ns - (K - 1) * R]
    if K >= 2:
        want_live = LANES if R >= 2 * LANES else 2
        if counts[-1] < want_live:
            d = want_live - counts[-1]
            counts[-2] -= d
            counts[-1] += d
    scs_np = np.zeros((K, 5), np.int32)
    idx_np = np.full(K * R, -1, np.int64)
    i0 = 0
    for s, cnt in enumerate(counts):
        klo = R - cnt
        scs_np[s] = (i0, klo, 0, R, 0)  # [4] = capture col, set by callers
        idx_np[s * R + klo : (s + 1) * R] = i0 + np.arange(cnt)
        i0 += cnt
    return scs_np, idx_np


def pack_query(s_seq: jax.Array, scs_np, idx_np, K: int, rows: int,
               pad_char: int = PAD_CHAR):
    """Device-side query packing for the strip scan: returns ``(scs,
    s2cm_all)`` — the per-strip scalars with the top live row's char gathered
    in, and the (K*rows, LANES) column-major strip char planes."""
    i0s = jnp.asarray(scs_np[:, 0].copy())
    scs = jnp.asarray(scs_np).at[:, 2].set(s_seq[i0s])
    idx = jnp.asarray(idx_np)
    cm = jnp.where(idx >= 0, s_seq[jnp.maximum(idx, 0)], pad_char)
    s2cm_all = (
        cm.reshape(K, LANES, rows)
        .transpose(0, 2, 1)
        .reshape(K * rows, LANES)
    )
    return scs, s2cm_all


def heads_init(scs: jax.Array, nr: int, cfg: ScoringConfig, vdt,
               zero_col: bool = False):
    """Analytic left column H(i, 0) of every strip, in slot layout: the
    wavefront head the chunked kernel injects for the table's first column
    block (dead slots of a bottom-aligned strip stay NEG).  ``zero_col``
    selects the ends-free free-start boundary H(i, 0) = 0; affine configs
    charge one open + i*extend run."""
    k_flat = (
        jax.lax.broadcasted_iota(jnp.int32, (nr, LANES), 1) * nr
        + jax.lax.broadcasted_iota(jnp.int32, (nr, LANES), 0)
    )

    def head0(sc):
        i0, klo = sc[0], sc[1]
        if cfg.is_local or zero_col:
            return jnp.where(k_flat >= klo, vdt(0), vdt(NEG_INF))
        i = (i0 + 1 - klo) + k_flat  # the slot's DP row
        if cfg.is_affine:
            vals = vdt(cfg.gap_open) + i.astype(vdt) * vdt(cfg.gap_extend)
        else:
            vals = i.astype(vdt) * vdt(cfg.gap)
        return jnp.where(k_flat >= klo, vals, vdt(NEG_INF))

    return jax.vmap(head0)(scs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "m", "n", "nr", "block", "cfg", "ends", "use_f32", "interpret"
    ),
)
def _chunked_scan(
    s1p: jax.Array,  # (ceil(m/8) padded to block words,) packed text
    s2cm_all: jax.Array,  # (K * nr, LANES) strip chars
    scs: jax.Array,  # (K, 5) per-strip [i0, klo, s2_first, k_hi, cap_col]
    m: int,
    n: int,
    nr: int,
    block: int,
    cfg: ScoringConfig,
    ends,  # kernel-coordinate (zr, zc, er, ec) ends-free flags
    use_f32: bool,
    interpret: bool,
):
    vdt = jnp.float32 if use_f32 else jnp.int32
    zr, zc, er, ec = ends
    affine = cfg.is_affine
    R = nr * LANES
    K = scs.shape[0]
    Q = -(-m // block)
    p_max = (nr - 1) + (LANES - 1) * (nr + 2)
    unroll = 16
    g = cfg.gap
    local = cfg.is_local

    def bnd(length):  # closed-form boundary run cost
        if affine:
            return cfg.gap_open + cfg.gap_extend * length
        return cfg.gap * length

    s2cm_strips = s2cm_all.reshape(K, nr, LANES)
    heads0 = heads_init(scs, nr, cfg, vdt, zero_col=zc)  # (K, nr, LANES)
    headse0 = jnp.full((K, nr, LANES), vdt(NEG_INF))  # E at a true edge
    if cfg.has_matrix:
        # per-strip top-row profiles matrix[ch][s2_first], built on device
        # (s2_first is gathered in pack_query); slot K = decaying sentinel
        kk = len(cfg.matrix)
        mat = jnp.asarray(cfg.matrix, vdt)
        prof0s = jnp.full((K, kk + 1), vdt(_min0(cfg)))
        prof0s = prof0s.at[:, :kk].set(
            mat[:, jnp.minimum(scs[:, 2], kk - 1)].T)

    t_steps = _round_up(block + p_max + 132, unroll)
    # the final block's capture column is its (possibly ragged) true width
    m_rem = m - (Q - 1) * block
    call = _strip_call(block, nr, t_steps, unroll, cfg, vdt, interpret,
                       chunked=True, cap_min=min(block, m_rem))
    words_pb = block // 8
    jj = jnp.arange(block + 3, dtype=jnp.int32)

    def block_step(carry, q):
        heads, heads_e, score = carry
        j0 = q * block  # global column offset of this block's column 1
        s1p_q = jax.lax.dynamic_slice(s1p, (q * words_pb,), (words_pb,))
        # the block's true last column index (the final block is ragged);
        # the kernel captures the right edge there AND sentinels its text
        # chars beyond it — equal to `block` on every non-final block, so
        # inter-block coupling is unchanged
        last = jnp.minimum(m - j0, block)
        scs_q = scs.at[:, 4].set(last)
        # top row of the table for this block: H(0, j0 + jj)
        if local or zr:
            b0 = jnp.zeros((block + 3,), vdt)
        elif affine:
            jg = j0 + jj
            b0 = jnp.where(
                jg == 0, vdt(0),
                vdt(cfg.gap_open) + jg.astype(vdt) * vdt(cfg.gap_extend))
        else:
            b0 = ((j0 + jj) * g).astype(vdt)  # b0[0] = corner H(0, j0)
        bf0 = jnp.full((block + 3,), vdt(NEG_INF))  # F(0, :) = -inf

        def strip_step(bpair, xs):
            if affine:
                b, bf = bpair
            else:
                b = bpair
            if cfg.has_matrix:
                sc, s2cm_s, head_s, head_es, p0 = xs
                extra = (p0,)
            else:
                sc, s2cm_s, head_s, head_es = xs
                extra = ()
            if affine:
                outs = call(
                    s1p_q, sc, b.astype(vdt), bf.astype(vdt), s2cm_s,
                    *extra, head_s, head_es,
                )
                b_out, bf_out, vmax, _, cap, cape = outs
                return (b_out, bf_out), (vmax[0, 0], cap, cape)
            b_out, vmax, _, cap = call(
                s1p_q, sc, b.astype(vdt), s2cm_s, *extra, head_s
            )
            return b_out, (vmax[0, 0], cap, cap)

        xs = (scs_q, s2cm_strips, heads, heads_e)
        if cfg.has_matrix:
            xs = xs + (prof0s,)
        carry0 = (b0, bf0) if affine else b0
        bpair_fin, (vmaxs, caps, capes) = jax.lax.scan(
            strip_step, carry0, xs)
        b_fin = bpair_fin[0] if affine else bpair_fin
        if local:  # running max over ALL blocks (never overwritten)
            score = jnp.maximum(score, jnp.max(vmaxs))
        elif er:
            # last-DP-row extraction: every block's true columns compete
            # (b_fin[j] = H(n, j0 + j) for j = 1..last; [0] is recycled)
            live = jnp.logical_and(jj >= 1, jj <= last)
            score = jnp.maximum(
                score, jnp.max(jnp.where(live, b_fin, vdt(NEG_INF)))
            )
        else:
            sc_here = b_fin[last]  # H(n, m) lands in the final block
            score = jnp.where(q == Q - 1, sc_here, score)
        return (caps, capes, score), None

    init = (heads0, headse0, vdt(NEG_INF) if not local else vdt(0))
    (caps_fin, _, score), _ = jax.lax.scan(
        block_step, init, jnp.arange(Q, dtype=jnp.int32)
    )
    if not local and ec:
        # last-column extraction: the FINAL block's captures fired at the
        # true column m — reduce over live slots (k in [klo, k_hi))
        k_flat = (
            jax.lax.broadcasted_iota(jnp.int32, (nr, LANES), 1) * nr
            + jax.lax.broadcasted_iota(jnp.int32, (nr, LANES), 0)
        )

        def strip_colmax(sc, cap):
            live = jnp.logical_and(k_flat >= sc[1], k_flat < sc[3])
            return jnp.max(jnp.where(live, cap, vdt(NEG_INF)))

        score = jnp.maximum(
            score, jnp.max(jax.vmap(strip_colmax)(scs, caps_fin))
        )
    if not local and (er or ec):
        # closed-form boundary cells the in-table maxes never sweep
        if er:  # H(n, 0)
            score = jnp.maximum(score, vdt(0 if zc else bnd(n)))
        if ec:  # H(0, m)
            score = jnp.maximum(score, vdt(0 if zr else bnd(m)))
    # scores are integers (exactly representable under the f32 24-bit bound
    # checked by score_fn); return int32 regardless of the value dtype so the
    # public contract matches every other engine
    return score.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("m", "n", "nr", "block", "cfg", "zr", "zc",
                     "use_f32", "interpret"),
)
def _chunked_rows_scan(
    s1p: jax.Array,
    s2cm_all: jax.Array,
    scs: jax.Array,
    tb: jax.Array,  # Myers-Miller top-edge F open (gap_open, or 0 waived)
    m_true: jax.Array,  # true text length (<= the padded static m)
    m: int,
    n: int,
    nr: int,
    block: int,
    cfg: ScoringConfig,
    zr: bool,
    zc: bool,
    use_f32: bool,
    interpret: bool,
):
    """Affine fill returning the stacked per-block (H, F) boundary rows of
    the LAST DP row plus the final block's right-column capture planes —
    the Myers-Miller AND ends-free-locate building block at band speed.

    ``tb`` rides dynamically: the top-edge F row is ``H(0, :) + tb`` (so
    row 1's F opens at cost tb — ``tb = gap_open`` reproduces the standard
    Gotoh boundary exactly) and the left column spaces ``tb + i*ext`` —
    the flagged base solver's boundary forms.  ``zr``/``zc`` select the
    ends-free zero boundaries (overriding the tb spacing there)."""
    assert cfg.is_affine and not cfg.is_local
    vdt = jnp.float32 if use_f32 else jnp.int32
    K = scs.shape[0]
    Q = -(-m // block)
    p_max = (nr - 1) + (LANES - 1) * (nr + 2)
    unroll = 16
    ext = vdt(cfg.gap_extend)
    open_ = vdt(cfg.gap_open)
    tb = tb.astype(vdt)

    s2cm_strips = s2cm_all.reshape(K, nr, LANES)
    # left column H(i, 0) = tb + i*ext (the flagged boundary; 0 under zc)
    k_flat = (
        jax.lax.broadcasted_iota(jnp.int32, (nr, LANES), 1) * nr
        + jax.lax.broadcasted_iota(jnp.int32, (nr, LANES), 0)
    )

    def head0(sc):
        if zc:
            return jnp.where(k_flat >= sc[1], vdt(0), vdt(NEG_INF))
        i = (sc[0] + 1 - sc[1]) + k_flat
        return jnp.where(
            k_flat >= sc[1], tb + i.astype(vdt) * ext, vdt(NEG_INF))

    heads0 = jax.vmap(head0)(scs)
    headse0 = jnp.full((K, nr, LANES), vdt(NEG_INF))
    if cfg.has_matrix:
        kk = len(cfg.matrix)
        mat = jnp.asarray(cfg.matrix, vdt)
        prof0s = jnp.full((K, kk + 1), vdt(_min0(cfg)))
        prof0s = prof0s.at[:, :kk].set(
            mat[:, jnp.minimum(scs[:, 2], kk - 1)].T)

    t_steps = _round_up(block + p_max + 132, unroll)
    # captures couple blocks at dynamic per-block widths (ragged tail):
    # keep the capture select live throughout
    call = _strip_call(block, nr, t_steps, unroll, cfg, vdt, interpret,
                       chunked=True, cap_min=1)
    words_pb = block // 8
    jj = jnp.arange(block + 3, dtype=jnp.int32)

    def block_step(carry, q):
        heads, heads_e = carry
        j0 = q * block
        s1p_q = jax.lax.dynamic_slice(s1p, (q * words_pb,), (words_pb,))
        # per-block true width from the DYNAMIC text length: the static
        # shape is a 1/8-octave bucket so the Myers-Miller recursion's
        # data-dependent node widths share compiles; pad columns read as
        # the post-text sentinel through the kernel's m_sel guard
        last = jnp.clip(m_true - j0, 1, block)
        scs_q = scs.at[:, 4].set(last)
        jg = j0 + jj
        if zr:
            b0 = jnp.zeros((block + 3,), vdt)
        else:
            b0 = jnp.where(jg == 0, vdt(0), open_ + jg.astype(vdt) * ext)
        bf0 = b0 + tb  # F(0, :) = H(0, :) + tb: row 1 opens at cost tb
        # (tb = gap_open makes row 1's F = max(H0+open, H0+open)+ext, the
        # standard boundary; the zr form gives open+ext likewise)

        def strip_step(bpair, xs):
            b, bf = bpair
            if cfg.has_matrix:
                sc, s2cm_s, head_s, head_es, p0 = xs
                extra = (p0,)
            else:
                sc, s2cm_s, head_s, head_es = xs
                extra = ()
            b_out, bf_out, _, _, cap, cape = call(
                s1p_q, sc, b.astype(vdt), bf.astype(vdt), s2cm_s,
                *extra, head_s, head_es,
            )
            return (b_out, bf_out), (cap, cape)

        xs = (scs_q, s2cm_strips, heads, heads_e)
        if cfg.has_matrix:
            xs = xs + (prof0s,)
        (b_fin, bf_fin), (caps, capes) = jax.lax.scan(
            strip_step, (b0, bf0), xs)
        return (caps, capes), (b_fin, bf_fin, caps)

    _, (hrows, frows, caps_all) = jax.lax.scan(
        block_step, (heads0, headse0), jnp.arange(Q, dtype=jnp.int32))
    # caps_all[q]: block q's right-column capture planes in slot layout —
    # the TRUE final block's entry is H(i, m_true) (callers index it;
    # bucketed pad blocks beyond it capture garbage)
    return hrows, frows, caps_all


def gotoh_rows(
    s1,
    s2,
    cfg: ScoringConfig,
    tb: int,
    *,
    rows: int = 112,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
):
    """(H, F) of the final DP row (np.int64, length m+1) of the affine
    global fill with the Myers-Miller top-edge waiver ``tb`` — the
    alignment bisection's building block on the chunked band kernel
    (~100-200 GCUPS vs the XLA affine scan's ~0.5)."""
    if not cfg.is_affine or cfg.is_local or cfg.is_ends_free:
        raise ValueError("gotoh_rows serves global affine fills")
    s1 = np.asarray(s1, np.int32)
    s2 = np.asarray(s2, np.int32)
    m, n = int(s1.size), int(s2.size)
    if n < 2 or m < 8:
        raise ValueError("segment too small for the strip machinery")
    if max(m, n) > MAX_AXIS:
        raise ValueError("segment too long for the chunked band engine")
    from .band import MAX_BOUNDARY_AFFINE
    from .band_align import _bucket

    # the text axis pads to a 1/8-octave bucket: the Myers-Miller
    # recursion's data-dependent split widths then share compiles (the
    # kernel sentinels chars beyond the dynamic true length)
    m_pad = _round_up(_bucket(m), 8)
    block = int(min(block, MAX_BOUNDARY_AFFINE, m_pad))
    R = rows * LANES
    K = -(-n // R)
    Q = -(-m_pad // block)
    use_f32 = _wants_f32(cfg, m_pad, n)
    pad_char, post_text = _sentinels(cfg)
    scs_np, idx_np = strip_geometry(n, R)
    s_seq = jnp.asarray(s2, jnp.int32)
    scs, s2cm_all = pack_query(s_seq, scs_np, idx_np, K, rows, pad_char)
    tx = jnp.full((Q * block,), min(post_text, 15), jnp.int32)
    tx = jax.lax.dynamic_update_slice(tx, jnp.asarray(s1, jnp.int32), (0,))
    shifts = jnp.arange(8, dtype=jnp.int32) * 4
    s1p = jnp.sum(
        tx.reshape(Q * block // 8, 8) << shifts[None, :],
        axis=1, dtype=jnp.int32,
    )
    hrows, frows, _ = _chunked_rows_scan(
        s1p, s2cm_all, scs, jnp.int32(tb), jnp.int32(m), m_pad, n, rows,
        block, cfg, False, False, use_f32, interpret,
    )
    hrows = np.asarray(hrows).astype(np.int64)
    frows = np.asarray(frows).astype(np.int64)
    H = np.empty(m + 1, np.int64)
    F = np.empty(m + 1, np.int64)
    # left-column closed forms: H(n, 0) = tb + n*ext and F(n, 0) converges
    # to the same chain value
    H[0] = tb + n * cfg.gap_extend
    F[0] = H[0]
    for q in range(Q):
        j0 = q * block
        last = min(m - j0, block)
        if last <= 0:
            break
        H[j0 + 1 : j0 + last + 1] = hrows[q][1 : last + 1]
        F[j0 + 1 : j0 + last + 1] = frows[q][1 : last + 1]
    return H, F


def gotoh_locate_rows(
    s1,
    s2,
    cfg: ScoringConfig,
    *,
    zr: bool,
    zc: bool,
    rows: int = 112,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
):
    """(last_row, last_col) (np.int64, lengths m+1 / n+1) of the affine
    fill with (zr, zc) zero boundaries — the ends-free affine locate at
    band speed (~100 GCUPS vs the XLA locate scan's ~0.5)."""
    if not cfg.is_affine or cfg.is_local:
        raise ValueError("gotoh_locate_rows serves affine fills")
    s1 = np.asarray(s1, np.int32)
    s2 = np.asarray(s2, np.int32)
    m, n = int(s1.size), int(s2.size)
    if n < 2 or m < 8:
        raise ValueError("segment too small for the strip machinery")
    if max(m, n) > MAX_AXIS:
        raise ValueError("segment too long for the chunked band engine")
    from .band import MAX_BOUNDARY_AFFINE
    from .band_align import _bucket, _caps_to_col

    gcfg = cfg.with_mode(type(cfg.mode).GLOBAL)  # recurrence is global
    m_pad = _round_up(_bucket(m), 8)
    block = int(min(block, MAX_BOUNDARY_AFFINE, m_pad))
    R = rows * LANES
    K = -(-n // R)
    Q = -(-m_pad // block)
    use_f32 = _wants_f32(gcfg, m_pad, n)
    pad_char, post_text = _sentinels(gcfg)
    scs_np, idx_np = strip_geometry(n, R)
    s_seq = jnp.asarray(s2, jnp.int32)
    scs, s2cm_all = pack_query(s_seq, scs_np, idx_np, K, rows, pad_char)
    tx = jnp.full((Q * block,), min(post_text, 15), jnp.int32)
    tx = jax.lax.dynamic_update_slice(tx, jnp.asarray(s1, jnp.int32), (0,))
    shifts = jnp.arange(8, dtype=jnp.int32) * 4
    s1p = jnp.sum(
        tx.reshape(Q * block // 8, 8) << shifts[None, :],
        axis=1, dtype=jnp.int32,
    )
    hrows, _, caps_all = _chunked_rows_scan(
        s1p, s2cm_all, scs, jnp.int32(cfg.gap_open), jnp.int32(m), m_pad,
        n, rows, block, gcfg, zr, zc, use_f32, interpret,
    )
    hrows = np.asarray(hrows).astype(np.int64)
    row = np.empty(m + 1, np.int64)
    row[0] = 0 if zc else cfg.gap_open + n * cfg.gap_extend  # H(n, 0)
    for q in range(Q):
        j0 = q * block
        last = min(m - j0, block)
        if last <= 0:
            break
        row[j0 + 1 : j0 + last + 1] = hrows[q][1 : last + 1]
    b0m = 0 if zr else cfg.gap_open + m * cfg.gap_extend  # H(0, m)
    plan = [(int(scs_np[s, 0]), int(scs_np[s, 1])) for s in range(K)]
    q_true = -(-m // block) - 1  # the true final block (pad blocks beyond)
    col = _caps_to_col(np.asarray(caps_all[q_true]).astype(np.int64), plan,
                       n, R, rows, b0m)
    return row, col


def score_fn(
    m: int,
    n: int,
    cfg: ScoringConfig = ScoringConfig(),
    *,
    rows: int = 112,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
):
    """Jittable ``(s1, s2) -> score`` for fixed lengths ``m = len(s1)``,
    ``n = len(s2)`` — the unbounded-boundary engine's analog of
    ``band.score_fn`` (all packing runs on device inside the jit).
    Serves pair and matrix scoring (any K <= 16), affine (Gotoh) gaps,
    in all four alignment modes (round 5)."""
    if m == 0 or n == 0:
        base = _empty_score(m, n, cfg)
        return lambda s1, s2: jnp.int32(base)
    if (cfg.is_local and not cfg.has_matrix
            and (cfg.mismatch > 0 or (cfg.gap > 0 and not cfg.is_affine))):
        raise ValueError(
            "masked SW configs are outside the chunked engine's envelope"
        )
    if max(m, n) > MAX_AXIS:
        raise ValueError("sequence too long for the chunked band engine")
    swapped = n > m  # strips on the longer side shorten the per-block drain
    mb, ns = (n, m) if swapped else (m, n)
    if cfg.is_affine:
        # affine carries a second SMEM boundary row (F): the per-block
        # width obeys the same dual-row budget as band.MAX_BOUNDARY_AFFINE
        from .band import MAX_BOUNDARY_AFFINE

        block = min(block, MAX_BOUNDARY_AFFINE)
    ends = _ends_flags(cfg, swapped)
    kcfg = cfg
    if swapped and cfg.has_matrix:
        # the kernel scores matrix[text char][strip char]; swapping puts
        # s2 on the text axis, so an asymmetric matrix must transpose
        kcfg = dataclasses.replace(cfg, matrix=tuple(zip(*cfg.matrix)))
    block = int(min(block, _round_up(mb, 8)))
    if block % 8:
        raise ValueError("block width must be a multiple of 8")
    R = rows * LANES
    K = -(-ns // R)
    Q = -(-mb // block)
    use_f32 = _wants_f32(cfg, mb, ns)
    pad_char, post_text = _sentinels(kcfg)
    # the packed pad chars only matter up to the final block's true end —
    # beyond it the kernel's dynamic m_sel guard substitutes the sentinel —
    # but keep them a non-code anyway; clamp into the 4-bit pack range
    tx_pad = min(post_text, 15)

    scs_np, idx_np = strip_geometry(ns, R)

    def fn(s1: jax.Array, s2: jax.Array) -> jax.Array:
        b_seq, s_seq = (s2, s1) if swapped else (s1, s2)
        b_seq = b_seq.astype(jnp.int32)
        s_seq = s_seq.astype(jnp.int32)
        scs, s2cm_all = pack_query(s_seq, scs_np, idx_np, K, rows,
                                   pad_char)
        tx = jnp.full((Q * block,), tx_pad, jnp.int32)
        tx = jax.lax.dynamic_update_slice(tx, b_seq, (0,))
        shifts = jnp.arange(8, dtype=jnp.int32) * 4
        s1p = jnp.sum(
            tx.reshape(Q * block // 8, 8) << shifts[None, :],
            axis=1,
            dtype=jnp.int32,
        )
        return _chunked_scan(
            s1p, s2cm_all, scs, mb, ns, rows, block, kcfg, ends, use_f32,
            interpret,
        )

    return fn


def score(
    s1,
    s2,
    cfg: ScoringConfig = ScoringConfig(),
    *,
    rows: int = 112,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> int:
    """Alignment score with NO boundary-axis cap (both sequences may exceed
    ``band.MAX_BOUNDARY``; the limit is HBM).  NW any params, SW, matrix,
    semiglobal/infix."""
    s1 = jnp.asarray(np.asarray(s1, np.int32))
    s2 = jnp.asarray(np.asarray(s2, np.int32))
    fn = score_fn(
        int(s1.shape[0]), int(s2.shape[0]), cfg,
        rows=rows, block=block, interpret=interpret,
    )
    return int(np.asarray(fn(s1, s2)))
