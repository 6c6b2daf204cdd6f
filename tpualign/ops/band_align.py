"""Alignment recovery on the banded strip engine: k-way row splits for
global scoring, locate-and-walk for Smith-Waterman.

The round-2 framework aligned general-scoring/SW pairs through the
checkpointed diagonal traceback (27 s for the 64gb SW pair) because the fast
k-way Hirschberg was bit-parallel-only.  This module brings the same
one-dispatch-many-splits idea (``hirschberg.py``'s k-way splitter) to the
band engine, for **every** scoring config:

Global (NW any params)
----------------------
A **single-strip kernel** (same schedule as ``band._band_kernel_body``, one
strip per call, boundary row in/out) is scanned over the strip axis with
``lax.scan``: the carry is the boundary row ``B = H(i0, :)``, and the scan's
stacked outputs are **every strip-boundary row of H** — K full rows from ONE
dispatch.  A second scan on the reversed pair (its first strip bottom-aligned
via a dynamic first-live-slot, so its boundaries land on the same rows)
yields the reverse rows; ``argmax_j F[s][j] + R[s][m-j]`` then gives K-1
crossing points of the (leftmost) optimal path at once.  The K row-bands
between crossings are independent full-table walks handed to the native C++
traceback on a thread pool.  Wall: two band fills + one dispatch each + the
threaded walks — against one ~25 ms round trip *per split* for a binary
bisection.

Local (SW)
----------
Three passes of the same kernel locate an optimal cell without storing
anything dense: (1) the forward scan's per-strip running-max planes find the
strip s* and row r* of the first maximum; (2) a bottom-aligned refill of
rows ``s*R+1 .. i*`` re-derives ``H(i*, :)`` as its boundary output, whose
argmax is j*; (3) the native local walk runs on a window ending at
``(i*, j*)``, doubling the window until the recovered score matches the
known maximum (sound: window DP values never exceed the true DP's, so
equality certifies optimality).

Reference parity: the reference computes no alignment for ANY config
(``driver.cpp:35`` prints a score only); both paths here are framework
capabilities beyond it.  Tie order matches ``hirschberg.align``'s contract:
an optimal path, not necessarily the oracle's diag>up>left walk.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ScoringConfig
from .pallas_diag import LANES, _round_up
from .band import (
    NEG_INF,
    PAD_CHAR,
    _colmajor,
    _lane_shift,
    _min0,
    _pack4,
    _phase_grid,
    _sentinels,
    _shift1,
    _wants_f32,
    MAX_BOUNDARY,
)
from . import oracle

#: leaf bands bigger than this fall back to a binary split before walking
#: (native walk allocates (R+1)x(dx+1) int32)
MAX_LEAF_CELLS = 1 << 28

#: SW hits whose path bound stays under this take one native window walk;
#: longer hits locate the path START too and run the global k-way recovery
SW_WINDOW_LIMIT = 2048


def _check_align_cfg(cfg: ScoringConfig) -> None:
    """Gate for the band alignment paths: global/local, linear gap, pair
    or matrix scoring (ends-free modes go through ``ops.ends_free``, which
    reduces them to global cores recovered here)."""
    if cfg.is_ends_free:
        raise ValueError(
            "band_align serves global/local configs; ends-free modes "
            "reduce through ops.ends_free")
    if cfg.is_affine:
        raise ValueError(
            "affine gaps are outside the band alignment's envelope; "
            "small problems align via the oracle (see api.align)")


def _transposed(cfg: ScoringConfig) -> ScoringConfig:
    """Config for the swapped (s2, s1) orientation: matrices transpose
    (``matrix[a][b]`` scores s1-code a vs s2-code b)."""
    if not cfg.has_matrix:
        return cfg
    import dataclasses

    return dataclasses.replace(cfg, matrix=tuple(zip(*cfg.matrix)))


def _strip_kernel_body(
    m: int,
    nr: int,
    t_steps: int,
    unroll: int,
    cfg: ScoringConfig,
    vdt,
    interpret: bool,
    chunked: bool,
    zc: bool,
    capture: bool,
    cap_min: int,
    *refs,
):
    """One strip of the band schedule, boundary row in/out.

    Refs, in order: ``s1_ref`` SMEM (words,) packed text; ``sc_ref`` SMEM
    (5,) [i0, klo, s2_first, k_hi, m_sel] (strip row offset, first live
    slot for bottom-aligned partial strips, the top live row's char,
    one-past-last live slot, capture column);
    ``b_in_ref`` VMEM (m+3,) boundary row H(i0, :) — DMA'd
    into ``b_ref`` (a second SMEM window would bust the 1 MB budget at
    corpus m); ``s2cm_ref`` VMEM (nr, LANES) strip chars, column-major;
    [matrix: ``prof0_ref`` SMEM (K+1,) top-live-row profile
    ``matrix[ch][s2_first]`` with the decaying sentinel in slot K];
    [chunked: ``head_ref`` VMEM (nr, LANES) left-column values H(i, j0)
    in slot layout].  Outputs: ``b_ref`` SMEM (m+3,) boundary row out
    (also the working buffer); ``vmax_ref``; ``v_ref`` per-slot running
    max; [chunked or capture: ``cap_ref`` VMEM (nr, LANES) right-column
    capture H(i, j0+m)].  Then the plane/ring scratch, [matrix: K
    substitution profile planes], and the DMA semaphore.

    ``chunked`` is the column-block mode of the unbounded-boundary driver
    (``band_chunked.py``): the wavefront head injects a COLUMN of carried
    values instead of the analytic H(i, 0), and each slot's value at its
    last in-block column is captured for the next block.  ``zc`` zeroes
    the injected head column (ends-free free-start boundary, like local);
    ``capture`` turns on the right-column capture without the chunked
    head (the ends-free last-column extraction, round 5).
    """
    has_matrix = cfg.has_matrix
    affine = cfg.is_affine
    K = len(cfg.matrix) if has_matrix else 0
    i_in = 3
    refs_l = list(refs)
    s1_ref, sc_ref, b_in_ref = refs_l[:3]
    bf_in_ref = None
    if affine:  # F boundary row in (the vertical gap chain crosses strips)
        bf_in_ref = refs_l[i_in]
        i_in += 1
    s2cm_ref = refs_l[i_in]
    i_in += 1
    prof0_ref = None
    if has_matrix:
        prof0_ref = refs_l[i_in]
        i_in += 1
    head_ref = heade_ref = None
    if chunked:
        head_ref = refs_l[i_in]
        i_in += 1
        if affine:  # E head column (the horizontal chain crosses blocks)
            heade_ref = refs_l[i_in]
            i_in += 1
    b_ref = refs_l[i_in]
    i_in += 1
    bf_ref = None
    if affine:
        bf_ref = refs_l[i_in]
        i_in += 1
    vmax_ref, v_ref = refs_l[i_in:i_in + 2]
    i_in += 2
    cap_ref = cape_ref = None
    if chunked or capture:
        cap_ref = refs_l[i_in]
        i_in += 1
        if affine and chunked:
            cape_ref = refs_l[i_in]
            i_in += 1
    (a0_ref, a0s_ref, a1_ref, a1s_ref, w_ref, pendv_ref,
     pendw_ref) = refs_l[i_in:i_in + 7]
    i_in += 7
    e_ref = fs_ref = pendf_ref = None
    if affine:
        e_ref, fs_ref, pendf_ref = refs_l[i_in:i_in + 3]
        i_in += 3
    prof_refs = refs_l[i_in:i_in + K] if has_matrix else []
    dma_sem = refs_l[i_in + K]
    if not has_matrix:
        match = vdt(cfg.match)
        mismatch = vdt(cfg.mismatch)
    else:
        min0 = vdt(_min0(cfg))
    _, post_text = _sentinels(cfg)
    g = vdt(cfg.gap)
    if affine:
        open_ = vdt(cfg.gap_open)
        ext = vdt(cfg.gap_extend)
        g = ext  # analytic head spacing: H(i, 0) = open + i*ext
    local = cfg.is_local
    phase, k_flat = _phase_grid(nr)
    lane_is0 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) == 0
    neg = jnp.full((nr, LANES), NEG_INF, vdt)
    p_max = (nr - 1) + (LANES - 1) * (nr + 2)

    i0 = sc_ref[0]
    klo = sc_ref[1]  # first live slot; rows i0+1+(k-klo) live in k >= klo
    s2_first = sc_ref[2]
    k_hi = sc_ref[3]  # one past the last live slot (rows beyond the query)
    m_sel = sc_ref[4]  # capture column (m / block width / per-pair text len)
    if local or zc:
        i0g = vdt(0)
    elif affine:
        i0g = jnp.where(i0 == 0, vdt(0),
                        open_ + i0.astype(vdt) * ext)
    else:
        i0g = i0.astype(vdt) * g

    # head values: H(i0 + 1 + (k - klo), j0); dead slots (k < klo) stay NEG.
    # The chunked driver carries the true left column in slot layout; the
    # single-table fills use the analytic H(i, 0) boundary (0 under the
    # local / free-start-column forms; open + i*ext under affine — the
    # shared ``g = ext`` spacing plus the open term below)
    if chunked:
        head_vals = head_ref[:]
    elif local or zc:
        head_vals = jnp.where(k_flat >= klo, vdt(0), vdt(NEG_INF))
    else:
        head_base = (i0 + 1 - klo).astype(vdt) * g + k_flat.astype(vdt) * g
        if affine:
            head_base = head_base + open_
        head_vals = jnp.where(k_flat >= klo, head_base, vdt(NEG_INF))
    cand_slot = k_flat == klo  # the top live row consumes the boundary
    # the top live row runs staggered: at step t it computes column
    # j = t - phase(klo), so its boundary reads are B[j-1], B[j]
    p_klo = (klo % nr) + (klo // nr) * (nr + 2)

    if interpret:  # no DMA emulation needed: plain element copy
        def binit(j, _):
            b_ref[j] = b_in_ref[j]
            if affine:
                bf_ref[j] = bf_in_ref[j]
            return 0

        jax.lax.fori_loop(0, m + 3, binit, 0, unroll=False)
    else:
        cp = pltpu.make_async_copy(b_in_ref, b_ref, dma_sem)
        cp.start()
        cp.wait()
        if affine:
            cpf = pltpu.make_async_copy(bf_in_ref, bf_ref, dma_sem)
            cpf.start()
            cpf.wait()
    a0_ref[:] = neg
    a0s_ref[:] = neg
    a1_ref[:] = neg
    a1s_ref[:] = neg
    w_ref[:] = jnp.zeros((nr, LANES), jnp.int32)
    pendv_ref[:] = jnp.full((8, LANES), NEG_INF, vdt)
    pendw_ref[:] = jnp.zeros((8, LANES), jnp.int32)
    if affine:
        e_ref[:] = neg  # E decays until real H values flow in
        fs_ref[:] = neg  # shifted F plane, H's shift/ring discipline
        pendf_ref[:] = jnp.full((8, LANES), NEG_INF, vdt)
        # F(i0, 0): the column-0 up-gap chain — equals H(i0, 0) globally,
        # converges to open + ext under a zero column; NEG on strip 0
        if local:
            bf0 = vdt(NEG_INF)
        elif zc:
            bf0 = jnp.where(i0 == 0, vdt(NEG_INF), open_ + ext)
        else:
            bf0 = jnp.where(i0 == 0, vdt(NEG_INF), i0g)
    if local:
        v_ref[:] = jnp.zeros((nr, LANES), vdt)
    if chunked or capture:
        cap_ref[:] = neg
        if affine and chunked:
            cape_ref[:] = neg

    s2cm = s2cm_ref[:]
    if has_matrix:
        # per-strip substitution profile planes prof[w] = matrix[w][s2cm]
        # (strip chars are constant per call, so the K*K select tree
        # amortizes over the sweep); pad rows (code K) keep the decaying
        # sentinel default
        for w in range(K):
            p = jnp.full((nr, LANES), min0, vdt)
            for b in range(K):
                p = jnp.where(s2cm == b, vdt(cfg.matrix[w][b]), p)
            prof_refs[w][:] = p

    def substep(t, u, bjm1, bj, bjf, a_ref, as_ref, oa_ref, oas_ref, ramp,
                cap=False):
        idx = jnp.clip(t - 1, 0, m - 1)
        ch = (s1_ref[idx >> 3] >> ((idx & 7) << 2)) & 15
        # post-text sentinel beyond the DYNAMIC text end m_sel (<= the
        # static width m): bucketed fills and ragged batch pairs pad the
        # text axis, and the pad region must decay, not fabricate matches
        ch = jnp.where(t - 1 < m_sel, ch, post_text)
        w_row0 = jnp.where(
            lane_is0, ch, pendw_ref[(u - 3) % 8 : (u - 3) % 8 + 1, :]
        )
        w_new = _shift1(w_row0, w_ref[:], nr)
        w_ref[:] = w_new
        if has_matrix:
            sub = jnp.full((nr, LANES), min0, vdt)
            for w in range(K - 1, -1, -1):
                sub = jnp.where(w_new == w, prof_refs[w][:], sub)
        else:
            sub = jnp.where(s2cm == w_new, match, mismatch)
        # top live row's boundary candidate, merged plane-wide (the slot is
        # dynamic here — bottom-aligned strips — so no scalar-row shortcut)
        j_top = t - p_klo  # the top live row's column this step
        idx0 = jnp.clip(j_top - 1, 0, m - 1)
        ch0 = (s1_ref[idx0 >> 3] >> ((idx0 & 7) << 2)) & 15
        ch0 = jnp.where(j_top - 1 < m_sel, ch0, post_text)
        if has_matrix:
            sub0 = prof0_ref[ch0]
        else:
            sub0 = jnp.where(s2_first == ch0, match, mismatch)
        # live window only: outside it the boundary reads are clipped or
        # stale and would fabricate values above the top row's true max,
        # corrupting the per-slot max plane the SW locate pass reads
        win = (j_top >= 1) & (j_top <= m)
        if affine:
            # Gotoh: E (left gap) needs no shift — the left cell is this
            # slot one step earlier; F (up gap) rides H's exact shift/ring
            # discipline through fs_ref.  The top live row's F closes or
            # extends from BOTH boundary rows (H and F of row i0)
            e_new = jnp.maximum(a_ref[:] + open_, e_ref[:]) + ext
            f_new = jnp.maximum(as_ref[:] + open_, fs_ref[:]) + ext
            f_cand = jnp.maximum(bj + open_, bjf) + ext
            f_new = jnp.maximum(
                f_new,
                jnp.where(cand_slot & win, f_cand, vdt(NEG_INF)),
            )
            new = jnp.maximum(
                oas_ref[:] + sub, jnp.maximum(e_new, f_new)
            )
            cand = jnp.where(win, bjm1 + sub0, vdt(NEG_INF))
        else:
            cand = jnp.maximum(bjm1 + sub0, bj + g)
            cand = jnp.where(win, cand, vdt(NEG_INF))
            new = jnp.maximum(
                oas_ref[:] + sub, jnp.maximum(a_ref[:], as_ref[:]) + g
            )
        new = jnp.maximum(new, jnp.where(cand_slot, cand, vdt(NEG_INF)))
        if local:
            new = jnp.maximum(new, vdt(0))
        if ramp:
            new = jnp.where(phase == t, head_vals, new)
            if affine:
                # E state at the injected head column: NEG on a true
                # table edge, the carried E column in chunked mode
                e_head = heade_ref[:] if chunked else neg
                e_new = jnp.where(phase == t, e_head, e_new)
        if local:
            # fully masked fold: the locate pass reads PER-SLOT maxes, so
            # even decayed-but-positive pad/dead/pre-start values (which the
            # score kernel's global max tolerates) must stay out — incl.
            # the bucketed pad columns beyond the true text end m_sel
            live = (
                (phase <= t)
                & (t - phase <= m_sel)
                & (k_flat >= klo)
                & (k_flat < k_hi)
            )
            v_ref[:] = jnp.maximum(
                v_ref[:], jnp.where(live, new, vdt(NEG_INF))
            )
        if cap:  # right-column capture: each slot's value at column m_sel
            # (the block width for the chunked driver, the full text width
            # for the ends-free locate fills, the per-pair text length for
            # the batched serving path)
            hit = t - phase == m_sel
            cap_ref[:] = jnp.where(hit, new, cap_ref[:])
            if affine and chunked:  # the E chain crosses the block edge
                cape_ref[:] = jnp.where(hit, e_new, cape_ref[:])
        oa_ref[:] = new
        v_row0 = jnp.where(
            lane_is0,
            vdt(NEG_INF),
            pendv_ref[(u - 2) % 8 : (u - 2) % 8 + 1, :],
        )
        oas_ref[:] = _shift1(v_row0, new, nr)
        tail = new[nr - 1 : nr, :]
        pendv_ref[u % 8 : u % 8 + 1, :] = _lane_shift(tail)
        pendw_ref[u % 8 : u % 8 + 1, :] = _lane_shift(w_new[nr - 1 : nr, :])
        if affine:
            e_ref[:] = e_new
            fv_row0 = jnp.where(
                lane_is0,
                vdt(NEG_INF),
                pendf_ref[(u - 2) % 8 : (u - 2) % 8 + 1, :],
            )
            fs_ref[:] = _shift1(fv_row0, f_new, nr)
            pendf_ref[u % 8 : u % 8 + 1, :] = _lane_shift(
                f_new[nr - 1 : nr, :]
            )

    def block_impl(tt, c, ramp, cap=False):
        t0 = tt * unroll
        # boundary reads for the (staggered) top live row: B[j_top-1..];
        # writes trail the read cursor by p_max - p_klo >= the live rows'
        # phase span, so per-block early reads stay safe (callers keep
        # live counts >= LANES)
        bv = []
        bfv = []
        for u in range(-1, unroll):
            jt = t0 + u - p_klo
            b = b_ref[jnp.clip(jt, 0, m)]
            if chunked:  # the driver materializes the corner in B[0]
                bv.append(b)
            else:
                bv.append(jnp.where(jt == 0, i0g, b))
            if affine:
                bf = bf_ref[jnp.clip(jt, 0, m)]
                if not chunked:
                    bf = jnp.where(jt == 0, bf0, bf)
                bfv.append(bf)
            else:
                bfv.append(None)
        for u in range(unroll):
            t = t0 + u
            refs = (a0_ref, a0s_ref, a1_ref, a1s_ref)
            if u % 2 == 1:
                refs = (a1_ref, a1s_ref, a0_ref, a0s_ref)
            substep(t, u, bv[u], bv[u + 1], bfv[u + 1], *refs, ramp,
                    cap=cap)
            if u % 8 == 7:
                for uu in range(u - 7, u + 1):
                    j_out = t0 + uu - p_max
                    ok = jnp.logical_and(j_out >= 1, j_out <= m)
                    idx = jnp.where(ok, j_out, m + 2)
                    b_ref[idx] = pendv_ref[uu % 8, 0]
                    if affine:
                        bf_ref[idx] = pendf_ref[uu % 8, 0]
        return c

    t_head = min(t_steps, _round_up(p_max + 2, unroll))
    if not (chunked or capture):
        segs = [(0, t_head, True, False), (t_head, t_steps, False, False)]
    else:
        # captures fire at t = m_sel + phase: skip the capture select until
        # the earliest possible hit.  ``cap_min`` is the SMALLEST capture
        # column any call may carry (m for plain fills; the ragged final
        # block / owner chip / shortest batch pair for the dynamic-m_sel
        # drivers) — gating on the static width alone silently skipped the
        # ragged captures (caught by the 400k semiglobal native check)
        t_cap = min(t_steps, (cap_min // unroll) * unroll)
        cuts = sorted({0, min(t_head, t_cap), t_head, max(t_head, t_cap),
                       t_steps})
        segs = [
            (a, b, a < t_head, a >= t_cap)
            for a, b in zip(cuts, cuts[1:])
            if a < b
        ]
    for a, b, ramp_f, cap_f in segs:
        jax.lax.fori_loop(
            a // unroll, b // unroll,
            lambda tt, c, r=ramp_f, cp=cap_f: block_impl(tt, c, r, cp),
            0, unroll=False,
        )
    # the NEXT strip's boundary corner: H(i0+R, j0) — the injected left
    # column's last row when chunked, analytic H(i0+R, 0) otherwise
    if chunked:
        b_ref[0] = head_ref[nr - 1, LANES - 1]  # slot R-1
    else:
        nxt = i0 + (nr * LANES - klo)
        if local or zc:
            b_ref[0] = vdt(0)
        elif affine:
            b_ref[0] = open_ + nxt.astype(vdt) * ext
        else:
            b_ref[0] = nxt.astype(vdt) * g
    if affine:
        # BF[0] is never read (the top row's F candidate is masked at
        # j_top = 0); keep it a sane sentinel
        bf_ref[0] = vdt(NEG_INF)
    if local:
        vmax_ref[0, 0] = jnp.max(v_ref[:])
    else:
        vmax_ref[0, 0] = vdt(0)
        v_ref[:] = neg


def _strip_call(m, nr, t_steps, unroll, cfg, vdt, interpret, *, chunked,
                zc=False, capture=False, cap_min=None):
    """Build the single-strip pallas_call (see ``_strip_kernel_body``)."""
    kernel = functools.partial(
        _strip_kernel_body, m, nr, t_steps, unroll, cfg, vdt, interpret,
        chunked, zc, capture, m if cap_min is None else cap_min,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    affine = cfg.is_affine
    outs = [jax.ShapeDtypeStruct((m + 3,), vdt)]
    out_specs = [smem]
    if affine:
        outs.append(jax.ShapeDtypeStruct((m + 3,), vdt))  # F boundary row
        out_specs.append(smem)
    outs += [
        jax.ShapeDtypeStruct((1, 1), vdt),
        jax.ShapeDtypeStruct((nr, LANES), vdt),
    ]
    out_specs += [smem, vmem]
    ins = [smem, smem, vmem]
    if affine:
        ins.append(vmem)  # F boundary row in
    ins.append(vmem)  # s2cm
    if cfg.has_matrix:
        ins.append(smem)  # prof0: top-live-row profile (K+1,)
    if chunked:
        ins.append(vmem)  # head column plane
        if affine:
            ins.append(vmem)  # E head column plane
    if chunked or capture:
        outs.append(jax.ShapeDtypeStruct((nr, LANES), vdt))  # capture
        out_specs.append(vmem)
        if affine and chunked:
            outs.append(jax.ShapeDtypeStruct((nr, LANES), vdt))  # E capture
            out_specs.append(vmem)
    K = len(cfg.matrix) if cfg.has_matrix else 0
    return pl.pallas_call(
        kernel,
        out_shape=tuple(outs),
        # b_in arrives in VMEM and is DMA'd into the SMEM working window:
        # SMEM (1 MB) holds exactly one corpus-size boundary row
        in_specs=ins,
        out_specs=tuple(out_specs),
        scratch_shapes=(
            [pltpu.VMEM((nr, LANES), vdt) for _ in range(4)]
            + [
                pltpu.VMEM((nr, LANES), jnp.int32),
                pltpu.VMEM((8, LANES), vdt),
                pltpu.VMEM((8, LANES), jnp.int32),
            ]
            + ([pltpu.VMEM((nr, LANES), vdt), pltpu.VMEM((nr, LANES), vdt),
                pltpu.VMEM((8, LANES), vdt)] if affine else [])
            + [pltpu.VMEM((nr, LANES), vdt) for _ in range(K)]
            + [pltpu.SemaphoreType.DMA]
        ),
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("m", "nr", "cfg", "use_f32", "interpret", "chain_b",
                     "zc", "capture", "cap_min"),
)
def _strip_scan(
    s1p: jax.Array,  # (words,) packed text, or (K, words) when chain_b is
    #                  False (independent per-step pairs — the serving path)
    s2cm_all: jax.Array,  # (K * nr, LANES) strip chars
    scs: jax.Array,  # (K, 5) [i0, klo, s2_first, k_hi, m_sel] per strip
    b0: jax.Array,  # (m + 3,) initial boundary row, or (K, m + 3)
    prof0s,  # (K, K_alpha + 1) per-strip top-row profiles, or None
    m: int,
    nr: int,
    cfg: ScoringConfig,
    use_f32: bool,
    interpret: bool,
    chain_b: bool = True,
    zc: bool = False,
    capture: bool = False,
    cap_min=None,  # smallest m_sel any strip carries (capture gating)
):
    """Scan the single-strip kernel over K strips; returns the stacked
    boundary rows (K, m+3), per-strip vmax (K,), per-slot max planes, and
    (when ``capture``) the per-strip right-column capture planes.

    ``chain_b=True`` carries the boundary row strip-to-strip (one DP table,
    the alignment fills); ``chain_b=False`` feeds each step its own text and
    boundary row (independent pairs — the batched serving path)."""
    if cfg.is_affine:
        # the scan-of-strips unpack carries (b, vmax, vplane[, cap]) —
        # affine's extra F row rides only the chunked driver for now
        raise ValueError(
            "affine configs are outside the strip-scan fills; the "
            "alignment paths gate them to affine_align")
    vdt = jnp.float32 if use_f32 else jnp.int32
    p_max = (nr - 1) + (LANES - 1) * (nr + 2)
    unroll = 16
    t_steps = _round_up(m + p_max + 132, unroll)
    call = _strip_call(m, nr, t_steps, unroll, cfg, vdt, interpret,
                       chunked=False, zc=zc, capture=capture,
                       cap_min=cap_min)
    K = scs.shape[0]
    s2cm_strips = s2cm_all.reshape(K, nr, LANES)

    def unpack(outs):
        if capture:
            b_out, vmax, vplane, cap = outs
        else:
            (b_out, vmax, vplane), cap = outs, None
        return b_out, (b_out, vmax[0, 0], vplane) + (
            (cap,) if capture else ())

    if chain_b:
        def step(b, xs):
            if cfg.has_matrix:
                sc, s2cm_s, p0 = xs
                extra = (p0,)
            else:
                sc, s2cm_s = xs
                extra = ()
            return unpack(call(s1p, sc, b.astype(vdt), s2cm_s, *extra))

        xs = (scs, s2cm_strips) + (
            (prof0s,) if cfg.has_matrix else ())
        _, outs = jax.lax.scan(step, b0.astype(vdt), xs)
    else:
        def step(_, xs):
            if cfg.has_matrix:
                s1p_s, sc, b_s, s2cm_s, p0 = xs
                extra = (p0,)
            else:
                s1p_s, sc, b_s, s2cm_s = xs
                extra = ()
            _, out = unpack(call(s1p_s, sc, b_s.astype(vdt), s2cm_s,
                                 *extra))
            return 0, out

        xs = (s1p, scs, b0, s2cm_strips) + (
            (prof0s,) if cfg.has_matrix else ())
        _, outs = jax.lax.scan(step, 0, xs)
    if capture:
        return outs
    bs, vmaxs, vplanes = outs
    return bs, vmaxs, vplanes, None


def _plan_strips(n: int, R: int, bottom_align: bool):
    """Per-strip (i0, klo, row_count).  ``bottom_align`` puts the partial
    strip FIRST (live rows at the bottom of the slot range) so boundaries
    land on rows ``n - s*R`` — used by the reverse fill."""
    out = []
    if bottom_align:
        r0 = n % R or R
        out.append((0, R - r0))
        i0 = r0
        while i0 < n:
            out.append((i0, 0))
            i0 += R
    else:
        i0 = 0
        while i0 < n:
            out.append((i0, 0))
            i0 += R
    return out


def _prof0s(cfg, scs, use_f32):
    """(K_strips, K_alpha + 1) per-strip top-row profiles
    ``matrix[ch][s2_first]`` with the decaying sentinel in slot K."""
    if not cfg.has_matrix:
        return None
    mat = np.asarray(cfg.matrix, np.int64)
    kk = mat.shape[0]
    dt = np.float32 if use_f32 else np.int32
    out = np.full((scs.shape[0], kk + 1), _min0(cfg), dt)
    firsts = np.minimum(scs[:, 2], kk - 1)  # dead strips carry pad codes
    out[:, :kk] = mat[:, firsts].T
    return jnp.asarray(out)


def _bucket(m: int) -> int:
    """Round the text axis up to 1/8-octave granularity (<= 12.5% padding):
    the fills' compile keys stay bounded across the data-dependent prefix
    shapes the locate passes produce (the hirschberg _soft_bucket scheme).
    The kernel chars beyond the TRUE length (scs[:, 4]) read as the
    post-text sentinel, so the pad region only decays."""
    m = max(16, m)
    p = 1 << max(1, m.bit_length() - 4)
    return -(-m // p) * p


def _fill(s1, s2, cfg, rows, *, bottom_align=False, interpret=False,
          zero_row=False, zero_col=False, capture=False):
    """One band fill; returns (boundary rows (K, m_pad+3) np, vmaxs,
    vplanes, strip plan[, capture planes]).  Strips cover s2; boundary
    axis is s1, padded to a shape bucket (callers slice rows to the true
    ``m + 1``).

    ``zero_row`` zeroes the initial boundary row H(0, :) and ``zero_col``
    the injected head column H(:, 0) — the ends-free boundary variants;
    ``capture`` returns per-strip right-column planes H(i, m) in slot
    layout (the ends-free last-column extraction)."""
    m, n = int(s1.shape[0]), int(s2.shape[0])
    m_pad = _bucket(m)
    R = rows * LANES
    plan = _plan_strips(n, R, bottom_align)
    K = len(plan)
    use_f32 = _wants_f32(cfg, m_pad, n)
    vdt = jnp.float32 if use_f32 else jnp.int32
    pad_char, _ = _sentinels(cfg)

    s1j = jnp.asarray(s1, jnp.int32)
    s2j = jnp.asarray(s2, jnp.int32)
    s1p = _pack4(s1j, m_pad)
    # chars per strip, honoring bottom alignment of the first strip
    cm = jnp.full((K * R,), pad_char, jnp.int32)
    if bottom_align:
        r0 = n % R or R
        cm = jax.lax.dynamic_update_slice(
            cm, s2j[: r0].astype(jnp.int32), (R - r0,)
        )
        if n > r0:
            cm = jax.lax.dynamic_update_slice(
                cm, s2j[r0:].astype(jnp.int32), (R,)
            )
    else:
        cm = jax.lax.dynamic_update_slice(cm, s2j.astype(jnp.int32), (0,))
    s2cm_all = (
        cm.reshape(K, LANES, rows).transpose(0, 2, 1).reshape(K * rows, LANES)
    )
    scs = np.zeros((K, 5), np.int32)
    for s, (i0, klo) in enumerate(plan):
        scs[s, 0] = i0
        scs[s, 1] = klo
        scs[s, 2] = int(np.asarray(s2)[i0]) if i0 < n else pad_char
        scs[s, 3] = klo + min(n - i0, R - klo)
        scs[s, 4] = m  # capture column / true text end (pad cols decay)
    if cfg.is_local or zero_row:
        b0 = jnp.zeros((m_pad + 3,), vdt)
    else:
        b0 = (jnp.arange(m_pad + 3, dtype=jnp.int32) * cfg.gap).astype(vdt)
    bs, vmaxs, vplanes, caps = _strip_scan(
        s1p, s2cm_all, jnp.asarray(scs), b0, _prof0s(cfg, scs, use_f32),
        m_pad, rows, cfg, use_f32, interpret, zc=zero_col, capture=capture,
        cap_min=m,
    )
    out = (
        np.asarray(bs),
        np.asarray(vmaxs),
        np.asarray(vplanes),
        plan,
    )
    if capture:
        return out + (np.asarray(caps),)
    return out


def _leaf_walks(jobs, s1, s2, cfg):
    """Threaded native/oracle full-table walks over (ta, tb, qa, qb) bands;
    returns the concatenated alignment strings in path order.  Bands whose
    table exceeds :data:`MAX_LEAF_CELLS` are recursively median-split on
    the device before walking."""
    from concurrent.futures import ThreadPoolExecutor

    from ..utils import native

    use_native = native.available() and not cfg.is_local

    def leaf(ta, tb, qa, qb):
        text, query = s1[ta:tb], s2[qa:qb]
        cells = (tb - ta + 1) * (qb - qa + 1)
        if cells > MAX_LEAF_CELLS and qb - qa >= 2 and tb - ta >= 2:
            _, a1, a2 = _binary_walk(text, query, cfg)
            return None, a1, a2
        if use_native:
            try:
                return native.traceback(text, query, cfg)
            except RuntimeError:
                pass
        return oracle.traceback(text, query, cfg)

    with ThreadPoolExecutor(max_workers=8) as pool:
        futs = [pool.submit(leaf, *j) for j in jobs]
        results = [f.result() for f in futs]
    a1 = "".join(r[1] for r in results)
    a2 = "".join(r[2] for r in results)
    return a1, a2


def align_global(
    s1,
    s2,
    cfg: ScoringConfig = ScoringConfig(),
    *,
    rows: int = 32,
    interpret: bool = False,
) -> Tuple[int, str, str]:
    """Global alignment via k-way band row splits (any linear-gap params).

    Two band fills (forward + reverse, one device dispatch each) produce H
    rows at every strip boundary; crossings of the leftmost optimal path
    drop out of ``argmax(F + R)`` per row, and the row bands between them
    are walked by the native C++ traceback in parallel.  Substitution
    matrices (any K <= 16) ride the same machinery since round 5: profile
    planes in the strip kernel, the matrix-aware native walk at the
    leaves.
    """
    _check_align_cfg(cfg)
    s1 = np.asarray(s1, np.int32)
    s2 = np.asarray(s2, np.int32)
    m, n = s1.size, s2.size
    if m == 0 or n == 0 or (m + 1) * (n + 1) <= (1 << 22):
        from ..utils import native

        if m and n and native.available():
            try:
                return native.traceback(s1, s2, cfg)
            except RuntimeError:
                pass
        return oracle.traceback(s1, s2, cfg)
    if m > MAX_BOUNDARY:
        if n > MAX_BOUNDARY:
            raise ValueError("pair exceeds the boundary-row envelope")
        sc, x, y = align_global(
            s2, s1, _transposed(cfg), rows=rows, interpret=interpret
        )
        return sc, y, x
    R = rows * LANES
    if n <= 2 * R:  # a couple of strips: just walk it (binary split first
        # keeps the native table under MAX_LEAF_CELLS)
        return _binary_walk(s1, s2, cfg)

    f_bs, _, _, f_plan = _fill(s1, s2, cfg, rows, interpret=interpret)
    r_bs, _, _, r_plan = _fill(
        s1[::-1].copy(), s2[::-1].copy(), cfg, rows, bottom_align=True,
        interpret=interpret,
    )
    # forward boundaries: rows R, 2R, ... (strip s's output = row (s+1)R);
    # reverse boundaries: reverse rows r0, r0+R, ... = original n-r0-sR,
    # which are the SAME rows by construction of the bottom-aligned plan
    K = len(f_plan)
    rows_f = [f_plan[s][0] + (R - f_plan[s][1]) for s in range(K)]
    crossings: List[Tuple[int, int]] = [(0, 0)]
    total = None
    for s in range(K - 1):
        i_row = rows_f[s]
        F = f_bs[s][: m + 1].astype(np.int64)
        # reverse row for original row i: reverse fill boundary at
        # rev-row n - i; find its index in the reverse plan
        rr = n - i_row
        r_rows = [r_plan[t][0] + (R - r_plan[t][1]) for t in range(K)]
        ri = r_rows.index(rr)
        Rv = r_bs[ri][: m + 1].astype(np.int64)
        tot = F + Rv[::-1]
        x = int(np.argmax(tot))
        if total is None:
            total = int(tot[x])
        elif int(tot[x]) != total:
            raise ValueError("inconsistent k-way split totals")
        crossings.append((i_row, x))
    crossings.append((n, m))
    jobs = []
    for (qa, ta), (qb, tb) in zip(crossings, crossings[1:]):
        if tb < ta or qb < qa:
            raise ValueError("non-monotone k-way crossings")
        jobs.append((ta, tb, qa, qb))
    a1, a2 = _leaf_walks(jobs, s1, s2, cfg)
    score = oracle.alignment_score(a1, a2, cfg)
    if total is not None and score != total:
        raise ValueError(
            f"k-way alignment score {score} != fill total {total}"
        )
    return score, a1, a2


def _binary_walk(s1, s2, cfg) -> Tuple[int, str, str]:
    """Median row split via two bottom-aligned fills (their LAST boundary
    row always lands exactly on the median), then native walks — used when
    the strip count is too small for a k-way gain but the table is too big
    for one native allocation."""
    m, n = s1.size, s2.size
    mid = n // 2
    rows = max(8, min(112, _round_up(max(1, mid // LANES), 8)))
    f_bs, _, _, _ = _fill(s1, s2[:mid], cfg, rows, bottom_align=True)
    r_bs, _, _, _ = _fill(
        s1[::-1].copy(), s2[mid:][::-1].copy(), cfg, rows, bottom_align=True
    )
    F = f_bs[-1][: m + 1].astype(np.int64)
    Rv = r_bs[-1][: m + 1].astype(np.int64)
    tot = F + Rv[::-1]
    x = int(np.argmax(tot))
    a1, a2 = _leaf_walks(
        [(0, x, 0, mid), (x, m, mid, n)], s1, s2, cfg
    )
    return oracle.alignment_score(a1, a2, cfg), a1, a2


def _locate_end_impl(s1, s2, cfg, *, rows, interpret):
    m, n = s1.size, s2.size
    f_bs, vmaxs, vplanes, plan = _fill(
        s1, s2, cfg, rows, interpret=interpret
    )
    vmax = int(vmaxs.max())
    if vmax <= 0:
        return 0, 0, 0
    s_star = int(vmaxs.argmax())
    # row within the strip: slot (r, c) is DP row i0 + 1 + c*rows + r
    vplane = vplanes[s_star]
    r, c = np.unravel_index(int(vplane.argmax()), vplane.shape)
    i0 = plan[s_star][0]
    i_star = i0 + 1 + int(c) * rows + int(r)
    # pass 3: bottom-aligned refill of rows i0+1 .. i_star gives H(i_star, :)
    r0 = i_star - i0
    b_in = np.zeros(m + 3, np.int64)
    if s_star > 0:
        b_in[: m + 1] = f_bs[s_star - 1][: m + 1].astype(np.int64)
    if r0 < LANES:  # tiny refill: vectorized host row scan
        row = _rowscan_np(b_in[: m + 1], s1, s2[i0:i_star], cfg)
    else:
        sub_rows = max(8, min(rows, _round_up(-(-r0 // LANES), 8)))
        h_bs, _, _, _ = _fill_from(
            s1, s2[i0:i_star], cfg, sub_rows, b_in,
            use_f32=_wants_f32(cfg, m, n), interpret=interpret,
        )
        row = h_bs[-1][: m + 1].astype(np.int64)
    j_star = int(row.argmax())
    if int(row[j_star]) != vmax:
        raise ValueError(
            f"SW locate: row max {int(row[j_star])} != vmax {vmax}"
        )
    return i_star, j_star, vmax


def align_local(
    s1,
    s2,
    cfg: ScoringConfig,
    *,
    rows: int = 112,
    interpret: bool = False,
) -> Tuple[int, str, str]:
    """Smith-Waterman alignment: locate an optimal cell with band fills,
    then recover the path.

    Short hits (path bound below :data:`SW_WINDOW_LIMIT`) walk a native
    window ending at the located cell.  Long hits — e.g. the benchmark
    corpus pairs, whose local alignments span almost the whole sequences —
    locate the path's START by running the same passes on the reversed
    pair, then hand the sub-rectangle to :func:`align_global`'s k-way
    machinery: the optimal local path is exactly an optimal GLOBAL path of
    the matched substrings (a global path dipping below zero would yield a
    strictly better local alignment, contradiction), so the global k-way
    walk reproduces it at device speed regardless of path length.

    Returns local alignment strings of the matched substrings, like
    ``oracle.traceback`` in local mode (optimal path; tie order may differ
    from the oracle's row-major-first convention).
    """
    _check_align_cfg(cfg)
    if not cfg.is_local:
        raise ValueError("align_local requires a local (SW) config")
    if not cfg.has_matrix and (cfg.mismatch > 0 or cfg.gap > 0):
        raise ValueError(
            "positive mismatch/gap local configs use the masked engine; "
            "take the checkpointed traceback path"
        )
    s1 = np.asarray(s1, np.int32)
    s2 = np.asarray(s2, np.int32)
    m, n = s1.size, s2.size
    if m == 0 or n == 0 or (m + 1) * (n + 1) <= (1 << 22):
        return oracle.traceback(s1, s2, cfg)
    if m > MAX_BOUNDARY:
        if n > MAX_BOUNDARY:
            raise ValueError("pair exceeds the boundary-row envelope")
        sc, x, y = align_local(s2, s1, _transposed(cfg), rows=rows,
                               interpret=interpret)
        return sc, y, x

    i_star, j_star, vmax = _locate_end(
        s1, s2, cfg, rows=rows, interpret=interpret
    )
    if vmax == 0:
        return 0, "", ""
    # path length along either axis is at most vmax / unit_drop steps plus
    # the scoring slack; cheap hits take one native window walk
    if vmax <= SW_WINDOW_LIMIT * max(cfg.match, 1):
        from ..utils import native

        L = SW_WINDOW_LIMIT
        while True:
            ia = max(0, i_star - L)
            ja = max(0, j_star - L)
            text, query = s1[ja:j_star], s2[ia:i_star]
            sc = None
            if native.available():
                try:
                    sc, a1, a2 = native.traceback(text, query, cfg)
                except RuntimeError:
                    sc = None
            if sc is None:
                sc, a1, a2 = oracle.traceback(text, query, cfg)
            if sc == vmax:
                return sc, a1, a2
            if ia == 0 and ja == 0:
                raise ValueError(
                    f"windowed SW walk found {sc}, expected {vmax}"
                )
            L *= 4

    # long hit: locate the START via the reversed problem (the same
    # optimal path, reversed, ends where ours starts), then recover the
    # path as a global alignment of the substrings
    ir, jr, vmax_r = _locate_end(
        s1[::-1].copy(), s2[::-1].copy(), cfg, rows=rows,
        interpret=interpret,
    )
    if vmax_r != vmax:
        raise ValueError(f"reverse locate max {vmax_r} != {vmax}")
    i_s, j_s = n - ir, m - jr
    if i_s >= i_star or j_s >= j_star:
        raise ValueError("reverse locate crossed the forward end cell")
    gcfg = ScoringConfig(
        match=cfg.match, mismatch=cfg.mismatch, gap=cfg.gap,
        matrix=cfg.matrix,
    )
    sc, a1, a2 = align_global(
        s1[j_s:j_star], s2[i_s:i_star], gcfg, interpret=interpret
    )
    if sc != vmax:
        # forward end and reverse start belonged to different co-optimal
        # paths; the caller falls back to the checkpointed traceback
        raise ValueError(
            f"SW substring global score {sc} != vmax {vmax} (tie split)"
        )
    return sc, a1, a2


def _locate_end(s1, s2, cfg, *, rows, interpret):
    """Three band passes that find an optimal SW cell: (i*, j*, vmax)."""
    return _locate_end_impl(s1, s2, cfg, rows=rows, interpret=interpret)


def _rowscan_np(b_row, s1, s2_seg, cfg, zero_col=False):
    """Vectorized NumPy row scan from a given boundary row (the left-dep
    resolves to a running max of ``cand_j - j*gap``); used for refills too
    small to be worth a device dispatch."""
    m = s1.size
    g = cfg.gap
    zc = cfg.is_local or zero_col
    mat = np.asarray(cfg.matrix, np.int64) if cfg.has_matrix else None
    jg = np.arange(m + 1, dtype=np.int64) * g
    row = b_row.astype(np.int64).copy()
    for i in range(s2_seg.size):
        if mat is not None:
            eq = mat[np.asarray(s1, np.int64), int(s2_seg[i])]
        else:
            eq = np.where(s1 == s2_seg[i], cfg.match, cfg.mismatch)
        cand = np.empty(m + 1, np.int64)
        cand[0] = 0 if zc else row[0] + g
        cand[1:] = np.maximum(row[:-1] + eq, row[1:] + g)
        if cfg.is_local:
            cand = np.maximum(cand, 0)
        # left propagation: new[j] = max_k<=j (cand[k] + (j-k)*g)
        row = np.maximum.accumulate(cand - jg) + jg
        if cfg.is_local:
            row = np.maximum(row, 0)
    return row


def _caps_to_col(caps, plan, n, R, rows, b0m):
    """Assemble the last-column vector H(0..n, m) from per-strip capture
    planes.  Slot (r, c) of strip (i0, klo) holds k = c*rows + r, which is
    DP row ``i0 + 1 + (k - klo)`` when ``klo <= k < k_hi``.  ``b0m`` is
    H(0, m) from the initial boundary row."""
    col = np.empty(n + 1, np.int64)
    col[0] = b0m
    for s, (i0, klo) in enumerate(plan):
        cnt = min(n - i0, R - klo)
        kvals = caps[s].T.reshape(-1)  # k-ordered: index c*rows + r
        col[i0 + 1 : i0 + 1 + cnt] = kvals[klo : klo + cnt].astype(np.int64)
    return col


def locate_flex_device(
    s1,
    s2,
    cfg: ScoringConfig,
    *,
    anchored: bool = False,
    rows: int = 112,
    interpret: bool = False,
):
    """(score, ie, je) of an optimal extraction cell for the ends-free
    modes — the device analog of ``native.locate_flex`` (same boundary
    forms and argmax conventions), one band fill instead of an O(nm) CPU
    scan.

    ``anchored=False``: forward end-locate with the mode's free-start
    boundaries.  ``anchored=True``: the reversed start-locate — global
    (gap-penalized) boundaries anchor every path at (0, 0); the extraction
    set is unchanged (reversed last row ⇔ original row 0, reversed last
    column ⇔ original column 0).
    """
    if not cfg.is_ends_free:
        raise ValueError("locate_flex_device serves the sg/infix modes")
    if cfg.is_affine:
        raise ValueError("locate_flex_device is linear-gap only")
    s1 = np.asarray(s1, np.int32)
    s2 = np.asarray(s2, np.int32)
    if anchored:
        zr = zc = False
    else:
        zr, zc = cfg.free_start_s1, cfg.free_start_s2
    # native extract sets: sg = last row then strictly-greater last column;
    # infix = last row only (both forward and anchored)
    ext_col = cfg.free_end_s2
    return _locate_flags(s1, s2, cfg, zr, zc, True, ext_col,
                         rows=rows, interpret=interpret)


def _locate_flags(s1, s2, cfg, zr, zc, ext_row, ext_col, *,
                  rows, interpret, prefer_row=True):
    """Optimal cell over the selected boundary extraction set of the fill
    with (zr, zc) zero boundaries: the last DP row (``ext_row``) and/or
    the last column (``ext_col``).  ``prefer_row`` breaks score ties
    toward the row cell (the native convention); the swapped-orientation
    recursion flips it so the ORIGINAL row keeps winning ties."""
    m, n = int(s1.size), int(s2.size)
    assert ext_row or ext_col
    if m == 0 or n == 0:
        # degenerate: the table is its own boundary row/column
        row = np.zeros(m + 1, np.int64) if zr \
            else np.arange(m + 1, dtype=np.int64) * cfg.gap
        col = np.zeros(n + 1, np.int64) if zc \
            else np.arange(n + 1, dtype=np.int64) * cfg.gap
        if n == 0:  # single-row table: last row = the row, last col = [m]
            cands = []
            if ext_row:
                j = int(row.argmax())
                cands.append((int(row[j]), 0, j, 0 if prefer_row else 1))
            if ext_col:
                cands.append((int(row[m]), 0, m, 1 if prefer_row else 0))
        else:  # single-column table (m == 0)
            cands = []
            if ext_row:
                cands.append((int(col[n]), n, 0, 0 if prefer_row else 1))
            if ext_col:
                i = int(col.argmax())
                cands.append((int(col[i]), i, 0, 1 if prefer_row else 0))
        sc, i, j, _ = max(cands, key=lambda c: (c[0], -c[3]))
        return sc, i, j
    if m > MAX_BOUNDARY:
        if n > MAX_BOUNDARY:
            raise ValueError("pair exceeds the boundary-row envelope")
        # swapped orientation: the table (and matrix) transpose, row and
        # column roles exchange — including the extraction flags and the
        # tie preference
        sc, je, ie = _locate_flags(
            s2, s1, _transposed(cfg), zc, zr, ext_col, ext_row,
            rows=rows, interpret=interpret, prefer_row=not prefer_row)
        return sc, ie, je
    out = _fill(
        s1, s2, cfg, rows, bottom_align=True, interpret=interpret,
        zero_row=zr, zero_col=zc, capture=ext_col,
    )
    bs, plan = out[0], out[3]
    best = None
    if ext_row:
        row = bs[-1][: m + 1].astype(np.int64)
        brj = int(row.argmax())
        best = (int(row[brj]), n, brj)
    if ext_col:
        R = rows * LANES
        b0m = 0 if zr else m * cfg.gap
        col = _caps_to_col(out[4], plan, n, R, rows, b0m)
        bci = int(col.argmax())
        bc = int(col[bci])
        if best is None or bc > best[0] or (bc == best[0]
                                            and not prefer_row):
            best = (bc, bci, m)
    return best


def _fill_from(s1, s2_seg, cfg, rows, b_in, *, use_f32, interpret=False,
               zero_col=False):
    """Band fill of a row segment starting from a given boundary row —
    bottom-aligned so the LAST boundary output is exactly the segment's
    final row.  Used by the SW locate pass.  ``use_f32`` must reflect the
    PARENT problem's value bound (``b_in`` carries its magnitudes)."""
    m = int(s1.shape[0])
    m_pad = _bucket(m)
    nseg = int(s2_seg.shape[0])
    vdt = jnp.float32 if use_f32 else jnp.int32
    R = rows * LANES
    plan = _plan_strips(nseg, R, bottom_align=True)
    K = len(plan)
    pad_char, _ = _sentinels(cfg)
    s1j = jnp.asarray(s1, jnp.int32)
    s2j = jnp.asarray(s2_seg, jnp.int32)
    s1p = _pack4(s1j, m_pad)
    r0 = nseg % R or R
    cm = jnp.full((K * R,), pad_char, jnp.int32)
    cm = jax.lax.dynamic_update_slice(
        cm, s2j[:r0].astype(jnp.int32), (R - r0,)
    )
    if nseg > r0:
        cm = jax.lax.dynamic_update_slice(
            cm, s2j[r0:].astype(jnp.int32), (R,)
        )
    s2cm_all = (
        cm.reshape(K, LANES, rows).transpose(0, 2, 1).reshape(K * rows, LANES)
    )
    scs = np.zeros((K, 5), np.int32)
    for s, (i0, klo) in enumerate(plan):
        scs[s, 0] = i0
        scs[s, 1] = klo
        scs[s, 2] = int(np.asarray(s2_seg)[i0])
        scs[s, 3] = klo + min(nseg - i0, R - klo)
        scs[s, 4] = m
    b0np = np.zeros(m_pad + 3, np.int64)  # pad-col boundary: any finite
    b0np[: m + 1] = np.asarray(b_in[: m + 1])  # value — pad cells decay
    b0 = jnp.asarray(b0np).astype(vdt)  # and callers slice to m + 1
    bs, vmaxs, vplanes, _ = _strip_scan(
        s1p, s2cm_all, jnp.asarray(scs), b0, _prof0s(cfg, scs, use_f32),
        m_pad, rows, cfg, use_f32, interpret, zc=zero_col,
    )
    return np.asarray(bs), np.asarray(vmaxs), np.asarray(vplanes), plan
