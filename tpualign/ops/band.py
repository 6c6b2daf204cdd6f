"""Banded strip wavefront: the general-scoring engine at bitpal's layout.

Motivation (round-2 verdict item #1)
------------------------------------
The flat anti-diagonal kernel (``ops/pallas_diag.py``) carries two structural
costs on large pairs:

1. **Dead-slot work.** Its diagonal buffers span the whole shorter sequence
   (``(990, 128)`` at corpus scale) and every step sweeps every slot, yet on a
   square pair only ~half the slots are live on average — 2x the minimal
   element work.
2. **Lane shuffles on the chain.** Its flat layout makes the per-step
   shift-by-one a *lane* roll (~80 cycles, measured) consumed on the
   loop-carried dependency chain, stalling the in-order stream (~70% of its
   issue roofline, ``results/roofline.md``).

This kernel removes both by processing the DP table in **row strips** of
``R = NR * 128`` rows with the word layout proven in ``ops/bitpal.py``:
within a strip, DP row ``k`` (k = 0..R-1) lives at slot
``(r = k % NR, c = k // NR)`` — **column-major** — and lane column ``c`` runs
**staggered** two steps behind its left neighbor.  At global step ``t``, slot
``(r, c)`` computes cell ``(i = i0 + k, j = t - phase(k))`` with
``phase(k) = r + c * (NR + 2)``.  Consequences, exactly as in bitpal
(``bitpal.py:50-61``):

* the every-step shift-by-one (values and the text-char window alike) is a
  cheap **sublane** shift;
* the once-per-lane boundary (row 0 needs the previous lane's tail) is a lane
  roll **consumed 3-4 steps after it is produced** — entirely off the
  dependency chain, carried across the gap by an 8-deep ping-pong ring;
* buffers shrink from O(min(N,M)) to O(R): every swept slot is (near-)live,
  so per-cell issue cost drops ~2x on square pairs.

Round-3 "lean" schedule (verdict item #1: close the general/SW gap)
-------------------------------------------------------------------
Measured on this chip (tools/microbench_narrow.py + issue-cost probes):
int16/int8 vector select/max/roll do not compile, and bf16 ops crack into
two micro-ops per vreg — narrow-type packing buys nothing.  What does pay:

* every former ``roll + where(row_is0, ...)`` pair is ONE concatenate — the
  row-0 merge rides inside the shift (``jnp.concatenate([row0, x[:-1]])``);
* the top-row boundary candidate no longer touches the full plane: it is
  fixed up on ``(1, LANES)`` tiles (a sub-vreg select + max and two small
  stores) instead of a plane-wide select + max;
* **sentinel padding** makes Smith-Waterman's running max unmasked: strip
  pad rows carry char 5 and the post-text stream char 6 — neither matches
  any live code 0..4, so (for the usual ``mismatch <= 0 >= gap``) dead and
  pad cells only decay and ``vmax = max(vmax, new)`` needs no live mask;
* values run in **float32 when the score bound fits 24-bit-exact integers**
  (|score| paths bounded by (m+n+2)*wmax < 2^24): f32 max issues ~1.4x
  cheaper than int32 max on this VPU; int32 remains the exact fallback for
  extreme products.

Net: ~9 full-plane vector ops per NW step (11 for SW) against the previous
~17/~23 — measured 2x on the 64gb sweep.

Strips couple through one **boundary row** ``B[j] = H(i0, j)`` held in SMEM:
the strip's top row consumes ``B[j-1], B[j]`` as *scalars* (scalar SMEM reads
are cheap and off the vector critical path), and its bottom row emits the next
boundary one scalar per step (batched per unrolled block from the pendv
ring's lane-0 column as scalar VMEM reads).  Writes trail reads by
``R + 2*(LANES-1)`` steps, so one buffer serves in place.  Every boundary
cell is *injected* (the wavefront head writes ``H(i, 0)`` when
``t == phase``, the top row merges the scalar candidate), so any scoring
scheme is admitted — including Smith-Waterman, whose zero floor and running
max ride the same schedule.

Capability envelope: the strip axis (``s2``) is **unbounded** (strips
stream), the boundary axis (``s1``) must fit SMEM (~200k chars); the
orientation is chosen per problem.  Reference semantics: the recurrence of
``serial.cpp:23-31`` with ``H[0][j] = j*gap, H[i][0] = i*gap``
(``serial.cpp:16-17``); SW adds the zero floor and max-cell tracking the
reference lacks (README.md:2 announces SW but never implements it).

Round-4 scoring shapes (both beyond the reference)
--------------------------------------------------
* **Substitution matrices** (5-code alphabets): the strip's query chars are
  constant, so ``matrix[w][s2cm]`` is precomputed per strip into K VMEM
  **profile planes** (a K*K select tree amortized over the sweep); the
  per-step substitution is then a K-way select over the sliding text char.
  The scalar top row reads a host-precomputed (strip, char) SMEM profile.
  Sentinel chars (pad rows 5, post-text 6) score ``min(0, min(matrix))``,
  restoring the decay guarantee that lets SW's running max go unmasked.
  Asymmetric matrices transpose with the orientation swap.
* **Ends-free modes** (semiglobal ``sg`` / ``infix``), via four
  kernel-coordinate flags (:func:`_ends_flags`): zero boundary row (zr) /
  zero injected column (zc); score extraction as a running max over the
  last DP row (er: slot ``k*`` of the peeled last strip — or the scalar
  chain when ``k* == 0``) and a j = m column-capture plane reduced per
  strip (ec); the j = 0 / i = 0 boundary cells are closed-form outside the
  kernel.  Affine composes with both (round 5): zr zeroes the H boundary
  row while its F row stays NEG; zc's column-0 F chain converges to
  ``open + ext`` (fed through ``bf0``) with the scalar head forced to 0
  at t = 0; the closed-form boundary cells charge one open+extend run.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ScoringConfig
from .pallas_diag import LANES, _round_up

NEG_INF = -(2**30)

#: steps fused per loop iteration.  The pend rings are 8 deep and indexed
#: by ``u mod 8``; any multiple of 8 keeps ``t ≡ u (mod 8)`` for every block
UNROLL = 8

#: boundary-row capacity: B (one scalar per column) plus the 4-bit packed
#: text must fit SMEM (~1 MB) alongside loop scalars
MAX_BOUNDARY = 200_000

#: affine carries a second boundary row (the F chain), so its cap halves
MAX_BOUNDARY_AFFINE = 90_000

#: strip-axis guard (HBM for the column-major char layout, ~4 B/char)
MAX_STRIP_AXIS = 1 << 30

#: float32 holds integers exactly below 2^24; past this score bound the
#: kernel falls back to int32 values (same schedule, pricier maxes)
F32_EXACT = 1 << 24

#: strip pad rows carry this char: it matches neither live codes 0..4 nor
#: the post-text sentinel 6, so pad cells can never out-climb live ones
PAD_CHAR = 5


def _sentinels(cfg: ScoringConfig):
    """(pad_char, post_text_char) for a config.

    Pair scoring compares text chars against strip chars directly, so the
    two sentinels must differ from every live code AND from each other
    (5 / 6 for the 0..4 ``.bdna`` alphabet).  Matrix mode selects through
    profile planes whose default is the decaying :func:`_min0`, reached by
    ANY code >= K on either axis — so both sentinels can share code K and
    alphabets up to the full 4-bit pack range (K <= 16, codes 0..15) fit.
    """
    if cfg.has_matrix:
        K = len(cfg.matrix)
        return K, K
    return PAD_CHAR, 6


def _phase_grid(nr: int):
    """Per-slot stagger phase: slot (r, c) runs at diagonal ``t - phase``."""
    r = jax.lax.broadcasted_iota(jnp.int32, (nr, LANES), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (nr, LANES), 1)
    return r + c * (nr + 2), c * nr + r  # (phase, k_flat)


def _shift1(row0, x, nr: int):
    """Shift ``x`` down one sublane, inserting ``row0`` — merge + shift in
    one concatenate (the round-3 lean trick; replaces roll + select)."""
    return jnp.concatenate([row0, x[: nr - 1, :]], axis=0)


def _lane_shift(row):
    """(1, LANES) lane roll by one, dtype-generic (consumed 2-4 steps later,
    so its cross-lane latency sits off the dependency chain)."""
    return jnp.concatenate([row[:, -1:], row[:, :-1]], axis=1)


def _band_kernel_body(
    n: int,
    m: int,
    nr: int,
    n_strips: int,
    t_steps: int,
    unroll: int,
    cfg: ScoringConfig,
    ends,  # kernel-coordinate (zr, zc, er, ec) flags, see _ends_flags
    vdt,  # value dtype: jnp.float32 (24-bit-exact fast path) or jnp.int32
    # positional refs, in pallas order — inputs:
    #   s1_ref      SMEM (m/8,) packed text, 8 chars per int32 (4 bits each)
    #   s2tops_ref  SMEM (n_strips,) char of each strip's top row
    #   s2cm_ref    VMEM (n_strips*nr, LANES) column-major strip chars
    #   prof0_ref   SMEM (n_strips*8,) top-row substitution profile
    #               ``matrix[ch][s2_first]`` per (strip, text char) — matrix
    #               mode only
    # then the output:
    #   out_ref     SMEM (1, 1) score, value dtype
    # then scratch:
    #   a0/a0s/a1/a1s  (nr, LANES) ping-pong value planes (raw + shifted)
    #   w_ref          char window, v_ref SW running max, snap_ref snapshot
    #   pendv/pendw    (8, LANES) hand-off rings, b_ref SMEM boundary row
    #   [affine] E plane, shifted-F plane, F ring, F boundary row
    #   [ec] vcol_ref  last-column capture plane (j = m front)
    #   [er] vrow_ref  last-row running max plane (k* slot, last strip)
    #   [matrix] K substitution profile planes ``matrix[w][s2cm]``
    s1_ref,
    s2tops_ref,
    s2cm_ref,
    *rest,
):
    zr, zc, er, ec = ends
    has_matrix = cfg.has_matrix
    K = len(cfg.matrix) if has_matrix else 0
    i_arg = 0
    if has_matrix:
        prof0_ref = rest[0]
        i_arg = 1
    (out_ref, a0_ref, a0s_ref, a1_ref, a1s_ref, w_ref, v_ref, snap_ref,
     pendv_ref, pendw_ref, b_ref) = rest[i_arg:i_arg + 11]
    rest = rest[i_arg + 11:]
    if cfg.is_affine:
        e_ref, fs_ref, pendf_ref, bf_ref = rest[:4]
        rest = rest[4:]
    if ec:
        vcol_ref = rest[0]
        rest = rest[1:]
    if er:
        vrow_ref = rest[0]
        rest = rest[1:]
    prof_refs = list(rest[:K]) if has_matrix else []

    if not has_matrix:
        match = vdt(cfg.match)
        mismatch = vdt(cfg.mismatch)
    else:
        min0 = vdt(_min0(cfg))
    _, post_text = _sentinels(cfg)
    g = vdt(cfg.gap)
    affine = cfg.is_affine
    if affine:
        open_ = vdt(cfg.gap_open)
        ext = vdt(cfg.gap_extend)
        g = ext  # head_base spacing: H(i, 0) = open + i*ext (global)
    local = cfg.is_local
    # pad/dead cells only decay under these signs; the rare SW config
    # outside them keeps a masked running max (correct, a little slower).
    # Affine opens/extends are <= 0 by construction (_check_cfg rejects
    # positive-mismatch local affine).  In matrix mode the sentinel
    # profile value (_min0 <= 0) restores the decay guarantee for any
    # matrix, so only the gap sign matters.
    if has_matrix:
        unmasked_vmax = affine or cfg.gap <= 0
    else:
        unmasked_vmax = cfg.mismatch <= 0 and (affine or cfg.gap <= 0)
    R = nr * LANES
    phase, k_flat = _phase_grid(nr)
    lane_is0 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) == 0
    neg = jnp.full((nr, LANES), NEG_INF, vdt)
    neg_row = jnp.full((1, LANES), NEG_INF, vdt)
    head_base = k_flat.astype(vdt) * g  # + (i0+1)*g per strip = H(i0+1+k, 0)
    p_max = (nr - 1) + (LANES - 1) * (nr + 2)
    # NW answer lives at slot k* (cell H(n, m)) of the last strip, final at
    # step t* = m + phase(k*); snapshotted there before j>m garbage rolls in
    k_star = (n - 1) % R
    t_star = m + (k_star % nr) + (k_star // nr) * (nr + 2)
    # the snapshot keeps only the (up to) 8-sublane tile containing slot k*
    snr = min(8, nr)
    snap_r0 = (k_star % nr) & ~7
    snap_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (snr, LANES), 0)
        == (k_star % nr) - snap_r0
    ) & (jax.lax.broadcasted_iota(jnp.int32, (snr, LANES), 1) == k_star // nr)
    if er:
        # last-DP-row extraction: slot k* is the only plane slot carrying
        # row n (k_star == 0 rides the scalar top-row chain instead)
        kstar_mask = k_flat == k_star

    if local:
        live_ramp = None  # built per strip (needs i_mask) when masked

    # --- strip-0 boundary row: H(0, j) = j * gap (0 for SW and the
    # ends-free zr modes); affine H(0, j>=1) = open + j*ext and
    # F(0, :) = -inf (no gap above row 0) ---
    def binit(j, _):
        jv = jnp.int32(j).astype(vdt)
        if local or zr:
            b_ref[j] = vdt(0)
        elif affine:
            b_ref[j] = jnp.where(j == 0, vdt(0), open_ + jv * ext)
        else:
            b_ref[j] = jv * g
        if affine:
            bf_ref[j] = vdt(NEG_INF)
        return 0

    jax.lax.fori_loop(0, m + 1, binit, 0, unroll=False)
    if local:
        v_ref[:] = jnp.zeros((nr, LANES), vdt)

    def strip(s, aux_in, last):
        # ``last`` is a PYTHON bool: the final strip is peeled out of the
        # fori so its extraction work (NW snapshot, last-row running max)
        # compiles only where it runs
        i0 = s * R  # boundary row index: B = H(i0, :)
        if local or zc:
            i0g = vdt(0)
        elif affine:
            i0g = jnp.where(
                i0 == 0, vdt(0), open_ + jnp.int32(i0).astype(vdt) * ext
            )
        else:
            i0g = jnp.int32(i0).astype(vdt) * g
        a0_ref[:] = neg
        a0s_ref[:] = neg
        a1_ref[:] = neg
        a1s_ref[:] = neg
        w_ref[:] = jnp.zeros((nr, LANES), jnp.int32)
        pendv_ref[:] = jnp.full((8, LANES), NEG_INF, vdt)
        pendw_ref[:] = jnp.zeros((8, LANES), jnp.int32)
        if affine:
            e_ref[:] = neg  # E = left-gap plane: decays until H is real
            fs_ref[:] = neg  # shifted F plane (up-gap), H's shift discipline
            pendf_ref[:] = jnp.full((8, LANES), NEG_INF, vdt)
            # F(i0, 0): the column-0 up-gap chain.  Globally it equals
            # H(i0, 0); under a zero column (ends-free zc) it converges to
            # open + ext from row 1 on (F(i,0) = max(0 + open, F(i-1,0)) +
            # ext with ext <= 0).  NEG on strip 0 / in local mode — it
            # feeds only the injected column-0 H, any sane value works
            if local:
                bf0 = vdt(NEG_INF)
            elif zc:
                bf0 = jnp.where(i0 == 0, vdt(NEG_INF), open_ + ext)
            else:
                bf0 = jnp.where(i0 == 0, vdt(NEG_INF), i0g)
        if local or zc:  # SW / free-start boundary: H(i, 0) = 0
            head_vals = jnp.zeros((nr, LANES), vdt)
        elif affine:  # H(i0+1+k, 0) = open + (i0+1+k) * ext
            head_vals = open_ + (jnp.int32(i0 + 1).astype(vdt)) * ext \
                + head_base
        else:
            head_vals = (jnp.int32(i0 + 1).astype(vdt)) * g + head_base
        s2cm = s2cm_ref[pl.ds(s * nr, nr), :]
        s2_first = s2tops_ref[s]  # char of the strip's top row
        if has_matrix:
            # per-strip substitution profile planes: prof[w] =
            # matrix[w][s2cm] — s2cm is constant per strip, so the K*K
            # select tree amortizes over the whole sweep; pad rows
            # (PAD_CHAR) fall through to the decaying sentinel value
            for w in range(K):
                p = jnp.full((nr, LANES), min0, vdt)
                for b in range(K):
                    p = jnp.where(s2cm == b, vdt(cfg.matrix[w][b]), p)
                prof_refs[w][:] = p
        if local and not unmasked_vmax:
            n_loc = n - i0  # rows beyond the query are masked from the max
            i_mask = k_flat < n_loc
        if ec:
            vcol_ref[:] = neg  # j = m front capture, reduced per strip
        if er and last and k_star != 0:
            vrow_ref[:] = neg
        t_snap = t_star if last else None
        fix_snap0 = snap_r0 == 0  # snapshot tile contains the cand-fixed row

        def substep(t, u, bjm1, bj, bjf, c0s, e0s, aux, a_ref, as_ref,
                    oa_ref, oas_ref, ramp=True):
            # --- char window (slides exactly like the value buffers) ---
            idx = jnp.clip(t - 1, 0, m - 1)
            ch = (s1_ref[idx >> 3] >> ((idx & 7) << 2)) & 15
            # post-text sentinel (6 pair / K matrix, injected AFTER the
            # 4-bit unpack so it needn't fit the pack): matches no live
            # code and no pad row, so dead-region cells can only decay
            ch = jnp.where(t - 1 < m, ch, post_text)
            w_row0 = jnp.where(
                lane_is0, ch, pendw_ref[(u - 3) % 8 : (u - 3) % 8 + 1, :]
            )
            w_new = _shift1(w_row0, w_ref[:], nr)
            w_ref[:] = w_new
            if has_matrix:
                # K-way select tree over the text char against the
                # precomputed per-strip profile planes; sentinel chars
                # (post-text 6) fall through to the decaying default
                sub = jnp.full((nr, LANES), min0, vdt)
                for w in range(K - 1, -1, -1):
                    sub = jnp.where(w_new == w, prof_refs[w][:], sub)
            else:
                sub = jnp.where(s2cm == w_new, match, mismatch)
            # --- TOP ROW IS SCALAR.  Slot (0, 0)'s in-plane inputs are NEG
            # by construction (its up/diag live in the boundary row), so the
            # true cell H(i0+1, t) follows the pure scalar recurrence
            #   c0s_t = max(B[t-1] + sub0, B[t] + g, c0s_{t-1} + g)
            # on the scalar core — no plane-wide select, no sub-vreg store.
            # ``bjm1``/``bj`` are read per block (no serial carry on B). ---
            if has_matrix:
                # one dynamic SMEM load, off the vector path: the
                # (strip, text char) profile is precomputed host-side,
                # K+1 wide so the post-text sentinel (code K) hits the
                # decaying _min0 slot
                sub0 = prof0_ref[s * (K + 1) + ch]
            else:
                sub0 = jnp.where(s2_first == ch, match, mismatch)
            if affine:
                # Gotoh top row: the up-gap F(i0+1, t) closes/extends from
                # BOTH boundary rows; the left-gap E rides a second scalar
                # carry; the diag stays B_H[t-1] + sub
                f0s = jnp.maximum(bj + open_, bjf) + ext
                e0s = jnp.maximum(c0s + open_, e0s) + ext
                cand = jnp.where(t >= 1, bjm1 + sub0, vdt(NEG_INF))
                c0s = jnp.maximum(jnp.maximum(cand, e0s), f0s)
                if zc:  # free-start column: H(i0+1, 0) = 0, not the F form
                    c0s = jnp.where(t == 0, vdt(0), c0s)
            else:
                cand = jnp.maximum(bjm1 + sub0, bj + g)
                cand = jnp.where(t >= 1, cand, vdt(NEG_INF))
                c0s = jnp.maximum(cand, c0s + g)
            if local:
                c0s = jnp.maximum(c0s, vdt(0))
            # --- the recurrence (oas still holds shift(diag t-2)) ---
            if affine:
                # E: left gap — the left cell is this slot one step ago
                # (a_ref), so E never crosses sublanes or lanes; F: up gap —
                # fs_ref carries the previous step's F plane SHIFTED, by
                # exactly H's shift/ring discipline below
                e_new = jnp.maximum(a_ref[:] + open_, e_ref[:]) + ext
                f_new = jnp.maximum(as_ref[:] + open_, fs_ref[:]) + ext
                new = jnp.maximum(
                    oas_ref[:] + sub, jnp.maximum(e_new, f_new)
                )
            else:
                new = jnp.maximum(
                    oas_ref[:] + sub, jnp.maximum(a_ref[:], as_ref[:]) + g
                )
            if local:
                new = jnp.maximum(new, vdt(0))
            if ramp:  # wavefront head j=0; dead once t > max phase
                new = jnp.where(phase == t, head_vals, new)
            # row 0 with the scalar top cell patched into lane 0 (pure
            # value, feeds the shift concat below — never stored back)
            c0 = jnp.where(lane_is0, c0s, new[0:1, :])
            if local:
                if unmasked_vmax:
                    # sentinel pad chars guarantee dead/pad cells decay
                    v_ref[:] = jnp.maximum(v_ref[:], new)
                    aux = jnp.maximum(aux, c0s)
                else:
                    live = (phase >= t - m) & i_mask
                    if ramp:
                        live = live & (phase < t)
                    v_ref[:] = jnp.maximum(
                        v_ref[:], jnp.where(live, new, vdt(NEG_INF))
                    )
                    # past-the-text top cells are fabricated; keep them out
                    aux = jnp.maximum(
                        aux, jnp.where(t <= m, c0s, vdt(NEG_INF))
                    )
            elif er or ec:
                # ends-free extraction (garbage slot (0, 0) reads as
                # ~NEG_INF + O(wmax) — far below any real score, harmless)
                if ec:
                    # each slot passes j = m exactly once, at t = m + phase:
                    # capture then, reduce (live rows only) at strip end
                    vcol_ref[:] = jnp.where(
                        phase == t - m, new, vcol_ref[:]
                    )
                    # the scalar top row's j = m cell: H(i0+1, m) at t = m
                    aux = jnp.maximum(
                        aux, jnp.where(t == m, c0s, vdt(NEG_INF))
                    )
                if er and last:
                    if k_star == 0:
                        # DP row n IS the last strip's scalar top row
                        live0 = jnp.logical_and(t >= 1, t <= m)
                        aux = jnp.maximum(
                            aux, jnp.where(live0, c0s, vdt(NEG_INF))
                        )
                    else:
                        # slot k* sweeps row n cells j = t - phase in [1, m]
                        rm = kstar_mask & (phase >= t - m) & (phase < t)
                        vrow_ref[:] = jnp.maximum(
                            vrow_ref[:], jnp.where(rm, new, neg)
                        )
            elif last:
                if k_star == 0:
                    # answer cell is the scalar top cell of the last strip
                    aux = jnp.where(t == t_snap, c0s, aux)
                else:
                    # branchless single-vreg snapshot of the H(n, m) tile
                    src = new[snap_r0 : snap_r0 + snr, :]
                    if fix_snap0:  # tile row 0 carries the scalar top cell
                        src = jnp.concatenate([c0, src[1:, :]], axis=0)
                    snap_ref[:] = jnp.where(t == t_snap, src, snap_ref[:])

            oa_ref[:] = new
            v_row0 = jnp.where(
                lane_is0,
                vdt(NEG_INF),
                pendv_ref[(u - 2) % 8 : (u - 2) % 8 + 1, :],
            )
            if nr > 1:  # shift down 1: row 0 <- ring, row 1 <- patched top
                oas_ref[:] = jnp.concatenate(
                    [v_row0, c0, new[1 : nr - 1, :]], axis=0
                )
            else:
                oas_ref[:] = v_row0
            # --- hand-offs: consumed 2-4 steps later, off the chain ---
            tail = c0 if nr == 1 else new[nr - 1 : nr, :]
            pendv_ref[u % 8 : u % 8 + 1, :] = _lane_shift(tail)
            pendw_ref[u % 8 : u % 8 + 1, :] = _lane_shift(
                w_new[nr - 1 : nr, :]
            )
            if affine:
                e_ref[:] = e_new
                # F's shift + ring, mirroring H's (fs next step = up cells)
                f0 = jnp.where(lane_is0, f0s, f_new[0:1, :])
                fv_row0 = jnp.where(
                    lane_is0,
                    vdt(NEG_INF),
                    pendf_ref[(u - 2) % 8 : (u - 2) % 8 + 1, :],
                )
                if nr > 1:
                    fs_ref[:] = jnp.concatenate(
                        [fv_row0, f0, f_new[1 : nr - 1, :]], axis=0
                    )
                else:
                    fs_ref[:] = fv_row0
                ftail = f0 if nr == 1 else f_new[nr - 1 : nr, :]
                pendf_ref[u % 8 : u % 8 + 1, :] = _lane_shift(ftail)
            return c0s, e0s, aux

        def block_impl(tt, carry, ramp):
            c0s, e0s, aux = carry
            t0 = tt * unroll
            # B[t0-1 .. t0+unroll-1] read up front: in-block boundary writes
            # trail by p_max >= 132 steps, so an early read is always safe
            bv = []
            bfv = []
            for u in range(-1, unroll):
                t = t0 + u
                b = b_ref[jnp.clip(t, 0, m)]
                bv.append(jnp.where(t == 0, i0g, b))
                if affine:
                    bf = bf_ref[jnp.clip(t, 0, m)]
                    bfv.append(jnp.where(t == 0, bf0, bf))
                else:
                    bfv.append(None)
            for u in range(unroll):
                t = t0 + u
                if u % 2 == 0:
                    c0s, e0s, aux = substep(t, u, bv[u], bv[u + 1],
                                            bfv[u + 1], c0s, e0s, aux,
                                            a0_ref, a0s_ref, a1_ref,
                                            a1s_ref, ramp=ramp)
                else:
                    c0s, e0s, aux = substep(t, u, bv[u], bv[u + 1],
                                            bfv[u + 1], c0s, e0s, aux,
                                            a1_ref, a1s_ref, a0_ref,
                                            a0s_ref, ramp=ramp)
                if u % 8 == 7:
                    # --- bottom row -> next boundary, batched per 8 steps
                    # (the ring is 8 deep: flush before slots recycle).
                    # pendv[uu%8] is the lane-rolled tail row of step t0+uu,
                    # so its lane 0 holds slot (nr-1, 127) = the strip's
                    # bottom-row value.  Scalar VMEM reads + branchless
                    # dump-slot stores keep the hand-off on the scalar core,
                    # overlapped with the next steps' vector work.
                    for uu in range(u - 7, u + 1):
                        j_out = t0 + uu - p_max
                        ok = jnp.logical_and(j_out >= 1, j_out <= m)
                        idx = jnp.where(ok, j_out, m + 2)  # write-off slot
                        b_ref[idx] = pendv_ref[uu % 8, 0]
                        if affine:
                            bf_ref[idx] = pendf_ref[uu % 8, 0]
            return c0s, e0s, aux

        def block_ramp(tt, c):
            return block_impl(tt, c, True)

        def block_steady(tt, c):
            return block_impl(tt, c, False)

        # head injections only happen while t <= max phase: split the sweep
        # so the steady-state blocks skip the injection select entirely
        t_head = min(t_steps, _round_up(p_max + 2, unroll))
        # linear: the c0s carry seeds the left chain so that
        # c0s(0) = max(-, seed + g) = H(i0+1, 0).  Gap-penalized boundaries
        # seed H(i0, 0); zero boundaries (local / zc) seed -g so the chain
        # lands exactly on 0 — seeding 0 would drift by g (visible with
        # positive gaps, and for zc whenever the boundary is on the path).
        # Affine seeds NEG (t=0 derives H(i0+1, 0) from the boundary F).
        if affine:
            c0s0 = vdt(NEG_INF)
        elif local or zc:
            c0s0 = vdt(-cfg.gap)
        else:
            c0s0 = i0g
        carry = jax.lax.fori_loop(
            0, t_head // unroll, block_ramp, (c0s0, vdt(NEG_INF), aux_in),
            unroll=False,
        )
        carry = jax.lax.fori_loop(
            t_head // unroll, t_steps // unroll, block_steady, carry,
            unroll=False,
        )
        aux = carry[2]
        if ec:
            # reduce the j = m capture plane over this strip's live rows
            # (k = 0 is the garbage slot — its row rides the scalar chain)
            live_col = jnp.logical_and(k_flat >= 1, k_flat < n - i0)
            aux = jnp.maximum(
                aux, jnp.max(jnp.where(live_col, vcol_ref[:], neg))
            )
        return aux

    aux0 = vdt(0) if local else vdt(NEG_INF)
    aux_out = jax.lax.fori_loop(
        0, n_strips - 1, lambda s, a: strip(s, a, False), aux0,
        unroll=False,
    )
    aux_out = strip(n_strips - 1, aux_out, True)

    if local:
        out_ref[0, 0] = jnp.maximum(
            jnp.maximum(jnp.max(v_ref[:]), aux_out), vdt(0)
        )
    elif er or ec:
        ans = aux_out
        if er and k_star != 0:
            ans = jnp.maximum(ans, jnp.max(vrow_ref[:]))
        out_ref[0, 0] = ans
    elif k_star == 0:
        out_ref[0, 0] = aux_out
    else:
        out_ref[0, 0] = jnp.sum(
            jnp.where(snap_mask, snap_ref[:], vdt(0)), dtype=vdt
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n", "m", "nr", "cfg", "ends", "use_f32", "unroll", "interpret"
    ),
)
def _band_call(
    s1_packed: jax.Array,
    s2tops: jax.Array,
    s2cm: jax.Array,
    prof0,  # (n_strips*8,) top-row matrix profile, or None
    n: int,
    m: int,
    nr: int,
    cfg: ScoringConfig,
    ends,  # kernel-coordinate (zr, zc, er, ec)
    use_f32: bool,
    unroll: int,
    interpret: bool,
) -> jax.Array:
    vdt = jnp.float32 if use_f32 else jnp.int32
    zr, zc, er, ec = ends
    R = nr * LANES
    n_strips = -(-n // R)
    # full strips must drain through phase(R-1); a lone strip only through
    # its last live slot.  +132 slack lets the bottom row's final boundary
    # writes land (j_out trails by p_max)
    if n_strips == 1:
        k_last = n - 1
    else:
        k_last = R - 1
    p_need = (k_last % nr) + (k_last // nr) * (nr + 2)
    t_steps = _round_up(m + p_need + 132, unroll)
    kernel = functools.partial(
        _band_kernel_body, n, m, nr, n_strips, t_steps, unroll, cfg, ends,
        vdt,
    )
    ins = [s1_packed, s2tops, s2cm]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if cfg.has_matrix:
        ins.append(prof0)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    scratch = [pltpu.VMEM((nr, LANES), vdt) for _ in range(4)]
    scratch.append(pltpu.VMEM((nr, LANES), jnp.int32))  # char window
    scratch.append(pltpu.VMEM((nr, LANES), vdt))  # SW running max
    scratch.append(pltpu.VMEM((min(8, nr), LANES), vdt))  # snapshot tile
    scratch.append(pltpu.VMEM((8, LANES), vdt))  # pendv ring
    scratch.append(pltpu.VMEM((8, LANES), jnp.int32))  # pendw ring
    scratch.append(pltpu.SMEM((m + 3,), vdt))  # boundary + dump slot
    if cfg.is_affine:
        scratch.append(pltpu.VMEM((nr, LANES), vdt))  # E (left-gap) plane
        scratch.append(pltpu.VMEM((nr, LANES), vdt))  # shifted F plane
        scratch.append(pltpu.VMEM((8, LANES), vdt))  # F hand-off ring
        scratch.append(pltpu.SMEM((m + 3,), vdt))  # F boundary row
    if ec:
        scratch.append(pltpu.VMEM((nr, LANES), vdt))  # j = m capture
    if er:
        scratch.append(pltpu.VMEM((nr, LANES), vdt))  # row-n running max
    if cfg.has_matrix:
        for _ in range(len(cfg.matrix)):  # substitution profile planes
            scratch.append(pltpu.VMEM((nr, LANES), vdt))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), vdt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*ins)
    return out[0, 0].astype(jnp.int32)


def _pack4(s1: jax.Array, m: int) -> jax.Array:
    """8 chars per int32 word for SMEM scalar streaming (bitpal layout)."""
    n_words = -(-m // 8)
    pad = jnp.zeros((n_words * 8,), jnp.int32)
    pad = jax.lax.dynamic_update_slice(pad, s1.astype(jnp.int32), (0,))
    shifts = jnp.arange(8, dtype=jnp.int32) * 4
    return jnp.sum(
        pad.reshape(n_words, 8) << shifts[None, :], axis=1, dtype=jnp.int32
    )


def _colmajor(
    s2: jax.Array, n: int, nr: int, pad_char: int = PAD_CHAR
) -> jax.Array:
    """Strip chars, column-major: out[s*nr + r, c] = s2[s*R + c*nr + r].

    Pad rows carry ``pad_char`` (:data:`PAD_CHAR` for pair scoring, K for
    matrix mode — see :func:`_sentinels`), which matches no live code and
    no post-text char — pad cells only decay, which is what lets the SW
    running max run unmasked.  Pad rows sit below every live row, so
    their garbage never flows upward (deps go down/right only).
    """
    R = nr * LANES
    n_strips = -(-n // R)
    pad = jnp.full((n_strips * R,), pad_char, jnp.int32)
    pad = jax.lax.dynamic_update_slice(pad, s2.astype(jnp.int32), (0,))
    return (
        pad.reshape(n_strips, LANES, nr)
        .transpose(0, 2, 1)
        .reshape(n_strips * nr, LANES)
    )


def _wmax(cfg: ScoringConfig) -> int:
    """Largest per-step value change (drift/f32-exactness bound)."""
    if cfg.has_matrix:
        lo, hi = cfg.sub_bounds()
        sub_mag = max(abs(lo), abs(hi), 1)
    else:
        sub_mag = max(abs(cfg.match), abs(cfg.mismatch), 1)
    if cfg.is_affine:
        return max(sub_mag, abs(cfg.gap_open) + abs(cfg.gap_extend))
    return max(sub_mag, abs(cfg.gap))


def _min0(cfg: ScoringConfig) -> int:
    """Sentinel substitution score (pad rows / post-text chars) in matrix
    mode: <= 0 and <= every real entry, so dead cells only decay —
    the same decay guarantee pair scoring gets from ``mismatch <= 0``."""
    lo, _ = cfg.sub_bounds()
    return min(0, lo)


def _ends_flags(cfg: ScoringConfig, swapped: bool):
    """Kernel-coordinate ends-free flags ``(zr, zc, er, ec)``.

    ``zr``: boundary row H(0, :) = 0; ``zc``: injected column H(:, 0) = 0;
    ``er``: score maxes over the last DP row (j = 0..m); ``ec``: over the
    last column (i = 0..n).  Swapping the orientation transposes the table,
    exchanging row flags with column flags.
    """
    if not cfg.is_ends_free:
        return (False, False, False, False)
    zr, zc = cfg.free_start_s1, cfg.free_start_s2
    er, ec = cfg.free_end_s1, cfg.free_end_s2
    if swapped:
        zr, zc, er, ec = zc, zr, ec, er
    return (zr, zc, er, ec)


def supports(cfg: ScoringConfig) -> bool:
    """True when this kernel serves ``cfg``'s scoring shape (dispatch
    consults this; unsupported shapes run on the xla engine).

    Everything the config admits fits since round 5: matrix alphabets up
    to K = 16 (live codes 0..15 ride the 4-bit text pack, both sentinels
    share code K — see :func:`_sentinels`), and the affine ends-free
    compositions (zero-boundary Gotoh forms: zeroed H rows with NEG F
    rows, the converged open+ext column-0 F chain, and a forced-zero
    scalar head under zc)."""
    return True


def _check_cfg(cfg: ScoringConfig, total: int) -> None:
    if not supports(cfg):
        raise ValueError(
            "this scoring shape is outside the band kernel's envelope; "
            "use impl='xla'")
    if (cfg.is_affine and cfg.is_local and not cfg.has_matrix
            and cfg.mismatch > 0):
        # the unmasked running max needs decaying dead cells; the masked
        # fallback only exists on the linear path
        raise ValueError(
            "positive-mismatch local affine configs are outside the band "
            "kernel's envelope; use impl='xla'")
    if total * _wmax(cfg) > 2**29:
        raise ValueError("scoring magnitudes too large for int32 headroom")


def _wants_f32(cfg: ScoringConfig, m: int, n: int) -> bool:
    """True when every value the kernel can produce is a 24-bit-exact
    integer in float32 (score paths bounded by (m+n+2) * wmax)."""
    return (m + n + 2) * _wmax(cfg) < F32_EXACT


def _orient(m: int, n: int, cap: int = MAX_BOUNDARY):
    """Pick (boundary_axis_len, strip_axis_len, swapped).

    Total steps ~ (strip/R)*(boundary + R): fewer with strips on the shorter
    side, but the boundary side must fit SMEM.  Score is symmetric.
    """
    lo, hi = (m, n) if m <= n else (n, m)
    if hi <= cap:
        return hi, lo  # boundary = longer, strips = shorter
    if lo <= cap:
        return lo, hi  # boundary = shorter, strips = longer (unbounded)
    raise ValueError(
        f"both sequences exceed the boundary-row capacity "
        f"({cap}); use the sharded engine or impl='xla'"
    )


def _empty_score(m: int, n: int, cfg: ScoringConfig) -> int:
    """Closed-form score when either sequence is empty."""
    if cfg.is_local or m + n == 0:
        return 0

    def run(length: int) -> int:  # cost of one all-gap run
        if cfg.is_affine:
            return cfg.gap_open + cfg.gap_extend * length
        return cfg.gap * length

    if cfg.is_ends_free:
        if n == 0:  # s1 runs against nothing: skippable iff an s1 end is free
            return 0 if (cfg.free_start_s1 or cfg.free_end_s1) else run(m)
        return 0 if (cfg.free_start_s2 or cfg.free_end_s2) else run(n)
    return run(m + n)


def score_fn(
    m: int,
    n: int,
    cfg: ScoringConfig = ScoringConfig(),
    *,
    rows: int = 112,
    unroll: int = 16,
    interpret: bool = False,
):
    """Jittable ``(s1, s2) -> score`` for fixed lengths ``m = len(s1)``
    (columns), ``n = len(s2)`` (rows).  ``rows`` is the strip depth knob
    (NR sublanes, R = NR*128 DP rows per strip)."""
    _check_cfg(cfg, m + n)  # gate before the degenerate early return, so
    # unsupported shapes (e.g. affine ends-free) raise like the non-empty
    # path instead of returning a linear-gap value (ADVICE r4)
    if m == 0 or n == 0:
        base = _empty_score(m, n, cfg)
        return lambda s1, s2: jnp.int32(base)
    # affine carries a second boundary row (F) in SMEM: halve the cap
    mb, ns = _orient(m, n, MAX_BOUNDARY_AFFINE if cfg.is_affine
                     else MAX_BOUNDARY)
    swapped = mb != m  # boundary axis carries s2, strips carry s1
    use_f32 = _wants_f32(cfg, m, n)
    ends = _ends_flags(cfg, swapped)
    kcfg = cfg
    if swapped and cfg.has_matrix:
        # the kernel scores matrix[text char][strip char]; swapping puts
        # s2 on the text axis, so an asymmetric matrix must transpose
        # (matrix[a][b] is defined as s1-code a vs s2-code b)
        kcfg = dataclasses.replace(cfg, matrix=tuple(zip(*cfg.matrix)))

    R = rows * LANES
    n_strips = -(-ns // R)

    def fn(s1: jax.Array, s2: jax.Array) -> jax.Array:
        b_seq, s_seq = (s2, s1) if swapped else (s1, s2)
        spad = jnp.zeros((n_strips * R,), jnp.int32)
        spad = jax.lax.dynamic_update_slice(
            spad, s_seq.astype(jnp.int32), (0,)
        )
        s2tops = spad[:: R][:n_strips]
        prof0 = None
        if kcfg.has_matrix:
            # (strip, text char) top-row profile: matrix[ch][s2_first];
            # K+1 wide per strip — slot K (the post-text sentinel) decays
            # via _min0
            vdt = jnp.float32 if use_f32 else jnp.int32
            kk = len(kcfg.matrix)
            mat = jnp.asarray(kcfg.matrix, vdt)
            prof0 = jnp.full((n_strips, kk + 1), vdt(_min0(kcfg)))
            prof0 = prof0.at[:, :kk].set(mat[:, s2tops].T).reshape(-1)
        res = _band_call(
            _pack4(b_seq, mb),
            s2tops,
            _colmajor(s_seq, ns, rows, _sentinels(kcfg)[0]),
            prof0,
            ns,
            mb,
            rows,
            kcfg,
            ends,
            use_f32,
            unroll,
            interpret,
        )
        # the in-kernel maxes cover j in [1, m] / i in [1, n]; the j = 0 /
        # i = 0 boundary cells are closed-form (affine: one open+extend run)
        zr, zc, er, ec = ends

        def bnd(length: int) -> int:
            if cfg.is_affine:
                return cfg.gap_open + cfg.gap_extend * length
            return cfg.gap * length

        if er:  # H(n, 0)
            res = jnp.maximum(res, jnp.int32(0 if zc else bnd(ns)))
        if ec:  # H(0, m)
            res = jnp.maximum(res, jnp.int32(0 if zr else bnd(mb)))
        return res

    return fn


def score(
    s1,
    s2,
    cfg: ScoringConfig = ScoringConfig(),
    *,
    rows: int = 112,
    interpret: bool = False,
) -> int:
    """Alignment score via the banded strip kernel (NW any params, SW).

    Reference semantics (``serial.cpp:16-31``); the engine of choice for
    every scoring config outside the bit-parallel family.
    """
    s1 = jnp.asarray(s1, jnp.int32)
    s2 = jnp.asarray(s2, jnp.int32)
    m, n = int(s1.shape[0]), int(s2.shape[0])
    if m == 0 or n == 0:
        _check_cfg(cfg, m + n)
        return _empty_score(m, n, cfg)
    if max(m, n) > MAX_STRIP_AXIS:
        raise ValueError("sequence too long for the banded kernel")
    return int(score_fn(m, n, cfg, rows=rows, interpret=interpret)(s1, s2))
