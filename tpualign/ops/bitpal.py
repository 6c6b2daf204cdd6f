"""Bit-parallel NW scoring kernel: 31 DP cells per int32 lane word.

Motivation
----------
The reference's entire performance program (ILP bit tricks ``serial.cpp:23-31``,
cache blocking, sentinel wavefront threads, MPI strips) still spends ~10 scalar
ops per DP cell.  The wavefront Pallas kernel (``ops/pallas_diag.py``) brings
that to ~10 *vector* ops per 128-lane diagonal slice.  This engine removes the
per-cell cost itself: for the reference's scoring scheme (MATCH=1, MISMATCH=0,
GAP=-1, ``needleman-wunsch.hpp:11-13``) adjacent-cell score differences are
bounded, so the DP state compresses to a few *bits* per cell and one VPU op
advances 31 cells per lane — the Myers (1999) / BitPAl (Loving, Hernandez &
Benson 2014) bit-parallel technique, re-derived for this scheme and laid out
as a word-level anti-diagonal wavefront across the 8x128 vector unit.

Derivation (match=1, mismatch=0, gap=-1)
----------------------------------------
Let ``v = H(i,j) - H(i-1,j)`` (vertical delta) and ``h = H(i,j) - H(i,j-1)``
(horizontal delta).  Both lie in ``{-1, 0, 1, 2}``: the gap branch bounds them
below by -1, and ``H(i-1,j-1) >= H(i-1,j) - 1`` bounds them above by 2.
Subtracting ``H(i-1,j-1)`` from the recurrence gives, per cell, with inputs
``v_in = v(i, j-1)``, ``h_in = h(i-1, j)`` and match bit ``s``:

    T    = max(s, h_in - 1, v_in - 1)    # = H(i,j) - H(i-1,j-1)
    h_out = T - v_in;   v_out = T - h_in

Since ``h_in - 1 <= 1`` and ``v_in - 1 <= 1``, ``T`` is *binary*:
``T = 1  iff  s or v_in = 2 or h_in = 2``, else 0 — a single "promotion bit"
``P``.  The only intra-column dependency is the ``h_in = 2`` chain:
``h_out = 2  iff  P and v_in = -1``, so a promotion ripples down exactly
through runs of ``v_in = -1`` cells — resolved for 31 rows at once by one
carry-propagating add (Myers' trick), seeded by ``S = Eq | (v_in = 2)``:

    received = ((Vm1 + (S & Vm1) + c_in) ^ Vm1) & MASK31;   P = S | received

where ``Vm1`` is the ``v = -1`` indicator word and ``c_in`` the promotion
carried in from the word above.  Everything else is boolean plane algebra on
one-hot indicators of ``v`` and ``h`` (tables in ``_plane_step``).

Word-wavefront layout on the VPU
--------------------------------
The query sequence is cut into 31-row words (bit 31 reserved so the carry out
of the add is readable as a plane bit).  Word ``w`` at text column ``j``
depends only on previous-step state (itself at column ``j-1``; word ``w-1``
at column ``j`` via its bottom ``h_out``), so each step advances *every* word
one column: a 2-D wavefront over (word, column).  No sentinel/progress-index
machinery survives (cf. ``src/sentinel``, ``src/idxarray``): the schedule is
static.

The word -> vector-slot mapping is chosen around measured VPU costs: any
lane-crossing shuffle (``pltpu.roll`` over lanes) costs ~80 cycles of latency
while sublane concatenation costs ~6 and ALU ops ~1.7, so words are laid out
**column-major** — word ``w`` lives at ``(row = w % rows, lane = w // rows)``
— making the every-step neighbor hand-off (packed top-bit/char words) a pure
sublane shift.  The once-per-lane boundary (row 0 needs ``(rows-1, lane-1)``)
*would* still be a lane roll on the critical chain, so the schedule staggers
word ``w`` by ``2w`` steps (column ``d - 2w`` at step ``d``): every hand-off
— sublane shift and lane roll alike — is consumed two steps after it is
produced, off the loop-carried dependency chain (ping-pong double buffers
carry them across the gap).  Price: ``2 * nw`` ramp steps instead of ``nw``
(~3% at corpus sizes).

Cost: ~60 cheap vector ops advance ``31 * nw`` cells (nw = word count),
~0.45 lane-ops per cell — and the kernel runs at its VPU issue bound for
that op count (results/roofline.md).  Score is recovered from the final
column's vertical deltas: ``H(n, m) = m * gap + sum_i v(i, m)`` via
``population_count`` outside the kernel.

Scope: global alignment with any scoring affinely reducible to
``(1, 0, -g)`` for integer ``g <= MAX_G`` (:func:`family`): g = 1 runs the
hand-tuned two-plane step below; g >= 2 runs the generic B-bit plane
algebra (:func:`_g_plane_step`).  Other configurations (including
Smith-Waterman) dispatch to the general wavefront kernel
(``api.resolve_impl``).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ScoringConfig
from .pallas_diag import GRAIN, LANES, SUBLANES, _round_up

WORD = 31  # DP rows per int32 lane word (bit 31 = carry-out of the Myers add)
MASK31 = (1 << WORD) - 1
ALPHABET = 4  # .bdna base codes 1..4 (README.md:8); 0 = padding, never matches

#: fused steps per loop iteration (amortizes loop control and gives the
#: in-order VLIW scheduler a window of independent cross-step work);
#: interpret mode (CPU tests) uses a small factor to keep traces tractable
UNROLL = 32
UNROLL_INTERPRET = 2

#: VMEM guard: word count per (rows,128) plane set (9 planes resident)
MAX_WORDS = 512 * 1024


#: largest reduced gap weight the generalized kernel supports (delta
#: encodings of 2g+2 values must fit the hand-off pack next to the char)
MAX_G = 7


def stream_epw(B: int) -> int:
    """h_top-stream entries per int32 word: the largest power of two that
    fits, so the kernel's per-step unpack is a shift/mask pair instead of a
    signed div/mod (measured: scalar integer division sits on the in-order
    scalar chain and dominates small-word-count steps)."""
    return 1 << ((32 // B).bit_length() - 1)


def family(cfg: ScoringConfig):
    """``(mult, g)`` if ``cfg`` is global scoring affinely equivalent to
    ``(1, 0, -g)`` for an integer ``1 <= g <= MAX_G``, else None.

    For any alignment of sequences with lengths m, n: matches a, mismatches
    b, gaps G satisfy ``2(a + b) + G# = m + n`` (G# = gap count), so

        S = M a + X b + G G# = X (m+n)/2 + (M-X) a + (G - X/2) G#.

    When ``G - X/2 == -g (M-X)`` (and ``M > X`` so the map is
    order-preserving) this is an exact affine function of the reduced score
    ``S_g = a - g G#`` — the score under ``(1, 0, -g)``:
    ``S = (X (m+n) + 2 (M-X) S_g) / 2`` (always integral).  Examples:
    g=1 covers ``(k,0,-k)``, ``(1,-2,-4)``, ``(5,2,-2)``; g=2 covers
    ``(1,0,-2)``, ``(2,0,-4)``, ``(3,2,-1)``; most realistic linear-gap
    scorings land at some small g.
    """
    if cfg.is_local or cfg.is_affine or cfg.is_ends_free or cfg.has_matrix:
        return None
    mult = cfg.match - cfg.mismatch
    if mult <= 0:
        return None
    num = cfg.mismatch - 2 * cfg.gap  # = 2 g (M-X) when a member
    if num <= 0 or num % (2 * mult):
        return None
    g = num // (2 * mult)
    return (mult, g) if 1 <= g <= MAX_G else None


def supported_scale(cfg: ScoringConfig) -> Optional[int]:
    """Back-compat gate: the affine multiplier when :func:`family` matches."""
    fam = family(cfg)
    return fam[0] if fam else None


def _from_unit(cfg: ScoringConfig, total_len, unit_score):
    """Map the unit-scheme score back to ``cfg``'s scale (see
    :func:`supported_scale`); exact integer arithmetic."""
    mult = cfg.match - cfg.mismatch
    return (cfg.mismatch * total_len + 2 * mult * unit_score) // 2


# ---------------------------------------------------------------------------
# Reference implementation: whole column in one Python bigint
# ---------------------------------------------------------------------------


def score_bigint(s1, s2) -> int:
    """Bit-parallel NW score with unit scheme via arbitrary-precision ints.

    One bigint per indicator plane holds the whole column; Python's bigint add
    propagates the promotion carry across all rows at once.  This is the
    executable specification the Pallas kernel is tested against (itself
    validated against the scalar DP oracle, ``ops/oracle.py``).
    """
    s1 = np.asarray(s1)
    s2 = np.asarray(s2)
    m, n = int(s1.size), int(s2.size)
    if m == 0 or n == 0:
        return -(m + n)
    mask = (1 << n) - 1
    eq = [0] * (ALPHABET + 1)
    for i, c in enumerate(np.asarray(s2, np.int64)):
        if 1 <= c <= ALPHABET:
            eq[int(c)] |= 1 << i
    vm1, v0, v1, v2 = mask, 0, 0, 0
    for c in np.asarray(s1, np.int64):
        E = eq[int(c)] if 1 <= c <= ALPHABET else 0
        S = E | v2
        received = (((S & vm1) + vm1) ^ vm1) & mask  # h_top=-1 -> no carry-in
        P = S | received
        nP = mask ^ P
        h2 = P & vm1
        h1 = (P & v0) | (nP & vm1)
        h0 = (P & v1) | (nP & v0)
        hm1 = (P & v2) | (nP & v1)
        h2i = (h2 << 1) & mask
        h1i = (h1 << 1) & mask
        h0i = (h0 << 1) & mask
        hm1i = ((hm1 << 1) | 1) & mask  # top boundary: Dh(0,j) = gap
        v2 = P & hm1i
        v1 = (P & h0i) | (nP & hm1i)
        v0 = (P & h1i) | (nP & h0i)
        vm1 = (P & h2i) | (nP & h1i)
    return -m + bin(v1).count("1") + 2 * bin(v2).count("1") - bin(vm1).count("1")


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _plane_step(E, b0, b1, u0, u1):
    """One word-column update, both deltas in 2-bit binary planes.

    ``(b0, b1)`` encode the stored vertical deltas (``enc = v + 1``, bit 0 /
    bit 1 planes); ``(u0, u1)`` likewise encode the horizontal delta entering
    each word's top row.  Returns new ``(b0, b1)`` and the packed bottom-row
    hand-off word ``tp``.

    With P the promotion bit (``T = max(s, h-1, v-1)`` is binary for this
    scheme, see module docstring): ``h_out = P - v_in`` gives, in encoding
    space, ``u_out = P + (2 - enc_v)`` — and since ``v=-1 or v=1  <=>  bit0
    clear`` etc., the one-hot tables collapse: ``bit0(u_out) = P & ~b0 | ~P &
    (b0 & ~b1)``, ``bit1(u_out) = P & ~b1 | ~P & (~b0 & ~b1)``.  Symmetrically
    ``enc_v_out = P + (2 - u_in)`` is a two-bit add: ``x = 2 - u_in`` has
    ``x0 = u0_in`` and ``x1 = ~(u0_in ^ u1_in)``, then ``+P`` ripples one
    carry.  The mod-4 wrap at ``u_in = 2, P = 1`` is exact (v_out = -1).

    Bit-31 hygiene: ``received``/``P`` and (via the xor) ``b0`` may carry a
    junk bit 31; every consumer masks it structurally (``&`` against a
    31-bit plane, or the popcount validity mask), so no explicit MASK31.
    """
    nB0 = b0 ^ MASK31
    nB1 = b1 ^ MASK31
    vm1 = nB0 & nB1
    S = E | (b0 & b1)  # seed: match or v = 2
    # E & vm1 == S & vm1 (v=2 and v=-1 are disjoint) — keeps S off the chain
    summ = vm1 + (E & vm1) + (u0 & u1)  # carry-in = (h_top == 2)
    received = summ ^ vm1
    P = S | received
    nP = P ^ MASK31
    U0 = (P & nB0) | (nP & (b0 & nB1))
    U1 = (P & nB1) | (nP & vm1)
    # bottom bits (row WORD-1) packed for the next word / next step
    tp = ((U0 >> (WORD - 1)) & 1) | ((U1 >> (WORD - 2)) & 2)
    # h_in planes: shift down one row, inject h_top bits at row 0
    U0i = ((U0 << 1) & MASK31) | u0
    U1i = ((U1 << 1) & MASK31) | u1
    x1 = (U0i ^ U1i) ^ MASK31
    b0n = U0i ^ P
    b1n = x1 ^ (U0i & P)
    return b0n, b1n, tp


def _plane_step_c(E, nb0, nb1, u0, u1):
    """Complement-state variant of :func:`_plane_step` for the lean flagship
    schedule: the carried planes are the complements ``nb = b ^ MASK31``, so
    the two de-complement xors that headed every step vanish, and the raw
    (pre-shift) ``h_out`` planes ``(U0, U1)`` are returned for the separate
    hand-off buffers instead of being packed into a single word.

    Bit-31 hygiene is dropped entirely (no ``& MASK31`` on the shifted-in
    planes): bit 31 of every carried plane may be junk.  That is safe
    structurally — the carry-add only propagates junk *upward* into bit 31,
    hand-off consumers extract bit 30 (``WORD - 1``) with an explicit
    ``& 1``, and the score reduction masks with ``valid <= MASK31``
    (:func:`_reduce_score`)."""
    vm1 = nb0 & nb1  # v = -1 plane (was nB0 & nB1)
    v2 = (nb0 | nb1) ^ MASK31  # b0 & b1: v = 2
    S = E | v2
    summ = vm1 + (E & vm1) + (u0 & u1)  # carry-in = (h_top == 2)
    received = summ ^ vm1
    P = S | received
    nP = P ^ MASK31
    U0 = (P & nb0) | (nP & (nb1 ^ vm1))  # nb1 ^ vm1 == b0 & ~b1
    U1 = (P & nb1) | (nP & vm1)
    U0i = (U0 << 1) | u0  # junk lands in bit 31; tolerated (see above)
    U1i = (U1 << 1) | u1
    nb0n = U0i ^ nP  # == (U0i ^ P) ^ MASK31
    nb1n = (U0i ^ U1i) ^ (U0i & P)  # == x1 ^ (U0i & P) ^ MASK31
    return nb0n, nb1n, U0, U1


def _bitpal_kernel_body_lean(
    mt: int,
    rows: int,
    total: int,
    unroll: int,
    nw: int,
    text_ref,
    eq_ref,
    b0_out,
    b1_out,
    cca, ccb,  # char delay line, ping-ponged by step parity
    h0a, h0b,  # h_out bit-0 planes (raw, pre-shift), ping-ponged
    h1a, h1b,  # h_out bit-1 planes
    pend_ref,  # (SUBLANES, LANES): lane-rolled tail rows; [parity + 2*plane]
):
    """Lean re-schedule of :func:`_bitpal_kernel_body` (same contract, same
    ramp/steady/drain phasing) that cuts the steady step from ~52 to ~44
    full-plane ops:

    - the sublane roll + row-0 select collapses to ONE ``jnp.concatenate``
      per carried plane (the row-0 merge rides inside the shift — the trick
      measured on the band engine in round 3);
    - the hand-off travels as three planes (char, h bit 0, h bit 1) instead
      of one packed word, deleting the 5-op bottom-row pack and the 2-op
      merge; consumers read bit ``WORD-1`` of the shifted raw planes;
    - the delta state is carried complemented (:func:`_plane_step_c`),
      deleting the two ``^ MASK31`` that fed ``vm1``, and the two
      ``& MASK31`` bit-31 hygiene ops go with it.

    Outputs are de-complemented once after the loops, so ``_reduce_score``
    and every caller see the exact :func:`_bitpal_kernel_body` contract."""
    row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    offs = 2 * (row_i + rows * lane_i)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    eq = [eq_ref[c] for c in range(ALPHABET)]

    # column-0 boundary: v = gap -> enc 0 -> complement planes all-ones
    nb_init = jnp.full((rows, LANES), MASK31, jnp.int32)
    b0_out[:] = nb_init
    b1_out[:] = nb_init
    for ref in (cca, ccb, h0a, h0b, h1a, h1b):
        ref[:] = jnp.zeros((rows, LANES), jnp.int32)
    pend_ref[:] = jnp.zeros((SUBLANES, LANES), jnp.int32)

    def step(d, u, freeze=True):
        p = u % 2
        cc = cca if p == 0 else ccb
        h0 = h0a if p == 0 else h0b
        h1 = h1a if p == 0 else h1b
        # fresh text char via the scalar core (SMEM), as in the base kernel
        idx = jnp.minimum(d - 1, mt - 1)
        val = (text_ref[idx >> 3] >> ((idx & 7) << 2)) & 15
        cc_row0 = jnp.where(lane_row == 0, val, pend_ref[p : p + 1, :])
        # word 0's h_top is the boundary Dh(0,j) = gap -> both bits 0
        h0_row0 = jnp.where(lane_row == 0, 0, pend_ref[2 + p : 3 + p, :])
        h1_row0 = jnp.where(lane_row == 0, 0, pend_ref[4 + p : 5 + p, :])
        cts_cc = jnp.concatenate([cc_row0, cc[: rows - 1]], axis=0)
        cts_h0 = jnp.concatenate([h0_row0, h0[: rows - 1]], axis=0)
        cts_h1 = jnp.concatenate([h1_row0, h1[: rows - 1]], axis=0)
        win = cts_cc
        E = jnp.where(
            win <= 2,
            jnp.where(win == 1, eq[0], eq[1]),
            jnp.where(win == 3, eq[2], eq[3]),
        )
        u0 = (cts_h0 >> (WORD - 1)) & 1
        u1 = (cts_h1 >> (WORD - 1)) & 1
        nb0n, nb1n, U0, U1 = _plane_step_c(E, b0_out[:], b1_out[:], u0, u1)
        if freeze:
            upd = (offs <= d - 1) & (offs >= d - mt)
            b0_out[:] = jnp.where(upd, nb0n, b0_out[:])
            b1_out[:] = jnp.where(upd, nb1n, b1_out[:])
        else:
            b0_out[:] = nb0n
            b1_out[:] = nb1n
        cc[:] = cts_cc  # the char line stores SHIFTED: one row per 2 steps
        h0[:] = U0  # h planes store RAW (slot-positioned); shift at read
        h1[:] = U1
        pend_ref[p : p + 1, :] = pltpu.roll(
            cts_cc[rows - 1 : rows, :], 1, axis=1
        )
        pend_ref[2 + p : 3 + p, :] = pltpu.roll(
            U0[rows - 1 : rows, :], 1, axis=1
        )
        pend_ref[4 + p : 5 + p, :] = pltpu.roll(
            U1[rows - 1 : rows, :], 1, axis=1
        )

    def body(tt, _, freeze=True):
        d0 = unroll * tt + 1
        for u in range(unroll):
            step(d0 + u, u, freeze)
        return 0

    d_lo = 2 * (nw - 1) + 1
    tt0 = max(0, min(-(-(d_lo - 1) // unroll), total // unroll))
    tt1 = max(tt0, min(mt // unroll, total // unroll))
    jax.lax.fori_loop(0, tt0, body, 0, unroll=False)
    jax.lax.fori_loop(
        tt0, tt1, functools.partial(body, freeze=False), 0, unroll=False
    )
    jax.lax.fori_loop(tt1, total // unroll, body, 0, unroll=False)
    # de-complement: callers and _reduce_score see the base-kernel contract
    b0_out[:] = b0_out[:] ^ MASK31
    b1_out[:] = b1_out[:] ^ MASK31


def _bitpal_kernel_body(
    mt: int,
    rows: int,
    total: int,
    unroll: int,
    nw: int,
    text_ref,
    eq_ref,  # (ALPHABET, rows, LANES) match planes per base code
    b0_out,
    b1_out,
    cta_ref,
    ctb_ref,
    pend_ref,
):
    """See module docstring.  ``mt`` = text length (columns); word ``w`` of
    the query lives at slot ``(w % rows, w // rows)`` (column-major) and
    computes column ``d - 2w`` at step ``d``.

    ``cta``/``ctb`` carry each word's per-step hand-off to its successor,
    packed as ``(text char << 2) | 2-bit h_out encoding``, ping-ponged by
    step parity: the 2-steps-per-word stagger means a successor consumes
    hand-offs that are two steps old, so the sublane concat shift, the char
    unpack, and the match-plane select all run a full step ahead of their
    consumer — off the loop-carried dependency chain, which reduces to the
    core plane recurrence.  ``pend_ref`` rows 0/1 ping-pong the lane-rolled
    tail row serving the next lane's row 0, likewise two steps later."""
    row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    offs = 2 * (row_i + rows * lane_i)  # step offset of word slot = 2w
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    eq = [eq_ref[c] for c in range(ALPHABET)]

    # column-0 boundary: v = gap everywhere -> enc 0 -> both planes zero
    b0_out[:] = jnp.zeros((rows, LANES), jnp.int32)
    b1_out[:] = jnp.zeros((rows, LANES), jnp.int32)
    cta_ref[:] = jnp.zeros((rows, LANES), jnp.int32)
    ctb_ref[:] = jnp.zeros((rows, LANES), jnp.int32)
    pend_ref[:] = jnp.zeros((SUBLANES, LANES), jnp.int32)

    def step(d, u, freeze=True):
        # word 0 takes the fresh text char (its column is d) and the DP
        # boundary row's horizontal delta (Dh(0,j) = gap -> h_top bit 3);
        # other lanes' row 0 takes the two-step-old rolled tail row.
        # The char comes from SMEM via the scalar core (8 chars per int32):
        # a vector-lane extract here would put an ~80-cycle cross-lane
        # reduce on the loop-carried dependency chain
        ct_ref = cta_ref if u % 2 == 0 else ctb_ref
        idx = jnp.minimum(d - 1, mt - 1)
        val = (text_ref[idx >> 3] >> ((idx & 7) << 2)) & 15
        pend_row = pend_ref[u % 2 : u % 2 + 1, :]
        # word 0's h_top is the boundary Dh(0,j) = gap: u = 0 -> low bits 00
        row0 = jnp.where(lane_row == 0, val << 2, pend_row)
        cts = jnp.where(
            row_i == 0, row0, pltpu.roll(ct_ref[:], 1, axis=0)
        )
        win = cts >> 2
        # select the match plane for each slot's text char (balanced tree:
        # two levels deep off the chain); the win == 0 (pre-start)
        # fallthrough picks eq[1] harmlessly: such slots and all their
        # downstream consumers are frozen by the update mask below
        E = jnp.where(
            win <= 2,
            jnp.where(win == 1, eq[0], eq[1]),
            jnp.where(win == 3, eq[2], eq[3]),
        )
        u0 = cts & 1
        u1 = (cts >> 1) & 1
        b0n, b1n, tp = _plane_step(E, b0_out[:], b1_out[:], u0, u1)
        if freeze:
            # freeze words outside their live column range [1, mt]:
            # pre-start words must stay at the column-0 state, finished
            # words hold their final (column mt) deltas, which the score
            # reduction reads
            upd = (offs <= d - 1) & (offs >= d - mt)
            b0_out[:] = jnp.where(upd, b0n, b0_out[:])
            b1_out[:] = jnp.where(upd, b1n, b1_out[:])
        else:
            # steady state: every real word is inside [1, mt] (pad slots
            # only ever feed other pad slots and are masked from the score)
            b0_out[:] = b0n
            b1_out[:] = b1n
        ctn = tp | (cts & ~jnp.int32(3))
        ct_ref[:] = ctn  # read slot == write slot: consumed at step d+2
        # tail hand-off to the next lane: rolled now, consumed at step d+2 —
        # the ~80-cycle lane shuffle runs entirely off the dependency chain
        pend_ref[u % 2 : u % 2 + 1, :] = pltpu.roll(
            ctn[rows - 1 : rows, :], 1, axis=1
        )

    def body(tt, _, freeze=True):
        d0 = unroll * tt + 1
        for u in range(unroll):
            step(d0 + u, u, freeze)
        return 0

    # Three phases: ramp-in (words entering), steady (every real word live:
    # the freeze mask is all-true, ~92% of the steps at corpus sizes — skip
    # its 5 ops), drain (words finishing).  `total` is pre-rounded to
    # UNROLL; overrun steps find no live word and change nothing.
    d_lo = 2 * (nw - 1) + 1  # first step with every real word started
    tt0 = max(0, min(-(-(d_lo - 1) // unroll), total // unroll))
    tt1 = max(tt0, min(mt // unroll, total // unroll))
    jax.lax.fori_loop(0, tt0, body, 0, unroll=False)
    jax.lax.fori_loop(
        tt0, tt1, functools.partial(body, freeze=False), 0, unroll=False
    )
    jax.lax.fori_loop(tt1, total // unroll, body, 0, unroll=False)


def _add_planes(A, Bp):
    """Bit-sliced ripple add of two plane lists (mod 2^len)."""
    out = []
    carry = None
    for b in range(len(A)):
        x = A[b]
        y = Bp[b] if b < len(Bp) else None
        if y is None:
            s_ = x if carry is None else x ^ carry
            carry = None if carry is None else x & carry
        else:
            s_ = x ^ y if carry is None else x ^ y ^ carry
            carry = x & y if carry is None else (x & y) | (carry & (x ^ y))
        out.append(s_)
    return out


def _g_plane_step(g, E, V, u):
    """Generalized :func:`_plane_step` for the reduced scheme ``(1, 0, -g)``.

    Deltas live in ``[-g, 1+g]``; ``enc = delta + g`` in ``[0, 2g+1]`` as
    ``B = bit_length(2g+1)`` bit planes.  ``V`` = stored vertical-delta
    planes, ``u`` = h_top planes.  The promotion bit is binary exactly as at
    g=1 (``T = max(s, h-g, v-g)`` and ``h-g <= 1``): ``P = s | (v = 1+g) |
    (h = 1+g)``, propagating through runs of ``enc_v = 0`` via the Myers
    add.  Outputs ``enc_out = P + 2g - enc_in`` via bit-sliced adders.
    Returns new ``V`` planes and the h_out planes (caller packs the bottom
    bits).  Bigint-validated for g = 1..4 before porting.
    """
    B = len(V)
    vmax = 2 * g + 1
    nV = [v ^ MASK31 for v in V]
    enc_is0 = nV[0]
    for b in range(1, B):
        enc_is0 = enc_is0 & nV[b]
    enc_ismax = V[0] if vmax & 1 else nV[0]
    for b in range(1, B):
        enc_ismax = enc_ismax & (V[b] if (vmax >> b) & 1 else nV[b])
    c_in = u[0] if vmax & 1 else (u[0] ^ MASK31)  # h_top == vmax pattern
    for b in range(1, B):
        c_in = c_in & (u[b] if (vmax >> b) & 1 else (u[b] ^ MASK31))
    S = E | enc_ismax
    summ = enc_is0 + (E & enc_is0) + (c_in & 1)
    received = summ ^ enc_is0
    P = (S | received) & MASK31  # adders below need a clean bit 31
    const = [jnp.int32(MASK31) if (vmax >> b) & 1 else jnp.int32(0)
             for b in range(B)]  # + (2g + 1) == + vmax
    U = _add_planes(nV, const)  # 2g - enc == (2g+1) + ~enc  (mod 2^B)
    U = _add_planes(U, [P])
    U = [x & MASK31 for x in U]
    Ui = [((x << 1) & MASK31) | u[b] for b, x in enumerate(U)]
    Vn = _add_planes([x ^ MASK31 for x in Ui], const)
    Vn = _add_planes(Vn, [P])
    return [x & MASK31 for x in Vn], U


def _g_kernel_body(
    g: int,
    mt: int,
    rows: int,
    total: int,
    unroll: int,
    nw: int,
    text_ref,
    eq_ref,
    *refs,
):
    """Generalized single-shot wavefront for ``(1, 0, -g)``: same schedule,
    layout, and hand-off machinery as ``_bitpal_kernel_body`` with B-bit
    delta planes.  ``refs`` = B plane outputs, then scratch cta, ctb, pend.
    The hand-off pack carries h_out enc at bits [0, B) and the char at
    bits [B, B+4)."""
    B = max(1, (2 * g + 1).bit_length())
    v_out = refs[:B]
    cta_ref, ctb_ref, pend_ref = refs[B], refs[B + 1], refs[B + 2]
    row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    offs = 2 * (row_i + rows * lane_i)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    eq = [eq_ref[c] for c in range(ALPHABET)]

    for r in v_out:  # column-0 boundary: v = -g -> enc 0
        r[:] = jnp.zeros((rows, LANES), jnp.int32)
    cta_ref[:] = jnp.zeros((rows, LANES), jnp.int32)
    ctb_ref[:] = jnp.zeros((rows, LANES), jnp.int32)
    pend_ref[:] = jnp.zeros((SUBLANES, LANES), jnp.int32)

    def step(d, uu, freeze=True):
        ct_ref = cta_ref if uu % 2 == 0 else ctb_ref
        idx = jnp.minimum(d - 1, mt - 1)
        val = (text_ref[idx >> 3] >> ((idx & 7) << 2)) & 15
        pend_row = pend_ref[uu % 2 : uu % 2 + 1, :]
        # word 0's h_top is the boundary: h = -g -> enc 0 -> low bits 0
        row0 = jnp.where(lane_row == 0, val << B, pend_row)
        # one concat: the row-0 merge rides inside the sublane shift
        cts = jnp.concatenate([row0, ct_ref[: rows - 1]], axis=0)
        win = cts >> B
        E = jnp.where(
            win <= 2,
            jnp.where(win == 1, eq[0], eq[1]),
            jnp.where(win == 3, eq[2], eq[3]),
        )
        u = [(cts >> b) & 1 for b in range(B)]
        Vn, U = _g_plane_step(g, E, [r[:] for r in v_out], u)
        if freeze:
            upd = (offs <= d - 1) & (offs >= d - mt)
            for r, vn in zip(v_out, Vn):
                r[:] = jnp.where(upd, vn, r[:])
        else:  # steady state: every real word live, pads only feed pads
            for r, vn in zip(v_out, Vn):
                r[:] = vn
        tp = (U[0] >> (WORD - 1)) & 1
        for b in range(1, B):
            tp = tp | ((U[b] >> (WORD - 1 - b)) & (1 << b))
        ctn = tp | (cts & ~jnp.int32((1 << B) - 1))
        ct_ref[:] = ctn
        pend_ref[uu % 2 : uu % 2 + 1, :] = pltpu.roll(
            ctn[rows - 1 : rows, :], 1, axis=1
        )

    def body(tt, _, freeze=True):
        d0 = unroll * tt + 1
        for uu in range(unroll):
            step(d0 + uu, uu, freeze)
        return 0

    # ramp / steady / drain split as in _bitpal_kernel_body
    d_lo = 2 * (nw - 1) + 1
    tt0 = max(0, min(-(-(d_lo - 1) // unroll), total // unroll))
    tt1 = max(tt0, min(mt // unroll, total // unroll))
    jax.lax.fori_loop(0, tt0, body, 0, unroll=False)
    jax.lax.fori_loop(
        tt0, tt1, functools.partial(body, freeze=False), 0, unroll=False
    )
    jax.lax.fori_loop(tt1, total // unroll, body, 0, unroll=False)


@functools.partial(
    jax.jit, static_argnames=("g", "mt", "rows", "total", "unroll", "nw",
                              "interpret")
)
def _g_call(
    text_packed: jax.Array,
    eq_planes: jax.Array,
    g: int,
    mt: int,
    rows: int,
    total: int,
    unroll: int,
    nw: int,
    interpret: bool,
):
    B = max(1, (2 * g + 1).bit_length())
    kernel = functools.partial(
        _g_kernel_body, g, mt, rows, total, unroll, nw
    )
    return pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32) for _ in range(B)
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(B)
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), jnp.int32),
            pltpu.VMEM((rows, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(text_packed, eq_planes)


def _rc_kernel_body(
    mt: int,
    rows: int,
    total: int,
    unroll: int,
    rc: int,  # columns advanced per step (2..4)
    lean: bool,  # complement-carry inner step (_plane_step_c)
    text_ref,  # SMEM: packed chars, 8 per int32
    eq_ref,
    b0_out,
    b1_out,
    ct_ref,
    pend_ref,
):
    """R-columns-per-step variant of ``_bitpal_kernel_body``.

    Each step advances every word ``rc`` text columns (the ``rc`` column
    updates of one word chain through registers), amortizing the per-step
    hand-off machinery.  The hand-off pack carries all ``rc`` columns: h_out
    bits at ``[0, 2*rc)`` (column c at bits 2c), chars at ``[8, 8+4*rc)``.

    Stagger: within a lane, a word trails its predecessor by ONE step (its
    whole ``rc``-column window consumes the pack written last step — the
    sublane shift joins the dependency chain, but its ~6-cycle latency is
    amortized over ``rc`` columns); across the lane boundary the stagger is
    ``rows+1`` steps, aging the expensive lane roll to 2 steps as before.
    Word ``w`` at step ``t`` covers columns ``(rc*(t - off_w) - rc,
    rc*(t - off_w)]`` with ``off_w = w % rows + (rows+1) * (w // rows)``;
    ramp = max offset ~ nw steps (vs ``2 nw`` for the 1-column kernel)."""
    lam = rows + 1
    row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    offs = row_i + lam * lane_i
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    eq = [eq_ref[c] for c in range(ALPHABET)]

    # column-0 boundary: enc 0 everywhere (complemented when lean)
    init = MASK31 if lean else 0
    b0_out[:] = jnp.full((rows, LANES), init, jnp.int32)
    b1_out[:] = jnp.full((rows, LANES), init, jnp.int32)
    ct_ref[:] = jnp.zeros((rows, LANES), jnp.int32)
    pend_ref[:] = jnp.zeros((SUBLANES, LANES), jnp.int32)

    def step(t, u):
        # word 0's fresh pack: chars text[rc*(t-1) .. rc*t - 1], h_top = 0
        cpack = jnp.int32(0)
        for c in range(rc):
            idx = jnp.minimum(rc * (t - 1) + c, mt - 1)
            ch = (text_ref[idx >> 3] >> ((idx & 7) << 2)) & 15
            cpack = cpack | (ch << (8 + 4 * c))
        pend_row = pend_ref[u % 2 : u % 2 + 1, :]
        row0 = jnp.where(lane_row == 0, cpack, pend_row)
        # one concat: the row-0 merge rides inside the sublane shift
        cts = jnp.concatenate([row0, ct_ref[: rows - 1]], axis=0)

        b0, b1 = b0_out[:], b1_out[:]
        colbase = rc * t - rc * offs - rc  # column before this step's window
        tpn = cts & ~jnp.int32((1 << (2 * rc)) - 1)  # keep the char bits
        for c in range(rc):
            win = (cts >> (8 + 4 * c)) & 15
            E = jnp.where(
                win <= 2,
                jnp.where(win == 1, eq[0], eq[1]),
                jnp.where(win == 3, eq[2], eq[3]),
            )
            u0 = (cts >> (2 * c)) & 1
            u1 = (cts >> (2 * c + 1)) & 1
            if lean:
                b0n, b1n, U0, U1 = _plane_step_c(E, b0, b1, u0, u1)
                tp = ((U0 >> (WORD - 1)) & 1) | ((U1 >> (WORD - 2)) & 2)
            else:
                b0n, b1n, tp = _plane_step(E, b0, b1, u0, u1)
            col = colbase + 1 + c
            upd = (col >= 1) & (col <= mt)
            b0 = jnp.where(upd, b0n, b0)
            b1 = jnp.where(upd, b1n, b1)
            tpn = tpn | (tp << (2 * c))
        b0_out[:] = b0
        b1_out[:] = b1
        ct_ref[:] = tpn  # consumed next step (in-lane) / via pend (cross-lane)
        pend_ref[u % 2 : u % 2 + 1, :] = pltpu.roll(
            tpn[rows - 1 : rows, :], 1, axis=1
        )

    def body(tt, _):
        t0 = unroll * tt + 1
        for u in range(unroll):
            step(t0 + u, u)
        return 0

    jax.lax.fori_loop(0, total // unroll, body, 0, unroll=False)
    if lean:  # back to true encoding for _reduce_score
        b0_out[:] = b0_out[:] ^ MASK31
        b1_out[:] = b1_out[:] ^ MASK31


def _batch_kernel_body(
    g: int,
    batch: int,
    rows: int,
    total: int,
    unroll: int,
    lean: bool,  # g=1 only: complement-carry inner step (_plane_step_c)
    # refs: mts SMEM (batch,), text SMEM flat column-major (8 chars/int32),
    # eq (ALPHABET, batch*rows, LANES), B delta-plane outputs, then scratch
    # cta, ctb, penda, pendb (all (batch*rows, LANES))
    *refs,
):
    """Batched single-chip fill: ``batch`` same-bucket pairs interleaved.

    Pair ``b`` occupies the row block ``[b*rows, (b+1)*rows)`` of every
    plane; within a block the layout and 2w-stagger schedule match
    ``_bitpal_kernel_body``.  The sublane hand-off shift is shared (one roll
    for all pairs), with each pair's row 0 patched from its own text char
    and rolled tail, so B small problems amortize the per-step cost that
    makes them latency-bound when run alone (a serving workload: one
    dispatch scores the whole batch)."""
    B = 2 if g == 1 else max(1, (2 * g + 1).bit_length())
    mts_ref, text_ref, eq_ref = refs[:3]
    v_out = refs[3 : 3 + B]
    cta_ref, ctb_ref, penda_ref, pendb_ref = refs[3 + B : 7 + B]
    brows = batch * rows
    row_i = jax.lax.broadcasted_iota(jnp.int32, (brows, LANES), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (brows, LANES), 1)
    offs = 2 * ((row_i % rows) + rows * lane_i)  # pair-local word stagger
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    is_row0 = (row_i % rows) == 0
    eq = [eq_ref[c] for c in range(ALPHABET)]

    def chars_at(idx):
        # ONE scalar read per 8 pairs per step; pairs past their own text
        # length read the 0 pad char, whose garbage effects are frozen out
        # by the per-pair update mask
        wpb = (batch + 7) // 8
        words = [text_ref[idx * wpb + j] for j in range(wpb)]
        return [
            (words[b >> 3] >> ((b & 7) << 2)) & 15 for b in range(batch)
        ]

    lean1 = lean and g == 1
    # column-0 boundary: enc 0 everywhere (complemented when lean)
    vinit = MASK31 if lean1 else 0
    for r in v_out:
        r[:] = jnp.full((brows, LANES), vinit, jnp.int32)
    cta_ref[:] = jnp.zeros((brows, LANES), jnp.int32)
    ctb_ref[:] = jnp.zeros((brows, LANES), jnp.int32)
    # pend buffers hold each pair's NEXT row-0 (text char at lane 0 embedded
    # at write time, rolled tail elsewhere), full-shaped so consumption is a
    # single masked select; seed them with the step-1 / step-2 chars
    zero = jnp.zeros((brows, LANES), jnp.int32)
    seed_a, seed_b = zero, zero
    c1 = chars_at(jnp.int32(0))
    c2 = chars_at(jnp.int32(1))
    for b in range(batch):
        at0 = (row_i == b * rows) & (lane_row == 0)
        seed_a = jnp.where(at0, c1[b] << B, seed_a)
        seed_b = jnp.where(at0, c2[b] << B, seed_b)
    penda_ref[:] = seed_a
    pendb_ref[:] = seed_b
    # per-pair text bound as a plane, for the freeze mask
    mtp = jnp.zeros((brows, LANES), jnp.int32)
    for b in range(batch):
        mtp = jnp.where(row_i // rows == b, mts_ref[b], mtp)

    def step(d, u):
        ct_ref = cta_ref if u % 2 == 0 else ctb_ref
        pend = penda_ref if u % 2 == 0 else pendb_ref
        cts = jnp.where(is_row0, pend[:], pltpu.roll(ct_ref[:], 1, axis=0))
        win = cts >> B
        E = jnp.where(
            win <= 2,
            jnp.where(win == 1, eq[0], eq[1]),
            jnp.where(win == 3, eq[2], eq[3]),
        )
        ubits = [(cts >> b) & 1 for b in range(B)]
        if lean1:
            nb0n, nb1n, U0, U1 = _plane_step_c(
                E, v_out[0][:], v_out[1][:], ubits[0], ubits[1]
            )
            Vn = [nb0n, nb1n]
            tp = ((U0 >> (WORD - 1)) & 1) | ((U1 >> (WORD - 2)) & 2)
        elif g == 1:
            b0n, b1n, tp = _plane_step(
                E, v_out[0][:], v_out[1][:], ubits[0], ubits[1]
            )
            Vn = [b0n, b1n]
        else:
            Vn, U = _g_plane_step(g, E, [r[:] for r in v_out], ubits)
            tp = (U[0] >> (WORD - 1)) & 1
            for b in range(1, B):
                tp = tp | ((U[b] >> (WORD - 1 - b)) & (1 << b))
        upd = (offs <= d - 1) & (offs >= d - mtp)
        for r, vn in zip(v_out, Vn):
            r[:] = jnp.where(upd, vn, r[:])
        ctn = tp | (cts & ~jnp.int32((1 << B) - 1))
        ct_ref[:] = ctn
        # one full lane roll (latency hidden by the 2-step slack) feeds every
        # pair's next-lane hand-off; each pair's row 0 for step d+2 is staged
        # with its step-(d+2) char already at lane 0
        rolled = pltpu.roll(ctn, 1, axis=1)
        nxt = chars_at(d + 1)  # chars for step d+2 (column index d+1)
        for b in range(batch):
            tail = b * rows + rows - 1
            r0 = b * rows
            pend[r0 : r0 + 1, :] = jnp.where(
                lane_row == 0, nxt[b] << B, rolled[tail : tail + 1, :],
            )

    def body(tt, _):
        d0 = unroll * tt + 1
        for u in range(unroll):
            step(d0 + u, u)
        return 0

    jax.lax.fori_loop(0, total // unroll, body, 0, unroll=False)
    if lean1:  # back to true encoding for the per-pair popcount reduce
        v_out[0][:] = v_out[0][:] ^ MASK31
        v_out[1][:] = v_out[1][:] ^ MASK31


@functools.lru_cache(maxsize=64)
def score_batch_fn(
    batch: int,
    m_cap: int,
    n_cap: int,
    cfg: ScoringConfig = ScoringConfig(),
    interpret: bool = False,
    lean: Optional[bool] = None,
):
    """Jittable batched scorer for serving: ``(texts, queries, mts, nqs) ->
    (batch,) scores``, all pairs padded to ``(m_cap, n_cap)`` with true
    lengths passed as data.  One dispatch fills every pair; see
    ``_batch_kernel_body``."""
    fam = family(cfg)
    if fam is None:
        raise ValueError(
            "batched scoring requires a bit-parallel scoring family"
        )
    g = fam[1]
    # same int32 headroom guard as score_fn: the device-side affine map
    # computes 2*mult*unit with unit up to ~g*(m+n)
    mult = cfg.match - cfg.mismatch
    if (abs(cfg.mismatch) + 2 * mult * g) * (m_cap + n_cap) >= 2**31:
        raise ValueError("scoring magnitudes too large for int32 headroom")
    B = 2 if g == 1 else max(1, (2 * g + 1).bit_length())
    unroll = UNROLL_INTERPRET if interpret else UNROLL
    nw = -(-n_cap // WORD)
    rows = _round_up(nw, GRAIN) // LANES
    if batch * rows * LANES > MAX_WORDS:
        raise ValueError("batch x query bucket too large for VMEM planes")
    total = _round_up(m_cap + 2 * (nw - 1), unroll)
    if (total + 2) * ((batch + 7) // 8) * 4 > 640 * 1024:
        raise ValueError(
            "batch text footprint exceeds the SMEM budget; batch scoring "
            "targets many small pairs — use score()/score_fn for large ones"
        )
    lean = LEAN_FLAGSHIP if lean is None else lean
    kernel = functools.partial(
        _batch_kernel_body, g, batch, rows, total, unroll, lean
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((batch * rows, LANES), jnp.int32)
            for _ in range(B)
        ),
        in_specs=[smem, smem, vmem],
        out_specs=tuple([vmem] * B),
        scratch_shapes=[
            pltpu.VMEM((batch * rows, LANES), jnp.int32),
            pltpu.VMEM((batch * rows, LANES), jnp.int32),
            pltpu.VMEM((batch * rows, LANES), jnp.int32),
            pltpu.VMEM((batch * rows, LANES), jnp.int32),
        ],
        interpret=interpret,
    )

    @jax.jit
    def fn(texts, queries, mts, nqs):
        # per-pair match planes, stacked along the row-block axis
        qpad = jnp.zeros((batch, nw * WORD), jnp.int32)
        qpad = jax.lax.dynamic_update_slice(
            qpad, queries.astype(jnp.int32), (0, 0)
        )
        bits = qpad.reshape(batch, nw, WORD)
        weights = jnp.asarray([1 << b for b in range(WORD)], jnp.int32)
        planes = []
        for cch in range(1, ALPHABET + 1):
            words = jnp.sum(
                jnp.where(bits == cch, weights[None, None, :], 0),
                axis=2, dtype=jnp.int32,
            )  # (batch, nw)
            pad = jnp.zeros((batch, rows * LANES), jnp.int32)
            pad = jax.lax.dynamic_update_slice(pad, words, (0, 0))
            planes.append(
                pad.reshape(batch, LANES, rows)
                .transpose(0, 2, 1)
                .reshape(batch * rows, LANES)
            )
        eq_planes = jnp.stack(planes)

        # column-major packing: row d holds all pairs' column-(d+1) chars
        wpb = (batch + 7) // 8
        tcm = jnp.zeros((total + 2, wpb * 8), jnp.int32)
        tcm = jax.lax.dynamic_update_slice(
            tcm, texts.astype(jnp.int32).T, (0, 0)
        )
        shifts = jnp.arange(8, dtype=jnp.int32) * 4
        tpacked = jnp.sum(
            tcm.reshape(total + 2, wpb, 8) << shifts[None, None, :],
            axis=2, dtype=jnp.int32,
        ).reshape(-1)

        planes = call(mts.astype(jnp.int32), tpacked, eq_planes)
        # per-pair valid mask from true query length
        word_idx = (
            jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1) * rows
            + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
        )
        nbits = jnp.clip(
            nqs[:, None, None] - WORD * word_idx[None, :, :], 0, WORD
        )
        valid = jnp.where(
            nbits >= WORD, jnp.int32(MASK31), (jnp.int32(1) << nbits) - 1
        )
        pc = lambda x: jnp.sum(  # noqa: E731
            jax.lax.population_count(x.reshape(batch, rows, LANES) & valid),
            axis=(1, 2),
        )
        enc = sum((1 << b) * pc(planes[b]) for b in range(B))
        unit = enc - g * (mts + nqs)
        return _from_unit(cfg, mts + nqs, unit)

    return fn


def score_batch(texts, queries, cfg: ScoringConfig = ScoringConfig(),
                *, interpret: bool = False) -> np.ndarray:
    """Score ``len(texts)`` pairs in one dispatch (lists of int sequences)."""
    batch = len(texts)
    assert batch == len(queries) and batch > 0
    m_cap = max(1, max(len(t) for t in texts))
    n_cap = max(1, max(len(q) for q in queries))
    fn = score_batch_fn(batch, m_cap, n_cap, cfg, interpret)
    tx = np.zeros((batch, m_cap), np.int32)
    qx = np.zeros((batch, n_cap), np.int32)
    mts = np.zeros(batch, np.int32)
    nqs = np.zeros(batch, np.int32)
    for i, (t, q) in enumerate(zip(texts, queries)):
        tx[i, : len(t)] = t
        qx[i, : len(q)] = q
        mts[i] = len(t)
        nqs[i] = len(q)
    return np.asarray(
        fn(jnp.asarray(tx), jnp.asarray(qx), jnp.asarray(mts),
           jnp.asarray(nqs))
    )


def _chunk_kernel_body(
    g: int,
    rows: int,
    t_steps: int,
    unroll: int,
    r_star: Optional[int],
    cap_slots,  # tuple of (slot_row, lane): per-step (1,1) h_out captures
    nw: Optional[int],  # real word count: enables the dynamic steady split
    lean: bool,  # g=1 only: complement-state inner step (_plane_step_c)
    # refs: d0/mt SMEM (2,), text SMEM (t_steps//8,), ustream SMEM
    # (t_steps // stream_epw(B) words, stream_epw(B) pow2-packed entries
    # per word), eq (ALPHABET, rows, LANES),
    # then B+3 state inputs (delta planes, cta, ctb, pend), B+3 state
    # outputs, optionally the (t_steps, LANES) tail capture (r_star), and
    # optionally the (t_steps, len(cap_slots)) multi-row capture: the
    # per-step bottom h_out of len(cap_slots) chosen words — the full
    # horizontal-delta streams of those DP rows, which the K-way Hirschberg
    # split turns into whole rows of H (one fill, many split points)
    *refs,
):
    """Resumable T-step slice of the bit-parallel wavefront (multi-chip).

    Same schedule and plane algebra as ``_bitpal_kernel_body`` with three
    differences for the sharded pipeline (``parallel/bitpal_strips.py``):
    state (v planes + hand-off ping-pongs) is carried in/out instead of
    initialized, word 0's ``h_top`` comes from a per-column 2-bit stream (the
    upstream chip's bottom h_out) instead of the constant DP boundary, and
    row ``r_star`` — holding the chip's last real word — is captured per step
    for the downstream chip.  ``t_steps`` and ``d0`` must be even so the
    ping-pong parity is continuous across chunk boundaries.  ``mt`` (the true
    text length, bounding the per-word freeze) is dynamic — callers with many
    distinct segment shapes (the Hirschberg bisection) bucket their padded
    shapes into a handful of compilations.  ``g`` selects the reduced scheme
    ``(1, 0, -g)``: g=1 runs the hand-tuned 2-bit plane step, g>=2 the
    generic B-bit plane algebra (``_g_plane_step``)."""
    B = 2 if g == 1 else max(1, (2 * g + 1).bit_length())
    lean1 = lean and g == 1  # complement-carry variant (round-3 lean)
    epw = stream_epw(B)  # ustream entries per int32 (power of two)
    eshift = epw.bit_length() - 1
    d0_ref, text_ref, ustream_ref, eq_ref = refs[:4]
    v_in = refs[4 : 4 + B]
    cta_in, ctb_in, pend_in = refs[4 + B : 7 + B]
    v_out = refs[7 + B : 7 + 2 * B]
    cta_out, ctb_out, pend_out = refs[7 + 2 * B : 10 + 2 * B]
    extra = list(refs[10 + 2 * B :])
    tail_out = extra.pop(0) if r_star is not None else None
    caps_out = extra.pop(0) if extra else None  # (t_steps, len(cap_slots))
    row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    offs = 2 * (row_i + rows * lane_i)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    eq = [eq_ref[c] for c in range(ALPHABET)]

    for r_out, r_in in zip(v_out, v_in):
        # lean: planes are carried complemented INSIDE the loop only — the
        # at-rest state stays true-encoding (resume/popcount contract
        # unchanged), at two plane-xors per chunk (~1e-3 of the step ops)
        r_out[:] = (r_in[:] ^ MASK31) if lean1 else r_in[:]
    cta_out[:] = cta_in[:]
    ctb_out[:] = ctb_in[:]
    pend_out[:] = pend_in[:]
    d0 = d0_ref[0]
    mt = d0_ref[1]

    def step(dl, u, freeze=True):
        d = d0 + dl  # global (chip-local cumulative) step
        ct_ref = cta_out if u % 2 == 0 else ctb_out
        val = (text_ref[(dl - 1) >> 3] >> (((dl - 1) & 7) << 2)) & 15
        ub = (
            ustream_ref[(dl - 1) >> eshift] >> (((dl - 1) & (epw - 1)) * B)
        ) & ((1 << B) - 1)
        pend_row = pend_out[u % 2 : u % 2 + 1, :]
        row0 = jnp.where(lane_row == 0, (val << B) | ub, pend_row)
        # one concat: the row-0 merge rides inside the sublane shift
        cts = jnp.concatenate([row0, ct_ref[: rows - 1]], axis=0)
        win = cts >> B
        E = jnp.where(
            win <= 2,
            jnp.where(win == 1, eq[0], eq[1]),
            jnp.where(win == 3, eq[2], eq[3]),
        )
        ubits = [(cts >> b) & 1 for b in range(B)]
        if lean1:
            nb0n, nb1n, U0, U1 = _plane_step_c(
                E, v_out[0][:], v_out[1][:], ubits[0], ubits[1]
            )
            Vn = [nb0n, nb1n]
            tp = ((U0 >> (WORD - 1)) & 1) | ((U1 >> (WORD - 2)) & 2)
        elif g == 1:
            b0n, b1n, tp = _plane_step(
                E, v_out[0][:], v_out[1][:], ubits[0], ubits[1]
            )
            Vn = [b0n, b1n]
        else:
            Vn, U = _g_plane_step(g, E, [r[:] for r in v_out], ubits)
            tp = (U[0] >> (WORD - 1)) & 1
            for b in range(1, B):
                tp = tp | ((U[b] >> (WORD - 1 - b)) & (1 << b))
        if freeze:
            upd = (offs <= d - 1) & (offs >= d - mt)
            for r, vn in zip(v_out, Vn):
                r[:] = jnp.where(upd, vn, r[:])
        else:  # steady: every real word inside [1, mt]; pads feed only pads
            for r, vn in zip(v_out, Vn):
                r[:] = vn
        ctn = tp | (cts & ~jnp.int32((1 << B) - 1))
        ct_ref[:] = ctn
        if tail_out is not None:  # score-only callers skip the capture
            tail_out[pl.ds(dl - 1, 1), :] = ctn[r_star : r_star + 1, :]
        if caps_out is not None:
            for j, (cr, cl) in enumerate(cap_slots):
                caps_out[pl.ds(dl - 1, 1), j : j + 1] = ctn[
                    cr : cr + 1, cl : cl + 1
                ]
        pend_out[u % 2 : u % 2 + 1, :] = pltpu.roll(
            ctn[rows - 1 : rows, :], 1, axis=1
        )

    def body(tt, _, freeze=True):
        dl0 = unroll * tt + 1
        for u in range(unroll):
            step(dl0 + u, u, freeze)
        return 0

    nblocks = t_steps // unroll
    if nw is None:
        jax.lax.fori_loop(0, nblocks, body, 0, unroll=False)
    else:
        # dynamic ramp/steady/drain: steady blocks (every real word live,
        # i.e. d0+dl in [2(nw-1)+1, mt]) skip the freeze mask's ops.  The
        # bounds are traced (d0/mt are runtime scalars); using the padded
        # word count only shrinks the steady window (safe).
        d_lo = 2 * (nw - 1) + 1
        tt0 = jnp.clip(-(-(d_lo - 1 - d0) // unroll), 0, nblocks)
        tt1 = jnp.clip((mt - d0) // unroll, tt0, nblocks)
        jax.lax.fori_loop(0, tt0, body, 0, unroll=False)
        jax.lax.fori_loop(
            tt0, tt1, functools.partial(body, freeze=False), 0,
            unroll=False,
        )
        jax.lax.fori_loop(tt1, nblocks, body, 0, unroll=False)
    if lean1:  # back to true encoding for the at-rest state contract
        v_out[0][:] = v_out[0][:] ^ MASK31
        v_out[1][:] = v_out[1][:] ^ MASK31


def chunk_call(
    d0_mt: jax.Array,  # (2,) int32: [step base (even), true text length mt]
    text_chunk: jax.Array,  # (t_steps//8,) packed chars
    ustream: jax.Array,  # (t_steps//16,) packed 2-bit h_top values
    eq_planes: jax.Array,
    state,  # tuple of B+3 arrays: delta planes..., cta, ctb, pend
    *,
    rows: int,
    t_steps: int,
    r_star: Optional[int],
    unroll: Optional[int] = None,
    interpret: bool = False,
    g: int = 1,
    cap_slots=None,  # tuple of (slot_row, lane): multi-row h_out streams
    nw: Optional[int] = None,  # real word count: enables the steady split
    lean: Optional[bool] = None,  # g=1 complement-carry step; None = default
):
    """Run one T-step chunk; returns ``(new_state, tail_rows[, caps])``.

    ``r_star=None`` skips the boundary-stream capture (score-only callers),
    returning tail ``None`` and saving the (t_steps, 128) buffer.
    ``cap_slots`` adds a third result: a (t_steps, J) buffer of the chosen
    words' per-step bottom h_out packs (K-way Hirschberg row streams)."""
    if unroll is None:
        unroll = UNROLL_INTERPRET if interpret else UNROLL
    assert t_steps % unroll == 0 and t_steps % 16 == 0
    B = 2 if g == 1 else max(1, (2 * g + 1).bit_length())
    assert len(state) == B + 3, (len(state), B)
    caps = tuple(cap_slots) if cap_slots else None
    lean = LEAN_FLAGSHIP if lean is None else lean
    kernel = functools.partial(
        _chunk_kernel_body, g, rows, t_steps, unroll, r_star, caps, nw, lean
    )
    state_shapes = [jax.ShapeDtypeStruct(s.shape, s.dtype) for s in state]
    with_tail = r_star is not None
    n_state = B + 3
    out_shape = tuple(state_shapes)
    if with_tail:
        out_shape += (jax.ShapeDtypeStruct((t_steps, LANES), jnp.int32),)
    if caps:
        out_shape += (
            jax.ShapeDtypeStruct((t_steps, len(caps)), jnp.int32),
        )
    n_out = len(out_shape)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[smem, smem, smem] + [vmem] * (n_state + 1),
        out_specs=tuple([vmem] * n_out),
        interpret=interpret,
    )(d0_mt, text_chunk, ustream, eq_planes, *state)
    result = (out[:n_state], out[n_state] if with_tail else None)
    if caps:
        return result + (out[-1],)
    return result


def init_chunk_state(rows: int, g: int = 1):
    """Initial kernel state: column-0 DP boundary — v = -g everywhere,
    i.e. enc 0, so every delta plane starts zero."""
    B = 2 if g == 1 else max(1, (2 * g + 1).bit_length())
    z = jnp.zeros((rows, LANES), jnp.int32)
    return tuple([z] * B) + (
        z,  # cta
        z,  # ctb
        jnp.zeros((SUBLANES, LANES), jnp.int32),  # pend
    )


#: lean flagship schedule (concat-fused shifts, split hand-off planes,
#: complement state) — A/B switch for the silicon bench; exactness of both
#: paths is covered by the CPU suite
LEAN_FLAGSHIP = os.environ.get("TPUALIGN_LEAN_FLAGSHIP", "1") != "0"


@functools.partial(
    jax.jit, static_argnames=("mt", "rows", "total", "unroll", "nw",
                     "interpret", "lean")
)
def _bitpal_call(
    text_staged: jax.Array,
    eq_planes: jax.Array,
    mt: int,
    rows: int,
    total: int,
    unroll: int,
    nw: int,
    interpret: bool,
    lean: Optional[bool] = None,
):
    lean = LEAN_FLAGSHIP if lean is None else lean
    body = _bitpal_kernel_body_lean if lean else _bitpal_kernel_body
    kernel = functools.partial(body, mt, rows, total, unroll, nw)
    out_shape = tuple(
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32) for _ in range(2)
    )
    if lean:
        # char + 2 raw h_out planes, each ping-ponged by step parity
        scratch = [pltpu.VMEM((rows, LANES), jnp.int32)] * 6 + [
            pltpu.VMEM((SUBLANES, LANES), jnp.int32)
        ]
    else:
        scratch = [
            pltpu.VMEM((rows, LANES), jnp.int32),  # hand-off words, even
            pltpu.VMEM((rows, LANES), jnp.int32),  # hand-off words, odd
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),  # rolled-tail ping-pong
        ]
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(2)
        ),
        scratch_shapes=scratch,
        interpret=interpret,
    )(text_staged, eq_planes)


def _pack_text(text: jax.Array, mt: int) -> jax.Array:
    """Pack text chars 8-per-int32 (4 bits each) for SMEM scalar reads."""
    n_words = -(-mt // 8)
    tpad = jnp.zeros((n_words * 8,), jnp.int32)
    tpad = jax.lax.dynamic_update_slice(tpad, text.astype(jnp.int32), (0,))
    shifts = jnp.arange(8, dtype=jnp.int32) * 4
    return jnp.sum(
        tpad.reshape(n_words, 8) << shifts[None, :], axis=1, dtype=jnp.int32
    )


def _colmajor(words: jax.Array, rows: int) -> jax.Array:
    """(nw,) word array -> (rows, 128) with word ``w`` at
    ``(w % rows, w // rows)``."""
    out = jnp.zeros((rows * LANES,), jnp.int32)
    out = jax.lax.dynamic_update_slice(out, words.astype(jnp.int32), (0,))
    return out.reshape(LANES, rows).T


def _eq_planes(query: jax.Array, nq: int, nw: int, rows: int) -> jax.Array:
    """(ALPHABET, rows, 128) int32: bit ``b`` of word ``w`` of plane ``c-1``
    set iff ``query[31w + b] == c``; words placed column-major."""
    qpad = jnp.zeros((nw * WORD,), jnp.int32)
    qpad = jax.lax.dynamic_update_slice(qpad, query.astype(jnp.int32), (0,))
    bits = qpad.reshape(nw, WORD)
    weights = jnp.asarray([1 << b for b in range(WORD)], jnp.int32)
    planes = []
    for c in range(1, ALPHABET + 1):
        words = jnp.sum(
            jnp.where(bits == c, weights[None, :], 0), axis=1, dtype=jnp.int32
        )
        planes.append(_colmajor(words, rows))
    return jnp.stack(planes)


def _layout(nq: int, mt: int, unroll: int = UNROLL):
    """Static geometry: words, padded rows, rounded step count.

    The last word's final column lands at step ``mt + 2 * (nw - 1)`` (the
    kernel staggers word ``w`` by ``2w`` steps)."""
    nw = -(-nq // WORD)
    rows = _round_up(nw, GRAIN) // LANES
    total = _round_up(mt + 2 * (nw - 1), unroll)
    return nw, rows, total


def _orientation(m: int, n: int):
    """Choose which sequence becomes the query (bit axis): minimize padded
    work = steps x padded slots.  Ties go to the longer query (fewer steps)."""

    def cost(nq, mt):
        nw, rows, total = _layout(nq, mt)
        return total * rows * LANES

    return cost(m, n) <= cost(n, m)  # True: s1 is the query


def _valid_mask(nq: int, nw: int, rows: int) -> np.ndarray:
    mask = np.zeros(rows * LANES, np.int32)
    mask[:nw] = MASK31
    r = nq - WORD * (nw - 1)
    mask[nw - 1] = (1 << r) - 1
    return mask.reshape(LANES, rows).T  # column-major word placement


def _reduce_score(planes, valid, mt: int, nq: int, g: int = 1) -> jax.Array:
    """H(nq, mt) = -g*mt + sum of final-column deltas; per row the delta is
    ``enc - g = sum_b 2^b plane_b  -  g``."""
    pc = lambda x: jnp.sum(jax.lax.population_count(x & valid))  # noqa: E731
    enc = sum((1 << b) * pc(pl_) for b, pl_ in enumerate(planes))
    return enc - g * (mt + nq)


def score(
    s1,
    s2,
    cfg: ScoringConfig = ScoringConfig(),
    *,
    interpret: bool = False,
) -> int:
    """NW score via the bit-parallel kernel (scoring family ``(k, 0, -k)``)."""
    if supported_scale(cfg) is None:
        raise ValueError(
            "bitpal engine requires global scoring affinely reducible to "
            "(1, 0, -g) for integer 1 <= g <= 7; use impl='pallas' or 'xla'"
        )
    s1 = jnp.asarray(s1, jnp.int32)
    s2 = jnp.asarray(s2, jnp.int32)
    m, n = int(s1.shape[0]), int(s2.shape[0])
    if m == 0 or n == 0:
        return cfg.gap * (m + n)
    fn = score_fn(m, n, cfg, interpret=interpret)
    return int(fn(s1, s2))


#: single-dispatch text cap: packed text lives in SMEM (8 chars/int32, so
#: 768 KB at the cap — a 2M-char text put the buffer at the full 1 MB SMEM
#: and Mosaic compilation never returned); longer texts scan the resumable
#: chunk kernel over text slices with state carried on-device
TEXT_SMEM_CAP = 3 << 19


@functools.partial(
    jax.jit, static_argnames=("mt", "rows", "total", "unroll", "rc",
                              "interpret", "lean")
)
def _rc_call(
    text_packed: jax.Array,
    eq_planes: jax.Array,
    mt: int,
    rows: int,
    total: int,
    unroll: int,
    rc: int,
    interpret: bool,
    lean: Optional[bool] = None,
):
    lean = LEAN_FLAGSHIP if lean is None else lean
    kernel = functools.partial(
        _rc_kernel_body, mt, rows, total, unroll, rc, lean
    )
    return pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32) for _ in range(2)
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(2)
        ),
        scratch_shapes=[
            pltpu.VMEM((rows, LANES), jnp.int32),
            pltpu.VMEM((SUBLANES, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(text_packed, eq_planes)


def _rc_chunk_kernel_body(
    rc: int,
    rows: int,
    t_steps: int,
    unroll: int,
    lean: bool,  # complement-carry inner step (_plane_step_c)
    # refs
    d0_ref,  # SMEM (2,): [global step base (chunk * t_steps), true mt]
    text_ref,  # SMEM (rc*t_steps//8,): this chunk's chars, packed
    eq_ref,  # (ALPHABET, rows, LANES)
    b0_in,
    b1_in,
    ct_in,
    pend_in,
    b0_out,
    b1_out,
    ct_out,
    pend_out,
):
    """Resumable T-step slice of the R-columns kernel (``_rc_kernel_body``).

    Serves the beyond-SMEM chunked-text path only: word 0's ``h_top`` is the
    constant DP boundary (u bits 0), exactly as in the single-shot kernel —
    the sharded pipeline's upstream-delta variant stays on the 1-column
    chunk kernel.  State: both delta planes, the single hand-off buffer
    (the in-lane stagger is 1 step, so no ping-pong), and the 2-row pend
    ring; parity is continuous across chunks because ``t_steps`` is even."""
    lam = rows + 1
    row_i = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    offs = row_i + lam * lane_i
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    eq = [eq_ref[c] for c in range(ALPHABET)]

    # lean: planes carried complemented inside the loop only; at-rest state
    # stays true-encoding (two plane-xors per chunk)
    b0_out[:] = (b0_in[:] ^ MASK31) if lean else b0_in[:]
    b1_out[:] = (b1_in[:] ^ MASK31) if lean else b1_in[:]
    ct_out[:] = ct_in[:]
    pend_out[:] = pend_in[:]
    tb0 = d0_ref[0]
    mt = d0_ref[1]

    def step(dl, u):
        t = tb0 + dl  # global step: word w covers columns (rc(t-offs-1), rc(t-offs)]
        cpack = jnp.int32(0)
        for c in range(rc):
            idx = rc * (dl - 1) + c  # chunk-local; padded to rc*t_steps
            ch = (text_ref[idx >> 3] >> ((idx & 7) << 2)) & 15
            cpack = cpack | (ch << (8 + 4 * c))
        pend_row = pend_out[u % 2 : u % 2 + 1, :]
        row0 = jnp.where(lane_row == 0, cpack, pend_row)
        # one concat: the row-0 merge rides inside the sublane shift
        cts = jnp.concatenate([row0, ct_out[: rows - 1]], axis=0)

        b0, b1 = b0_out[:], b1_out[:]
        colbase = rc * t - rc * offs - rc
        tpn = cts & ~jnp.int32((1 << (2 * rc)) - 1)
        for c in range(rc):
            win = (cts >> (8 + 4 * c)) & 15
            E = jnp.where(
                win <= 2,
                jnp.where(win == 1, eq[0], eq[1]),
                jnp.where(win == 3, eq[2], eq[3]),
            )
            u0 = (cts >> (2 * c)) & 1
            u1 = (cts >> (2 * c + 1)) & 1
            if lean:
                b0n, b1n, U0, U1 = _plane_step_c(E, b0, b1, u0, u1)
                tp = ((U0 >> (WORD - 1)) & 1) | ((U1 >> (WORD - 2)) & 2)
            else:
                b0n, b1n, tp = _plane_step(E, b0, b1, u0, u1)
            col = colbase + 1 + c
            upd = (col >= 1) & (col <= mt)
            b0 = jnp.where(upd, b0n, b0)
            b1 = jnp.where(upd, b1n, b1)
            tpn = tpn | (tp << (2 * c))
        b0_out[:] = b0
        b1_out[:] = b1
        ct_out[:] = tpn
        pend_out[u % 2 : u % 2 + 1, :] = pltpu.roll(
            tpn[rows - 1 : rows, :], 1, axis=1
        )

    def body(tt, _):
        dl0 = unroll * tt + 1
        for u in range(unroll):
            step(dl0 + u, u)
        return 0

    jax.lax.fori_loop(0, t_steps // unroll, body, 0, unroll=False)
    if lean:  # back to true encoding for the at-rest state contract
        b0_out[:] = b0_out[:] ^ MASK31
        b1_out[:] = b1_out[:] ^ MASK31


def init_rc_chunk_state(rows: int):
    """Initial rc-chunk state: column-0 boundary (all planes/hand-offs 0)."""
    z = jnp.zeros((rows, LANES), jnp.int32)
    return (z, z, z, jnp.zeros((SUBLANES, LANES), jnp.int32))


def rc_chunk_call(
    d0_mt: jax.Array,
    text_chunk: jax.Array,  # (rc*t_steps//8,) packed chars
    eq_planes: jax.Array,
    state,  # (b0, b1, ct, pend)
    *,
    rc: int,
    rows: int,
    t_steps: int,
    unroll: Optional[int] = None,
    interpret: bool = False,
    lean: Optional[bool] = None,
):
    """Run one T-step rc chunk; returns the new state tuple."""
    if unroll is None:
        unroll = UNROLL_INTERPRET if interpret else UNROLL
    assert t_steps % unroll == 0 and t_steps % 2 == 0
    lean = LEAN_FLAGSHIP if lean is None else lean
    kernel = functools.partial(
        _rc_chunk_kernel_body, rc, rows, t_steps, unroll, lean
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct(s.shape, s.dtype) for s in state
        ),
        in_specs=[smem, smem] + [vmem] * 5,
        out_specs=tuple([vmem] * 4),
        interpret=interpret,
    )(d0_mt, text_chunk, eq_planes, *state)
    return out


def score_fn(
    m: int,
    n: int,
    cfg: ScoringConfig = ScoringConfig(),
    *,
    interpret: bool = False,
    text_cap: int = TEXT_SMEM_CAP,
    cols_per_step: Optional[int] = None,
    lean: Optional[bool] = None,
):
    """Jitted ``(s1, s2) -> score`` for fixed lengths ``m = len(s1)``,
    ``n = len(s2)``.  ``cols_per_step`` > 1 selects the R-column kernel
    (``_rc_kernel_body``); the default (None) auto-selects: small word
    counts (rows <= 16, g = 1) run 4 columns per step, which amortizes the
    per-step hand-off machinery that dominates when each vector op covers
    only 1-2 vregs (measured: 1Mx10k 164 -> 303 GCUPS, 1Mx60k 1384 -> 1715;
    at corpus word counts rc=1 stays ahead, 64gb 2191 vs 1093).

    The returned function is ``jax.jit``-wrapped and cached per
    (shapes, config): through a high-latency host link the factory's
    packing/reduction ops would otherwise dispatch eagerly per call —
    measured at 3-68x on the chunked paths, whose scan and packing are
    whole-program."""
    lean = LEAN_FLAGSHIP if lean is None else lean
    return _score_fn_cached(m, n, cfg, interpret, text_cap, cols_per_step,
                            lean)


@functools.lru_cache(maxsize=64)
def _score_fn_cached(m, n, cfg, interpret, text_cap, cols_per_step,
                     lean=None):
    return jax.jit(
        _score_fn_build(m, n, cfg, interpret, text_cap, cols_per_step, lean)
    )


def _score_fn_build(
    m: int,
    n: int,
    cfg: ScoringConfig,
    interpret: bool,
    text_cap: int,
    cols_per_step: Optional[int],
    lean: Optional[bool] = None,
):
    if supported_scale(cfg) is None:
        raise ValueError(
            "bitpal engine requires unit-equivalent global scoring"
        )
    # the affine score map runs in int32 on device: keep headroom.  The
    # reduced unit score reaches ~g*(m+n) for g-family members, so the
    # 2*mult*unit term scales with g, not 1 (ADVICE r1).
    mult = cfg.match - cfg.mismatch
    gfam = family(cfg)[1]
    if (abs(cfg.mismatch) + 2 * mult * gfam) * (m + n) >= 2**31:
        raise ValueError("scoring magnitudes too large for int32 headroom")
    if m == 0 or n == 0:
        return lambda s1, s2: jnp.int32(cfg.gap * (m + n))
    s1_is_query = _orientation(m, n)
    nq, mt = (m, n) if s1_is_query else (n, m)
    unroll = UNROLL_INTERPRET if interpret else UNROLL
    nw, rows, total = _layout(nq, mt, unroll)
    if nw > MAX_WORDS:
        raise ValueError("sequence too long for the VMEM-resident kernel")
    valid = jnp.asarray(_valid_mask(nq, nw, rows))

    _, gval = family(cfg)
    rc = cols_per_step
    if rc is None:
        rc = 4 if (gval == 1 and rows <= 16) else 1
    elif not 1 <= rc <= 4:
        raise ValueError("cols_per_step must be in 1..4")
    elif rc > 1 and gval > 1:
        raise ValueError("cols_per_step > 1 requires the g=1 family")
    if gval > 1 and mt <= text_cap:
        B = max(1, (2 * gval + 1).bit_length())

        def fn_g(s1: jax.Array, s2: jax.Array) -> jax.Array:
            query, text = (s1, s2) if s1_is_query else (s2, s1)
            planes = _g_call(
                _pack_text(text, mt),
                _eq_planes(query, nq, nw, rows),
                gval, mt, rows, total, unroll, nw, interpret,
            )
            pc = lambda x: jnp.sum(  # noqa: E731
                jax.lax.population_count(x & valid)
            )
            enc_sum = sum((1 << b) * pc(planes[b]) for b in range(B))
            unit = enc_sum - gval * (mt + nq)
            return _from_unit(cfg, mt + nq, unit)

        return fn_g

    if mt > text_cap:
        if rc > 1 and gval == 1:
            return _score_chunked_rc_fn(
                s1_is_query, cfg, nq, mt, nw, rows, valid, unroll,
                text_cap, rc, interpret=interpret, lean=lean,
            )
        return _score_chunked_fn(
            s1_is_query, cfg, nq, mt, nw, rows, valid, unroll, text_cap,
            gval, interpret=interpret, lean=lean,
        )

    if rc > 1:
        lam = rows + 1
        max_off = (nw - 1) % rows + lam * ((nw - 1) // rows)
        total_rc = _round_up(-(-mt // rc) + max_off, unroll)

        def fn_rc(s1: jax.Array, s2: jax.Array) -> jax.Array:
            query, text = (s1, s2) if s1_is_query else (s2, s1)
            planes = _rc_call(
                _pack_text(text, mt),
                _eq_planes(query, nq, nw, rows),
                mt, rows, total_rc, unroll, rc, interpret, lean,
            )
            return _from_unit(cfg, mt + nq, _reduce_score(planes, valid, mt, nq))

        return fn_rc

    def fn(s1: jax.Array, s2: jax.Array) -> jax.Array:
        query, text = (s1, s2) if s1_is_query else (s2, s1)
        planes = _bitpal_call(
            _pack_text(text, mt),
            _eq_planes(query, nq, nw, rows),
            mt,
            rows,
            total,
            unroll,
            nw,
            interpret,
            lean,
        )
        return _from_unit(cfg, mt + nq, _reduce_score(planes, valid, mt, nq))

    return fn


def _score_chunked_rc_fn(
    s1_is_query: bool,
    cfg: ScoringConfig,
    nq: int,
    mt: int,
    nw: int,
    rows: int,
    valid: jax.Array,
    unroll: int,
    text_cap: int,
    rc: int,
    interpret: bool = False,
    lean: Optional[bool] = None,
):
    """Beyond-SMEM texts at ``rc`` columns per step: ``lax.scan`` of the
    resumable R-column chunk kernel (``_rc_chunk_kernel_body``).  The regime
    this serves — huge text x small query — is exactly where the per-step
    hand-off overhead dominates, so the rc amortization compounds with
    chunking (verdict r1 item #2)."""
    lam = rows + 1
    max_off = (nw - 1) % rows + lam * ((nw - 1) // rows)
    t_steps = _round_up(
        min(text_cap, TEXT_SMEM_CAP // 2) // rc, max(unroll, 16)
    )
    n_chunks = -(-(-(-mt // rc) + max_off) // t_steps)
    cpc = rc * t_steps  # chars per chunk

    def fn(s1: jax.Array, s2: jax.Array) -> jax.Array:
        query, text = (s1, s2) if s1_is_query else (s2, s1)
        eq = _eq_planes(query, nq, nw, rows)
        tpad = jnp.zeros((n_chunks * cpc,), jnp.int32)
        tpad = jax.lax.dynamic_update_slice(tpad, text.astype(jnp.int32), (0,))
        shifts = jnp.arange(8, dtype=jnp.int32) * 4
        tpacked = jnp.sum(
            tpad.reshape(n_chunks, cpc // 8, 8) << shifts[None, None, :],
            axis=2,
            dtype=jnp.int32,
        )

        def chunk(state, x):
            q, tchunk = x
            new_state = rc_chunk_call(
                jnp.stack([q * t_steps, jnp.int32(mt)]),
                tchunk,
                eq,
                state,
                rc=rc,
                rows=rows,
                t_steps=t_steps,
                unroll=unroll,
                interpret=interpret,
                lean=lean,
            )
            return new_state, None

        state, _ = jax.lax.scan(
            chunk,
            init_rc_chunk_state(rows),
            (jnp.arange(n_chunks, dtype=jnp.int32), tpacked),
        )
        unit = _reduce_score(state[:2], valid, mt, nq)
        return _from_unit(cfg, mt + nq, unit)

    return fn


def _score_chunked_fn(
    s1_is_query: bool,
    cfg: ScoringConfig,
    nq: int,
    mt: int,
    nw: int,
    rows: int,
    valid: jax.Array,
    unroll: int,
    text_cap: int,
    g: int = 1,
    interpret: bool = False,
    lean: Optional[bool] = None,
):
    """Texts beyond the SMEM budget: ``lax.scan`` of the resumable chunk
    kernel over text slices, bit-parallel state carried on-device.

    Per-chunk SMEM holds text (4 bits/char) AND the zero h_top stream
    (2 bits/col), so chunks cap at half the single-shot budget."""
    t_steps = _round_up(min(text_cap, TEXT_SMEM_CAP // 2), max(unroll, 16))
    n_chunks = -(-(mt + 2 * (nw - 1)) // t_steps)
    B = 2 if g == 1 else max(1, (2 * g + 1).bit_length())
    u_words = -(-t_steps // stream_epw(B))

    def fn(s1: jax.Array, s2: jax.Array) -> jax.Array:
        query, text = (s1, s2) if s1_is_query else (s2, s1)
        eq = _eq_planes(query, nq, nw, rows)
        tpad = jnp.zeros((n_chunks * t_steps,), jnp.int32)
        tpad = jax.lax.dynamic_update_slice(tpad, text.astype(jnp.int32), (0,))
        shifts = jnp.arange(8, dtype=jnp.int32) * 4
        tpacked = jnp.sum(
            tpad.reshape(n_chunks, t_steps // 8, 8) << shifts[None, None, :],
            axis=2,
            dtype=jnp.int32,
        )
        ustream = jnp.zeros((u_words,), jnp.int32)

        def chunk(state, x):
            q, tchunk = x
            new_state, _ = chunk_call(
                jnp.stack([q * t_steps, jnp.int32(mt)]),
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
                nw=nw,
                lean=lean,
            )
            return new_state, None

        state, _ = jax.lax.scan(
            chunk,
            init_chunk_state(rows, g),
            (jnp.arange(n_chunks, dtype=jnp.int32), tpacked),
        )
        unit = _reduce_score(state[:B], valid, mt, nq, g)
        return _from_unit(cfg, mt + nq, unit)

    return fn
