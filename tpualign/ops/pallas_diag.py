"""Flagship single-chip Pallas kernel: anti-diagonal wavefront in VMEM.

Design
------
The reference parallelizes the row-major table fill with sentinel spin-waits
(``src/sentinel/*.cpp``), progress-index arrays (``src/idxarray/*.cpp``) and MPI
strip pipelines (``src/mpi/*.cpp``) because CPU threads race through a shared
O(N*M) int32 table.  On TPU none of that machinery survives: the dependency
structure of the recurrence (``serial.cpp:23-31``) is a wavefront, so we sweep
**anti-diagonals** — every cell of diagonal ``d`` depends only on diagonals
``d-1`` and ``d-2`` — and the entire synchronization problem collapses into a
``fori_loop``.  Because only the score is needed (the reference prints just
``t[size-1]``, ``driver.cpp:35``), the O(N*M) table is never materialized: two
rolling diagonal buffers of length ``min(N,M)+1`` hold all live state, so even
the "64gb" corpus pair (whose int32 table is 64 GB) runs entirely in VMEM with
zero HBM traffic in the hot loop.

Layout and step structure:

* A diagonal lives flat row-major in an ``(rows, 128)`` int32 VMEM buffer;
  element ``k`` of diagonal ``d`` is cell ``(i=k, j=d-k)``.
* The recurrence needs each predecessor diagonal both aligned and shifted by
  one (``new[k] = max(D2[k-1]+sub, D1[k-1]+g, D1[k]+g)``), so every diagonal is
  kept together with its shifted copy and two buffer pairs alternate by
  parity: each step performs exactly **one** shift (of the fresh diagonal).
  A flat shift-by-one is a lane roll plus a sublane roll of the lane-127
  column (``pltpu.roll``) — circular, wrapping the last element to slot 0.
* The substitution operand ``s1[d-1-k]`` is a sliding reversed window of
  ``s1`` that rolls by one each step.  Mosaic forbids scalar VMEM stores and
  dynamic lane indexing, so the per-step insert of ``s1[d-1]`` at slot 0 is
  done fully vectorized: a dynamic *sublane* slice picks the (1, 128) row of
  a staged copy of ``s1``, a lane-mask reduce extracts the element, and a
  ``where`` on the (precomputed) slot-0 mask merges it into the rolled window.
* Boundary cells (``H[0][j] = j*gap``, ``H[i][0] = i*gap``, ``serial.cpp:16-17``)
  mostly *emerge from the recurrence itself* (see the comment in the kernel
  body): with dead slots at ~-2^30 the j=0 boundary column is produced by the
  shifted previous boundary, and only slot 0 needs an explicit select.

Out-of-band cells (``k > d`` or ``k < d-M``) are provably never read by valid
cells (their dependencies stay in range), so no per-step masking is needed for
global alignment; Smith-Waterman masks only its running-max accumulator.
The branchless bit-trick max of the reference (``a - (((a-b)>>31)&(a-b))``)
and its x86 spin-wait assembly both become plain vector ``maximum``/``where``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ensure_pair_modes, ScoringConfig

LANES = 128
SUBLANES = 8
GRAIN = LANES * SUBLANES  # one full (8,128) int32 tile
NEG_INF = -(2**30)

#: VMEM budget guard: the kernel keeps ~8 diagonal-sized int32 buffers resident.
MAX_DIAG_ELEMS = 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_to_grid(v: jax.Array, rows: int, fill: int = 0) -> jax.Array:
    """Flat int32 vector -> (rows, 128) row-major buffer, ``fill`` padded."""
    out = jnp.full((rows * LANES,), fill, dtype=jnp.int32)
    out = jax.lax.dynamic_update_slice(out, v.astype(jnp.int32), (0,))
    return out.reshape(rows, LANES)


def _shift_down_one(v: jax.Array) -> jax.Array:
    """Circular flat-order shift by one: out[k] = v[(k-1) mod size].

    In (sublane, lane) layout: a lane roll, with the lane-0 column patched from
    the previous sublane's lane-127 value (wrapping the buffer tail to slot 0).
    Both rolls act on the full buffer — a narrow (rows, 1) strided roll would
    serialize into per-sublane ops.
    """
    rolled = pltpu.roll(v, 1, axis=1)
    down = pltpu.roll(rolled, 1, axis=0)  # down[r, 0] = v[r-1, 127]
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(lane == 0, down, rolled)


#: substeps fused per loop iteration (amortizes loop control and lets the
#: scheduler overlap the independent window-insert chains of adjacent steps)
UNROLL = 8


def _wavefront_core(
    n, m, rows, cfg, s1_ref, s2v_ref, w_ref, v_ref, a_refs, dbest_ref=None
):
    """Shared wavefront machinery: returns ``(init, emit, k_flat)``.

    ``init()`` seeds the state; ``emit(d, u)`` runs diagonal ``d`` where ``u``
    is its (static) position in an unrolled run starting at an odd diagonal.

    Global mode: boundaries *emerge from the recurrence*.  With all dead
    slots initialized to ~-2^30, the j=0 boundary cell at slot k=d computes
    itself: its only live dependency is As[d] = (previous boundary) + gap,
    both dead candidates staying ~NEG (they drift by <= |match| per step).
    Valid-region values can leak upward into the tail slots (k > n) with a
    +gap-per-step decay chain and eventually wrap into slot 0 through the
    circular shift — which is why slot 0 (the i=0 boundary, value d*gap) is
    the single slot still fixed with a select.  Requires gap <= 0.
    Local mode keeps explicit masking: the zero floor would otherwise let
    dead slots accrete garbage matches above the true maximum.

    State is two (diagonal, shifted-copy) buffer pairs alternating by
    parity; entering step d the pair written two steps ago still holds
    shift(diag d-2), so each step performs exactly one shift (of its own
    fresh output) and no buffer copies.
    """
    match = jnp.int32(cfg.match)
    mismatch = jnp.int32(cfg.mismatch)
    g = jnp.int32(cfg.gap)
    local = cfg.is_local
    a0_ref, a0s_ref, a1_ref, a1s_ref = a_refs

    k_flat = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    )
    k_is0 = k_flat == 0
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

    def init():
        if local:
            zero = jnp.zeros((rows, LANES), dtype=jnp.int32)
            a0_ref[:] = zero
            a0s_ref[:] = zero
            a1_ref[:] = zero
            a1s_ref[:] = zero
            v_ref[:] = zero
            if dbest_ref is not None:
                dbest_ref[:] = zero
        else:
            neg = jnp.full((rows, LANES), NEG_INF, jnp.int32)
            a0_ref[:] = jnp.where(k_is0, 0, neg)  # diag 0: H(0,0) = 0
            a0s_ref[:] = jnp.where(k_flat == 1, 0, neg)  # its shifted copy
            a1_ref[:] = neg
            a1s_ref[:] = neg
        w_ref[:] = jnp.zeros((rows, LANES), dtype=jnp.int32)

    def advance_window(w, d):
        # w_flat[k] = s1[d-1-k].  New element s1[d-1] enters at slot 0
        # (clamped index: d-1 >= m only feeds dead columns); slots that rolled
        # in before step 1 are dead likewise.  The char comes from SMEM via
        # the scalar core (8 chars per int32): a vector-lane extract here
        # would put an ~80-cycle cross-lane reduce on the loop-carried chain.
        idx = jnp.minimum(d - 1, m - 1)
        val = (s1_ref[idx >> 3] >> ((idx & 7) << 2)) & 15
        return jnp.where(k_is0, val, _shift_down_one(w))

    def one_diag(d, w, a, as_, bs):
        """Compute diagonal d from values; returns (new, sub window w)."""
        w = advance_window(w, d)
        sub = jnp.where(s2v_ref[:] == w, match, mismatch)
        new = jnp.maximum(bs + sub, jnp.maximum(a, as_) + g)
        if local:
            new = jnp.maximum(new, 0)
            valid = (k_flat >= jnp.maximum(1, d - m)) & (
                k_flat <= jnp.minimum(d - 1, n)
            )
            masked = jnp.where(valid, new, NEG_INF)
            if dbest_ref is not None:
                improved = masked > v_ref[:]
                dbest_ref[:] = jnp.where(improved, d, dbest_ref[:])
                v_ref[:] = jnp.where(improved, masked, v_ref[:])
            else:
                v_ref[:] = jnp.maximum(v_ref[:], masked)
            new = jnp.where(k_is0 | (k_flat == d), 0, new)
        else:
            new = jnp.where(k_is0, d * g, new)
        return new, w

    def substep(d, a_ref, as_ref, oa_ref, oas_ref):
        # oas still holds shift(diag d-2) on entry (written two steps ago)
        new, w = one_diag(d, w_ref[:], a_ref[:], as_ref[:], oas_ref[:])
        w_ref[:] = w
        oa_ref[:] = new
        oas_ref[:] = _shift_down_one(new)

    def emit(d, u):
        if u % 2 == 0:
            substep(d, a0_ref, a0s_ref, a1_ref, a1s_ref)
        else:
            substep(d, a1_ref, a1s_ref, a0_ref, a0s_ref)

    return init, emit, k_flat


def _diag_kernel_body(
    n: int,
    m: int,
    rows: int,
    cfg: ScoringConfig,
    s1_ref,
    s2v_ref,
    out_ref,
    a0_ref,
    a0s_ref,
    a1_ref,
    a1s_ref,
    w_ref,
    v_ref,
):
    """See module docstring.  n = len(s2) (diagonal/buffer axis), m = len(s1)."""
    total = n + m  # diagonals 1..total
    init, emit, k_flat = _wavefront_core(
        n, m, rows, cfg, s1_ref, s2v_ref, w_ref, v_ref,
        (a0_ref, a0s_ref, a1_ref, a1s_ref),
    )
    init()

    def body(tt, _):
        d0 = UNROLL * tt + 1
        for u in range(UNROLL):
            emit(d0 + u, u)
        return 0

    done = (total // UNROLL) * UNROLL
    jax.lax.fori_loop(0, total // UNROLL, body, 0, unroll=False)
    for r in range(total - done):  # static remainder: no guarded steps
        emit(done + r + 1, r)

    if cfg.is_local:
        out_ref[0, 0] = jnp.max(v_ref[:])
    else:
        final_ref = a1_ref if total % 2 == 1 else a0_ref
        out_ref[0, 0] = jnp.max(jnp.where(k_flat == n, final_ref[:], NEG_INF))


def _diag_ckpt_kernel_body(
    n: int,
    m: int,
    rows: int,
    k_stride: int,
    groups: int,
    cfg: ScoringConfig,
    s1_ref,
    s2v_ref,
    # outputs
    cka_ref,  # (groups, rows, LANES) ANY: diag c*K   (even parity buffer)
    ckb_ref,  # (groups, rows, LANES) ANY: diag c*K-1 (odd parity buffer)
    v_out,  # (rows, LANES) VMEM: SW running max (unused for NW)
    dbest_out,  # (rows, LANES) VMEM: SW argmax diagonal (unused for NW)
    # scratch
    a0_ref,
    a0s_ref,
    a1_ref,
    a1s_ref,
    w_ref,
    sem,
):
    """Checkpointing wavefront: spill the (diag cK, diag cK-1) state pair to
    HBM before each K-step group.  The host-side diagonal-band traceback
    (``ops/traceback_diag.py``) exactly refills any band from one checkpoint.
    The last group may overrun past the final diagonal — the overrun steps
    compute dead values that no checkpoint or consumer ever reads."""
    assert k_stride % UNROLL == 0 and k_stride % 2 == 0
    init, emit, _ = _wavefront_core(
        n, m, rows, cfg, s1_ref, s2v_ref, w_ref, v_out,
        (a0_ref, a0s_ref, a1_ref, a1s_ref),
        dbest_ref=dbest_out if cfg.is_local else None,
    )
    init()

    def group(c, _):
        dma_a = pltpu.make_async_copy(a0_ref, cka_ref.at[c], sem.at[0])
        dma_b = pltpu.make_async_copy(a1_ref, ckb_ref.at[c], sem.at[1])
        dma_a.start()
        dma_b.start()
        dma_a.wait()
        dma_b.wait()

        def body(tt, _):
            d0 = c * k_stride + UNROLL * tt + 1
            for u in range(UNROLL):
                emit(d0 + u, u)
            return 0

        jax.lax.fori_loop(0, k_stride // UNROLL, body, 0, unroll=False)
        return 0

    jax.lax.fori_loop(0, groups, group, 0, unroll=False)


@functools.partial(
    jax.jit, static_argnames=("n", "m", "rows", "s1_rows", "cfg", "interpret")
)
def _diag_call(
    s1_staged: jax.Array,
    s2v_pad: jax.Array,
    n: int,
    m: int,
    rows: int,
    s1_rows: int,
    cfg: ScoringConfig,
    interpret: bool,
) -> jax.Array:
    kernel = functools.partial(_diag_kernel_body, n, m, rows, cfg)
    scratch = [pltpu.VMEM((rows, LANES), jnp.int32) for _ in range(4)]
    scratch.append(pltpu.VMEM((rows, LANES), jnp.int32))
    scratch.append(pltpu.VMEM((rows, LANES), jnp.int32))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(s1_staged, s2v_pad)
    return out[0, 0]


@functools.partial(
    jax.jit,
    static_argnames=("n", "m", "rows", "k_stride", "groups", "cfg", "interpret"),
)
def _diag_ckpt_call(
    s1_staged: jax.Array,
    s2v_pad: jax.Array,
    n: int,
    m: int,
    rows: int,
    k_stride: int,
    groups: int,
    cfg: ScoringConfig,
    interpret: bool,
):
    kernel = functools.partial(
        _diag_ckpt_kernel_body, n, m, rows, k_stride, groups, cfg
    )
    out_shape = (
        jax.ShapeDtypeStruct((groups, rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((groups, rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
    )
    out_specs = (
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    scratch = [pltpu.VMEM((rows, LANES), jnp.int32) for _ in range(5)]
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(s1_staged, s2v_pad)


def forward_checkpoints(
    s1,
    s2,
    cfg: ScoringConfig = ScoringConfig(),
    *,
    k_stride: int = 1024,
    interpret: bool = False,
):
    """Run the wavefront spilling diagonal-pair checkpoints every ``k_stride``
    steps.  Orientation is preserved (``s1`` = columns, ``s2`` = rows — the
    diagonal buffer axis); no swap, since the caller recovers a path.

    Returns ``(cka, ckb, v, dbest, rows, groups)`` as device arrays:
    ``cka[c]`` = diagonal ``c*k_stride``, ``ckb[c]`` = diagonal ``c*k_stride-1``
    (flat (rows,128) buffers, dead slots ~-2^30 for NW / garbage for SW);
    ``v``/``dbest`` = SW per-slot running max and its diagonal index.
    """
    s1 = jnp.asarray(s1, dtype=jnp.int32)
    s2 = jnp.asarray(s2, dtype=jnp.int32)
    m, n = int(s1.shape[0]), int(s2.shape[0])
    if n + 2 > MAX_DIAG_ELEMS:
        raise ValueError("s2 too long for the VMEM-resident kernel")
    _check_cfg(cfg, n + m)
    k_stride = _round_up(k_stride, UNROLL)
    total = n + m
    groups = -(-total // k_stride)
    s1_staged, s2v_pad, n, m, rows, s1_rows = _prepare(s1, s2)
    return (
        *_diag_ckpt_call(
            s1_staged, s2v_pad, n, m, rows, k_stride, groups, cfg, interpret
        ),
        rows,
        groups,
    )


def _prepare(
    s1: jax.Array, s2: jax.Array
) -> Tuple[jax.Array, jax.Array, int, int, int, int]:
    """Pack ``s1`` 8-chars-per-int32 for SMEM scalar reads and build the
    shifted-s2 buffer (``s2v[k] = s2[k-1]``)."""
    m = int(s1.shape[0])
    n = int(s2.shape[0])
    rows = _round_up(n + 2, GRAIN) // LANES
    n_words = -(-m // 8)
    s1_rows = n_words  # retained in the signature for callers
    tpad = jnp.zeros((n_words * 8,), jnp.int32)
    tpad = jax.lax.dynamic_update_slice(tpad, s1.astype(jnp.int32), (0,))
    shifts = jnp.arange(8, dtype=jnp.int32) * 4
    s1_packed = jnp.sum(
        tpad.reshape(n_words, 8) << shifts[None, :], axis=1, dtype=jnp.int32
    )
    s2v = jnp.pad(s2.astype(jnp.int32), (1, 0), constant_values=-1)
    s2v_pad = _pad_to_grid(s2v, rows, fill=-1)
    return s1_packed, s2v_pad, n, m, rows, s1_rows


def _check_cfg(cfg: ScoringConfig, total: int) -> None:
    """The natural-boundary global kernel needs gap <= 0 (always true for real
    alignment scoring) and headroom so dead-slot drift stays inside int32."""
    if cfg.is_affine:
        raise ValueError(
            "affine gaps are outside the flat wavefront kernel's envelope; "
            "use impl='xla' (or 'oracle')")
    if not cfg.is_local and cfg.gap > 0:
        raise ValueError("global Pallas kernel requires gap <= 0; use impl='xla'")
    drift = total * max(abs(cfg.gap), abs(cfg.match), abs(cfg.mismatch), 1)
    if drift > 2**29:
        raise ValueError("scoring magnitudes too large for int32 headroom")


def score(
    s1,
    s2,
    cfg: ScoringConfig = ScoringConfig(),
    *,
    interpret: bool = False,
) -> int:
    """Alignment score via the VMEM anti-diagonal kernel.

    The shorter sequence is placed on the diagonal (buffer) axis — the score is
    symmetric under swapping, and this minimizes resident state.
    """
    ensure_pair_modes(cfg, "pallas_diag")
    s1 = jnp.asarray(s1, dtype=jnp.int32)
    s2 = jnp.asarray(s2, dtype=jnp.int32)
    if s1.shape[0] == 0 or s2.shape[0] == 0:
        if cfg.is_local:
            return 0
        return cfg.gap * (s1.shape[0] + s2.shape[0])
    if s2.shape[0] > s1.shape[0]:
        s1, s2 = s2, s1
    if s2.shape[0] + 2 > MAX_DIAG_ELEMS:
        raise ValueError(
            f"sequence too long for the VMEM-resident kernel "
            f"({s2.shape[0]} > {MAX_DIAG_ELEMS - 2}); use the sharded engine"
        )
    _check_cfg(cfg, s1.shape[0] + s2.shape[0])
    s1_staged, s2v_pad, n, m, rows, s1_rows = _prepare(s1, s2)
    return int(
        _diag_call(s1_staged, s2v_pad, n, m, rows, s1_rows, cfg, interpret)
    )


def score_fn(
    m: int,
    n: int,
    cfg: ScoringConfig = ScoringConfig(),
    *,
    interpret: bool = False,
):
    """Jittable ``(s1, s2) -> score`` for fixed lengths (bench/compile checks).

    ``m = len(s1)`` must be >= ``n = len(s2)`` (no data-dependent swap inside
    jit); callers pass the longer sequence first.
    """
    ensure_pair_modes(cfg, "pallas_diag")
    if n > m:
        raise ValueError("pass the longer sequence first (m >= n)")
    _check_cfg(cfg, n + m)

    def fn(s1: jax.Array, s2: jax.Array) -> jax.Array:
        s1_staged, s2v_pad, _, _, rows, s1_rows = _prepare(s1, s2)
        return _diag_call(s1_staged, s2v_pad, n, m, rows, s1_rows, cfg, interpret)

    return fn
