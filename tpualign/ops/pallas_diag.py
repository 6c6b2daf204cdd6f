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
  ``s1``.  Instead of per-step scalar inserts (Mosaic forbids scalar VMEM
  stores), the *entire* reversed, padded ``s1`` sits in one circular buffer
  that rolls by one each step; the window is simply its first ``rows`` rows.
* Boundary cells (``H[0][j] = j*gap``, ``H[i][0] = i*gap``, ``serial.cpp:16-17``)
  are applied with an iota mask ``where`` *before* the shift, so the shifted
  copy inherits them — fully vectorized, no scalar stores anywhere.

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

from ..config import ScoringConfig

LANES = 128
SUBLANES = 8
GRAIN = LANES * SUBLANES  # one full (8,128) int32 tile
NEG_INF = -(2**30)

#: VMEM budget guard: the kernel keeps ~8 diagonal-sized int32 buffers resident.
MAX_DIAG_ELEMS = 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_to_grid(v: jax.Array, rows: int) -> jax.Array:
    """Flat int32 vector -> (rows, 128) row-major buffer, zero padded."""
    out = jnp.zeros((rows * LANES,), dtype=jnp.int32)
    out = jax.lax.dynamic_update_slice(out, v.astype(jnp.int32), (0,))
    return out.reshape(rows, LANES)


def _shift_down_one(v: jax.Array) -> jax.Array:
    """Circular flat-order shift by one: out[k] = v[(k-1) mod size].

    In (sublane, lane) layout: a lane roll, with the lane-0 column patched from
    the previous sublane's lane-127 value (wrapping the buffer tail to slot 0).
    """
    rolled = pltpu.roll(v, 1, axis=1)
    col = rolled[:, 0:1]  # = v[:, 127]
    colr = pltpu.roll(col, 1, axis=0)  # colr[r] = v[r-1, 127]
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(lane == 0, colr, rolled)


def _diag_kernel_body(
    n: int,
    m: int,
    rows: int,
    cfg: ScoringConfig,
    b0_ref,
    s2v_ref,
    out_ref,
    a0_ref,
    a0s_ref,
    a1_ref,
    a1s_ref,
    b_ref,
    v_ref,
):
    """See module docstring.  n = len(s2) (diagonal/buffer axis), m = len(s1)."""
    match = jnp.int32(cfg.match)
    mismatch = jnp.int32(cfg.mismatch)
    g = jnp.int32(cfg.gap)
    local = cfg.is_local
    total = n + m  # diagonals 1..total

    zero = jnp.zeros((rows, LANES), dtype=jnp.int32)
    a0_ref[:] = zero  # holds diag 0: H(0,0)=0 at k=0; rest never read
    a0s_ref[:] = zero  # shift(diag 0): zero at k=1 required
    a1_ref[:] = zero
    a1s_ref[:] = zero
    b_ref[:] = b0_ref[:]  # circular reversed-s1 feed
    if local:
        v_ref[:] = zero

    k_flat = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    )
    k_is0 = k_flat == 0

    def substep(d, a_ref, as_ref, oa_ref, oas_ref):
        # advance the reversed-s1 window: b_flat[k] = s1[d-1-k] (dead slots pad)
        b_ref[:] = _shift_down_one(b_ref[:])
        sub = jnp.where(s2v_ref[:] == b_ref[0:rows, :], match, mismatch)
        new = jnp.maximum(
            oas_ref[:] + sub,  # oas still holds shift(diag d-2)
            jnp.maximum(a_ref[:], as_ref[:]) + g,
        )
        if local:
            new = jnp.maximum(new, 0)
            # interior cells only: k=0 / k=d are boundaries (0 in SW), and the
            # out-of-band region accretes garbage that must not feed the max
            valid = (k_flat >= jnp.maximum(1, d - m)) & (
                k_flat <= jnp.minimum(d - 1, n)
            )
            v_ref[:] = jnp.maximum(v_ref[:], jnp.where(valid, new, NEG_INF))
        # boundary cells (0, d) at k=0 and (d, 0) at k=d, applied BEFORE the
        # shift so the shifted copy inherits them at k=1 / k=d+1.  For d > n
        # the k==d slot is out-of-band (never read) so no guard is needed.
        bval = jnp.int32(0) if local else d * g
        new = jnp.where(k_is0 | (k_flat == d), bval, new)
        oa_ref[:] = new
        oas_ref[:] = _shift_down_one(new)

    def body(tt, _):
        d0 = 2 * tt + 1
        substep(d0, a0_ref, a0s_ref, a1_ref, a1s_ref)
        substep(d0 + 1, a1_ref, a1s_ref, a0_ref, a0s_ref)
        return 0

    jax.lax.fori_loop(0, (total + 1) // 2, body, 0, unroll=False)

    if local:
        out_ref[0, 0] = jnp.max(v_ref[:])
    else:
        final_ref = a1_ref if total % 2 == 1 else a0_ref
        out_ref[0, 0] = jnp.max(jnp.where(k_flat == n, final_ref[:], NEG_INF))


@functools.partial(
    jax.jit, static_argnames=("n", "m", "rows", "brows", "cfg", "interpret")
)
def _diag_call(
    b0: jax.Array,
    s2v_pad: jax.Array,
    n: int,
    m: int,
    rows: int,
    brows: int,
    cfg: ScoringConfig,
    interpret: bool,
) -> jax.Array:
    kernel = functools.partial(_diag_kernel_body, n, m, rows, cfg)
    scratch = [pltpu.VMEM((rows, LANES), jnp.int32) for _ in range(4)]
    scratch.append(pltpu.VMEM((brows, LANES), jnp.int32))
    scratch.append(pltpu.VMEM((rows, LANES), jnp.int32))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=scratch,
        interpret=interpret,
    )(b0, s2v_pad)
    return out[0, 0]


def _prepare(
    s1: jax.Array, s2: jax.Array
) -> Tuple[jax.Array, jax.Array, int, int, int, int]:
    """Build the circular reversed-s1 feed and the shifted-s2 buffer.

    The feed ``b0`` satisfies ``roll(b0, d)[k] = s1[d-1-k]`` wherever that
    index is live, i.e. ``b0[t] = s1_ext[size-1-t]`` with ``s1_ext`` zero
    padded to the buffer size (>= n+m+2 so no live slot is ever overrun).
    """
    m = int(s1.shape[0])
    n = int(s2.shape[0])
    rows = _round_up(n + 2, GRAIN) // LANES
    size = _round_up(n + m + 2, GRAIN)
    brows = size // LANES
    s1_ext = jnp.zeros((size,), dtype=jnp.int32)
    s1_ext = jax.lax.dynamic_update_slice(s1_ext, s1.astype(jnp.int32), (0,))
    b0 = jnp.flip(s1_ext).reshape(brows, LANES)
    s2v = jnp.pad(s2.astype(jnp.int32), (1, 0), constant_values=-1)
    s2v_pad = _pad_to_grid(s2v, rows)
    return b0, s2v_pad, n, m, rows, brows


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
    b0, s2v_pad, n, m, rows, brows = _prepare(s1, s2)
    return int(_diag_call(b0, s2v_pad, n, m, rows, brows, cfg, interpret))


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
    if n > m:
        raise ValueError("pass the longer sequence first (m >= n)")

    def fn(s1: jax.Array, s2: jax.Array) -> jax.Array:
        b0, s2v_pad, _, _, rows, brows = _prepare(s1, s2)
        return _diag_call(b0, s2v_pad, n, m, rows, brows, cfg, interpret)

    return fn
