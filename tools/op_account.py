"""Op-by-op account of the flagship kernel's steady-state step (verdict r2
item #4: 60 delivered ops/step vs the ~25-op plane-algebra floor — measure
what each block of wavefront machinery actually costs on this chip).

Method: a standalone Pallas microbench replicates the steady-state step of
``ops/bitpal.py::_bitpal_kernel_body`` (no freeze mask — the real kernel
skips it in ~92% of steps already) and ablates one machinery group at a
time, keeping the loop-carried dependency chain through the delta planes so
nothing dead-code-eliminates.  Cycles/step are measured by the slope method
(time at T and 2T in-kernel steps, subtract) — the only timing the tunnel's
~30 ms dispatch floor cannot pollute.

Groups (steady step, (32,128) int32 buffers = 4 vregs per op):
  echar    scalar text-char fetch + row-0 compose  (expected ~free: scalar core)
  ctsshift sublane roll + row-0 select of the char/h_top window
  eselect  match-plane select tree (2 compares + 3 selects)
  uunpack  h_top bit unpack (and/shift x2)
  tppack   bottom-row hand-off pack into the ct word
  pendroll lane roll of the hand-off row (expected ~free: off-chain)
  core     the plane algebra itself (floor)

Run on the chip: ``python tools/op_account.py``; feeds results/roofline.md.
"""

import sys
import time

sys.path.insert(0, ".")

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpualign.ops.bitpal import _plane_step, _plane_step_c, MASK31

ROWS, LANES, UNROLL = 32, 128, 16


def lean_kernel_body(T, text_ref, out_ref, b0, b1, cca, ccb, h0a, h0b,
                     h1a, h1b, pend):
    """Steady-state step of ``_bitpal_kernel_body_lean`` (round-3 schedule):
    concat-fused shifts, split hand-off planes, complement state — measured
    against the base step above to validate the modeled ~8-op cut."""
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    eq = [text_ref[c] * jnp.ones((ROWS, LANES), jnp.int32) for c in range(4)]
    for ref in (cca, ccb, h0a, h0b, h1a, h1b):
        ref[:] = jnp.zeros((ROWS, LANES), jnp.int32)
    b0[:] = jnp.full((ROWS, LANES), MASK31, jnp.int32)
    b1[:] = jnp.full((ROWS, LANES), MASK31, jnp.int32)
    pend[:] = jnp.zeros((8, LANES), jnp.int32)

    def step(d, u):
        p = u % 2
        cc = cca if p == 0 else ccb
        h0 = h0a if p == 0 else h0b
        h1 = h1a if p == 0 else h1b
        idx = jnp.minimum(d - 1, 63)
        val = (text_ref[idx >> 3] >> ((idx & 7) << 2)) & 15
        cc_row0 = jnp.where(lane_row == 0, val, pend[p : p + 1, :])
        h0_row0 = jnp.where(lane_row == 0, 0, pend[2 + p : 3 + p, :])
        h1_row0 = jnp.where(lane_row == 0, 0, pend[4 + p : 5 + p, :])
        cts_cc = jnp.concatenate([cc_row0, cc[: ROWS - 1]], axis=0)
        cts_h0 = jnp.concatenate([h0_row0, h0[: ROWS - 1]], axis=0)
        cts_h1 = jnp.concatenate([h1_row0, h1[: ROWS - 1]], axis=0)
        E = jnp.where(
            cts_cc <= 2,
            jnp.where(cts_cc == 1, eq[0], eq[1]),
            jnp.where(cts_cc == 3, eq[2], eq[3]),
        )
        u0 = (cts_h0 >> 30) & 1
        u1 = (cts_h1 >> 30) & 1
        nb0n, nb1n, U0, U1 = _plane_step_c(E, b0[:], b1[:], u0, u1)
        b0[:] = nb0n
        b1[:] = nb1n
        cc[:] = cts_cc
        h0[:] = U0
        h1[:] = U1
        pend[p : p + 1, :] = pltpu.roll(cts_cc[ROWS - 1 : ROWS, :], 1, axis=1)
        pend[2 + p : 3 + p, :] = pltpu.roll(U0[ROWS - 1 : ROWS, :], 1, axis=1)
        pend[4 + p : 5 + p, :] = pltpu.roll(U1[ROWS - 1 : ROWS, :], 1, axis=1)

    def body(tt, c):
        for u in range(UNROLL):
            step(UNROLL * tt + u + 1, u)
        return c

    jax.lax.fori_loop(0, T // UNROLL, body, 0, unroll=False)
    out_ref[:] = b0[:] ^ b1[:]


def build_lean(T):
    return pl.pallas_call(
        functools.partial(lean_kernel_body, T),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((ROWS, LANES), jnp.int32)] * 8
        + [pltpu.VMEM((8, LANES), jnp.int32)],
    )


def kernel_body(T, ablate, text_ref, out_ref, b0, b1, cta, ctb, pend):
    row_i = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    # four "eq" planes, derived from the real input so they stay live
    eq = [text_ref[c] * jnp.ones((ROWS, LANES), jnp.int32) for c in range(4)]
    b0[:] = jnp.zeros((ROWS, LANES), jnp.int32)
    b1[:] = jnp.zeros((ROWS, LANES), jnp.int32)
    cta[:] = jnp.zeros((ROWS, LANES), jnp.int32)
    ctb[:] = jnp.zeros((ROWS, LANES), jnp.int32)
    pend[:] = jnp.zeros((8, LANES), jnp.int32)

    def step(d, u):
        ct_ref = cta if u % 2 == 0 else ctb
        if ablate == "echar":
            row0 = pend[u % 2 : u % 2 + 1, :]
        else:
            idx = jnp.minimum(d - 1, 63)
            val = (text_ref[idx >> 3] >> ((idx & 7) << 2)) & 15
            row0 = jnp.where(lane_row == 0, val << 2, pend[u % 2:u % 2 + 1, :])
        if ablate == "ctsshift":
            cts = ct_ref[:]
        else:
            cts = jnp.where(row_i == 0, row0, pltpu.roll(ct_ref[:], 1, axis=0))
        if ablate == "eselect":
            E = eq[1] ^ cts  # keep cts live without the select tree
        else:
            win = cts >> 2
            E = jnp.where(
                win <= 2,
                jnp.where(win == 1, eq[0], eq[1]),
                jnp.where(win == 3, eq[2], eq[3]),
            )
        if ablate == "uunpack":
            u0 = cts
            u1 = cts
        else:
            u0 = cts & 1
            u1 = (cts >> 1) & 1
        if ablate == "core":
            b0n, b1n, tp = b0[:] ^ E, b1[:] ^ u0, u1
        else:
            b0n, b1n, tp = _plane_step(E, b0[:], b1[:], u0, u1)
        b0[:] = b0n
        b1[:] = b1n
        if ablate == "tppack":
            ctn = cts
        else:
            ctn = tp | (cts & ~jnp.int32(3))
        ct_ref[:] = ctn
        if ablate != "pendroll":
            pend[u % 2 : u % 2 + 1, :] = pltpu.roll(
                ctn[ROWS - 1 : ROWS, :], 1, axis=1
            )

    def body(tt, c):
        for u in range(UNROLL):
            step(UNROLL * tt + u + 1, u)
        return c

    jax.lax.fori_loop(0, T // UNROLL, body, 0, unroll=False)
    out_ref[:] = b0[:] ^ b1[:]


def build(T, ablate):
    return pl.pallas_call(
        functools.partial(kernel_body, T, ablate),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((ROWS, LANES), jnp.int32)] * 4
        + [pltpu.VMEM((8, LANES), jnp.int32)],
    )


def wall(fn, x, reps=5):
    # force a full host read every sample: through the axon relay a bare
    # block_until_ready on an unread buffer returns ~immediately (deferred
    # execution) and the r4 queue's op account read 0.0 cyc/step for every
    # group because of it
    np.asarray(fn(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(x))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    assert jax.default_backend() == "tpu", "run on the chip"
    # slope steps sized so the T2-T1 delta is ~100 ms of kernel time —
    # far above the tunnel's run-to-run noise (the r4 run used 1<<17/1<<18,
    # whose ~7 ms delta drowned and read ~0 cyc/step for every group)
    T1, T2 = 1 << 21, 1 << 22
    x = jnp.asarray(np.arange(64), jnp.int32)
    freq = 940e6  # v5e core clock
    rows = []
    for ablate in ("none", "echar", "ctsshift", "eselect", "uunpack",
                   "tppack", "pendroll", "core"):
        f1 = jax.jit(build(T1, ablate))
        f2 = jax.jit(build(T2, ablate))
        dt = wall(f2, x) - wall(f1, x)
        cyc = dt / (T2 - T1) * freq
        rows.append((ablate, cyc))
        print(f"{ablate:10s} {cyc:7.1f} cyc/step", flush=True)
    base = rows[0][1]
    print("\ndeltas vs full step (machinery group costs):")
    for name, cyc in rows[1:]:
        print(f"{name:10s} {base - cyc:+7.1f} cyc")
    # the round-3 lean schedule, same slope method: validates the modeled
    # ~8-op cut against the base step measured above
    f1 = jax.jit(build_lean(T1))
    f2 = jax.jit(build_lean(T2))
    cyc = (wall(f2, x) - wall(f1, x)) / (T2 - T1) * freq
    print(f"\n{'lean':10s} {cyc:7.1f} cyc/step "
          f"({base - cyc:+.1f} vs base schedule)", flush=True)


if __name__ == "__main__":
    main()
