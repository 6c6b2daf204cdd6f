"""Scratch: bitpal kernel optimization variants, timed on the 64gb pair."""
import functools, time, sys
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpualign.ops.pallas_diag import GRAIN, LANES, _round_up, _shift_down_one
from tpualign.ops.bitpal import (
    WORD, MASK31, _plane_step, _stage, _eq_planes, _layout, _orientation,
    _valid_mask, _reduce_score,
)
from tpualign.io.bdna import read_bdna
from tpualign.ops import bitpal


def kernel_v2(mt, rows, total, unroll, text_ref, eq_ref,
              vm1_out, v1_out, v2_out, v0_ref, ct_ref, capm1, cap1, cap2):
    """Variant: combined (win<<4 | tp) buffer -> one slot-shift per step;
    capture column-mt planes instead of freezing; E=0 on pre-start slots."""
    k_flat = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    )
    k_is0 = k_flat == 0
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    eq = [eq_ref[c] for c in range(4)]

    neg = jnp.zeros((rows, LANES), jnp.int32)
    vm1_out[:] = jnp.full((rows, LANES), MASK31, jnp.int32)
    v0_ref[:] = neg
    v1_out[:] = neg
    v2_out[:] = neg
    capm1[:] = jnp.full((rows, LANES), MASK31, jnp.int32)
    cap1[:] = neg
    cap2[:] = neg
    ct_ref[:] = jnp.full((rows, LANES), 2, jnp.int32)  # dead: win=0, tp=h1

    def step(d):
        idx = jnp.minimum(d - 1, mt - 1)
        row = text_ref[pl.ds(idx // LANES, 1), :]
        val = jnp.max(
            jnp.where(lane_row == idx % LANES, row, 0), axis=1, keepdims=True
        )
        comb = jnp.where(k_is0, (val << 4) | 8, _shift_down_one(ct_ref[:]))
        win = comb >> 4
        E = jnp.where(
            win == 1, eq[0],
            jnp.where(win == 2, eq[1],
                      jnp.where(win == 3, eq[2],
                                jnp.where(win == 4, eq[3], 0))),
        )
        h2 = comb & 1
        h1 = (comb >> 1) & 1
        h0 = (comb >> 2) & 1
        hm1 = (comb >> 3) & 1
        vm1n, v0n, v1n, v2n, tp = _plane_step(
            E, vm1_out[:], v0_ref[:], v1_out[:], v2_out[:], h2, h1, h0, hm1
        )
        vm1_out[:] = vm1n
        v0_ref[:] = v0n
        v1_out[:] = v1n
        v2_out[:] = v2n
        cap = k_flat == d - mt
        capm1[:] = jnp.where(cap, vm1n, capm1[:])
        cap1[:] = jnp.where(cap, v1n, cap1[:])
        cap2[:] = jnp.where(cap, v2n, cap2[:])
        ct_ref[:] = tp | (win << 4)

    def body(tt, _):
        d0 = unroll * tt + 1
        for u in range(unroll):
            step(d0 + u)
        return 0

    jax.lax.fori_loop(0, total // unroll, body, 0, unroll=False)
    # final capture happens at d = mt + k for slot k; ok since loop runs past
    vm1_out[:] = capm1[:]
    v1_out[:] = cap1[:]
    v2_out[:] = cap2[:]


@functools.partial(jax.jit, static_argnames=("mt", "rows", "total", "unroll"))
def call_v2(text_staged, eq_planes, mt, rows, total, unroll):
    kernel = functools.partial(kernel_v2, mt, rows, total, unroll)
    out_shape = tuple(jax.ShapeDtypeStruct((rows, LANES), jnp.int32) for _ in range(3))
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)),
        scratch_shapes=[pltpu.VMEM((rows, LANES), jnp.int32) for _ in range(5)],
    )(text_staged, eq_planes)


def score_v2(s1, s2, unroll):
    m, n = len(s1), len(s2)
    s1_is_query = _orientation(m, n)
    nq, mt = (m, n) if s1_is_query else (n, m)
    nw, rows, _ = _layout(nq, mt)
    # capture of slot k fires at d = mt + k <= mt + nw - 1 + ... need total >= mt + nw
    total = _round_up(mt + nw, unroll)
    t_rows = _round_up(mt, GRAIN) // LANES
    valid = jnp.asarray(_valid_mask(nq, nw, rows))
    q, t = (s1, s2) if s1_is_query else (s2, s1)
    planes = call_v2(
        _stage(jnp.asarray(t, jnp.int32), t_rows),
        _eq_planes(jnp.asarray(q, jnp.int32), nq, nw, rows),
        mt, rows, total, unroll,
    )
    return int(_reduce_score(planes, valid, mt))


def timeit(fn, *args):
    fn(*args)  # compile+warm
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t0)
    return best


if __name__ == "__main__":
    s1 = read_bdna("/root/reference/bdna/64gb-1.bdna")
    s2 = read_bdna("/root/reference/bdna/64gb-2.bdna")
    sm1 = read_bdna("/root/reference/bdna/smid1.bdna")
    sm2 = read_bdna("/root/reference/bdna/smid2.bdna")
    cells = len(s1) * len(s2)

    # correctness of v2 on small inputs first
    from tpualign.ops import oracle
    from tpualign.config import ScoringConfig
    for mm, nn in [(50, 53), (31, 64), (200, 130), (1000, 997)]:
        from tpualign.io.bdna import random_pair
        a, b = random_pair(mm, nn, seed=mm + nn)
        w = oracle.score(a, b, ScoringConfig())
        g = score_v2(a, b, 8)
        assert g == w, (mm, nn, g, w)
    print("v2 correctness ok; smid:", score_v2(sm1, sm2, 8), "(want 5839)")

    for unroll in (4, 8, 16, 32):
        # baseline (current production kernel) honors UNROLL=8 only; time v2
        t = timeit(lambda u=unroll: score_v2(s1, s2, u))
        print(f"v2 unroll={unroll}: {t*1e3:.1f} ms  {cells/t/1e9:.0f} GCUPS")

    # production kernel baseline at its fixed unroll
    fn = jax.jit(bitpal.score_fn(len(s1), len(s2)))
    d1, d2 = jnp.asarray(s1, jnp.int32), jnp.asarray(s2, jnp.int32)
    t = timeit(lambda: fn(d1, d2).block_until_ready())
    print(f"v1 (production): {t*1e3:.1f} ms  {cells/t/1e9:.0f} GCUPS")
