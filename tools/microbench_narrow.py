"""Microbenchmark: narrow-int (int16/int8) VPU issue cost on this chip.

Decides the design of the band engine's packed-cell representation
(VERDICT r2 item #1): if Mosaic issues int16 vector ops at one vreg per
(16,128) elements — i.e. 2 DP cells per 32-bit lane — the band kernel's
issue-bound schedule doubles its cells/cycle for free; int8 would be 4x.

Method: slope.  A kernel runs K dependent steps of an op mix over an
(ROWS, 128) buffer; time at K and 2K through one dispatch each and
subtract, eliminating the ~30 ms tunnel floor.  Comparing int32 vs int16
vs int8 at the same *element* shape isolates the per-vreg issue cost.

Run on the real chip: `python tools/microbench_narrow.py`.
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 128
LANES = 128
FREQ = 940e6  # v5e nominal clock


def _mix_kernel(steps, n_ops, dtype, use_roll, x_ref, o_ref, a_ref, b_ref):
    one = jnp.ones((ROWS, LANES), dtype)

    def body(t, _):
        a = a_ref[:]
        b = b_ref[:]
        for _ in range(n_ops // 2):
            a = jnp.maximum(a, b) + one
            b = b + a
        if use_roll:
            a = pltpu.roll(a, 1, axis=0)
        a_ref[:] = a
        b_ref[:] = b
        return 0

    a_ref[:] = x_ref[:]
    b_ref[:] = x_ref[:] + one
    jax.lax.fori_loop(0, steps, body, 0, unroll=False)
    o_ref[:] = a_ref[:]


@functools.partial(jax.jit, static_argnames=("steps", "n_ops", "dtype",
                                             "use_roll"))
def _run(x, steps, n_ops, dtype, use_roll):
    kernel = functools.partial(_mix_kernel, steps, n_ops, dtype, use_roll)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((ROWS, LANES), dtype)] * 2,
    )(x)


def slope(dtype, n_ops=16, use_roll=False, k=20000):
    x = jnp.ones((ROWS, LANES), dtype)
    walls = []
    for steps in (k, 2 * k):
        r = _run(x, steps, n_ops, dtype, use_roll)
        r.block_until_ready()
        t0 = time.perf_counter()
        r = _run(x, steps, n_ops, dtype, use_roll)
        r.block_until_ready()
        walls.append(time.perf_counter() - t0)
    dt = walls[1] - walls[0]
    cyc_per_step = dt / k * FREQ
    return cyc_per_step


def correctness_roll():
    """pltpu.roll(axis=0) semantics on packed narrow types vs int32."""
    out = {}
    for dtype in (jnp.int32, jnp.int16, jnp.int8):
        x = jnp.arange(ROWS * LANES, dtype=dtype).reshape(ROWS, LANES) % 100

        def k(x_ref, o_ref):
            o_ref[:] = pltpu.roll(x_ref[:], 1, axis=0)

        try:
            r = pl.pallas_call(
                k,
                out_shape=jax.ShapeDtypeStruct((ROWS, LANES), dtype),
            )(x)
            ok = bool(jnp.all(r == jnp.roll(x, 1, axis=0)))
            out[str(dtype.__name__)] = "OK" if ok else "WRONG"
        except Exception as e:  # noqa
            out[str(dtype.__name__)] = f"FAIL: {str(e)[:80]}"
    return out


if __name__ == "__main__":
    print("roll-correctness:", correctness_roll())
    for use_roll in (False, True):
        for dtype in (jnp.int32, jnp.int16, jnp.int8):
            try:
                c = slope(dtype, use_roll=use_roll)
                # vregs swept per step at n_ops=16:
                # int32: 16 ops * ROWS/8 vregs; int16: ROWS/16; int8: ROWS/32
                print(f"dtype={dtype.__name__:6s} roll={use_roll} "
                      f"cyc/step={c:7.1f}")
            except Exception as e:
                print(f"dtype={dtype.__name__:6s} roll={use_roll} "
                      f"FAILED: {str(e)[:100]}")
