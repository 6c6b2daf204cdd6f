import time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES, ROWS = 128, 32

def timed(body_fn, steps, nscratch=4):
    def kernel(x_ref, o_ref, *sc):
        a = sc[0]
        a[:] = x_ref[:]
        def body(i, _):
            body_fn(a, sc, i)
            return 0
        jax.lax.fori_loop(0, steps, body, 0, unroll=False)
        o_ref[:] = a[:]
    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((ROWS, LANES), jnp.int32) for _ in range(nscratch)],
        )(x)
    x = jnp.full((ROWS, LANES), 3, jnp.int32)
    int(run(x)[0, 0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        int(run(x)[0, 0])
        ts.append(time.perf_counter() - t0)
    return min(ts)

def slope(body_fn, label, s1=500_000, nscratch=4):
    t1 = timed(body_fn, s1, nscratch)
    t2 = timed(body_fn, 2 * s1, nscratch)
    per = (t2 - t1) / s1
    print(f"{label:30s} {per*1e9:7.2f} ns/step {per*0.94e9:6.1f} cyc")

def roll_narrow1(a, sc, i):
    row = a[31:32, :]
    r = pltpu.roll(row, 1, axis=1)
    a[:] = a[:] + r + i

def roll_narrow8(a, sc, i):
    blk = a[24:32, :]
    r = pltpu.roll(blk, 1, axis=1)
    a[0:8, :] = a[0:8, :] + r
    a[:] = a[:] + i

def lane_offset_copy(a, sc, i):
    b = sc[1]
    b[0:1, 1:128] = a[31:32, 0:127]
    a[:] = a[:] + b[:] + i

def sub_shift_plus_patch(a, sc, i):
    x = a[:]
    sh = jnp.concatenate([x[ROWS-1:, :], x[:ROWS-1, :]], axis=0)
    row = pltpu.roll(x[31:32, :], 1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    row0 = jnp.where(lane == 0, i, row)
    a[:] = jnp.concatenate([row0, sh[1:, :]], axis=0)

def dyn_row_write(a, sc, i):
    b = sc[1]
    b[pl.ds(i % 32, 1), :] = a[31:32, :] + i
    a[:] = a[:] + b[pl.ds((i + 16) % 32, 1), :]

slope(roll_narrow1, "roll (1,128) lane")
slope(roll_narrow8, "roll (8,128) lane")
slope(lane_offset_copy, "lane-offset slice copy", nscratch=4)
slope(sub_shift_plus_patch, "sub-shift + narrow patch")
slope(dyn_row_write, "dynamic row write+read")
