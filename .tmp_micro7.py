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
    print(f"{label:28s} {per*1e9:7.2f} ns/step {per*0.94e9:6.1f} cyc")

lane0 = None

def roll_sub(a, sc, i):
    a[:] = pltpu.roll(a[:], 1, axis=0) + i

def roll_lane(a, sc, i):
    a[:] = pltpu.roll(a[:], 1, axis=1) + i

def slice_shift_lane(a, sc, i):
    x = a[:]
    a[:] = jnp.concatenate([x[:, LANES-1:], x[:, :LANES-1]], axis=1) + i

def slice_shift_sub(a, sc, i):
    x = a[:]
    a[:] = jnp.concatenate([x[ROWS-1:, :], x[:ROWS-1, :]], axis=0) + i

def full_shift_flat(a, sc, i):
    r = pltpu.roll(a[:], 1, axis=1)
    d = pltpu.roll(r, 1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    a[:] = jnp.where(lane == 0, d, r) + i

def full_shift_colmajor(a, sc, i):
    # word w at (row = w % ROWS, lane = w // ROWS): w-1 = row-1 (sublane roll),
    # row 0 patched from previous lane's row ROWS-1
    d = pltpu.roll(a[:], 1, axis=0)       # d[0,:] = a[ROWS-1,:]
    dl = pltpu.roll(d, 1, axis=1)         # previous lane
    row = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
    a[:] = jnp.where(row == 0, dl, d) + i

slope(roll_sub, "roll axis=0 (sublane)")
slope(roll_lane, "roll axis=1 (lane)")
slope(slice_shift_lane, "concat shift lane")
slope(slice_shift_sub, "concat shift sublane")
slope(full_shift_flat, "full flat shift (2 rolls)")
slope(full_shift_colmajor, "full colmajor (2 rolls)")
