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

def slope(body_fn, label, s1=400_000, nscratch=4):
    t1 = timed(body_fn, s1, nscratch)
    t2 = timed(body_fn, 2 * s1, nscratch)
    per = (t2 - t1) / s1
    print(f"{label:30s} {per*1e9:7.2f} ns/step {per*0.94e9:6.1f} cyc")

def adds_only(n):
    def f(a, sc, i):
        x = a[:]
        outs = [x + (i ^ k) for k in range(n)]
        while len(outs) > 1:
            outs = [outs[j] ^ outs[j+1] for j in range(0, len(outs)-1, 2)] + ([outs[-1]] if len(outs) % 2 else [])
        a[:] = outs[0]
    return f

def roll_plus_adds(n):
    def f(a, sc, i):
        x = a[:]
        b = sc[1]
        # roll on an INDEPENDENT buffer; result stored to separate scratch
        b[:] = pltpu.roll(b[:], 1, axis=1)
        outs = [x + (i ^ k) for k in range(n)]
        while len(outs) > 1:
            outs = [outs[j] ^ outs[j+1] for j in range(0, len(outs)-1, 2)] + ([outs[-1]] if len(outs) % 2 else [])
        a[:] = outs[0]
    return f

def narrowroll_plus_adds(n):
    def f(a, sc, i):
        x = a[:]
        b = sc[1]
        b[0:1, :] = pltpu.roll(b[0:1, :], 1, axis=1)
        outs = [x + (i ^ k) for k in range(n)]
        while len(outs) > 1:
            outs = [outs[j] ^ outs[j+1] for j in range(0, len(outs)-1, 2)] + ([outs[-1]] if len(outs) % 2 else [])
        a[:] = outs[0]
    return f

slope(adds_only(64), "64 indep ops")
slope(roll_plus_adds(64), "64 indep + 1 indep roll")
slope(narrowroll_plus_adds(64), "64 indep + narrow roll")
slope(adds_only(128), "128 indep ops")
slope(roll_plus_adds(128), "128 indep + 1 indep roll")
