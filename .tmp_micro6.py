import time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from functools import partial

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
    r = run(x); print("  probe value:", int(r[0, 0]))  # force full sync
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        v = int(run(x)[0, 0])   # force a device->host read: cannot be async
        ts.append(time.perf_counter() - t0)
    return min(ts)

def slope(body_fn, label, s1=1_000_000, nscratch=4):
    t1 = timed(body_fn, s1, nscratch)
    t2 = timed(body_fn, 2 * s1, nscratch)
    per = (t2 - t1) / s1
    print(f"{label:22s} t1={t1*1e3:7.1f}ms t2={t2*1e3:7.1f}ms  {per*1e9:7.2f} ns/step {per*0.94e9:6.1f} cyc")

def dep(n):
    def f(a, sc, i):
        x = a[:]
        for k in range(n):
            x = x + (i ^ k)
        a[:] = x
    return f

def indep(n):
    def f(a, sc, i):
        x = a[:]
        outs = [x + (i ^ k) for k in range(n)]
        while len(outs) > 1:
            outs = [outs[j] ^ outs[j + 1] for j in range(0, len(outs) - 1, 2)] + ([outs[-1]] if len(outs) % 2 else [])
        a[:] = outs[0]
    return f

def rollchain(n):
    def f(a, sc, i):
        x = a[:]
        for k in range(n):
            x = pltpu.roll(x, 1, axis=1)
        a[:] = x + i
    return f

slope(dep(1), "dep 1")
slope(dep(8), "dep 8")
slope(dep(32), "dep 32")
slope(indep(16), "indep 16")
slope(rollchain(1), "roll 1")
slope(rollchain(4), "roll 4")
