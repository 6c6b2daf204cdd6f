import time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES, ROWS = 128, 32
STEPS = 1_000_000

def bench(body_fn, label, nscratch=4):
    def kernel(x_ref, o_ref, *sc):
        a = sc[0]
        a[:] = x_ref[:]
        def body(i, _):
            body_fn(a, sc, i)
            return 0
        jax.lax.fori_loop(0, STEPS, body, 0, unroll=False)
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
    xs = [jnp.full((ROWS, LANES), s + 1, jnp.int32) for s in range(3)]
    run(xs[0]).block_until_ready()
    best = float("inf")
    for s in range(3):
        t0 = time.perf_counter(); run(xs[s]).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:24s} {best/STEPS*1e9:7.2f} ns/step {best/STEPS*0.94e9:6.1f} cyc")

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
        # combine with a shallow tree (log depth) so work isn't DCEd
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

bench(dep(1), "dep chain 1")
bench(dep(4), "dep chain 4")
bench(dep(8), "dep chain 8")
bench(dep(16), "dep chain 16")
bench(dep(32), "dep chain 32")
bench(indep(16), "indep 16 (tree)")
bench(rollchain(1), "roll chain 1")
bench(rollchain(4), "roll chain 4")
