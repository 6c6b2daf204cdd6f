"""Microbenchmark: serial-dependent op chains in a pallas fori_loop on (32,128)."""
import functools, time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES, ROWS, STEPS = 128, 32, 200_000

def make(body_fn, nscratch=2):
    def kernel(x_ref, o_ref, *scratch):
        a = scratch[0]
        a[:] = x_ref[:]
        def body(i, _):
            body_fn(a, scratch, i)
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
    return run

lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)

CASES = {
    "empty":        lambda a, s, i: None,
    "1 add":        lambda a, s, i: a.__setitem__(slice(None), a[:] + 1),
    "4 add chain":  lambda a, s, i: a.__setitem__(slice(None), ((a[:]+1)+(3))+((0))+(i)),
    "1 and":        lambda a, s, i: a.__setitem__(slice(None), a[:] & 0x7FFFFFF1),
    "1 where":      lambda a, s, i: a.__setitem__(slice(None), jnp.where(a[:] > 0, a[:] + 1, a[:] - 1)),
    "roll lane":    lambda a, s, i: a.__setitem__(slice(None), pltpu.roll(a[:], 1, axis=1)),
    "roll sub":     lambda a, s, i: a.__setitem__(slice(None), pltpu.roll(a[:], 1, axis=0)),
    "shift1 full":  None,  # filled below
    "dynslice":     None,
}
def shift1(a, s, i):
    r = pltpu.roll(a[:], 1, axis=1)
    d = pltpu.roll(r, 1, axis=0)
    a[:] = jnp.where(jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1) == 0, d, r)
CASES["shift1 full"] = shift1
def dynslice(a, s, i):
    row = s[1][pl.ds((i % 200) // LANES, 1), :]
    v = jnp.max(jnp.where(jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) == i % LANES, row, 0), axis=1, keepdims=True)
    a[:] = a[:] + v
CASES["dynslice"] = dynslice

x = jnp.arange(ROWS * LANES, dtype=jnp.int32).reshape(ROWS, LANES)
for name, fn in CASES.items():
    if fn is None: continue
    run = make(fn)
    run(x).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); run(x).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:12s} {best/STEPS*1e9:7.1f} ns/step  {best/STEPS*0.94e9:6.0f} cyc")

# scaling check: does wall time scale with STEPS at all?
import sys
for steps in (1000, 100_000, 400_000):
    STEPS = steps
    def body_add(a, s, i):
        a[:] = a[:] + i
    def kernel(x_ref, o_ref, a, b):
        a[:] = x_ref[:]
        def body(i, _):
            body_add(a, (a, b), i)
            return 0
        jax.lax.fori_loop(0, steps, body, 0, unroll=False)
        o_ref[:] = a[:]
    @jax.jit
    def run2(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((ROWS, LANES), jnp.int32) for _ in range(2)],
        )(x)
    r = run2(x); r.block_until_ready()
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter(); run2(x).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    print(f"steps={steps}: total {best*1e3:.3f} ms, {best/steps*1e9:.2f} ns/step, out[0,0]={int(r[0,0])}")
