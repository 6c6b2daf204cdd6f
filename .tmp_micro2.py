import functools, time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES, ROWS = 128, 32
STEPS = 4_000_000

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

def shift1(a, s, i):
    r = pltpu.roll(a[:], 1, axis=1)
    d = pltpu.roll(r, 1, axis=0)
    a[:] = jnp.where(jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1) == 0, d, r)

def dynslice(a, s, i):
    row = s[1][pl.ds((i % 200) // LANES, 1), :]
    v = jnp.max(jnp.where(jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) == i % LANES, row, 0), axis=1, keepdims=True)
    a[:] = a[:] + v

def add8(a, s, i):
    x = a[:]
    for _ in range(8):
        x = x + i
    a[:] = x

CASES = {
    "empty": lambda a, s, i: None,
    "1 add": lambda a, s, i: a.__setitem__(slice(None), a[:] + i),
    "8 add chain": add8,
    "1 where": lambda a, s, i: a.__setitem__(slice(None), jnp.where(a[:] > 0, a[:] + i, a[:] - 1)),
    "roll lane": lambda a, s, i: a.__setitem__(slice(None), pltpu.roll(a[:], 1, axis=1) + i),
    "shift1 full": shift1,
    "dynslice": dynslice,
}

x = jnp.arange(ROWS * LANES, dtype=jnp.int32).reshape(ROWS, LANES)
for name, fn in CASES.items():
    run = make(fn)
    run(x).block_until_ready()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter(); run(x).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:12s} {best*1e3:8.1f} ms total  {best/STEPS*1e9:7.2f} ns/step  {best/STEPS*0.94e9:6.1f} cyc")
