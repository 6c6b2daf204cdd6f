import time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES, ROWS = 128, 32
STEPS = 2_000_000

def make(body_fn):
    def kernel(x_ref, o_ref, a, b):
        a[:] = x_ref[:]
        def body(i, _):
            body_fn(a, b, i)
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
            scratch_shapes=[pltpu.VMEM((ROWS, LANES), jnp.int32) for _ in range(2)],
        )(x)
    return run

def shift1(a, b, i):
    r = pltpu.roll(a[:], 1, axis=1)
    d = pltpu.roll(r, 1, axis=0)
    a[:] = jnp.where(jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1) == 0, d, r) + i

CASES = {
    "1 add":  lambda a, b, i: a.__setitem__(slice(None), a[:] + i),
    "8 chain": lambda a, b, i: a.__setitem__(slice(None), (((((((a[:] + i) ^ 3) & 0x7FFFFFFF) | 1) + i) ^ 5) & 0x3FFFFFFF) + i),
    "shift1+add": shift1,
}
xs = [jnp.full((ROWS, LANES), s, jnp.int32) for s in range(6)]
for name, fn in CASES.items():
    run = make(fn)
    run(xs[5]).block_until_ready()
    times = []
    for s in range(4):
        t0 = time.perf_counter()
        run(xs[s]).block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"{name:10s} calls(ms): {[f'{t*1e3:.1f}' for t in times]}  best {best/STEPS*1e9:6.2f} ns/step {best/STEPS*0.94e9:5.1f} cyc")
