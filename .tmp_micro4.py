import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES, ROWS = 128, 32
STEPS = 2_000_000

def kernel(x_ref, o_ref, a, b):
    a[:] = x_ref[:]
    def body(i, _):
        a[:] = a[:] + i
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

x = jnp.zeros((ROWS, LANES), jnp.int32)
t0 = time.perf_counter()
r = run(x).block_until_ready()
print("first call:", (time.perf_counter()-t0), "s")
want = sum(range(STEPS)) % (1 << 32)
if want >= 1 << 31: want -= 1 << 32
print("out:", int(r[0][0]), "want:", want, "match:", int(r[0][0]) == want)
t0 = time.perf_counter(); run(x).block_until_ready(); print("second:", time.perf_counter()-t0)
y = jnp.ones((ROWS, LANES), jnp.int32)
t0 = time.perf_counter(); r2 = run(y).block_until_ready(); print("fresh input:", time.perf_counter()-t0, int(r2[0][0]))
