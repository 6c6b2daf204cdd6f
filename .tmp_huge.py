import time, jax, jax.numpy as jnp
from tpualign.ops import bitpal
from tpualign.io.bdna import random_pair
m, n = 2_500_000, 2_480_000
s1, s2 = random_pair(m, n, seed=42)
fn = jax.jit(bitpal.score_fn(m, n))
d1, d2 = jnp.asarray(s1, jnp.int32), jnp.asarray(s2, jnp.int32)
t0 = time.perf_counter()
sc = int(fn(d1, d2).block_until_ready())
print(f"compile+run {time.perf_counter()-t0:.1f}s score {sc}")
t0 = time.perf_counter()
sc = int(fn(d1, d2).block_until_ready())
dt = time.perf_counter() - t0
print(f"2.5Mx2.48M (24.8 TB int32 table equivalent): {dt:.2f}s  {m*n/dt/1e9:.0f} GCUPS")
