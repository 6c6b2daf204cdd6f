import time, numpy as np, jax, jax.numpy as jnp
from tpualign.ops import bitpal
from tpualign.io.bdna import read_bdna

s1 = read_bdna("/root/reference/bdna/64gb-1.bdna")
s2 = read_bdna("/root/reference/bdna/64gb-2.bdna")
m, n = len(s1), len(s2)
cells = m * n
fn = jax.jit(bitpal.score_fn(m, n))
d1, d2 = jnp.asarray(s1, jnp.int32), jnp.asarray(s2, jnp.int32)
t0 = time.perf_counter()
score = int(fn(d1, d2).block_until_ready())
print("compile+run:", time.perf_counter()-t0, "score:", score, "(want 73888)")
best = float("inf")
for _ in range(5):
    t0 = time.perf_counter()
    fn(d1, d2).block_until_ready()
    best = min(best, time.perf_counter()-t0)
print(f"best {best*1e3:.1f} ms  {cells/best/1e9:.1f} GCUPS  ({cells/best/1e9/5.37:.1f}x ref best)")
