import time, sys
import jax, jax.numpy as jnp
from tpualign.ops import bitpal
from tpualign.io.bdna import random_pair, read_bdna
from tpualign.ops import oracle
from tpualign.config import ScoringConfig

# correctness spot-check vs oracle on a moderate pair first
a, b = random_pair(3001, 2777, seed=1)
assert bitpal.score(a, b) == oracle.score(a, b, ScoringConfig()), "correctness FAIL"

m, n = 400_000, 398_000
s1, s2 = random_pair(m, n, seed=9)
cells = m * n
fn = jax.jit(bitpal.score_fn(m, n))
d1, d2 = jnp.asarray(s1, jnp.int32), jnp.asarray(s2, jnp.int32)
sc = int(fn(d1, d2).block_until_ready())
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    fn(d1, d2).block_until_ready()
    best = min(best, time.perf_counter() - t0)
print(f"400k pair: {best*1e3:.1f} ms  {cells/best/1e9:.0f} GCUPS  score={sc}")
