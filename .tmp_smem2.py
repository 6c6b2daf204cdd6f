import numpy as np, jax, jax.numpy as jnp, time, traceback
from tpualign.ops import bitpal
from tpualign.io.bdna import random_pair
mt, n = 4_000_000, 10_000
s1, s2 = random_pair(mt, n, seed=1)
try:
    fn = jax.jit(bitpal.score_fn(mt, n))
    d1, d2 = jnp.asarray(s1, jnp.int32), jnp.asarray(s2, jnp.int32)
    sc = int(fn(d1, d2).block_until_ready())
    print("ok", sc)
except Exception:
    traceback.print_exc()
