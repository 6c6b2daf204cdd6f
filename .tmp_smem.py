import numpy as np, jax, jax.numpy as jnp, time
from tpualign.ops import bitpal
from tpualign.io.bdna import random_pair

# how long a text fits SMEM? try 1M, 2M, 4M chars (128KB, 256KB, 512KB packed)
for mt in (4_000_000, 16_000_000):
    n = 10_000
    s1, s2 = random_pair(mt, n, seed=1)
    try:
        fn = jax.jit(bitpal.score_fn(mt, n))
        d1, d2 = jnp.asarray(s1, jnp.int32), jnp.asarray(s2, jnp.int32)
        t0 = time.perf_counter()
        sc = int(fn(d1, d2).block_until_ready())
        print(f"mt={mt}: ok score={sc} wall={time.perf_counter()-t0:.1f}s")
    except Exception as e:
        print(f"mt={mt}: FAIL {str(e)[:200]}")
