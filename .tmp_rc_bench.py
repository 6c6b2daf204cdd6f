import time, jax, jax.numpy as jnp
from tpualign.ops import bitpal
from tpualign.io.bdna import read_bdna
from tpualign.bench.harness import time_device_fn

s1 = read_bdna("/root/reference/bdna/64gb-1.bdna")
s2 = read_bdna("/root/reference/bdna/64gb-2.bdna")
d1, d2 = jnp.asarray(s1, jnp.int32), jnp.asarray(s2, jnp.int32)
cells = len(s1) * len(s2)
for rc in (1, 2, 3, 4):
    fn = bitpal.score_fn(len(s1), len(s2), cols_per_step=rc)
    r = time_device_fn(jax.jit(fn), (d1, d2), label=f"rc={rc}", cells=cells, runs=3)
    print(f"rc={rc}: {r.wall_s_best*1e3:.2f} ms  {r.gcups_best:.0f} GCUPS  score {r.score}")
