import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import time
import numpy as np
from tpualign.ops import bitpal
from tpualign.io.bdna import random_pair

t0 = time.time()
s1, s2 = random_pair(30, 30, seed=1)
got = bitpal.score(s1, s2, interpret=True)
want = bitpal.score_bigint(s1, s2)
print("30x30:", got, want, "elapsed", time.time() - t0)
