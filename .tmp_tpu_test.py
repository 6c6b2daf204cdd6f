import time, numpy as np, jax
print("backend:", jax.default_backend())
from tpualign.ops import bitpal, oracle
from tpualign.io.bdna import read_bdna, random_pair
from tpualign.config import ScoringConfig

# correctness on corpus + random
for name, want in [("debug", 27), ("small", 2), ("t", 17), ("smid", 5839)]:
    s1 = read_bdna(f"/root/reference/bdna/{name}1.bdna")
    s2 = read_bdna(f"/root/reference/bdna/{name}2.bdna")
    got = bitpal.score(s1, s2)
    print(name, got, "ok" if got == want else f"FAIL want {want}")
for seed in range(3):
    s1, s2 = random_pair(3001, 2777, seed=seed)
    w = oracle.score(s1, s2, ScoringConfig())
    g = bitpal.score(s1, s2)
    print("rand", seed, g, "ok" if g == w else f"FAIL want {w}")
