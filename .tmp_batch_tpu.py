import time, numpy as np
from tpualign.ops import bitpal
from tpualign.io.bdna import read_bdna

s1 = read_bdna("/root/reference/bdna/2gb-1.bdna")
s2 = read_bdna("/root/reference/bdna/2gb-2.bdna")
B = 16
texts = [s1] * B
queries = [s2] * B
cells = B * len(s1) * len(s2)
out = bitpal.score_batch(texts, queries)  # compile+warm
assert all(v == 12958 for v in out.tolist()), out
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    bitpal.score_batch(texts, queries)
    best = min(best, time.perf_counter() - t0)
print(f"B={B} 2gb pairs: {best*1e3:.1f} ms total -> {best/B*1e3:.2f} ms/pair, "
      f"{cells/best/1e9:.0f} GCUPS aggregate (single-pair path: 132 GCUPS)")
