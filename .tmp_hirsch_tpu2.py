import time
import numpy as np
from tpualign.io.bdna import read_bdna, BASES
from tpualign.ops import hirschberg

for name, reps in [("64gb", 2)]:
    s1 = read_bdna(f"/root/reference/bdna/{name}-1.bdna" if name.endswith("gb") else f"/root/reference/bdna/{name}1.bdna")
    s2 = read_bdna(f"/root/reference/bdna/{name}-2.bdna" if name.endswith("gb") else f"/root/reference/bdna/{name}2.bdna")
    for r in range(reps):
        t0 = time.perf_counter()
        sc, a1, a2 = hirschberg.align(s1, s2)
        dt = time.perf_counter() - t0
        ok = (a1.replace('-','') == "".join(BASES[int(c)] for c in s1)
              and a2.replace('-','') == "".join(BASES[int(c)] for c in s2))
        print(f"{name} run{r}: score {sc} len {len(a1)} wall {dt:.2f}s valid={ok}", flush=True)
