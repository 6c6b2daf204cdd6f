"""Score one .bdna pair — the reference's driver.cpp workflow, one call.

Usage: python examples/score_pair.py SEQ1.bdna SEQ2.bdna [--sw]
"""
import sys
import time

sys.path.insert(0, ".")

from tpualign import align_score
from tpualign.config import AlignMode, ScoringConfig
from tpualign.io.bdna import read_bdna

s1, s2 = read_bdna(sys.argv[1]), read_bdna(sys.argv[2])
mode = AlignMode.LOCAL if "--sw" in sys.argv else AlignMode.GLOBAL
t0 = time.perf_counter()
score = align_score(s1, s2, ScoringConfig(mode=mode))
print(f"{(time.perf_counter() - t0) * 1e3:.2f} ms")
print(f"Score: {score}")
