"""Fold the round-4 silicon queue's outputs back into ``results/``.

Same job as ``tools/merge_silicon_r3.py`` (which never got its queue run —
the relay was down for round 3's window) but reading ``/tmp/silicon_r4``
and also carrying the round-4 capability sweeps (matrix / semiglobal /
infix rows on the band kernel).  Idempotent; rerunning after a partial
queue just re-applies what exists.
"""

from __future__ import annotations

import importlib.util
import os
import shutil
import subprocess
import sys

_here = os.path.dirname(os.path.abspath(__file__))
_spec = importlib.util.spec_from_file_location(
    "merge_silicon_r3", os.path.join(_here, "merge_silicon_r3.py"))
r3 = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(r3)

SRC = "/tmp/silicon_r4"
LARGE = "/tmp/bench_large_r3.json"
RESULTS = r3.RESULTS

SWEEPS = r3.SWEEPS + [
    "sizes-matrix-v5e1", "sizes-sg-v5e1", "sizes-infix-v5e1",
    "sizes-sg-matrix-v5e1",
]


def main() -> int:
    did = []
    for name in SWEEPS:
        for ext in (".tsv", ".json"):
            src = os.path.join(SRC, name + ext)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(RESULTS, name + ext))
                did.append(f"  copied {name}{ext}")
    if os.path.exists(LARGE):
        did += r3.merge_large(LARGE)
    else:
        did.append(f"  (no {LARGE} - large-scale rows unchanged)")
    plots = [
        (["sizes-nw-v5e1.tsv"], "sizes-nw-v5e1.png", []),
        (["sizes-nw-v5e1.tsv", "sizes-nw-band-v5e1.tsv",
          "sizes-sw-v5e1.tsv"], "engines-v5e1.png",
         ["--labels", "bitpal NW,band NW(2/-3/-4),band SW(3/-2/-1)"]),
        (["sizes-nw-band-v5e1.tsv", "sizes-sw-v5e1.tsv",
          "sizes-matrix-v5e1.tsv", "sizes-sg-v5e1.tsv"],
         "sizes-band-v5e1.png",
         ["--labels", "band NW,band SW,band matrix,band semiglobal"]),
    ]
    for tsvs, png, extra in plots:
        paths = [os.path.join(RESULTS, t) for t in tsvs]
        if all(os.path.exists(p) for p in paths):
            r = subprocess.run(
                [sys.executable, os.path.join(_here, "plot_bench.py"),
                 *paths, "-o", os.path.join(RESULTS, png), *extra],
                capture_output=True, text=True)
            did.append(f"  plot {png}: rc={r.returncode}"
                       + (f" ({r.stderr.strip().splitlines()[-1]})"
                          if r.returncode else ""))
    print("\n".join(did) if did else "nothing to merge")
    tsv = os.path.join(RESULTS, "sizes-nw-v5e1.tsv")
    if os.path.exists(tsv):
        with open(tsv) as f:
            last = f.read().strip().splitlines()[-1].split("\t")
        print(f"\n64gb flagship sweep row: {last[4]} GCUPS best")
    return 0


if __name__ == "__main__":
    sys.exit(main())
