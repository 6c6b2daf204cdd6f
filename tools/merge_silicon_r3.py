"""Fold the round-3 silicon queue's outputs back into ``results/``.

The queue (``tools/silicon_r3.sh``) writes everything under
``/tmp/silicon_r3`` + ``/tmp/bench_large_r3.json``; this script

1. copies the refreshed size-sweep TSV/JSON files over ``results/``,
2. merges the large-scale rows (unified-recipe 64gb headline, lean/base
   A/B, band 64gb rows, 400k + 2.5M chunked general/SW scores) into
   ``results/large-scale-v5e1.json``,
3. regenerates the committed sweep plots,
4. prints a summary table for the README refresh.

Idempotent: rerunning after a partial queue just re-applies what exists.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

SRC = "/tmp/silicon_r3"
LARGE = "/tmp/bench_large_r3.json"
RESULTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "results")

SWEEPS = [
    "sizes-nw-v5e1", "sizes-nw-band-v5e1", "sizes-sw-v5e1",
    "tune-band-v5e1", "tune-band-chunked-v5e1",
]


def merge_large(path: str) -> list[str]:
    with open(path) as f:
        rows = json.load(f)
    tgt = os.path.join(RESULTS, "large-scale-v5e1.json")
    with open(tgt) as f:
        doc = json.load(f)
    lines = []
    for row in rows:
        engine, pair = row["engine"], row["pair"]
        entry = {
            "pair": pair, "engine": engine,
            "wall_s": row["wall_s"], "gcups": row["gcups"],
            "score": row["score"],
        }
        if "cold_s" in row:
            entry["cold_s"] = row["cold_s"]
        runs = doc["score_runs"]
        # replace a same-pair same-engine row, else same-pair engine-less
        # legacy row (the pre-r3 rows never recorded an engine), else append
        hit = next((i for i, r in enumerate(runs)
                    if r.get("engine") == engine
                    and r["pair"].split(" (")[0] == pair), None)
        if hit is None and engine in ("bitpal",):
            hit = next((i for i, r in enumerate(runs)
                        if "engine" not in r
                        and r["pair"].split(" (")[0] == pair), None)
        if hit is None:
            runs.append(entry)
            lines.append(f"  + {pair} / {engine}: {row['gcups']} GCUPS")
        else:
            entry["pair"] = runs[hit]["pair"]  # keep the long label
            if "table_equiv_gb" in runs[hit]:
                entry["table_equiv_gb"] = runs[hit]["table_equiv_gb"]
            old = runs[hit].get("gcups")
            runs[hit] = entry
            lines.append(
                f"  ~ {pair} / {engine}: {old} -> {row['gcups']} GCUPS")
    doc["meta"]["note_r3b"] = (
        "round 3 (post-outage): unified amortized recipe "
        "(harness.time_device_fn), lean flagship schedule; rows above "
        "refreshed by tools/merge_silicon_r3.py from the silicon queue"
    )
    with open(tgt, "w") as f:
        json.dump(doc, f, indent=1)
    return lines


def main() -> int:
    did = []
    for name in SWEEPS:
        for ext in (".tsv", ".json"):
            src = os.path.join(SRC, name + ext)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(RESULTS, name + ext))
                did.append(f"  copied {name}{ext}")
    if os.path.exists(LARGE):
        did += merge_large(LARGE)
    else:
        did.append(f"  (no {LARGE} - large-scale rows unchanged)")
    # regenerate committed plots for any refreshed sweep
    plots = [
        (["sizes-nw-v5e1.tsv"], "sizes-nw-v5e1.png", []),
        (["sizes-nw-v5e1.tsv", "sizes-nw-band-v5e1.tsv",
          "sizes-sw-v5e1.tsv"], "engines-v5e1.png",
         ["--labels", "bitpal NW,band NW(2/-3/-4),band SW(3/-2/-1)"]),
        (["sizes-nw-band-v5e1.tsv", "sizes-sw-v5e1.tsv"],
         "sizes-band-v5e1.png", ["--labels", "band NW,band SW"]),
    ]
    for tsvs, png, extra in plots:
        paths = [os.path.join(RESULTS, t) for t in tsvs]
        if all(os.path.exists(p) for p in paths):
            r = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(__file__),
                                              "plot_bench.py"),
                 *paths, "-o", os.path.join(RESULTS, png), *extra],
                capture_output=True, text=True)
            did.append(f"  plot {png}: rc={r.returncode}"
                       + (f" ({r.stderr.strip().splitlines()[-1]})"
                          if r.returncode else ""))
    print("\n".join(did) if did else "nothing to merge")
    # README summary table source
    tsv = os.path.join(RESULTS, "sizes-nw-v5e1.tsv")
    if os.path.exists(tsv):
        with open(tsv) as f:
            last = f.read().strip().splitlines()[-1].split("\t")
        print(f"\n64gb flagship sweep row: {last[4]} GCUPS best "
              f"({last[2]} ms, score {last[6]})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
