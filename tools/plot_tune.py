#!/usr/bin/env python
"""Render a 2-D tuning sweep as heatmap + 3-D surface.

Successor of the reference's ``data/block-tuning/tuning-graph.py`` (N x M
block-shape surface): here the swept space is the chunked-text kernel's
``cols_per_step x chunk-chars`` grid from ``tpualign tune --engine rc-chunk``
(or any TSV with columns ``<xcol> <ycol> <zcol>``).

Usage:
    python tools/plot_tune.py results/tune-rc-chunk-v5e1.tsv -o tune.png
"""

from __future__ import annotations

import argparse
import csv
import sys


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("tsv")
    ap.add_argument("-o", "--out", default="tune-surface.png")
    ap.add_argument("--xcol", default="chunk")
    ap.add_argument("--ycol", default="rc")
    ap.add_argument("--zcol", default="gcups")
    args = ap.parse_args()

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as np
    except ImportError:
        print("matplotlib not available", file=sys.stderr)
        return 1

    rows = list(csv.DictReader(open(args.tsv), delimiter="\t"))
    xs = sorted({int(r[args.xcol]) for r in rows})
    ys = sorted({int(r[args.ycol]) for r in rows})
    z = np.full((len(ys), len(xs)), np.nan)
    for r in rows:
        z[ys.index(int(r[args.ycol])), xs.index(int(r[args.xcol]))] = float(
            r[args.zcol]
        )

    fig = plt.figure(figsize=(11, 4.5))
    ax = fig.add_subplot(1, 2, 1)
    im = ax.imshow(z, aspect="auto", origin="lower", cmap="viridis")
    ax.set_xticks(range(len(xs)), [str(x) for x in xs], rotation=45)
    ax.set_yticks(range(len(ys)), [str(y) for y in ys])
    ax.set_xlabel(args.xcol)
    ax.set_ylabel(args.ycol)
    ax.set_title(f"{args.zcol} heatmap")
    fig.colorbar(im, ax=ax, shrink=0.9)
    bi, bj = np.unravel_index(np.nanargmax(z), z.shape)
    ax.plot(bj, bi, "r*", markersize=14)

    ax3 = fig.add_subplot(1, 2, 2, projection="3d")
    xg, yg = np.meshgrid(range(len(xs)), range(len(ys)))
    ax3.plot_surface(xg, yg, z, cmap="viridis", edgecolor="k", lw=0.3)
    ax3.set_xticks(range(len(xs)))
    ax3.set_xticklabels([str(x) for x in xs], fontsize=7)
    ax3.set_yticks(range(len(ys)))
    ax3.set_yticklabels([str(y) for y in ys], fontsize=7)
    ax3.set_xlabel(args.xcol)
    ax3.set_ylabel(args.ycol)
    ax3.set_zlabel(args.zcol)
    ax3.set_title(
        f"best: {args.ycol}={ys[bi]}, {args.xcol}={xs[bj]} "
        f"({z[bi, bj]:.0f})"
    )
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
