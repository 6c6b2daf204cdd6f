"""Command-line interface.

Successor of the reference's driver binaries + zsh harness in one tool:

- ``score``    — the driver.cpp contract: print elapsed ms and ``Score: N``
                 (``driver.cpp:33-35``), any engine, NW or SW.
- ``align``    — score **plus the alignment** (capability the reference lacks).
- ``generate`` — synthesize ``.bdna`` pairs by DP-table footprint, like the
                 reference's 2gb..64gb corpus naming.
- ``bench``    — size sweep -> TSV/JSON (succeeds ``benchmark-sizes.sh`` and
                 ``data/multi.tsv``).
- ``tune``     — knob sweep (succeeds ``block-tune.sh`` / ``buf-tune.sh``).
- ``info``     — devices/backend.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import List

import numpy as np

from .config import AlignMode, EngineConfig, ScoringConfig


def _scoring(args) -> ScoringConfig:
    matrix = None
    if getattr(args, "matrix", None):
        from . import matrices

        matrix = matrices.parse(args.matrix)
    return ScoringConfig(
        match=args.match,
        mismatch=args.mismatch,
        gap=args.gap,
        mode=AlignMode(args.mode),
        gap_open=getattr(args, "gap_open", None),
        gap_extend=getattr(args, "gap_extend", None),
        matrix=matrix,
    )


def _add_scoring_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--mode", choices=[m.value for m in AlignMode],
                   default="nw",
                   help="nw = global, sw = local (Smith-Waterman), "
                        "sg = semiglobal/ends-free, infix = fit the second "
                        "sequence inside the first")
    p.add_argument("--match", type=int, default=1)
    p.add_argument("--mismatch", type=int, default=0)
    p.add_argument("--gap", type=int, default=-1)
    p.add_argument("--gap-open", type=int, default=None,
                   help="affine (Gotoh) gaps: a run of L gap columns costs "
                        "gap_open + L*gap_extend (overrides --gap; set "
                        "both affine flags together)")
    p.add_argument("--gap-extend", type=int, default=None)
    p.add_argument("--matrix", type=str, default=None,
                   help="substitution matrix: 'dna:match,transition,"
                        "transversion' or explicit rows 'r00,r01,../r10,..' "
                        "indexed by .bdna code (overrides --match/--mismatch)")


def _add_engine_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--impl",
                   choices=["auto", "bitpal", "band", "band-chunked",
                            "pallas", "xla", "oracle", "bitpal-strips",
                            "band-strips", "strips"],
                   default="auto")
    p.add_argument("--chunk-rows", type=int, default=2048,
                   help="pipelined chunk depth for the sharded engine")


def _load_pair(args):
    from .io.bdna import read_bdna

    return read_bdna(args.seq1), read_bdna(args.seq2)


def cmd_score(args) -> int:
    from .api import align_score

    s1, s2 = _load_pair(args)
    engine = EngineConfig(impl=args.impl, chunk_rows=args.chunk_rows)
    t0 = time.perf_counter()
    score = align_score(s1, s2, _scoring(args), engine)
    ms = (time.perf_counter() - t0) * 1e3
    print(f"{ms:.2f}")
    print(f"Score: {score}")
    return 0


def cmd_align(args) -> int:
    from .api import align

    s1, s2 = _load_pair(args)
    engine = EngineConfig(impl=args.impl, chunk_rows=args.chunk_rows)
    t0 = time.perf_counter()
    score, a1, a2 = align(s1, s2, _scoring(args), engine)
    ms = (time.perf_counter() - t0) * 1e3
    print(f"{ms:.2f}")
    print(f"Score: {score}")
    if args.out:
        with open(args.out, "w") as f:
            f.write(a1 + "\n" + a2 + "\n")
        print(f"alignment written to {args.out}")
    else:
        width = args.width
        for off in range(0, len(a1), width):
            x, y = a1[off : off + width], a2[off : off + width]
            mid = "".join("|" if a == b and a != "-" else " " for a, b in zip(x, y))
            print(x)
            print(mid)
            print(y)
            print()
    return 0


def cmd_generate(args) -> int:
    from .io.bdna import pair_lengths_for_gb, random_pair, table_gb, write_bdna

    if args.gb is not None:
        l1, l2 = pair_lengths_for_gb(args.gb)
    elif args.lengths:
        l1, l2 = args.lengths
    else:
        print("error: pass --gb or --lengths", file=sys.stderr)
        return 2
    s1, s2 = random_pair(l1, l2, seed=args.seed)
    write_bdna(args.out1, s1)
    write_bdna(args.out2, s2)
    print(f"wrote {args.out1} ({l1} bases), {args.out2} ({l2} bases); "
          f"table {table_gb(l1, l2):.2f} GB")
    return 0


def _bench_one(name: str, s1, s2, scoring, impl: str, runs: int):
    import jax
    import jax.numpy as jnp

    from .bench.harness import time_device_fn

    # longer-first helps the word-layout engines, but swapping the pair is
    # only score-preserving when the config is orientation-symmetric: infix
    # ("fit all of s2 inside s1") and asymmetric matrices score DIFFERENT
    # problems after a swap (the r4 silicon sweep's 64gb infix row tripped
    # its own native gate exactly this way)
    swap_safe = scoring.mode is not AlignMode.INFIX and (
        scoring.matrix is None
        or scoring.matrix == tuple(zip(*scoring.matrix))
    )
    if swap_safe and len(s2) > len(s1):
        s1, s2 = s2, s1
    if impl == "auto":
        from .api import resolve_impl

        impl = resolve_impl(EngineConfig(), scoring, (len(s1), len(s2)))
    args = None
    if impl == "bitpal-strips":
        from .parallel import bitpal_strips

        fn = bitpal_strips.score_fn(len(s1), len(s2), scoring)
    elif impl == "band-strips":
        from .parallel import band_strips

        sfn, prep = band_strips.score_fn(len(s1), len(s2), scoring)
        args = prep(np.asarray(s1), np.asarray(s2))
        fn = jax.jit(sfn)
    elif impl == "strips":
        from .parallel import strips as strips_mod

        sfn, (m_pad, n_pad) = strips_mod.score_fn(len(s1), len(s2), scoring)
        p1 = np.zeros(m_pad, np.int32)
        p1[: len(s1)] = s1
        p2 = np.zeros(n_pad, np.int32)
        p2[: len(s2)] = s2
        s1, s2 = p1, p2
        fn = jax.jit(sfn)
    elif impl == "bitpal":
        from .ops import bitpal

        fn = jax.jit(bitpal.score_fn(len(s1), len(s2), scoring))
    elif impl == "band":
        from .ops import band

        fn = jax.jit(band.score_fn(len(s1), len(s2), scoring))
    elif impl == "band-chunked":
        from .ops import band_chunked

        fn = jax.jit(band_chunked.score_fn(len(s1), len(s2), scoring))
    elif impl == "pallas":
        from .ops import pallas_diag

        fn = jax.jit(pallas_diag.score_fn(len(s1), len(s2), scoring))
    else:
        from .ops import xla as xla_ops

        fn = jax.jit(xla_ops.score_fn(scoring))
    if args is None:
        args = (
            jnp.asarray(np.asarray(s1), jnp.int32),
            jnp.asarray(np.asarray(s2), jnp.int32),
        )
    return time_device_fn(
        fn, args, label=name, cells=len(s1) * len(s2), runs=runs
    )


def _check_bench_score(name, s1, s2, scoring, score, mode: str):
    """Score cross-check for a bench row (verdict r1 item #8): ``golden``
    compares against the reference binary's pinned score when one exists
    for this pair+config; ``native`` recomputes with the independent C++
    scorer (any config, O(NM) — minutes at corpus sizes).  Returns an error
    string, or None if the row is valid."""
    if mode == "off":
        return None
    from .config import ScoringConfig

    if mode == "golden":
        from .config import AlignMode
        from .golden import GOLDEN_NW_UNIT, GOLDEN_SW_2_1_2

        sw_cfg = ScoringConfig(
            match=2, mismatch=-1, gap=-2, mode=AlignMode.LOCAL
        )
        if scoring == ScoringConfig() and name in GOLDEN_NW_UNIT:
            want = GOLDEN_NW_UNIT[name]
        elif scoring == sw_cfg and name in GOLDEN_SW_2_1_2:
            want = GOLDEN_SW_2_1_2[name]
        else:
            return None  # no pin applies; row passes unchecked
    else:  # native
        from .utils import native

        if not native.available():
            return None
        want = native.score(s1, s2, scoring)
    if score != want:
        return (
            f"{name}: score {score} != {'pinned' if mode == 'golden' else 'native'}"
            f" {want} — row withheld"
        )
    return None


def cmd_bench(args) -> int:
    from .bench.harness import write_json, write_tsv
    from .io.bdna import read_bdna

    results = []
    bad = 0
    for name in args.pairs.split(","):
        p1 = os.path.join(args.corpus, f"{name}-1.bdna")
        p2 = os.path.join(args.corpus, f"{name}-2.bdna")
        if not os.path.exists(p1):
            p1 = os.path.join(args.corpus, f"{name}1.bdna")
            p2 = os.path.join(args.corpus, f"{name}2.bdna")
        s1, s2 = read_bdna(p1), read_bdna(p2)
        r = _bench_one(name, s1, s2, _scoring(args), args.impl, args.runs)
        err = _check_bench_score(name, s1, s2, _scoring(args), r.score,
                                 args.check)
        if err:
            print(f"ERROR {err}", file=sys.stderr)
            bad += 1
            continue
        print(f"{r.label}\t{r.row()['ms_avg']} ms\t{r.row()['gcups_best']} GCUPS"
              f"\tscore {r.score}")
        results.append(r)
    if args.tsv:
        write_tsv(args.tsv, results)
    if args.json:
        import jax

        sc = _scoring(args)
        write_json(args.json, results, {
            "backend": jax.default_backend(),
            "impl": args.impl, "runs": args.runs,
            # record the scoring config so downstream consumers (e.g. the
            # golden-pin tests) know WHICH problem these scores belong to
            "scoring": {
                "match": sc.match, "mismatch": sc.mismatch, "gap": sc.gap,
                "mode": sc.mode.value,
                "matrix": getattr(args, "matrix", None) or None,
                "gap_open": sc.gap_open, "gap_extend": sc.gap_extend,
            },
        })
    return 1 if bad else 0


def cmd_tune_rc_chunk(args, s1, s2) -> int:
    """2-D tuning surface (cols_per_step x chunk chars) of the single-chip
    chunked-text kernel — the successor of the reference's N x M block-shape
    sweep (``src/block-tune.sh`` + ``data/block-tuning/tuning-graph.py``)."""
    import jax.numpy as jnp

    from .bench.harness import time_device_fn
    from .ops import bitpal

    m, n = len(s1), len(s2)
    if n > m:
        s1, s2 = s2, s1
        m, n = n, m
    d1 = jnp.asarray(np.asarray(s1), jnp.int32)
    d2 = jnp.asarray(np.asarray(s2), jnp.int32)
    rows = []
    for rc in (int(v) for v in args.rc.split(",")):
        for chunk in (int(v) for v in args.values.split(",")):
            fn = bitpal.score_fn(
                m, n, _scoring(args), text_cap=min(chunk, m - 1),
                cols_per_step=rc,
            )
            r = time_device_fn(
                fn, (d1, d2), label=f"rc{rc}/c{chunk}",
                cells=m * n, runs=args.runs,
            )
            print(f"rc={rc}\tchunk={chunk}\t{r.wall_s_best*1e3:.2f} ms\t"
                  f"{r.gcups_best:.3f} GCUPS\tscore {r.score}")
            rows.append((rc, chunk, round(r.wall_s_best * 1e3, 3),
                         round(r.gcups_best, 3), r.score))
    if args.tsv:
        with open(args.tsv, "w") as f:
            f.write("rc\tchunk\tms_best\tgcups\tscore\n")
            for row in rows:
                f.write("\t".join(str(v) for v in row) + "\n")
        print(f"wrote {args.tsv}")
    return 0


def cmd_tune_band(args, s1, s2) -> int:
    """Sweep the band engines' strip depth ``rows`` (x column ``block`` for
    the chunked engine) — the block-shape tuner's successor for the
    general-scoring family (``sentinel-ob-tune.cpp`` + ``block-tune.sh``)."""
    import jax
    import jax.numpy as jnp

    from .bench.harness import time_device_fn
    from .ops import band, band_chunked

    m, n = len(s1), len(s2)
    d1 = jnp.asarray(np.asarray(s1), jnp.int32)
    d2 = jnp.asarray(np.asarray(s2), jnp.int32)
    chunked = args.engine == "band-chunked"
    blocks = ([int(v) for v in args.blocks.split(",")] if chunked else [0])
    rows = []
    for nr in (int(v) for v in args.values.split(",")):
        for blk in blocks:
            if chunked:
                fn = jax.jit(band_chunked.score_fn(
                    m, n, _scoring(args), rows=nr, block=blk))
                label = f"rows{nr}/b{blk}"
            else:
                fn = jax.jit(band.score_fn(m, n, _scoring(args), rows=nr))
                label = f"rows{nr}"
            r = time_device_fn(
                fn, (d1, d2), label=label, cells=m * n, runs=args.runs)
            print(f"{label}\t{r.wall_s_best*1e3:.2f} ms\t"
                  f"{r.gcups_best:.3f} GCUPS\tscore {r.score}")
            rows.append((nr, blk, round(r.wall_s_best * 1e3, 3),
                         round(r.gcups_best, 3), r.score))
    if args.tsv:
        with open(args.tsv, "w") as f:
            f.write("rows\tblock\tms_best\tgcups\tscore\n")
            for row in rows:
                f.write("\t".join(str(v) for v in row) + "\n")
        print(f"wrote {args.tsv}")
    return 0


def cmd_tune(args) -> int:
    """Sweep a sharded engine's chunk depth (COMMBUF_SIZE successor)."""
    import jax

    from .io.bdna import read_bdna
    from .parallel import bitpal_strips, strips
    from .parallel.mesh import make_mesh

    s1, s2 = read_bdna(args.seq1), read_bdna(args.seq2)
    if args.engine == "rc-chunk":
        return cmd_tune_rc_chunk(args, s1, s2)
    if args.engine in ("band", "band-chunked"):
        return cmd_tune_band(args, s1, s2)
    mesh = make_mesh(args.devices if args.devices > 0 else None)
    use_bitpal = args.engine == "bitpal"
    interpret = jax.devices()[0].platform != "tpu"

    rows = []
    for chunk in (int(v) for v in args.values.split(",")):
        if use_bitpal:
            import jax.numpy as jnp

            from .bench.harness import time_device_fn

            fn = bitpal_strips.score_fn(
                len(s1), len(s2), _scoring(args), mesh=mesh,
                chunk_cols=chunk, interpret=interpret,
            )
            d1 = jnp.asarray(np.asarray(s1), jnp.int32)
            d2 = jnp.asarray(np.asarray(s2), jnp.int32)
            r = time_device_fn(
                fn, (d1, d2), label=str(chunk),
                cells=len(s1) * len(s2), runs=args.runs,
            )
            best, score = r.wall_s_best, r.score
        else:
            score = strips.score(
                s1, s2, _scoring(args), mesh=mesh, chunk_rows=chunk
            )  # compile + warmup
            samples = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                strips.score(
                    s1, s2, _scoring(args), mesh=mesh, chunk_rows=chunk
                )
                samples.append(time.perf_counter() - t0)
            best = min(samples)
        gcups = len(s1) * len(s2) / best / 1e9
        print(f"chunk={chunk}\t{best*1e3:.2f} ms\t{gcups:.3f} GCUPS\tscore {score}")
        rows.append((chunk, best, gcups, score))
    if args.tsv:
        with open(args.tsv, "w") as f:
            f.write("chunk\tms_best\tgcups\tscore\n")
            for chunk, best, gcups, score in rows:
                f.write(f"{chunk}\t{best*1e3:.2f}\t{gcups:.3f}\t{score}\n")
    return 0


def cmd_info(args) -> int:
    import jax

    print(f"jax {jax.__version__}, backend {jax.default_backend()}")
    for d in jax.devices():
        print(f"  {d}")
    return 0


def main(argv: List[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="tpualign", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("score", help="alignment score of two .bdna files")
    p.add_argument("seq1")
    p.add_argument("seq2")
    _add_scoring_args(p)
    _add_engine_args(p)
    p.set_defaults(fn=cmd_score)

    p = sub.add_parser("align", help="score + alignment")
    p.add_argument("seq1")
    p.add_argument("seq2")
    p.add_argument("--out", help="write alignment to file")
    p.add_argument("--width", type=int, default=80)
    _add_scoring_args(p)
    _add_engine_args(p)
    p.set_defaults(fn=cmd_align)

    p = sub.add_parser("generate", help="synthesize a .bdna pair")
    p.add_argument("out1")
    p.add_argument("out2")
    p.add_argument("--gb", type=float, help="target int32 DP-table footprint")
    p.add_argument("--lengths", type=int, nargs=2, metavar=("L1", "L2"))
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_generate)

    p = sub.add_parser("bench", help="size sweep -> TSV/JSON")
    p.add_argument("--pairs", default="2gb,8gb,16gb,32gb,64gb")
    p.add_argument("--corpus", default="/root/reference/bdna")
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--tsv")
    p.add_argument("--json")
    p.add_argument("--check", choices=["golden", "native", "off"],
                   default="golden",
                   help="score cross-check per row: 'golden' = reference "
                        "binary pins (default), 'native' = independent C++ "
                        "scorer (any config), 'off' = none")
    _add_scoring_args(p)
    _add_engine_args(p)
    p.set_defaults(fn=cmd_bench)

    p = sub.add_parser("tune", help="sweep engine tuning knobs")
    p.add_argument("seq1")
    p.add_argument("seq2")
    p.add_argument("--engine",
                   choices=["strips", "bitpal", "rc-chunk", "band",
                            "band-chunked"],
                   default="strips",
                   help="sharded chunk depth (strips/bitpal), the 2-D "
                        "(cols_per_step x chunk chars) surface of the "
                        "single-chip chunked-text kernel (rc-chunk), or "
                        "the band engines' strip depth (x column block)")
    p.add_argument("--values", default="256,512,1024,2048,4096")
    p.add_argument("--rc", default="1,2,3,4",
                   help="cols_per_step values for --engine rc-chunk")
    p.add_argument("--blocks", default="65536,131072",
                   help="column-block widths for --engine band-chunked")
    p.add_argument("--devices", type=int, default=0, help="mesh size (0 = all)")
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--tsv")
    _add_scoring_args(p)
    p.set_defaults(fn=cmd_tune)

    p = sub.add_parser("info", help="backend and device info")
    p.set_defaults(fn=cmd_info)

    args = ap.parse_args(argv)

    # Pin a usable platform BEFORE any command touches devices: a dead
    # tunnel relay must degrade to CPU (with a warning), never hang.
    import jax  # noqa: F401  (pre-imported by the site hook anyway)

    from .utils.platform import ensure_live_backend

    ensure_live_backend()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
