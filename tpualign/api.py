"""Top-level user API: score and align with automatic engine dispatch.

Successor of the reference's driver layer (``src/common/driver.cpp``,
``mpi-*-driver.cpp``): where the reference picks an implementation by compiling
a different binary, here one call dispatches on :class:`EngineConfig.impl` and
the available hardware.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .config import AlignMode, EngineConfig, ScoringConfig

#: Above this many DP cells, ``align`` switches from the in-memory full-table
#: traceback to the checkpointed block traceback.
FULL_TABLE_CELL_LIMIT = 16 * 1024 * 1024


_backend_guarded = False


def _platform() -> str:
    import jax

    # first device query in the process: make sure a dead tunnel relay
    # degrades to CPU instead of hanging the caller (library users don't
    # go through the CLI's guard)
    global _backend_guarded
    if not _backend_guarded:
        from .utils.platform import ensure_live_backend

        ensure_live_backend()
        _backend_guarded = True
    return jax.default_backend()


def resolve_impl(
    engine: EngineConfig,
    scoring: Optional[ScoringConfig] = None,
    shape: Optional[Tuple[int, int]] = None,
) -> str:
    """Resolve ``impl='auto'`` to a concrete engine for this process.

    On TPU, global scoring schemes affinely reducible to ``(1, 0, -g)``
    (integer g <= 7 — includes the reference's compiled-in constants) get the
    31-cells-per-word bit-parallel engine; everything else, including
    Smith-Waterman, gets the banded strip kernel (``ops/band.py``), which
    runs the general recurrence at ~2x the flat wavefront's throughput.

    With ``shape = (len(s1), len(s2))`` on a multi-device process, problems
    whose sharded axis gives every chip a substantial band resolve to the
    pipelined sharded engines (``parallel/``) — the successor of the
    reference's mpi drivers being first-class peers of serial
    (``mpi-vert-driver.cpp``).
    """
    if engine.impl != "auto":
        return engine.impl
    if scoring is not None and scoring.is_affine:
        # affine (Gotoh) gaps: the band kernel runs the three-matrix
        # recurrence on TPU (round 3); the XLA row scan is the portable
        # engine and the past-cap fallback; multi-device processes shard
        # through the (H, E)-halo strip pipeline
        plat = _platform()  # FIRST: fires the dead-relay guard before any
        #                     jax.devices() query below can dial the tunnel
        import jax

        if (shape is not None and len(jax.devices()) > 1
                and not (scoring.has_matrix or scoring.is_ends_free)):
            # the sharded row-scan pipeline carries plain affine only;
            # affine+matrix / affine+ends-free fall through to band/xla
            # resolution below (ADVICE r4)
            m, n = shape
            if max(m, n) >= 4096 * len(jax.devices()):
                return "strips"
        return "band" if plat == "tpu" else "xla"
    if _platform() != "tpu":
        return "xla"
    import jax

    if scoring is not None and (scoring.has_matrix or scoring.is_ends_free):
        # round-4 scoring shapes: served natively by the band kernel and
        # (round 5) its chunked and sharded tiers; only the affine
        # ends-free composition still rides the XLA scan
        from .ops import band

        if not band.supports(scoring):
            return "xla"
        if shape is not None and len(jax.devices()) > 1:
            m, n = shape
            if max(m, n) >= 4096 * len(jax.devices()):
                return "band-strips"
        return "band"
    fam = None
    if scoring is not None:
        from .ops import bitpal

        fam = bitpal.supported_scale(scoring)
    n_dev = len(jax.devices())
    if n_dev > 1 and shape is not None:
        m, n = shape
        # sharded axis: query words (bitpal-strips) / text columns (strips)
        if fam is not None and min(m, n) >= 4096 * n_dev:
            return "bitpal-strips"
        if fam is None and max(m, n) >= 4096 * n_dev:
            return "band-strips"
    return "bitpal" if fam is not None else "band"


def align_score(
    s1: np.ndarray,
    s2: np.ndarray,
    scoring: ScoringConfig = ScoringConfig(),
    engine: EngineConfig = EngineConfig(),
) -> int:
    """Alignment score of ``s1`` (columns) vs ``s2`` (rows).

    Semantics identical to the reference serial kernel (``serial.cpp:16-31``)
    for global mode; local mode adds the Smith-Waterman zero floor.
    """
    s1 = np.asarray(s1)
    s2 = np.asarray(s2)
    impl = resolve_impl(engine, scoring, (int(s1.size), int(s2.size)))
    if impl == "oracle":
        from .ops import oracle

        return oracle.score(s1, s2, scoring)
    if impl == "bitpal-strips":
        from .parallel import bitpal_strips

        try:
            return bitpal_strips.score(
                s1, s2, scoring,
                chunk_cols=engine.chunk_rows,
                interpret=engine.interpret or _platform() != "tpu",
            )
        except ValueError:  # outside the family/pipeline envelope
            impl = "strips"
    if impl == "band-strips":
        from .parallel import band_strips

        try:
            # band kernel inside every shard (hybrid-vert successor);
            # falls back to the portable sharded row scan outside its
            # envelope (masked SW, per-chip block over the SMEM budget) —
            # matrix/ends-free configs fall to the single-chip band tiers
            # instead (the portable row-scan pipeline is pair-only)
            return band_strips.score(
                s1, s2, scoring,
                interpret=engine.interpret or _platform() != "tpu",
            )
        except ValueError:
            impl = "strips" if not (
                scoring.has_matrix or scoring.is_ends_free
            ) else "band"
    if impl == "strips":
        from .parallel import strips

        return strips.score(s1, s2, scoring, chunk_rows=engine.chunk_rows)
    if impl == "bitpal":
        from .ops import bitpal

        try:
            return bitpal.score(s1, s2, scoring, interpret=engine.interpret)
        except ValueError:  # outside this engine's envelope
            impl = "pallas" if _platform() == "tpu" else "xla"
            return align_score(
                s1, s2, scoring,
                EngineConfig(impl=impl, interpret=engine.interpret),
            )
    if impl == "band":
        from .ops import band

        try:
            return band.score(s1, s2, scoring, interpret=engine.interpret)
        except ValueError:  # outside the boundary-row envelope
            # (the chunked tier serves matrix/ends-free AND affine since
            # round 5 — the 48gb/64gb affine boundaries that busted the
            # dual-SMEM-row cap no longer fall to the 0.5-GCUPS scan)
            impl = "band-chunked"
    if impl == "band-chunked":
        from .ops import band_chunked

        try:
            return band_chunked.score(
                s1, s2, scoring, interpret=engine.interpret
            )
        except ValueError:  # masked SW / beyond the HBM guard
            impl = "xla" if (
                scoring.has_matrix or scoring.is_ends_free
                or scoring.is_affine
            ) else "pallas"
    if impl == "xla":
        from .ops import xla

        return xla.score(s1, s2, scoring)
    if impl == "pallas":
        from .ops import pallas_diag

        return pallas_diag.score(s1, s2, scoring, interpret=engine.interpret)
    raise ValueError(f"unknown impl {impl!r}")


def align(
    s1: np.ndarray,
    s2: np.ndarray,
    scoring: ScoringConfig = ScoringConfig(),
    engine: EngineConfig = EngineConfig(),
) -> Tuple[int, str, str]:
    """Score plus aligned strings — capability the reference lacks entirely
    (it prints only the score, ``driver.cpp:35``).

    Small problems use the exact full-table traceback; large ones use the
    checkpointed block traceback (O(NM/K) memory, device forward pass).
    """
    s1 = np.asarray(s1, dtype=np.int8)
    s2 = np.asarray(s2, dtype=np.int8)
    cells = (s1.size + 1) * (s2.size + 1)
    if cells <= FULL_TABLE_CELL_LIMIT:
        from .ops import oracle
        from .utils import native

        if (not scoring.is_local and not scoring.is_affine
                and native.available()):
            try:  # C++ walk, string-identical to the oracle, ~50x faster
                return native.traceback(s1, s2, scoring)
            except RuntimeError:
                pass
        return oracle.traceback(s1, s2, scoring)
    if scoring.has_matrix or scoring.is_ends_free:
        from .ops import ends_free

        # round-4 shapes at scale: locate the optimal end/start cells (one
        # band fill each on TPU; native CPU scans off-device), then align
        # the global core — band k-way recovery for matrix cores (round 5)
        return ends_free.align_large(s1, s2, scoring, engine)
    if scoring.is_affine:
        from .ops import affine_align

        # Myers-Miller bisection over the affine row scan (global), or
        # locate + anchored-reverse + Myers-Miller (local): linear space,
        # any size
        if scoring.is_local:
            return affine_align.align_local(s1, s2, scoring)
        return affine_align.align(s1, s2, scoring)
    impl = resolve_impl(engine, scoring)
    if impl == "bitpal":
        from .ops import hirschberg

        # bit-parallel Hirschberg bisection: fastest large-alignment path;
        # returns an optimal path whose tie order may differ from the
        # oracle's diag>up>left convention (use impl='pallas' for that)
        try:
            return hirschberg.align(
                s1, s2, scoring, interpret=engine.interpret
            )
        except ValueError:  # outside the bisection's scoring envelope
            pass
    if impl in ("band", "pallas"):
        from .ops import band_align

        # k-way band alignment: two capture fills + threaded native walks
        # (global), or locate-and-window-walk (SW) — the fast path for
        # every config outside the bit-parallel family (round-3)
        try:
            if scoring.is_local:
                return band_align.align_local(
                    s1, s2, scoring, interpret=engine.interpret
                )
            return band_align.align_global(
                s1, s2, scoring, interpret=engine.interpret
            )
        except ValueError:  # outside the band envelope / masked SW config
            pass
        # fallback: checkpointed diagonal traceback
        from .ops import traceback_diag

        try:
            return traceback_diag.align_diag(
                s1, s2, scoring, interpret=engine.interpret
            )
        except ValueError:  # config outside the Pallas kernel's envelope
            pass
    from .ops import traceback as tb

    return tb.align_checkpointed(s1, s2, scoring, engine)


def align_score_batch(
    texts,
    queries,
    scoring: ScoringConfig = ScoringConfig(),
    engine: EngineConfig = EngineConfig(),
) -> np.ndarray:
    """Scores for a batch of pairs in one device dispatch (serving path).

    All pairs share a padded shape bucket; through a high-latency host link
    this amortizes the per-dispatch round trip across the whole batch.
    Bit-parallel scoring families (affinely reducible to ``(1, 0, -g)``)
    take the fast path; other configurations fall back to a per-pair loop.
    """
    from .ops import bitpal

    resolved = resolve_impl(engine, scoring)
    if (scoring.is_affine and engine.impl in ("auto", "xla")
            and not (scoring.has_matrix or scoring.is_ends_free)):
        # one-dispatch Gotoh batch: the affine row scan vmapped over the
        # padded bucket (the band/bitpal batch kernels are linear-gap).
        # affine+matrix / affine+ends-free configs score wrong through this
        # shortcut (it extracts global/local with match/mismatch only), so
        # they take the per-pair loop below (ADVICE r4, high)
        from .ops import xla as xla_ops

        return xla_ops.score_batch_affine(texts, queries, scoring)
    # Take the bit-parallel batch kernel only when it is the resolved engine,
    # or on impl='auto' off-TPU (where the interpreted batch kernel still
    # beats a per-pair python loop).  An *explicit* impl='xla' request is
    # honored with the per-pair XLA path (ADVICE r1).
    if bitpal.family(scoring) is not None and (
        resolved == "bitpal" or (engine.impl == "auto" and resolved == "xla")
    ):
        try:
            return bitpal.score_batch(
                texts, queries, scoring,
                interpret=engine.interpret or _platform() != "tpu",
            )
        except ValueError:  # outside the batch kernel envelope
            pass
    if resolved in ("band", "bitpal") or (
        engine.impl == "auto" and resolved == "xla"
    ):
        # non-family configs (incl. SW): batched band dispatch — each pair
        # rides the strip kernel as one bottom-aligned strip (round-3)
        from .ops import band_batch

        try:
            return band_batch.score_batch(
                texts, queries, scoring,
                interpret=engine.interpret or _platform() != "tpu",
            )
        except ValueError:  # outside the batch envelope
            pass
    return np.asarray(
        [align_score(t, q, scoring, engine) for t, q in zip(texts, queries)]
    )
