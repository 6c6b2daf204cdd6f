"""Scoring and execution configuration for tpu-align.

The reference (EricBAndrews/Fast-Needleman-Wunsch) spreads its configuration over
three tiers — compile-time ``#define``s (``src/common/needleman-wunsch.hpp:11-16``:
MATCH=1, MISMATCH=0, GAP=-1; block shapes ``sentinel-otf-blocked-mt.cpp:5-6``;
comm-chunk sizes ``nw-mpi.hpp:18`` / ``nw-hybrid.hpp:20-22``), argv knobs for the
tune binaries (``block-tuner.cpp:26-27``), and launcher environment
(``OMP_NUM_THREADS``, ``mpirun -np``).  This module unifies all of that into two
plain dataclasses:

* :class:`ScoringConfig` — the algorithm: substitution scores, gap penalty, and
  alignment mode (global Needleman-Wunsch vs. local Smith-Waterman).
* :class:`EngineConfig` — the execution strategy: which kernel implementation,
  chunk depth for the pipelined multi-chip fill (successor of ``COMMBUF_SIZE``),
  and tile shape for the blocked kernels (successor of the ``N``/``M`` block dims).
"""

from __future__ import annotations

import dataclasses
import enum


class AlignMode(enum.Enum):
    """Global (Needleman-Wunsch) or local (Smith-Waterman) alignment."""

    GLOBAL = "nw"
    LOCAL = "sw"


@dataclasses.dataclass(frozen=True)
class ScoringConfig:
    """Linear-gap scoring parameters.

    Defaults reproduce the reference's compiled-in constants
    (``needleman-wunsch.hpp:11-13``): match=+1, mismatch=0, gap=-1.
    Scores are int32 throughout; with \\|scores\\| <= 1 and sequence lengths
    <= ~10^7 the DP values stay far from int32 overflow.
    """

    match: int = 1
    mismatch: int = 0
    gap: int = -1
    mode: AlignMode = AlignMode.GLOBAL
    # Affine (Gotoh) gaps: a run of L gap columns costs
    # ``gap_open + L * gap_extend`` (both <= 0).  ``None`` = linear gaps
    # (cost ``L * gap``; equivalently gap_open=0, gap_extend=gap).  The
    # reference has no affine mode; this is a beyond-parity capability
    # served by the oracle/xla/band engines.
    gap_open: int | None = None
    gap_extend: int | None = None

    def __post_init__(self) -> None:
        for name in ("match", "mismatch", "gap"):
            v = getattr(self, name)
            if not isinstance(v, int):
                raise TypeError(f"{name} must be a Python int, got {type(v)}")
        if not isinstance(self.mode, AlignMode):
            raise TypeError(f"mode must be AlignMode, got {type(self.mode)}")
        if (self.gap_open is None) != (self.gap_extend is None):
            raise ValueError("gap_open and gap_extend must be set together")
        if self.gap_open is not None:
            for name in ("gap_open", "gap_extend"):
                v = getattr(self, name)
                if not isinstance(v, int):
                    raise TypeError(
                        f"{name} must be a Python int, got {type(v)}")
                if v > 0:
                    # open <= 0 also underpins the vectorized E-resolve:
                    # a gap reopened from a gap-sourced cell never beats
                    # extending the existing gap
                    raise ValueError(f"{name} must be <= 0, got {v}")

    @property
    def is_local(self) -> bool:
        return self.mode is AlignMode.LOCAL

    @property
    def is_affine(self) -> bool:
        return self.gap_open is not None

    def with_mode(self, mode: AlignMode) -> "ScoringConfig":
        return dataclasses.replace(self, mode=mode)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Execution-strategy knobs.

    ``chunk_rows`` is the depth (in DP rows) of one pipelined super-step of the
    multi-chip strip fill — the TPU successor of the reference's MPI comm-buffer
    size (``COMMBUF_SIZE`` 1280 ints, ``nw-mpi.hpp:18``, swept by
    ``src/buf-tune.sh``).  The reference's other tuned dimension — OMP block
    shape (N=128, M=64, ``sentinel-otf-blocked-mt.cpp:5-6``, swept by
    ``src/block-tune.sh``) — has no successor knob: the hardware (8, 128)
    vector shape fixes the tiling (see PARITY.md §2b).
    """

    impl: str = "auto"  # single-chip: bitpal|band|band-chunked|pallas|xla|
    #                     oracle; sharded: bitpal-strips|band-strips|strips
    chunk_rows: int = 2048
    interpret: bool = False  # run Pallas kernels in interpreter mode (CPU tests)

    def __post_init__(self) -> None:
        if self.impl not in (
            "auto", "bitpal", "band", "band-chunked", "pallas", "xla",
            "oracle", "bitpal-strips", "band-strips", "strips",
        ):
            raise ValueError(f"unknown impl {self.impl!r}")
        if self.chunk_rows <= 0:
            raise ValueError("chunk_rows must be positive")


DEFAULT_SCORING = ScoringConfig()
DEFAULT_ENGINE = EngineConfig()
