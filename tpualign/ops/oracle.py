"""NumPy reference implementations — the test oracle.

The reference validates correctness by comparing the printed ``Score:`` line
across its 16 C++ implementations on tiny inputs (SURVEY.md §4); it ships no
automated tests.  This module is the missing oracle layer: a direct, readable
transcription of the DP *semantics* of the serial kernel
(``src/serial/serial.cpp:16-31``: boundaries ``t[0][j]=j*GAP``, ``t[i][0]=i*GAP``;
recurrence ``max(diag+sub, up+gap, left+gap)`` with tie order diag > up > left),
against which every device kernel is checked cell-exactly.

Conventions (same as the reference): ``s1`` runs across the top (columns, length
M -> table has M+1 columns), ``s2`` down the side (rows, length N).  The NW score
is the bottom-right cell.  Smith-Waterman (announced but never implemented in the
reference, ``README.md:2``) adds the zero floor and scores at the running max cell.

Row updates are vectorized with the max-plus prefix-scan identity: with linear
gap ``g``, ``H[i][j] = max(T[j], H[i][j-1]+g)`` unrolls to
``H[i][j] = j*g + cummax_k<=j (T[k] - k*g)`` — an ``np.maximum.accumulate``.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..config import AlignMode, ScoringConfig

#: -inf stand-in for the affine gap matrices, far from int64 limits
NEG = -(np.int64(1) << np.int64(62))


def _sub_row(s1: np.ndarray, base: np.int64, cfg: ScoringConfig) -> np.ndarray:
    if cfg.matrix is not None:
        mat = np.asarray(cfg.matrix, dtype=np.int64)
        if s1.size and (s1.min() < 0 or s1.max() >= mat.shape[0]):
            raise ValueError("sequence codes outside the matrix alphabet")
        if not 0 <= int(base) < mat.shape[0]:
            raise ValueError("sequence codes outside the matrix alphabet")
        return mat[s1, int(base)]
    return np.where(s1 == base, np.int64(cfg.match), np.int64(cfg.mismatch))


def _affine_row(H, F, sub, i, jext, open_, ext, local, zero_col=False):
    """One Gotoh row: returns (H_new, F_new) given the previous row.

    ``F`` (vertical gap) is elementwise; the in-row ``E`` (horizontal gap)
    dependency unrolls — with ``open <= 0`` a gap reopened from a
    gap-ended cell never beats extending, so
    ``E[j] = open + j*ext + cummax_{k<j}(T[k] - k*ext)`` over the
    gap-free candidates ``T`` alone (same max-plus prefix-scan family as
    the linear engines' row resolve).
    """
    M = H.size - 1
    Fn = np.maximum(H + open_, F) + ext
    T = np.empty(M + 1, dtype=np.int64)
    T[0] = 0 if (local or zero_col) else open_ + i * ext
    np.maximum(H[:-1] + sub, Fn[1:], out=T[1:])
    if local:
        np.maximum(T, 0, out=T)
    C = np.maximum.accumulate(T - jext)
    E = np.concatenate(([NEG], C[:-1])) + open_ + jext
    return np.maximum(T, E), Fn


def score_table(
    s1: np.ndarray, s2: np.ndarray, cfg: ScoringConfig = ScoringConfig()
) -> np.ndarray:
    """Full (N+1, M+1) int32 DP table.  O(N*M) memory — small inputs only."""
    s1 = np.asarray(s1, dtype=np.int64)
    s2 = np.asarray(s2, dtype=np.int64)
    M, N = s1.size, s2.size
    g = np.int64(cfg.gap)
    local = cfg.is_local
    zero_col = local or cfg.free_start_s2  # H(i, 0) = 0
    zero_row = local or cfg.free_start_s1  # H(0, j) = 0
    if cfg.is_affine:
        open_, ext = np.int64(cfg.gap_open), np.int64(cfg.gap_extend)
        jext = np.arange(M + 1, dtype=np.int64) * ext
        H = np.zeros((N + 1, M + 1), dtype=np.int64)
        if not zero_row:
            H[0, 1:] = open_ + jext[1:]
        F = np.full(M + 1, NEG, dtype=np.int64)
        for i in range(1, N + 1):
            sub = _sub_row(s1, s2[i - 1], cfg)
            H[i], F = _affine_row(
                H[i - 1], F, sub, i, jext, open_, ext, local,
                zero_col=zero_col)
        return H.astype(np.int32)
    H = np.zeros((N + 1, M + 1), dtype=np.int64)
    jg = np.arange(M + 1, dtype=np.int64) * g
    if not zero_row:
        H[0, :] = jg
    if not zero_col:
        H[:, 0] = np.arange(N + 1, dtype=np.int64) * g
    for i in range(1, N + 1):
        sub = _sub_row(s1, s2[i - 1], cfg)
        T = np.empty(M + 1, dtype=np.int64)
        T[0] = 0 if zero_col else H[i - 1, 0] + g
        np.maximum(H[i - 1, :-1] + sub, H[i - 1, 1:] + g, out=T[1:])
        if local:
            np.maximum(T, 0, out=T)
        # resolve the in-row left dependency with a running max
        H[i] = np.maximum.accumulate(T - jg) + jg
    return H.astype(np.int32)


def score(
    s1: np.ndarray, s2: np.ndarray, cfg: ScoringConfig = ScoringConfig()
) -> int:
    """Alignment score in O(M) memory (row scan) — works for the big pairs."""
    s1 = np.asarray(s1, dtype=np.int64)
    s2 = np.asarray(s2, dtype=np.int64)
    M = s1.size
    g = np.int64(cfg.gap)
    local = cfg.is_local
    zero_col = local or cfg.free_start_s2
    zero_row = local or cfg.free_start_s1
    if cfg.is_affine:
        open_, ext = np.int64(cfg.gap_open), np.int64(cfg.gap_extend)
        jext = np.arange(M + 1, dtype=np.int64) * ext
        H = np.zeros(M + 1, dtype=np.int64)
        if not zero_row:
            H[1:] = open_ + jext[1:]
        F = np.full(M + 1, NEG, dtype=np.int64)
        best = np.int64(0)
        best_col = H[-1]  # running max over the last column (ends-free)
        for i in range(1, s2.size + 1):
            sub = _sub_row(s1, s2[i - 1], cfg)
            H, F = _affine_row(H, F, sub, i, jext, open_, ext, local,
                               zero_col=zero_col)
            if local:
                best = max(best, H.max())
            best_col = max(best_col, H[-1])
        if local:
            return int(best)
        if cfg.free_end_s1:
            row_best = H.max()
            return int(max(row_best, best_col) if cfg.free_end_s2
                       else row_best)
        return int(H[-1])
    jg = np.arange(M + 1, dtype=np.int64) * g
    H = np.zeros(M + 1, dtype=np.int64) if zero_row else jg.copy()
    best = np.int64(0)
    best_col = H[-1]
    T = np.empty(M + 1, dtype=np.int64)
    for i in range(1, s2.size + 1):
        sub = _sub_row(s1, s2[i - 1], cfg)
        T[0] = 0 if zero_col else H[0] + g
        np.maximum(H[:-1] + sub, H[1:] + g, out=T[1:])
        if local:
            np.maximum(T, 0, out=T)
        H = np.maximum.accumulate(T - jg) + jg
        if local:
            best = max(best, H.max())
        best_col = max(best_col, H[-1])
    if local:
        return int(best)
    if cfg.free_end_s1:
        row_best = H.max()
        return int(max(row_best, best_col) if cfg.free_end_s2 else row_best)
    return int(H[-1])


def traceback(
    s1: np.ndarray,
    s2: np.ndarray,
    cfg: ScoringConfig = ScoringConfig(),
) -> Tuple[int, str, str]:
    """Score plus aligned strings (gap char ``-``), from the full table.

    Tie order diag > up > left mirrors the branchless max of the reference
    (``serial.cpp:29-30``: a later candidate replaces only on a strictly greater
    value).  For Smith-Waterman the path starts at the maximum cell (row-major
    first occurrence) and stops at the first zero cell.  Ends-free modes
    (semiglobal/infix) start at the maximum boundary cell — last row first,
    then last column, first occurrence — and stop when a free start is
    reached; like SW, the returned strings cover only the aligned core.
    """
    from ..io.bdna import BASES

    s1 = np.asarray(s1, dtype=np.int64)
    s2 = np.asarray(s2, dtype=np.int64)
    if cfg.is_affine:
        return _traceback_affine(s1, s2, cfg)
    H = score_table(s1, s2, cfg).astype(np.int64)
    local = cfg.is_local
    if local:
        i, j = np.unravel_index(int(np.argmax(H)), H.shape)
        sc = int(H[i, j])
    elif cfg.is_ends_free:
        i, j = _ends_free_start(H, cfg)
        sc = int(H[i, j])
    else:
        i, j = s2.size, s1.size
        sc = int(H[i, j])
    a1: List[str] = []
    a2: List[str] = []
    g = cfg.gap
    while i > 0 or j > 0:
        if local and H[i, j] == 0:
            break
        if (cfg.free_start_s1 and i == 0) or (cfg.free_start_s2 and j == 0):
            break
        diag_ok = i > 0 and j > 0
        if diag_ok:
            subs = int(cfg.sub_score(int(s1[j - 1]), int(s2[i - 1])))
        if diag_ok and H[i, j] == H[i - 1, j - 1] + subs:
            a1.append(BASES[s1[j - 1]])
            a2.append(BASES[s2[i - 1]])
            i, j = i - 1, j - 1
        elif i > 0 and H[i, j] == H[i - 1, j] + g:
            a1.append("-")
            a2.append(BASES[s2[i - 1]])
            i -= 1
        elif j > 0 and H[i, j] == H[i, j - 1] + g:
            a1.append(BASES[s1[j - 1]])
            a2.append("-")
            j -= 1
        else:  # pragma: no cover - would indicate a broken table
            raise AssertionError(f"no predecessor at ({i},{j})")
    return sc, "".join(reversed(a1)), "".join(reversed(a2))


def _ends_free_start(H: np.ndarray, cfg: ScoringConfig) -> Tuple[int, int]:
    """Best boundary cell for semiglobal/infix walks: scan the last row
    (if the s1 end is free), then the last column (if the s2 end is free);
    first occurrence of the maximum wins."""
    N, M = H.shape[0] - 1, H.shape[1] - 1
    best = None
    if cfg.free_end_s1:
        j = int(np.argmax(H[N, :]))
        best = (int(H[N, j]), N, j)
    if cfg.free_end_s2:
        i = int(np.argmax(H[:, M]))
        cand = (int(H[i, M]), i, M)
        if best is None or cand[0] > best[0]:
            best = cand
    if best is None:  # pragma: no cover - modes guarantee a free end
        best = (int(H[N, M]), N, M)
    return best[1], best[2]


def _traceback_affine(
    s1: np.ndarray, s2: np.ndarray, cfg: ScoringConfig
) -> Tuple[int, str, str]:
    """Gotoh three-state backtrace from exact H/E/F tables (small inputs).

    The tables use the *sequential* recurrences (not the cummax shortcut)
    so every per-cell value is exact for predecessor tests.  Tie order
    mirrors the linear walk: diag > up (F) > left (E); inside a gap state
    closing (H predecessor) beats extending.
    """
    from ..io.bdna import BASES

    M, N = s1.size, s2.size
    open_, ext = np.int64(cfg.gap_open), np.int64(cfg.gap_extend)
    local = cfg.is_local
    zero_row = local or cfg.free_start_s1
    zero_col = local or cfg.free_start_s2
    H = np.zeros((N + 1, M + 1), dtype=np.int64)
    E = np.full((N + 1, M + 1), NEG, dtype=np.int64)
    F = np.full((N + 1, M + 1), NEG, dtype=np.int64)
    if not zero_row:
        H[0, 1:] = open_ + np.arange(1, M + 1, dtype=np.int64) * ext
    if not zero_col:
        H[1:, 0] = open_ + np.arange(1, N + 1, dtype=np.int64) * ext
    for i in range(1, N + 1):
        sub = _sub_row(s1, s2[i - 1], cfg)
        F[i, :] = np.maximum(H[i - 1, :] + open_, F[i - 1, :]) + ext
        for j in range(1, M + 1):
            E[i, j] = max(H[i, j - 1] + open_, E[i, j - 1]) + ext
            h = max(H[i - 1, j - 1] + sub[j - 1], E[i, j], F[i, j])
            H[i, j] = max(h, 0) if local else h
    # row-0 E boundary (global/ends-free): a left-gap prefix is reachable
    if not local:
        for j in range(1, M + 1):
            E[0, j] = max(H[0, j - 1] + open_, E[0, j - 1]) + ext
    if local:
        i, j = np.unravel_index(int(np.argmax(H)), H.shape)
        sc = int(H[i, j])
    elif cfg.is_ends_free:
        i, j = _ends_free_start(H, cfg)
        sc = int(H[i, j])
    else:
        i, j = N, M
        sc = int(H[i, j])
    a1: List[str] = []
    a2: List[str] = []
    state = "H"
    while i > 0 or j > 0:
        if state == "H":
            if local and H[i, j] == 0:
                break
            if (cfg.free_start_s1 and i == 0) or (
                    cfg.free_start_s2 and j == 0):
                break
            diag_ok = i > 0 and j > 0
            if diag_ok:
                sub = int(cfg.sub_score(int(s1[j - 1]), int(s2[i - 1])))
            if diag_ok and H[i, j] == H[i - 1, j - 1] + sub:
                a1.append(BASES[s1[j - 1]])
                a2.append(BASES[s2[i - 1]])
                i, j = i - 1, j - 1
            elif i > 0 and H[i, j] == F[i, j]:
                state = "F"
            elif j > 0 and H[i, j] == E[i, j]:
                state = "E"
            else:  # pragma: no cover - would indicate a broken table
                raise AssertionError(f"no predecessor at H({i},{j})")
        elif state == "F":
            a1.append("-")
            a2.append(BASES[s2[i - 1]])
            close = F[i, j] == H[i - 1, j] + open_ + ext
            i -= 1
            state = "H" if close else "F"
        else:  # E
            a1.append(BASES[s1[j - 1]])
            a2.append("-")
            close = E[i, j] == H[i, j - 1] + open_ + ext
            j -= 1
            state = "H" if close else "E"
    return sc, "".join(reversed(a1)), "".join(reversed(a2))


def alignment_score(a1: str, a2: str, cfg: ScoringConfig = ScoringConfig()) -> int:
    """Re-score an aligned pair — property check that a traceback is valid.

    Affine configs charge ``gap_open`` once per maximal gap run plus
    ``gap_extend`` per gap column; linear configs charge ``gap`` per column.
    """
    from ..io.bdna import BASES

    if len(a1) != len(a2):
        raise ValueError("aligned strings differ in length")
    sc = 0
    in_gap1 = in_gap2 = False
    for x, y in zip(a1, a2):
        if x == "-" or y == "-":
            if cfg.is_affine:
                opening = (x == "-" and not in_gap1) or (
                    y == "-" and not in_gap2)
                sc += (cfg.gap_open if opening else 0) + cfg.gap_extend
            else:
                sc += cfg.gap
        elif cfg.matrix is not None:
            sc += cfg.sub_score(BASES.index(x), BASES.index(y))
        elif x == y:
            sc += cfg.match
        else:
            sc += cfg.mismatch
        in_gap1, in_gap2 = x == "-", y == "-"
    return sc
