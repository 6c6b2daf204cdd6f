"""Fast TPU traceback: diagonal-checkpoint forward + band-walk backtrack.

The portable checkpointed traceback (``ops/traceback.py``) runs its forward
pass as an XLA row scan — correct everywhere, but far from the speed of the
Pallas wavefront.  This module pairs the flagship kernel
(``ops/pallas_diag.py``) with a diagonal-space backtrack:

1. **Forward (device, ~kernel speed):** the wavefront spills its state pair
   (diagonals ``c*K`` and ``c*K - 1``) to HBM every ``K`` steps
   (``forward_checkpoints``) — O((N+M)/K * N) memory.
2. **Backtrack (host):** the path is walked band by band.  Band ``c`` covers
   diagonals ``(cK, (c+1)K]``; its cells are *exactly* refilled from
   checkpoint ``c`` restricted to a window of 2K+1 slots around the path —
   the dependence cone of any path cell stays inside that window, and
   boundary cells are re-injected analytically, so refilled values are
   bit-identical to the full table and the walk follows the reference tie
   order (diag > up > left, ``serial.cpp:29-30``).

Work: O((N+M) * K) refill cells total — milliseconds at the default stride.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..config import ensure_pair_modes, ScoringConfig
from ..io.bdna import BASES
from . import pallas_diag

NEG = pallas_diag.NEG_INF


class _BandCache:
    """Exact refill of one diagonal band restricted to a slot window."""

    def __init__(
        self,
        c: int,
        k_hi: int,
        ck_a: np.ndarray,  # (groups, rows*128) flat checkpoint diagonals
        ck_b: np.ndarray,
        s1: np.ndarray,
        s2: np.ndarray,
        K: int,
        cfg: ScoringConfig,
    ):
        n, m = s2.size, s1.size
        total = n + m
        self.c = c
        d0 = c * K  # checkpoint diagonal (t index 1); t=0 is diagonal d0-1
        self.d0 = d0
        self.wlo = max(0, k_hi - 2 * K)
        whi = min(n, k_hi)
        W = whi - self.wlo + 1
        t_max = min(K, total - d0)  # diagonals d0+1 .. d0+t_max
        H = np.empty((t_max + 2, W), dtype=np.int64)
        H[0] = ck_b[c, self.wlo : whi + 1].astype(np.int64)
        H[1] = ck_a[c, self.wlo : whi + 1].astype(np.int64)
        if c == 0:
            # synthetic seeds: diag -1 has no cells; diag 0 is H(0,0)=0
            H[0] = NEG
            H[1] = NEG
            if self.wlo == 0:
                H[1][0] = 0
        g = cfg.gap
        local = cfg.is_local
        ks = np.arange(self.wlo, whi + 1, dtype=np.int64)  # absolute slots
        s1p = np.full(total + 2 * K + 4, -9, dtype=np.int64)
        s1p[: m] = s1
        s2p = np.full(n + 1, -7, dtype=np.int64)
        s2p[1:] = s2
        s2k = s2p[np.clip(ks, 0, n)]  # s2[k-1] per slot (k=0 dummy)
        for t in range(2, t_max + 2):
            d = d0 - 1 + t
            # s1[d-1-k] per slot, dead indices map to the -9 pad
            j_idx = np.clip(d - 1 - ks, 0, s1p.size - 1)
            sub = np.where(s1p[j_idx] == s2k, cfg.match, cfg.mismatch)
            prev = H[t - 1]
            prev2 = H[t - 2]
            up = np.empty(W, dtype=np.int64)
            up[1:] = prev[:-1]
            up[0] = NEG  # outside the window: cone-safe for path cells
            dg = np.empty(W, dtype=np.int64)
            dg[1:] = prev2[:-1]
            dg[0] = NEG
            row = np.maximum(dg + sub, np.maximum(up, prev) + g)
            if local:
                np.maximum(row, 0, out=row)
            bval = 0 if local else d * g
            if self.wlo == 0:
                row[0] = bval  # i = 0 boundary
            if self.wlo <= d <= whi:
                row[d - self.wlo] = bval  # j = 0 boundary
            H[t] = row
        self.H = H
        self.whi = whi

    def value(self, d: int, k: int) -> int:
        return int(self.H[d - self.d0 + 1, k - self.wlo])

    def contains(self, d: int, k: int) -> bool:
        return (
            self.d0 - 1 <= d <= self.d0 + self.H.shape[0] - 2
            and self.wlo <= k <= self.whi
        )


def _walk(
    s1: np.ndarray,
    s2: np.ndarray,
    cfg: ScoringConfig,
    ck_a: np.ndarray,
    ck_b: np.ndarray,
    K: int,
    d: int,
    k: int,
) -> Tuple[int, str, str]:
    """Backtrack from cell (diag d, slot k) to the start; returns
    (score at start cell, aligned strings)."""
    g = cfg.gap
    local = cfg.is_local
    a1: List[str] = []
    a2: List[str] = []

    band = None

    def get(dd: int, kk: int) -> int:
        nonlocal band
        if band is None or not band.contains(dd, kk):
            c = max(0, (dd - 1) // K) if dd > 0 else 0
            band = _BandCache(c, k, ck_a, ck_b, s1, s2, K, cfg)
        return band.value(dd, kk)

    score = get(d, k)
    while True:
        i, j = k, d - k
        if i == 0 or j == 0:
            if not local:
                while j > 0:
                    a1.append(BASES[s1[j - 1]])
                    a2.append("-")
                    j -= 1
                while i > 0:
                    a1.append("-")
                    a2.append(BASES[s2[i - 1]])
                    i -= 1
            break
        h = get(d, k)
        if local and h == 0:
            break
        sub = cfg.match if s1[j - 1] == s2[i - 1] else cfg.mismatch
        if get(d - 2, k - 1) + sub == h:
            a1.append(BASES[s1[j - 1]])
            a2.append(BASES[s2[i - 1]])
            d, k = d - 2, k - 1
        elif get(d - 1, k - 1) + g == h:
            a1.append("-")
            a2.append(BASES[s2[i - 1]])
            d, k = d - 1, k - 1
        elif get(d - 1, k) + g == h:
            a1.append(BASES[s1[j - 1]])
            a2.append("-")
            d = d - 1
        else:  # pragma: no cover
            raise AssertionError(f"no predecessor at diag {d} slot {k}")

    return score, "".join(reversed(a1)), "".join(reversed(a2))


def align_diag(
    s1: np.ndarray,
    s2: np.ndarray,
    cfg: ScoringConfig = ScoringConfig(),
    *,
    k_stride: int = 1024,
    interpret: bool = False,
) -> Tuple[int, str, str]:
    """Score + aligned strings via the Pallas wavefront (TPU fast path).

    Output is string-identical to ``oracle.traceback`` (same tie order and,
    for local mode, the same row-major-first maximum cell).
    """
    ensure_pair_modes(cfg, "traceback_diag")
    if cfg.is_affine:
        raise ValueError(
            "affine gaps are outside the diagonal traceback's envelope; "
            "small problems align via the oracle (see api.align)")
    s1 = np.asarray(s1, dtype=np.int8)
    s2 = np.asarray(s2, dtype=np.int8)
    m, n = int(s1.size), int(s2.size)
    if m == 0 or n == 0:
        from .oracle import traceback as _tb

        return _tb(s1, s2, cfg)

    k_stride = max(pallas_diag.UNROLL, min(k_stride, 1 << 20))
    cka, ckb, v, dbest, rows, groups = pallas_diag.forward_checkpoints(
        s1, s2, cfg, k_stride=k_stride, interpret=interpret
    )
    K = ((k_stride + pallas_diag.UNROLL - 1) // pallas_diag.UNROLL
         ) * pallas_diag.UNROLL
    # keep checkpoints int32 on the host (halves transfer/convert cost);
    # bands upcast their window slice to int64 for overflow-free refill
    ck_a = np.asarray(cka).reshape(groups, -1)
    ck_b = np.asarray(ckb).reshape(groups, -1)

    if cfg.is_local:
        vf = np.asarray(v, dtype=np.int64).reshape(-1)[: n + 1]
        score = int(vf.max(initial=0))
        if score <= 0:
            return 0, "", ""
        k0 = int(np.argmax(vf))  # smallest slot (= row) holding the max
        d0 = int(np.asarray(dbest, dtype=np.int64).reshape(-1)[k0])
        got, a1, a2 = _walk(s1, s2, cfg, ck_a, ck_b, K, d0, k0)
        assert got == score
        return score, a1, a2
    return _walk(s1, s2, cfg, ck_a, ck_b, K, n + m, n)
