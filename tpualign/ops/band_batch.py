"""Batched band scoring for serving: many pairs, any config, ONE dispatch.

The round-2 serving path batched only the bit-parallel scoring family
(``bitpal.score_batch``); every other config fell through to a per-pair
Python loop whose wall is dominated by the ~25 ms tunnel round trip per
pair.  This module closes that gap with zero new kernel code: each pair of
the bucket rides the alignment module's single-strip kernel as one
**bottom-aligned strip** (first live slot ``R - n_p``), so the strip's final
boundary-row output lands exactly on row ``n_p`` and ``B_out[m_p]`` IS the
pair's NW score; the per-strip running-max output is its SW score.  A
``lax.scan`` strings the pairs through one dispatch (``chain_b=False``:
each step gets its own text words and analytic boundary row).

Pairs fill sequentially at full band efficiency — the win over the loop is
the amortized dispatch, which through a tunneled chip is ~1000x for small
pairs.  Envelope: ``n_cap <= rows*128`` (one strip per pair),
``m_cap <= MAX_BOUNDARY``.

Reference parity: the reference has no serving path at all (one pair per
process, ``driver.cpp``); this is framework capability beyond it.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ScoringConfig
from .pallas_diag import LANES, _round_up
from .band import MAX_BOUNDARY, _empty_score, _sentinels, _wants_f32
from .band_align import _prof0s, _strip_scan


def _pack4_np(rows2d: np.ndarray) -> np.ndarray:
    """(batch, m) chars -> (batch, ceil(m/8)) packed words, 4 bits/char."""
    b, m = rows2d.shape
    w = -(-m // 8)
    pad = np.zeros((b, w * 8), np.int64)
    pad[:, :m] = rows2d
    pad = pad.reshape(b, w, 8)
    shifts = (np.arange(8, dtype=np.int64) * 4)[None, None, :]
    return (pad << shifts).sum(axis=2).astype(np.int32)


def score_batch(
    texts: Sequence,
    queries: Sequence,
    cfg: ScoringConfig = ScoringConfig(),
    *,
    rows: int = 0,
    interpret: bool = False,
) -> np.ndarray:
    """Scores for a batch of pairs in one device dispatch, any config —
    pair or matrix scoring, all four alignment modes (round 5: the
    ends-free extraction reads each pair's final boundary row plus a
    per-pair right-column capture at its own text length).

    ``texts[p]`` runs along the boundary axis (columns), ``queries[p]``
    along the strip axis (rows) — matching ``api.align_score(t, q)``.
    """
    if cfg.is_affine:
        raise ValueError(
            "affine gaps are outside the batched band engine's envelope; "
            "use the per-pair impl='xla' path")
    batch = len(texts)
    assert batch == len(queries) and batch > 0
    if (cfg.is_local and not cfg.has_matrix
            and (cfg.mismatch > 0 or cfg.gap > 0)):
        raise ValueError("masked SW configs are outside the batch envelope")
    m_cap = max(1, max(len(t) for t in texts))
    n_cap = max(1, max(len(q) for q in queries))
    if m_cap > MAX_BOUNDARY:
        raise ValueError("batch text bucket exceeds the boundary envelope")
    if rows <= 0:
        rows = max(8, _round_up(-(-n_cap // LANES), 8))
    R = rows * LANES
    if n_cap > R:
        raise ValueError(
            f"query bucket ({n_cap}) exceeds one strip (R={R}); raise rows"
        )

    pad_char, _ = _sentinels(cfg)
    zr = cfg.free_start_s1
    zc = cfg.free_start_s2
    ec = cfg.free_end_s2
    tx = np.zeros((batch, m_cap), np.int64)
    qx = np.full((batch, R), pad_char, np.int64)
    scs = np.zeros((batch, 5), np.int32)
    ms = np.zeros(batch, np.int64)
    ns = np.zeros(batch, np.int64)
    empty = np.zeros(batch, bool)
    for p, (t, q) in enumerate(zip(texts, queries)):
        t = np.asarray(t)
        q = np.asarray(q)
        ms[p], ns[p] = t.size, q.size
        if t.size == 0 or q.size == 0:
            empty[p] = True
            qx[p, R - 1 :] = 1  # placeholder live row
            scs[p] = (0, R - 1, 1, R, 1)
            continue
        tx[p, : t.size] = t
        qx[p, R - q.size :] = q  # bottom-aligned live rows
        scs[p] = (0, R - q.size, int(q[0]), R, t.size)
    s1p = jnp.asarray(_pack4_np(tx))
    # column-major slot layout per pair: slot (r, c) = padded row c*rows + r
    s2cm = (
        jnp.asarray(qx, jnp.int32)
        .reshape(batch, LANES, rows)
        .transpose(0, 2, 1)
        .reshape(batch * rows, LANES)
    )
    use_f32 = _wants_f32(cfg, m_cap, n_cap)
    vdt = jnp.float32 if use_f32 else jnp.int32
    if cfg.is_local or zr:
        b0 = jnp.zeros((batch, m_cap + 3), vdt)
    else:
        b0 = jnp.broadcast_to(
            (jnp.arange(m_cap + 3) * cfg.gap).astype(vdt),
            (batch, m_cap + 3),
        )
    live_ms = [int(v) for v, e in zip(ms, empty) if not e]
    res = _strip_scan(
        s1p, s2cm, jnp.asarray(scs), b0, _prof0s(cfg, scs, use_f32),
        m_cap, rows, cfg, use_f32, interpret, chain_b=False, zc=zc,
        capture=ec, cap_min=max(1, min(live_ms, default=1)),
    )
    bs, vmaxs, caps = res[0], res[1], res[3]
    if cfg.is_local:
        out = np.maximum(np.asarray(vmaxs).astype(np.int64), 0)
    elif cfg.is_ends_free:
        bs = np.asarray(bs).astype(np.int64)
        out = np.empty(batch, np.int64)
        for p in range(batch):
            m_p, n_p = int(ms[p]), int(ns[p])
            # last DP row: B_out[1..m_p] = H(n_p, 1..m_p); H(n_p, 0) is
            # closed-form (B_out[0] was recycled as the next-strip corner)
            h_n0 = 0 if zc else n_p * cfg.gap
            best = max(int(bs[p, 1 : m_p + 1].max(initial=h_n0)), h_n0)
            if ec:
                # last column H(1..n_p, m_p) from the per-pair capture at
                # its own text length; H(0, m_p) closed-form
                kvals = np.asarray(caps[p]).T.reshape(-1)
                klo = int(scs[p, 1])
                col = kvals[klo : klo + n_p].astype(np.int64)
                h_0m = 0 if zr else m_p * cfg.gap
                best = max(best, h_0m, int(col.max(initial=h_0m)))
            out[p] = best
    else:
        out = np.asarray(jnp.take_along_axis(
            bs, jnp.asarray(ms)[:, None].astype(jnp.int32), axis=1
        ))[:, 0].astype(np.int64)
    for p in range(batch):
        if empty[p]:
            out[p] = _empty_score(int(ms[p]), int(ns[p]), cfg)
    return out.astype(np.int64)
