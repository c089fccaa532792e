"""rANS frequency-table construction (host side).

Tables are tiny (256 entries) and stored verbatim in the FPVT container, so
building them on host from device-computed histograms costs one small
transfer per batch and keeps the device kernels table-driven.
"""

from __future__ import annotations

import numpy as np

PROB_BITS = 12
PROB_SCALE = 1 << PROB_BITS  # 4096
RANS_L = 1 << 15  # state lower bound; state in [2^15, 2^31)


def normalize_freqs_ctx(
    hist: np.ndarray, floor_mask: np.ndarray | None = None
) -> np.ndarray:
    """[NCTX*ALPHA] joint histogram -> per-context tables, each summing to
    CTX_PROB_SCALE.

    Without ``floor_mask`` every symbol gets >= 1 (sampled-histogram
    safety).  With a mask (an exact-support superset per (ctx, sym) pair)
    only masked pairs are floored: provably-absent pairs get frequency 0,
    which matters enormously for deterministic conditionals (a 16-symbol
    blanket floor at scale 128 costs log2(128/113) = 0.18 bits/symbol even
    when H(sym|ctx) = 0)."""
    from fpv_tpu.ops.rans_layout import CTX_ALPHA, CTX_NCTX, CTX_PROB_SCALE

    hist = np.asarray(hist, dtype=np.int64).reshape(CTX_NCTX, CTX_ALPHA)
    if floor_mask is not None:
        floor_mask = np.asarray(floor_mask, dtype=bool).reshape(
            CTX_NCTX, CTX_ALPHA
        )
    out = np.empty((CTX_NCTX, CTX_ALPHA), np.uint16)
    for c in range(CTX_NCTX):
        if floor_mask is not None and not floor_mask[c].any():
            # context never occurs: any valid row decodes (nothing coded)
            out[c] = np.full(CTX_ALPHA, CTX_PROB_SCALE // CTX_ALPHA, np.uint16)
            continue
        out[c] = normalize_freqs(
            hist[c],
            scale=CTX_PROB_SCALE,
            ensure_all=True,
            floor_mask=None if floor_mask is None else floor_mask[c],
        )
    return out.reshape(-1)


def normalize_freqs(
    hist: np.ndarray,
    scale: int = PROB_SCALE,
    ensure_all: bool = False,
    floor_mask: np.ndarray | None = None,
) -> np.ndarray:
    """Histogram -> frequency table summing to ``scale``; present symbols >= 1.

    Deterministic largest-remainder apportionment with index tie-break, so
    encoder and tests reproduce identical tables for identical data.

    ``ensure_all=True`` gives every symbol a nonzero frequency even when its
    histogram count is zero — required when the histogram is *sampled* (the
    encoder may meet symbols the sample missed).  Cost: ~0.09 bits/symbol
    worst case, negligible for sparse alphabets.

    ``floor_mask`` ([len(hist)] bool) refines that: an exact-support
    superset computed from the *full* data, so only masked symbols get the
    sampled-miss floor and provably-absent ones stay at frequency 0
    (reclaiming the floor's code space — the exact-histogram benefit at
    min/max-reduction cost).  Overrides ``ensure_all``.
    """
    hist = np.asarray(hist, dtype=np.int64)
    total = int(hist.sum())
    if total <= 0:
        if ensure_all or floor_mask is not None:
            # zero-pixel plane (e.g. previews of H<4 or W<4 frames): any
            # valid table works since nothing is coded; use uniform
            return np.full(len(hist), scale // len(hist), dtype=np.uint16)
        raise ValueError("empty histogram")
    if floor_mask is not None:
        present = (hist > 0) | np.asarray(floor_mask, dtype=bool)
    else:
        present = (hist > 0) | ensure_all
    npresent = int(present.sum())
    if npresent > scale:
        raise ValueError("alphabet larger than probability scale")
    ideal = hist.astype(np.float64) * (scale / total)
    freq = np.floor(ideal).astype(np.int64)
    freq[present & (freq == 0)] = 1
    # fix the sum by distributing the difference to the largest-remainder bins
    diff = scale - int(freq.sum())
    if diff != 0:
        rema = ideal - np.floor(ideal)
        if diff > 0:
            order = np.lexsort((np.arange(len(hist)), -rema))
            order = order[present[order]]
            for i in range(diff):
                freq[order[i % len(order)]] += 1
        else:
            # remove from the largest bins, never below 1
            for _ in range(-diff):
                candidates = np.where(present & (freq > 1))[0]
                j = candidates[np.argmax(freq[candidates])]
                freq[j] -= 1
    assert freq.sum() == scale
    return freq.astype(np.uint16)
