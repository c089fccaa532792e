"""rANS frequency-table construction (host side).

Tables are tiny (256 entries) and stored verbatim in the FPVT container, so
building them on host from device-computed histograms costs one small
transfer per batch and keeps the device kernels table-driven.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from fpv_tpu.utils.magic import magic_tables

PROB_BITS = 12
PROB_SCALE = 1 << PROB_BITS  # 4096
RANS_L = 1 << 15  # state lower bound; state in [2^15, 2^31)


def normalize_freqs(
    hist: np.ndarray, scale: int = PROB_SCALE, ensure_all: bool = False
) -> np.ndarray:
    """Histogram -> frequency table summing to ``scale``; present symbols >= 1.

    Deterministic largest-remainder apportionment with index tie-break, so
    encoder and tests reproduce identical tables for identical data.

    ``ensure_all=True`` gives every symbol a nonzero frequency even when its
    histogram count is zero — required when the histogram is *sampled* (the
    encoder may meet symbols the sample missed).  Cost: ~0.09 bits/symbol
    worst case, negligible for sparse alphabets.
    """
    hist = np.asarray(hist, dtype=np.int64)
    total = int(hist.sum())
    if total <= 0:
        raise ValueError("empty histogram")
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
            order = np.lexsort((np.arange(256), -rema))
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


@dataclasses.dataclass
class RansTables:
    """Everything the device kernels need, derived from a freq table."""

    freq: np.ndarray  # [256] u16, sums to PROB_SCALE
    cum: np.ndarray  # [256] u32 exclusive prefix sum
    mult_hi: np.ndarray  # [256] u32 magic multiplier high words (<= 2)
    mult_lo: np.ndarray  # [256] u32 magic multiplier low words
    shift: np.ndarray  # [256] u32 post-mulhi shifts
    slot_packed: np.ndarray  # [PROB_SCALE] u32: (sym<<24)|(slot_off<<12)|(freq-1)

    @classmethod
    def from_freq(cls, freq: np.ndarray) -> "RansTables":
        freq = np.asarray(freq, dtype=np.uint16)
        cum = np.zeros(256, dtype=np.uint32)
        cum[1:] = np.cumsum(freq.astype(np.uint32))[:-1]
        mult_hi, mult_lo, shift = magic_tables(freq)
        # slot -> (sym, slot - cum[sym], freq[sym]-1) packed in one u32;
        # symbol i occupies slots [cum[i], cum[i]+freq[i])
        sym_of_slot = np.repeat(np.arange(256, dtype=np.uint32), freq.astype(np.int64))
        slots = np.arange(PROB_SCALE, dtype=np.uint32)
        off = slots - cum[sym_of_slot]
        f1 = freq.astype(np.uint32)[sym_of_slot] - 1
        packed = (sym_of_slot << 24) | (off << 12) | f1
        return cls(
            freq=freq,
            cum=cum,
            mult_hi=mult_hi,
            mult_lo=mult_lo,
            shift=shift,
            slot_packed=packed,
        )
