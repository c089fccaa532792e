"""Exact division-by-constant via round-up magic multipliers.

rANS encoding divides the coder state by per-symbol frequencies
(``x // freq``).  TPUs have no fast integer divide, so we precompute, per
frequency ``d``, a multiplier ``m = ceil(2^(32+s) / d)`` with
``s = ceil(log2(d))``.  By the Granlund–Montgomery round-up theorem,
``(x * m) >> (32 + s) == x // d`` exactly for all ``x < 2^31`` (the coder
keeps its state below 2^31 for precisely this reason).  ``m <= 2^33`` and the
product fits in uint64.
"""

from __future__ import annotations

import numpy as np


def magic_u31(d: int) -> tuple[int, int]:
    """(multiplier, total_shift) with (x * m) >> shift == x // d for x < 2^31."""
    if d <= 0:
        raise ValueError("divisor must be positive")
    if d == 1:
        return 1, 32  # m = ceil(2^32/1) = 2^32 would overflow the bound; x*1>>0
        # handled specially below
    s = max(0, (d - 1).bit_length())  # ceil(log2(d))
    m = -(-(1 << (32 + s)) // d)  # ceil division
    return m, 32 + s


def magic_tables(freqs: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-symbol (mult_hi, mult_lo, post_shift) u32 arrays for a freq table.

    The multiplier is split as ``m = m_hi * 2^32 + m_lo`` (``m_hi <= 2``) so
    device code computes ``x // d = (x*m_hi + mulhi32(x, m_lo)) >> s`` in
    pure 32-bit arithmetic.  Zero frequencies (absent symbols) get divisor-1
    entries; they are never used by a correct encoder.
    """
    n = len(freqs)
    m_hi = np.zeros(n, dtype=np.uint32)
    m_lo = np.zeros(n, dtype=np.uint32)
    post = np.zeros(n, dtype=np.uint32)
    for i, d in enumerate(freqs):
        d = int(d)
        if d <= 1:
            m, sh = 1 << 32, 32  # x // 1 == x
        else:
            m, sh = magic_u31(d)
        m_hi[i] = m >> 32
        m_lo[i] = m & 0xFFFFFFFF
        post[i] = sh - 32
    return m_hi, m_lo, post
