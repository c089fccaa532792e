"""Vectorized numpy rANS engine (oracle + CPU fallback).

Implements exactly the stream layout of fpv_tpu.ops.rans_layout.  Vectorized
across all lanes per symbol step, so it is fast enough to serve as the CPU
fallback while doubling as the bit-level oracle the Pallas kernels are tested
against.
"""

from __future__ import annotations

import numpy as np

from fpv_tpu.ops.rans_layout import (
    BLOCK_LANES,
    PROB_BITS,
    PROB_SCALE,
    RANS_L,
    RENORM_SHIFT,
)


def encode_blocks(
    symbols: np.ndarray,  # [C_pad, K] uint8 (garbage beyond lens)
    lens: np.ndarray,  # [C_pad] int32
    freq: np.ndarray,  # [256] uint16
):
    """Returns (states u32 [C_pad], block_counts u32 [nblocks], payload u16)."""
    c_pad, k = symbols.shape
    assert c_pad % BLOCK_LANES == 0
    nblocks = c_pad // BLOCK_LANES
    freq32 = np.maximum(freq.astype(np.uint32), 1)  # guard inactive lanes
    cum = np.zeros(256, dtype=np.uint32)
    cum[1:] = np.cumsum(freq.astype(np.uint32))[:-1]

    x = np.full(c_pad, RANS_L, dtype=np.uint32)
    words = np.zeros((k, c_pad), dtype=np.uint16)  # by symbol index j
    emits = np.zeros((k, c_pad), dtype=bool)
    lens = np.asarray(lens, dtype=np.int32)
    syms = symbols.astype(np.int32)

    for t in range(k):
        j = k - 1 - t
        active = j < lens
        s = syms[:, j]
        f = np.where(active, freq32[s], 1).astype(np.uint32)
        c = cum[s]
        emit = active & (x >= (f << RENORM_SHIFT))
        words[j, emit] = (x[emit] & 0xFFFF).astype(np.uint16)
        emits[j] = emit
        x2 = np.where(emit, x >> 16, x)
        q = x2 // f
        xn = (q << PROB_BITS) + (x2 - q * f) + np.where(active, c, 0)
        x = np.where(active, xn, x)

    # payload: per block, groups in DESCENDING j order, row-major lanes
    counts = np.zeros(nblocks, dtype=np.uint32)
    parts = []
    for m in range(nblocks):
        sl = slice(m * BLOCK_LANES, (m + 1) * BLOCK_LANES)
        w = words[::-1, sl]  # descending j
        e = emits[::-1, sl]
        parts.append(w[e])  # row-major: j-major, lane-minor
        counts[m] = int(e.sum())
    payload = np.concatenate(parts) if parts else np.zeros(0, np.uint16)
    return x, counts, payload


def decode_blocks(
    states: np.ndarray,  # [C_pad] uint32
    block_counts: np.ndarray,  # [nblocks] uint32
    payload: np.ndarray,  # [sum(counts)] uint16
    lens: np.ndarray,  # [C_pad] int32
    freq: np.ndarray,  # [256] uint16
    chunk_len: int,
):
    """Returns (symbols u8 [C_pad, K], ok bool [C_pad])."""
    c_pad = len(states)
    nblocks = c_pad // BLOCK_LANES
    k = chunk_len
    cum = np.zeros(256, dtype=np.uint32)
    cum[1:] = np.cumsum(freq.astype(np.uint32))[:-1]
    sym_of_slot = np.repeat(
        np.arange(256, dtype=np.int32), freq.astype(np.int64)
    )
    freq32 = freq.astype(np.uint32)

    block_base = np.zeros(nblocks, dtype=np.int64)
    block_base[1:] = np.cumsum(block_counts.astype(np.int64))[:-1]
    # decoder consumes each block's payload backward from its end
    ptr = block_counts.astype(np.int64).copy()

    x = states.astype(np.uint32).copy()
    lens = np.asarray(lens, dtype=np.int32)
    out = np.zeros((c_pad, k), dtype=np.uint8)
    lane_block = np.arange(c_pad) // BLOCK_LANES

    for j in range(k):
        active = j < lens
        slot = (x & (PROB_SCALE - 1)).astype(np.int64)
        s = sym_of_slot[slot]
        f = freq32[s]
        xn = f * (x >> PROB_BITS) + (slot.astype(np.uint32) - cum[s])
        renorm = active & (xn < RANS_L)
        # group ranks: row-major within block
        r2 = renorm.reshape(nblocks, BLOCK_LANES)
        ranks = np.cumsum(r2, axis=1) - 1
        cnts = r2.sum(axis=1)
        base = block_base[lane_block] + (ptr[lane_block] - cnts[lane_block])
        pos = base + ranks.reshape(-1)
        w = np.zeros(c_pad, dtype=np.uint32)
        if renorm.any():
            # clip instead of raising on corrupt input; the final state/ptr
            # integrity check reports the corruption
            safe = np.clip(pos[renorm], 0, max(len(payload) - 1, 0))
            if len(payload):
                w[renorm] = payload[safe].astype(np.uint32)
        xn2 = np.where(renorm, (xn << 16) | w, xn)
        x = np.where(active, xn2, x)
        ptr -= cnts
        out[active, j] = s[active].astype(np.uint8)

    ok = (x == RANS_L) & (ptr[lane_block] == 0) | (lens == 0)
    # lanes with len 0 never touched: state stays as given (RANS_L expected)
    return out, ok
