"""Shared layout math for the block-interleaved rANS stream.

Coder (see docs/FORMAT_FPVT.md): 12-bit probabilities, 31-bit state in
[2^15, 2^31), 16-bit renormalization, initial/final state 2^15.

Stream layout ("step-major descending"):

* a plane batch of B frames is cut into chunks of K symbols (ceil(S/K) per
  frame, last chunk short); the chunk array is padded to a multiple of
  BLOCK_LANES = 1024 lanes (pad lanes have length 0);
* lanes are grouped into blocks of 1024 = [8 sublanes x 128 lanes];
* each block's payload is the concatenation of per-symbol-step word groups
  in DESCENDING symbol order (the encoder's natural emission order — it
  codes symbols in reverse); within a group, words are in row-major lane
  order; the DECODER therefore consumes the payload backward from the end;
* per chunk: a u32 final state; per block: a u32 word count.

This gives both sides fully static shapes, lets the encoder write forward
with a scalar pointer, and lets the decoder expand each group with one
window read — no per-lane stream cursors.
"""

from __future__ import annotations

import numpy as np

PROB_BITS = 12
PROB_SCALE = 1 << PROB_BITS
RANS_L = 1 << 15
RENORM_SHIFT = 19  # emit while x >= freq << 19 ((L >> PROB_BITS) * 2^16)

BLOCK_ROWS = 8
BLOCK_COLS = 128
BLOCK_LANES = BLOCK_ROWS * BLOCK_COLS  # 1024


def chunk_lens(nframes: int, plane_size: int, chunk_len: int) -> np.ndarray:
    """Per-chunk symbol counts, padded to a BLOCK_LANES multiple (len 0)."""
    cpf = -(-plane_size // chunk_len)
    lens = np.full(cpf, chunk_len, dtype=np.int32)
    lens[-1] = plane_size - (cpf - 1) * chunk_len
    lens = np.tile(lens, nframes)
    pad = (-len(lens)) % BLOCK_LANES
    if pad:
        lens = np.concatenate([lens, np.zeros(pad, np.int32)])
    return lens


def num_chunks(nframes: int, plane_size: int, chunk_len: int) -> int:
    return nframes * (-(-plane_size // chunk_len))


def num_blocks(nframes: int, plane_size: int, chunk_len: int) -> int:
    c = num_chunks(nframes, plane_size, chunk_len)
    return -(-c // BLOCK_LANES)
