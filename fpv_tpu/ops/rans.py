"""Interleaved-chunk rANS entropy coding on device.

This replaces the reference's serial per-plane brotli stage
(fusion_power_video.cc:643-728) — its throughput bottleneck — with a
data-parallel formulation: a byte plane is cut into fixed-size chunks of K
symbols, and thousands of independent rANS streams are encoded/decoded
simultaneously, one per chunk, vectorized across chunk lanes inside a
``lax.scan`` over symbol positions.

Coder parameters (see fpv_tpu.entropy.tables):

* 12-bit probabilities (PROB_SCALE = 4096), shared per-plane table;
* 31-bit state in [2^15, 2^31), 16-bit renormalization — each symbol emits
  exactly 0 or 1 uint16 word, so emission buffers have static shape [K, C];
* division by frequency via exact magic multipliers (fpv_tpu.utils.magic),
  valid for all states < 2^31 — no integer divide on the VPU.

Encoding walks symbols in reverse (standard rANS), emitting words
time-reversed per chunk; compaction to the final stream order is one scatter.
Decoding reads words forward per chunk with a per-lane cursor and must end in
the initial state ``RANS_L``, which doubles as an integrity check.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from fpv_tpu.entropy.tables import PROB_BITS, PROB_SCALE, RANS_L

_MASK = PROB_SCALE - 1


def _mulhi32(a: jax.Array, b: jax.Array) -> jax.Array:
    """(a * b) >> 32 for uint32 operands, in pure 32-bit arithmetic."""
    ah, al = a >> 16, a & 0xFFFF
    bh, bl = b >> 16, b & 0xFFFF
    lo = al * bl
    mid1 = ah * bl
    mid2 = al * bh
    t = (lo >> 16) + (mid1 & 0xFFFF) + (mid2 & 0xFFFF)
    return ah * bh + (mid1 >> 16) + (mid2 >> 16) + (t >> 16)


# renorm bound factor: x >= freq << RENORM_SHIFT triggers a 16-bit emission
# ((L >> PROB_BITS) * 2^16 == 2^19 for L = 2^15, PROB_BITS = 12)
RENORM_SHIFT = 15 - PROB_BITS + 16  # 19


@functools.partial(jax.jit, static_argnames=("num_chunks", "chunk_len"))
def rans_encode_chunks(
    symbols: jax.Array,  # [C, K] uint8 (padded past lens with anything)
    lens: jax.Array,  # [C] int32 symbols per chunk
    freq: jax.Array,  # [256] uint32
    cum: jax.Array,  # [256] uint32
    mult_hi: jax.Array,  # [256] uint32 magic multiplier high words
    mult_lo: jax.Array,  # [256] uint32 magic multiplier low words
    shift: jax.Array,  # [256] uint32 post-mulhi shifts
    num_chunks: int,
    chunk_len: int,
):
    """Encode C chunks of up to K symbols each.

    Returns (states u32 [C], stream u16 [C, K] in decode order, counts i32 [C]).
    """
    C, K = num_chunks, chunk_len
    syms_t = jnp.flip(symbols.astype(jnp.int32).T, axis=0)  # [K, C], reverse time
    js = jnp.arange(K - 1, -1, -1, dtype=jnp.int32)  # symbol index per step

    def step(x, inputs):
        sym, j = inputs
        active = j < lens
        f = freq[sym]
        c = cum[sym]
        mh = mult_hi[sym]
        ml = mult_lo[sym]
        s = shift[sym]
        emit = active & (x >= (f << RENORM_SHIFT))
        word = (x & 0xFFFF).astype(jnp.uint16)
        x2 = jnp.where(emit, x >> 16, x)
        q = (x2 * mh + _mulhi32(x2, ml)) >> s  # exact x2 // f (magic divide)
        r = x2 - q * f
        xn = (q << PROB_BITS) + r + c
        x = jnp.where(active, xn, x)
        return x, (word, emit)

    x0 = jnp.full((C,), RANS_L, dtype=jnp.uint32)
    xfinal, (words, emits) = jax.lax.scan(step, x0, (syms_t, js))
    # words/emits: [K, C] in encode-time order; stream order is reverse time.
    counts = jnp.sum(emits, axis=0, dtype=jnp.int32)  # [C]
    inc = jnp.cumsum(emits.astype(jnp.int32), axis=0)  # inclusive, [K, C]
    pos = jnp.where(emits, counts[None, :] - inc, K)  # K = dropped
    stream = jnp.zeros((C, K), dtype=jnp.uint16)
    lane = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[None, :], (K, C))
    stream = stream.at[lane.reshape(-1), pos.reshape(-1)].set(
        words.reshape(-1), mode="drop"
    )
    return xfinal, stream, counts


@functools.partial(jax.jit, static_argnames=("num_chunks", "chunk_len"))
def rans_decode_chunks(
    states: jax.Array,  # [C] uint32 final encoder states
    words: jax.Array,  # [C, K] uint16 per-chunk streams (decode order, padded)
    lens: jax.Array,  # [C] int32 symbols per chunk
    slot_packed: jax.Array,  # [PROB_SCALE] uint32 packed decode table
    num_chunks: int,
    chunk_len: int,
):
    """Decode C chunks -> (symbols u8 [C, K], ok bool [C]).

    ok[c] verifies the coder returned to RANS_L (stream integrity).
    """
    C, K = num_chunks, chunk_len
    words = words.astype(jnp.uint32)

    def step(carry, j):
        x, off = carry
        active = j < lens
        slot = x & _MASK
        e = slot_packed[slot]
        f = (e & 0xFFF) + 1
        o = (e >> PROB_BITS) & 0xFFF
        sym = (e >> 24).astype(jnp.uint8)
        xn = f * (x >> PROB_BITS) + o
        renorm = xn < RANS_L
        w = jnp.take_along_axis(words, off[:, None], axis=1)[:, 0]
        xn2 = jnp.where(renorm, (xn << 16) | w, xn)
        x = jnp.where(active, xn2, x)
        off = jnp.where(active & renorm, off + 1, off)
        return (x, off), sym

    (xfin, _), syms = jax.lax.scan(
        step,
        (states.astype(jnp.uint32), jnp.zeros((C,), jnp.int32)),
        jnp.arange(K, dtype=jnp.int32),
    )
    ok = xfin == RANS_L
    return syms.T, ok  # [C, K] uint8
