"""Per-plane-batch rANS stream codec: device kernels + host packaging.

One ``PlaneStream`` holds the entropy-coded bytes of one byte plane across a
whole batch of frames, sharing a single frequency table (amortizing table
cost and letting the device decode the entire batch in one program).

Layout strategy: each frame's plane (S bytes) is padded to ``cpf * K``
symbols (cpf = ceil(S/K) chunks of K), so the chunk grid is a plain reshape —
no gathers.  Chunks beyond a frame's real length are masked inactive inside
the kernels via per-chunk lengths.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fpv_tpu.entropy.tables import PROB_SCALE, RansTables, normalize_freqs
from fpv_tpu.ops.rans import rans_decode_chunks, rans_encode_chunks

DEFAULT_CHUNK_LEN = 4096


@dataclasses.dataclass
class PlaneStream:
    """Entropy-coded plane batch (host representation, maps 1:1 to container)."""

    nframes: int
    plane_size: int  # S = bytes per frame plane
    chunk_len: int  # K
    freq: np.ndarray  # [256] u16
    states: np.ndarray  # [C] u32
    counts: np.ndarray  # [C] u16 words per chunk
    payload: np.ndarray  # [sum(counts)] u16

    @property
    def chunks_per_frame(self) -> int:
        return -(-self.plane_size // self.chunk_len)

    @property
    def num_chunks(self) -> int:
        return self.nframes * self.chunks_per_frame

    def nbytes(self) -> int:
        return 512 + self.num_chunks * 6 + self.payload.size * 2


def _chunk_lens(nframes: int, plane_size: int, chunk_len: int) -> np.ndarray:
    cpf = -(-plane_size // chunk_len)
    lens = np.full(cpf, chunk_len, dtype=np.int32)
    lens[-1] = plane_size - (cpf - 1) * chunk_len
    return np.tile(lens, nframes)


def encode_plane_batch(
    plane: jax.Array,
    hist: np.ndarray,
    chunk_len: int = DEFAULT_CHUNK_LEN,
) -> PlaneStream:
    """Encode a [B, S] (or [B, H, W]) uint8 plane batch on device.

    ``hist`` is the 256-bin histogram of the whole batch (device-computed;
    passed in so callers can fuse histogramming with prediction).
    """
    b = plane.shape[0]
    flat = plane.reshape(b, -1)
    s = flat.shape[1]
    cpf = -(-s // chunk_len)
    pad = cpf * chunk_len - s
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
    symbols = flat.reshape(b * cpf, chunk_len)
    lens = _chunk_lens(b, s, chunk_len)

    freq = normalize_freqs(hist)
    tables = RansTables.from_freq(freq)
    states, stream, counts = rans_encode_chunks(
        symbols,
        jnp.asarray(lens),
        jnp.asarray(tables.freq.astype(np.uint32)),
        jnp.asarray(tables.cum),
        jnp.asarray(tables.mult_hi),
        jnp.asarray(tables.mult_lo),
        jnp.asarray(tables.shift),
        num_chunks=b * cpf,
        chunk_len=chunk_len,
    )
    counts_np = np.asarray(counts)
    stream_np = np.asarray(stream)
    mask = np.arange(chunk_len)[None, :] < counts_np[:, None]
    payload = stream_np[mask]  # row-major -> concatenated per chunk, in order
    return PlaneStream(
        nframes=b,
        plane_size=s,
        chunk_len=chunk_len,
        freq=freq,
        states=np.asarray(states),
        counts=counts_np.astype(np.uint16),
        payload=payload,
    )


def decode_plane_batch(stream: PlaneStream, check: bool = True) -> jax.Array:
    """Decode a PlaneStream -> [B, S] uint8 device array."""
    b, s, k = stream.nframes, stream.plane_size, stream.chunk_len
    cpf = stream.chunks_per_frame
    c = b * cpf
    counts = stream.counts.astype(np.int32)
    mask = np.arange(k)[None, :] < counts[:, None]
    words = np.zeros((c, k), dtype=np.uint16)
    words[mask] = stream.payload
    lens = _chunk_lens(b, s, k)
    tables = RansTables.from_freq(stream.freq)
    syms, ok = rans_decode_chunks(
        jnp.asarray(stream.states),
        jnp.asarray(words),
        jnp.asarray(lens),
        jnp.asarray(tables.slot_packed),
        num_chunks=c,
        chunk_len=k,
    )
    if check and not bool(jnp.all(ok)):
        raise ValueError("rANS stream integrity check failed")
    return syms.reshape(b, cpf * k)[:, :s]
