"""rANS coder: magic division, table construction, chunked roundtrip."""

import numpy as np
import pytest

from fpv_tpu.entropy.plane_codec import PlaneStream, decode_plane_batch, encode_plane_batch
from fpv_tpu.entropy.tables import PROB_SCALE, RansTables, normalize_freqs
from fpv_tpu.utils.magic import magic_tables, magic_u31
from fpv_tpu.utils import testdata


def test_magic_division_exact():
    rng = np.random.default_rng(3)
    xs = np.concatenate(
        [
            rng.integers(0, 1 << 31, size=2000, dtype=np.int64),
            np.array([0, 1, 2, (1 << 31) - 1, (1 << 30), (1 << 15)], dtype=np.int64),
        ]
    )
    for d in [2, 3, 5, 7, 11, 255, 256, 1000, 4095, 4096, 1, 17]:
        m_hi, m_lo, post = magic_tables(np.array([d]))
        m = (int(m_hi[0]) << 32) + int(m_lo[0])
        for x in xs:
            q = ((int(x) * m) >> 32) >> int(post[0])
            assert q == int(x) // d, (d, x)


def test_normalize_freqs_properties():
    rng = np.random.default_rng(11)
    for _ in range(20):
        hist = rng.integers(0, 10000, size=256)
        hist[rng.integers(0, 256, size=100)] = 0
        if hist.sum() == 0:
            hist[0] = 1
        freq = normalize_freqs(hist)
        assert freq.sum() == PROB_SCALE
        assert np.all((freq > 0) == (hist > 0))


def test_normalize_single_symbol():
    hist = np.zeros(256, dtype=np.int64)
    hist[42] = 1000
    freq = normalize_freqs(hist)
    assert freq[42] == PROB_SCALE and freq.sum() == PROB_SCALE


def _roundtrip(planes: np.ndarray, chunk_len=512):
    b = planes.shape[0]
    hist = np.bincount(planes.reshape(-1), minlength=256)
    stream = encode_plane_batch(planes.reshape(b, -1), hist, chunk_len=chunk_len)
    out = np.asarray(decode_plane_batch(stream))
    np.testing.assert_array_equal(out, planes.reshape(b, -1))
    return stream


def test_rans_roundtrip_plasma():
    planes = (testdata.plasma_frames(4, 48, 64) >> 8).astype(np.uint8)
    stream = _roundtrip(planes)
    # compressible data: payload smaller than raw
    assert stream.payload.size * 2 < planes.size


def test_rans_roundtrip_noise():
    planes = (testdata.noise_frames(3, 32, 48) & 0xFF).astype(np.uint8)
    _roundtrip(planes)


def test_rans_roundtrip_constant():
    planes = np.full((2, 40 * 40), 7, dtype=np.uint8)
    stream = _roundtrip(planes)
    assert stream.payload.size == 0  # single-symbol alphabet costs 0 words


def test_rans_roundtrip_short_last_chunk():
    # plane size not divisible by chunk_len
    planes = (testdata.plasma_frames(2, 31, 37) >> 8).astype(np.uint8)
    _roundtrip(planes, chunk_len=256)


def test_rans_roundtrip_two_symbols():
    rng = np.random.default_rng(5)
    planes = rng.choice([3, 200], size=(2, 1000)).astype(np.uint8)
    _roundtrip(planes, chunk_len=128)


def test_rans_ratio_reasonable_vs_entropy():
    """Coded size should be within ~5% of the order-0 entropy bound."""
    planes = (testdata.plasma_frames(4, 64, 64) >> 8).astype(np.uint8)
    hist = np.bincount(planes.reshape(-1), minlength=256).astype(np.float64)
    p = hist[hist > 0] / hist.sum()
    h_bits = -(p * np.log2(p)).sum() * planes.size
    stream = encode_plane_batch(planes.reshape(4, -1), hist.astype(np.int64),
                                chunk_len=4096)
    coded_bits = stream.payload.size * 16 + stream.states.size * 32
    assert coded_bits < h_bits * 1.05 + 64 * 8


def test_corrupt_stream_detected():
    planes = (testdata.plasma_frames(2, 32, 32) >> 8).astype(np.uint8)
    hist = np.bincount(planes.reshape(-1), minlength=256)
    stream = encode_plane_batch(planes.reshape(2, -1), hist, chunk_len=256)
    if stream.payload.size:
        stream.payload[0] ^= 0x5A
        with pytest.raises(ValueError):
            decode_plane_batch(stream)
