"""Plane-adopting ingest: pre-split high/low byte planes enter the FPV1
Encoder and the FPVT writer without a combine/split round trip, producing
byte-identical output to image ingest.

Parity target: the reference's plane-adopting Frame ctor
(/root/reference/fusion_power_video.cc:467-489) — the one reference API
surface that was still missing after round 4.
"""

from __future__ import annotations

import numpy as np
import pytest

from fpv_tpu.api import frame as frame_ops
from fpv_tpu.api.decoder import decode_file
from fpv_tpu.api.encoder import Encoder, encode_file
from fpv_tpu.api.fpvt_codec import FpvtWriter, decode_file_fpvt
from fpv_tpu.utils import testdata


def _split_host(frames: np.ndarray, shift: int) -> tuple[np.ndarray, np.ndarray]:
    """Host split at the writer's config (what a plane-producing camera
    driver would deliver)."""
    highs, lows = [], []
    for f in frames:
        p = frame_ops.split_planes(f, shift=shift, big_endian=False)
        highs.append(p.high)
        lows.append(p.low)
    return np.stack(highs), np.stack(lows)


def _encode_fpv1_planes(
    highs: np.ndarray, lows, shift: int, num_threads: int
) -> bytes:
    chunks: list[bytes] = []

    def cb(data: bytes, _p) -> None:
        chunks.append(data)

    enc = Encoder(num_threads=num_threads, shift=shift)
    enc.init_planes(highs[0], None if lows is None else lows[0], cb)
    for i in range(len(highs)):
        enc.compress_frame_planes(
            highs[i], None if lows is None else lows[i], cb
        )
    enc.finish(cb)
    return b"".join(chunks)


@pytest.mark.parametrize("native", [True, False])
@pytest.mark.parametrize("num_threads", [0, 2])
def test_fpv1_plane_ingest_byte_identical(monkeypatch, native, num_threads):
    if not native:
        monkeypatch.setenv("FPV_TPU_COMPAT_NATIVE", "0")
    frames = testdata.plasma_frames(5, 40, 56, bits=12, seed=3)
    shift = 4
    ref = encode_file(frames, shift=shift, num_threads=num_threads)
    highs, lows = _split_host(frames, shift)
    got = _encode_fpv1_planes(highs, lows, shift, num_threads)
    assert got == ref
    want = (frames.astype(np.uint16) << shift).astype(np.uint16)
    np.testing.assert_array_equal(decode_file(got), want)


@pytest.mark.parametrize("native", [True, False])
def test_fpv1_plane_ingest_no_low(monkeypatch, native):
    """low=None and an all-zero low both produce NO_LOW_BYTES frames,
    byte-identical to image ingest of high<<8 (split :447-449 semantics)."""
    if not native:
        monkeypatch.setenv("FPV_TPU_COMPAT_NATIVE", "0")
    rng = np.random.default_rng(7)
    highs = rng.integers(0, 256, (3, 24, 40), dtype=np.uint8)
    imgs = highs.astype(np.uint16) << 8
    ref = encode_file(imgs, shift=0, num_threads=0)
    got_none = _encode_fpv1_planes(highs, None, 0, 0)
    got_zero = _encode_fpv1_planes(
        highs, np.zeros_like(highs), 0, 0
    )
    assert got_none == ref
    assert got_zero == ref


def test_adopt_planes_matches_split():
    img = testdata.plasma_frames(1, 32, 48, bits=12, seed=9)[0]
    sp = frame_ops.split_planes(img, shift=4)
    ad = frame_ops.adopt_planes(sp.high, sp.low)
    assert ad.flags == sp.flags
    np.testing.assert_array_equal(ad.high, sp.high)
    np.testing.assert_array_equal(ad.low, sp.low)
    # missing low -> NO_LOW_BYTES, like the image ctor's all-zero case
    assert frame_ops.adopt_planes(sp.high).flags == int(
        frame_ops.FrameFlags.NO_LOW_BYTES
    )


def test_fpvt_plane_ingest_byte_identical():
    frames = testdata.plasma_frames(8, 32, 48, bits=12, seed=11)
    shift = 4
    kw = dict(frames_per_batch=4, chunk_log2=6, delta_is_frame0=True)

    wa = FpvtWriter(48, 32, shift=shift, **kw)
    parts_a = [wa.init(frames[0])]
    for s in range(1, 8, 4):
        parts_a.append(wa.encode_batch(frames[s : s + 4]))
    parts_a.append(wa.finish())
    file_a = b"".join(parts_a)

    highs, lows = _split_host(frames, shift)
    wb = FpvtWriter(48, 32, shift=shift, **kw)
    parts_b = [wb.init_planes(highs[0], lows[0])]
    for s in range(1, 8, 4):
        parts_b.append(
            wb.encode_batch_planes(highs[s : s + 4], lows[s : s + 4])
        )
    parts_b.append(wb.finish())
    file_b = b"".join(parts_b)

    assert file_a == file_b
    want = (frames.astype(np.uint16) << shift).astype(np.uint16)
    np.testing.assert_array_equal(decode_file_fpvt(file_b), want)


def test_fpvt_plane_ingest_no_low_roundtrip():
    """high-only plane ingest stays lossless (F_NO_LOW batches)."""
    rng = np.random.default_rng(13)
    highs = (rng.integers(0, 200, (4, 32, 48)) // 8 * 8).astype(np.uint8)
    w = FpvtWriter(48, 32, shift=0, frames_per_batch=4, chunk_log2=6,
                   delta_is_frame0=True)
    parts = [w.init_planes(highs[0]), w.encode_batch_planes(highs[1:]),
             w.finish()]
    out = decode_file_fpvt(b"".join(parts))
    np.testing.assert_array_equal(
        out, highs.astype(np.uint16) << 8
    )
