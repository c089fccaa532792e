"""8-bit direct input path (Frame's uint8 ctor, fusion_power_video.cc:453-465).

A uint8 frame is defined to be bitstream-identical to its uint16 widening
encoded with shift=8 little-endian: the sample bytes become the single
(high) plane and NO_LOW_BYTES is set.  These tests pin that identity at
every entry point (FPV1 Encoder, FPVT writer, columnar, Arrow), the
roundtrip back to uint8, and interop with the compiled reference binaries.
"""

import numpy as np
import pytest

from conftest import have_reference, ref_decode, ref_encode, requires_reference
from fpv_tpu.api import frame as frame_ops
from fpv_tpu.api.decoder import decode_file
from fpv_tpu.api.encoder import Encoder, encode_file
from fpv_tpu.api.frame import FrameFlags


def _u8_frames(n=5, h=24, w=32, seed=7):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 200, size=(h, w), dtype=np.uint8)
    return np.stack(
        [(base + rng.integers(0, 20, size=(h, w))).astype(np.uint8) for _ in range(n)]
    )


def test_split_planes_u8_matches_widened_shift8():
    img = _u8_frames(1)[0]
    p8 = frame_ops.split_planes(img)
    p16 = frame_ops.split_planes(img.astype(np.uint16), shift=8)
    np.testing.assert_array_equal(p8.high, p16.high)
    assert p8.low is None and p16.low is None
    assert p8.flags & FrameFlags.NO_LOW_BYTES
    assert p16.flags & FrameFlags.NO_LOW_BYTES


def test_device_split_planes_u8_matches_widened_shift8():
    from fpv_tpu.ops.planes import split_planes as dsplit

    imgs = _u8_frames(3)
    h8, l8, nz8 = dsplit(imgs)
    h16, l16, nz16 = dsplit(imgs.astype(np.uint16), shift=8)
    np.testing.assert_array_equal(np.asarray(h8), np.asarray(h16))
    np.testing.assert_array_equal(np.asarray(l8), np.asarray(l16))
    np.testing.assert_array_equal(np.asarray(nz8), np.asarray(nz16))
    assert not np.asarray(nz8).any()


def test_fpv1_u8_byte_identity_and_roundtrip():
    frames = _u8_frames()
    data8 = encode_file(frames, num_threads=2)  # shift auto-selects 8
    data16 = encode_file(frames.astype(np.uint16), shift=8, num_threads=0)
    assert data8 == data16
    out = decode_file(data8, dtype=np.uint8)
    np.testing.assert_array_equal(out, frames)


def test_fpv1_encoder_u8_requires_shift8():
    frames = _u8_frames(2)
    enc = Encoder(num_threads=0, shift=0)
    with pytest.raises(ValueError, match="uint8"):
        enc.init(frames[0], frames.shape[2], frames.shape[1], lambda d, p: None)
    with pytest.raises(ValueError, match="uint8"):
        encode_file(frames, shift=4)


@requires_reference
def test_fpv1_u8_reference_interop():
    """Our u8-encoded file == the reference's shift=8 encode of the widened
    raw, and the reference decodes our u8 file back to the samples."""
    if not have_reference():
        pytest.skip("reference toolchain unavailable")
    frames = _u8_frames(4, 16, 20)
    n, h, w = frames.shape
    ours = encode_file(frames, num_threads=2)
    raw16 = frames.astype("<u2").tobytes()
    theirs = ref_encode(raw16, w, h, 0, 8, threads=2)
    assert ours == theirs
    raw_back = ref_decode(ours, w, h, 0, 8)
    np.testing.assert_array_equal(
        np.frombuffer(raw_back, "<u2").reshape(n, h, w).astype(np.uint8), frames
    )


def test_fpvt_u8_byte_identity_and_roundtrip():
    from fpv_tpu.api.fpvt_codec import decode_file_fpvt, encode_file_fpvt

    frames = _u8_frames(6, 16, 16)
    data8 = encode_file_fpvt(frames, frames_per_batch=3)
    data16 = encode_file_fpvt(
        frames.astype(np.uint16), shift=8, frames_per_batch=3
    )
    assert data8 == data16
    out = decode_file_fpvt(data8, dtype=np.uint8)
    np.testing.assert_array_equal(out, frames)
    with pytest.raises(ValueError, match="uint8"):
        encode_file_fpvt(frames, shift=4)
    # dtype=uint8 decode of a non-shift-8 file is rejected
    d0 = encode_file_fpvt(frames.astype(np.uint16) << 8, shift=0)
    with pytest.raises(ValueError, match="uint8"):
        decode_file_fpvt(d0, dtype=np.uint8)


def test_columnar_u8_roundtrip():
    from fpv_tpu.batch.columnar import (
        ColumnarBatchDecoder,
        ColumnarBatchEncoder,
        ImageType,
    )

    frames = _u8_frames(5, 16, 16)
    h, w = frames.shape[1:]
    batches = []
    enc = ColumnarBatchEncoder(
        w, h, 8, False, lambda b: batches.append(b) if b is not None else None,
        frames_per_batch=2,
    )
    for i in range(len(frames)):
        enc.push_frame(100 + i, frames[i]).result(timeout=60)
    enc.close().result(timeout=60)
    enc.join()
    images = []
    dec = ColumnarBatchDecoder(
        ImageType.MSB8, unshift=False, image_processor=images.append
    )
    for b in batches:
        dec.push_batch(b).result(timeout=60)
    dec.close().result(timeout=60)
    dec.join()
    assert len(images) == 5
    for i, img in enumerate(images):
        np.testing.assert_array_equal(img.data8().reshape(h, w), frames[i])
    # wrong stream config is rejected up front (synchronously)
    enc0 = ColumnarBatchEncoder(w, h, 0, False, lambda b: None)
    with pytest.raises(ValueError, match="uint8"):
        enc0.push_frame(0, frames[0])
    enc0.close().result(timeout=60)
    enc0.join()


def test_arrow_u8_roundtrip():
    pa = pytest.importorskip("pyarrow")  # noqa: F841
    from fpv_tpu.batch.arrow import ArrowEncoder, decode_record_batch

    frames = _u8_frames(4, 16, 16)
    h, w = frames.shape[1:]
    rbs = []
    enc = ArrowEncoder(
        w, h, 8, False,
        lambda rb: rbs.append(rb) if rb is not None else None,
        frames_per_batch=2,
    )
    for i in range(len(frames)):
        enc.push_frame(i, frames[i]).result(timeout=60)
    enc.close().result(timeout=60)
    enc.join()
    decoded = []
    for rb in rbs:
        decoded.extend(decode_record_batch(rb))
    assert len(decoded) == 4
    for i, img in enumerate(decoded):
        np.testing.assert_array_equal((img >> 8).astype(np.uint8), frames[i])
