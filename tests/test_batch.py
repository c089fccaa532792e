"""Columnar batch subsystem + Arrow frontend tests.

Mirrors the reference's manual test drivers
(columnar_batch_encoder_test.cc:27-53, columnar_batch_decoder_test.cc:19-56,
arrow/arrow_encoder_test.cc:22-48) but with assertions.
"""

import numpy as np
import pytest

from fpv_tpu.batch.columnar import (
    ColumnarBatchDecoder,
    ColumnarBatchEncoder,
    ImageType,
)
from fpv_tpu.utils import testdata


def _encode_frames(frames, shift=0, frames_per_batch=4):
    batches = []

    def processor(batch):
        if batch is not None:
            batches.append(batch)

    enc = ColumnarBatchEncoder(
        frames.shape[2], frames.shape[1], shift, False, processor,
        frames_per_batch=frames_per_batch,
    )
    futures = [
        enc.push_frame(100 + i, frames[i], info=i) for i in range(len(frames))
    ]
    assert [f.result(timeout=60) for f in futures] == list(range(len(frames)))
    last_ts = enc.close().result(timeout=60)
    enc.join()
    assert last_ts == 100 + len(frames) - 1
    return batches


def test_columnar_roundtrip_full():
    frames = testdata.ramp_frames(7, 24, 32)
    batches = _encode_frames(frames, frames_per_batch=3)
    assert [b.length for b in batches] == [3, 3, 1]

    images = []
    dec = ColumnarBatchDecoder(ImageType.FULL, unshift=False,
                               image_processor=images.append)
    for b in batches:
        assert dec.push_batch(b).result(timeout=60) is b
    dec.close().result(timeout=60)
    dec.join()
    assert len(images) == 7
    for i, img in enumerate(images):
        assert img.timestamp == 100 + i
        np.testing.assert_array_equal(
            img.data16().reshape(24, 32), frames[i]
        )


def test_columnar_unshift_and_msb8():
    frames = testdata.plasma_frames(4, 16, 16, bits=12)
    batches = _encode_frames(frames, shift=4, frames_per_batch=4)
    images = []
    dec = ColumnarBatchDecoder(ImageType.FULL, unshift=True,
                               image_processor=images.append)
    for b in batches:
        dec.push_batch(b).result(timeout=60)
    dec.close().result(timeout=60)
    for i, img in enumerate(images):
        assert img.bpp == 12
        np.testing.assert_array_equal(img.data16().reshape(16, 16), frames[i])

    msb = []
    dec8 = ColumnarBatchDecoder(ImageType.MSB8, unshift=False,
                                image_processor=msb.append)
    for b in batches:
        dec8.push_batch(b).result(timeout=60)
    dec8.close().result(timeout=60)
    for i, img in enumerate(msb):
        expect = ((frames[i].astype(np.uint16) << 4) >> 8).astype(np.uint8)
        np.testing.assert_array_equal(img.data8().reshape(16, 16), expect)


def test_columnar_previews():
    frames = testdata.plasma_frames(2, 32, 32)
    batches = _encode_frames(frames, frames_per_batch=2)
    images = []
    dec = ColumnarBatchDecoder(ImageType.PREVIEW, unshift=False,
                               image_processor=images.append)
    for b in batches:
        dec.push_batch(b).result(timeout=60)
    dec.close().result(timeout=60)
    for i, img in enumerate(images):
        assert (img.xsize, img.ysize, img.bpp) == (8, 8, 8)
        high = (frames[i] >> 8).astype(np.uint32)
        expect = ((high.reshape(8, 4, 8, 4).sum(axis=(1, 3)) // 16) & 0xFE)
        np.testing.assert_array_equal(
            img.data8().reshape(8, 8), expect.astype(np.uint8)
        )


def test_batch_recycling():
    frames = testdata.ramp_frames(6, 16, 16)
    batches = []
    enc = ColumnarBatchEncoder(16, 16, 0, False,
                               lambda b: batches.append(b) if b else None,
                               frames_per_batch=3)
    for i in range(3):
        enc.push_frame(i, frames[i]).result(timeout=60)
    import time

    for _ in range(100):
        if batches:
            break
        time.sleep(0.05)
    assert batches
    first = batches[0]
    enc.return_processed_batch(first)  # recycle
    for i in range(3, 6):
        enc.push_frame(i, frames[i]).result(timeout=60)
    enc.close().result(timeout=60)
    enc.join()
    assert len(batches) == 2
    assert batches[1] is first  # recycled arena reused


def test_random_frames_stress():
    """500-random-frame stress like columnar_batch_encoder_test.cc:41-50."""
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 1 << 16, size=(50, 16, 16), dtype=np.uint16)
    batches = _encode_frames(frames, frames_per_batch=13)
    images = []
    dec = ColumnarBatchDecoder(ImageType.FULL, unshift=False,
                               image_processor=images.append)
    for b in batches:
        dec.push_batch(b).result(timeout=60)
    dec.close().result(timeout=60)
    for i, img in enumerate(images):
        np.testing.assert_array_equal(img.data16().reshape(16, 16), frames[i])


def test_arrow_encoder_roundtrip():
    pa = pytest.importorskip("pyarrow")
    from fpv_tpu.batch.arrow import ArrowEncoder, decode_record_batch

    frames = testdata.plasma_frames(5, 24, 24, bits=12)
    record_batches = []

    enc = ArrowEncoder(24, 24, 4, False,
                       lambda rb: record_batches.append(rb) if rb else None,
                       frames_per_batch=2)
    for i in range(5):
        enc.push_frame(1000 + i, frames[i]).result(timeout=60)
    enc.close().result(timeout=60)
    enc.join()
    assert [rb.num_rows for rb in record_batches] == [2, 2, 1]
    rb = record_batches[0]
    assert rb.schema.names == [
        "timestamp", "deltaPredicted", "cgPredicted", "preview",
        "highBytePlane", "lowBytePlane",
    ]
    md = rb.schema.metadata
    assert md[b"xsize"] == b"24" and md[b"shiftedLeft"] == b"4"

    decoded = []
    for rb in record_batches:
        decoded.extend(decode_record_batch(rb))
    for i, img in enumerate(decoded):
        np.testing.assert_array_equal(
            img, (frames[i].astype(np.uint16) << 4)
        )


def test_arrow_no_low_plus_delta_roundtrip():
    """A frame whose ORIGINAL low plane is all zero (NO_LOW_BYTES) while the
    delta frame has nonzero low bytes must decode with a ZERO low plane —
    not the delta frame's (extract_image semantics; the naive inverse adds
    dlow to the zeros)."""
    pytest.importorskip("pyarrow")
    from fpv_tpu.batch.arrow import ArrowEncoder, decode_record_batch

    rng = np.random.default_rng(3)
    delta = rng.integers(0, 1 << 16, (16, 16)).astype(np.uint16)  # low != 0
    frame = (rng.integers(0, 256, (16, 16)).astype(np.uint16)) << 8  # low == 0
    rbs = []
    enc = ArrowEncoder(16, 16, 0, False,
                       lambda rb: rbs.append(rb) if rb else None,
                       frames_per_batch=4)
    enc.push_frame(0, delta).result(timeout=60)
    enc.push_frame(1, frame).result(timeout=60)
    enc.close().result(timeout=60)
    enc.join()
    decoded = [img for rb in rbs for img in decode_record_batch(rb)]
    np.testing.assert_array_equal(decoded[0], delta)
    np.testing.assert_array_equal(decoded[1], frame)


def test_arrow_empty_close_does_not_deadlock():
    pytest.importorskip("pyarrow")
    from fpv_tpu.batch.arrow import ArrowEncoder

    enc = ArrowEncoder(16, 16, 0, False, lambda rb: None)
    assert enc.close().result(timeout=60) == -1
    enc.join()


def test_arrow_worker_error_surfaces():
    """A predict/compress failure must surface through close(), not kill
    the serializer thread silently."""
    pytest.importorskip("pyarrow")
    from concurrent.futures import Future

    from fpv_tpu.batch.arrow import ArrowEncoder

    enc = ArrowEncoder(16, 16, 0, False, lambda rb: None)
    enc.push_frame(0, np.zeros((16, 16), np.uint16)).result(timeout=60)
    boom: Future = Future()
    boom.set_exception(ValueError("boom"))
    enc._queue.put(boom)  # a frame whose pipeline stage failed
    with pytest.raises(ValueError):
        enc.close().result(timeout=60)
