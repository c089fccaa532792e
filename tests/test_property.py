"""Property-based roundtrip tests (hypothesis) over random shapes/configs."""

import numpy as np
from hypothesis import given, settings, strategies as st

from fpv_tpu.api.decoder import decode_file
from fpv_tpu.api.encoder import encode_file
from fpv_tpu.api.fpvt_codec import decode_file_fpvt, encode_file_fpvt
from fpv_tpu.entropy.plane_codec import decode_plane_batch, encode_plane_batch


@settings(max_examples=12, deadline=None)
@given(
    n=st.integers(1, 4),
    h=st.integers(8, 40).map(lambda x: x * 4),
    w=st.integers(8, 40).map(lambda x: x * 4),
    shift=st.sampled_from([0, 2, 4, 8]),
    big_endian=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_fpv1_roundtrip_random(n, h, w, shift, big_endian, seed):
    """Raw-byte-level roundtrip: raw -> encode -> decode -> unextract == raw."""
    from fpv_tpu.api.frame import unextract_frame
    from fpv_tpu.utils import testdata

    rng = np.random.default_rng(seed)
    bits = 16 - shift
    values = rng.integers(0, 1 << bits, size=(n, h, w), dtype=np.uint16)
    raw = testdata.to_raw_bytes(values, big_endian=big_endian)
    imgs = np.frombuffer(raw, dtype="<u2").reshape(n, h, w)
    data = encode_file(imgs, shift=shift, big_endian=big_endian, num_threads=0)
    out = decode_file(data)
    raw2 = b"".join(
        unextract_frame(out[i], shift, big_endian).tobytes() for i in range(n)
    )
    assert raw2 == raw


@settings(max_examples=8, deadline=None)
@given(
    n=st.integers(1, 5),
    h=st.integers(4, 20).map(lambda x: x * 4),
    w=st.integers(4, 20).map(lambda x: x * 4),
    shift=st.sampled_from([0, 4]),
    fpb=st.integers(1, 4),
    klog=st.sampled_from([6, 8, 9, 10]),  # 10: segmented (2 segments); deeper
    # K is covered by test_segmented_chunks_* (interpret mode iterates all
    # K steps, so large K on tiny shapes explodes suite time)
    seed=st.integers(0, 2**31 - 1),
)
def test_fpvt_roundtrip_random(n, h, w, shift, fpb, klog, seed):
    rng = np.random.default_rng(seed)
    bits = 16 - shift
    frames = rng.integers(0, 1 << bits, size=(n, h, w), dtype=np.uint16)
    data = encode_file_fpvt(frames, shift=shift, frames_per_batch=fpb,
                            chunk_log2=klog)
    out = decode_file_fpvt(data)
    np.testing.assert_array_equal(out, (frames << shift).astype(np.uint16))


@settings(max_examples=10, deadline=None)
@given(
    b=st.integers(1, 3),
    s=st.integers(1, 3000),
    k=st.sampled_from([32, 64, 257, 512, 1024]),  # 1024: segmented
    loc=st.integers(0, 255),
    scale=st.integers(1, 80),
    seed=st.integers(0, 2**31 - 1),
)
def test_rans_plane_roundtrip_random(b, s, k, loc, scale, seed):
    rng = np.random.default_rng(seed)
    planes = (rng.normal(loc, scale, size=(b, s))).astype(np.int64) % 256
    planes = planes.astype(np.uint8)
    hist = np.bincount(planes.reshape(-1), minlength=256)
    stream = encode_plane_batch(planes, hist, chunk_len=k, engine="numpy")
    out = np.asarray(decode_plane_batch(stream, engine="numpy"))
    np.testing.assert_array_equal(out, planes)


@settings(max_examples=8, deadline=None)
@given(
    b=st.integers(1, 3),
    s=st.integers(16, 2500),
    k=st.sampled_from([32, 128, 512]),
    scale=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
)
def test_rans_ctx16_roundtrip_random(b, s, k, scale, seed):
    """Context-coded (nibble alphabet, 32 conditional tables) plane batches
    roundtrip for arbitrary even-valued content (the low-coding domain)."""
    from fpv_tpu.ops.rans_layout import CODING_CTX16

    rng = np.random.default_rng(seed)
    planes = (
        (rng.normal(0, scale, size=(b, s))).astype(np.int64) % 16 * 16
    ).astype(np.uint8)  # low-nibble-zero values, like shift>=4 low planes
    stream = encode_plane_batch(
        planes, None, chunk_len=k, engine="numpy", coding=CODING_CTX16
    )
    out = np.asarray(decode_plane_batch(stream, engine="numpy"))
    np.testing.assert_array_equal(out, planes)


@settings(max_examples=10, deadline=None)
@given(
    b=st.integers(1, 3),
    s=st.integers(1, 3000),
    const=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_rans_auto_policy_roundtrip_random(b, s, const, seed):
    """lanes='auto' (narrow geometry + const short-circuit) roundtrips and
    its streams survive a serialize -> parse cycle byte-exactly."""
    from fpv_tpu.format import fpvt as _fpvt
    from fpv_tpu.ops.rans_layout import CODING_CONST

    rng = np.random.default_rng(seed)
    if const:
        planes = np.full((b, s), int(rng.integers(0, 256)), np.uint8)
    else:
        planes = rng.integers(0, 256, size=(b, s), dtype=np.uint8)
    stream = encode_plane_batch(planes, None, engine="numpy", lanes="auto")
    if const:
        assert stream.coding == CODING_CONST
    blob = _fpvt.serialize_plane_stream(stream)
    parsed, end = _fpvt.parse_plane_stream(blob, 0, b, expect_size=s)
    assert end == len(blob)
    out = np.asarray(decode_plane_batch(parsed, engine="numpy"))
    np.testing.assert_array_equal(out, planes)
