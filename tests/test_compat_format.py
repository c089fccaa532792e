"""FPV1 (reference-format) compatibility tests.

The gold standard: our encoder must produce byte-identical files to the
compiled reference encoder, and each side must decode the other's output
losslessly.
"""

import os

import numpy as np
import pytest

from fpv_tpu.api.decoder import RandomAccessDecoder, StreamingDecoder, decode_file
from fpv_tpu.api.encoder import encode_file
from fpv_tpu.api.frame import unextract_frame
from fpv_tpu.utils import testdata


@pytest.mark.parametrize(
    "shift,big_endian",
    [(0, False), (4, False), (8, False), (0, True), (3, True), (8, True)],
)
def test_native_compress_frame_matches_numpy_path(shift, big_endian):
    """The whole-frame native FPV1 pipeline (fpv_native.compress_frame) is
    byte-identical to the numpy oracle path across shift/endian variants."""
    frames = testdata.plasma_frames(5, 48, 64, bits=16 - shift, seed=11)
    old = os.environ.get("FPV_TPU_COMPAT_NATIVE")
    try:
        os.environ["FPV_TPU_COMPAT_NATIVE"] = "0"
        a = encode_file(frames, shift=shift, big_endian=big_endian,
                        num_threads=0)
        os.environ["FPV_TPU_COMPAT_NATIVE"] = "1"
        b = encode_file(frames, shift=shift, big_endian=big_endian,
                        num_threads=0)
    finally:
        if old is None:
            os.environ.pop("FPV_TPU_COMPAT_NATIVE", None)
        else:
            os.environ["FPV_TPU_COMPAT_NATIVE"] = old
    assert a == b

from conftest import ref_decode, ref_encode, requires_reference

CONFIGS = [
    # (bits, shift, big_endian)
    (16, 0, False),
    (12, 4, False),
    (12, 4, True),
    (8, 8, False),
    (16, 0, True),
]


def _roundtrip_frames(frames, shift, big_endian):
    raw = testdata.to_raw_bytes(frames, big_endian=big_endian)
    # the encoder sees raw bytes reinterpreted as native-LE uint16
    imgs = np.frombuffer(raw, dtype="<u2").reshape(frames.shape).astype(np.uint16)
    return raw, imgs


@pytest.mark.parametrize("bits,shift,big_endian", CONFIGS)
@requires_reference
def test_encode_byte_exact_vs_reference(bits, shift, big_endian):
    frames = testdata.plasma_frames(4, 48, 64, bits=bits)
    raw, imgs = _roundtrip_frames(frames, shift, big_endian)
    ref_bytes = ref_encode(raw, 64, 48, int(big_endian), shift)
    ours = encode_file(imgs, shift=shift, big_endian=big_endian, num_threads=2)
    assert ours == ref_bytes


@pytest.mark.parametrize("bits,shift,big_endian", CONFIGS)
@requires_reference
def test_decode_reference_files(bits, shift, big_endian):
    frames = testdata.plasma_frames(4, 48, 64, bits=bits)
    raw, imgs = _roundtrip_frames(frames, shift, big_endian)
    ref_bytes = ref_encode(raw, 64, 48, int(big_endian), shift)
    decoded = decode_file(ref_bytes)
    assert decoded.shape == (4, 48, 64)
    out = b"".join(
        unextract_frame(decoded[i], shift, big_endian).tobytes() for i in range(4)
    )
    assert out == raw


@pytest.mark.parametrize("bits,shift,big_endian", CONFIGS)
@requires_reference
def test_reference_decodes_our_files(bits, shift, big_endian):
    frames = testdata.plasma_frames(4, 48, 64, bits=bits)
    raw, imgs = _roundtrip_frames(frames, shift, big_endian)
    ours = encode_file(imgs, shift=shift, big_endian=big_endian, num_threads=0)
    out = ref_decode(ours, 64, 48, int(big_endian), shift)
    assert out == raw


@pytest.mark.parametrize(
    "gen",
    [
        lambda: testdata.plasma_frames(3, 32, 32),
        lambda: testdata.ramp_frames(3, 36, 44),
        lambda: testdata.noise_frames(3, 32, 32),
        lambda: testdata.constant_frames(3, 32, 32),
    ],
)
def test_self_roundtrip(gen):
    frames = gen()
    data = encode_file(frames, num_threads=0)
    decoded = decode_file(data)
    np.testing.assert_array_equal(decoded, frames)


def test_streaming_decoder_chunked_feed():
    """Feed the bitstream in 97-byte chunks to exercise buffer carry paths
    (cf. benchmark.cc:193-235 which uses 64 KiB chunks)."""
    frames = testdata.plasma_frames(5, 32, 48)
    data = encode_file(frames, num_threads=2)
    dec = StreamingDecoder()
    got = []

    def cb(ok, frame, xs, ys, payload):
        assert ok
        got.append(np.array(frame))

    for pos in range(0, len(data), 97):
        dec.decode(data[pos : pos + 97], cb)
    assert len(got) == 5
    np.testing.assert_array_equal(np.stack(got), frames)


def test_random_access_decoder_previews():
    frames = testdata.plasma_frames(3, 64, 64)
    data = encode_file(frames, num_threads=0)
    dec = RandomAccessDecoder()
    assert dec.init(data)
    assert dec.numframes == 3
    assert (dec.preview_xsize, dec.preview_ysize) == (16, 16)
    # decode out of order
    for i in (2, 0, 1):
        np.testing.assert_array_equal(dec.decode_frame(i), frames[i])
        pv = dec.decode_preview(i)
        assert pv.shape == (16, 16)
        # previews are the 4x4 box filter of the high plane, LSB cleared
        high = (frames[i] >> 8).astype(np.uint32)
        expect = (
            high.reshape(16, 4, 16, 4).sum(axis=(1, 3)) // 16
        ).astype(np.uint8) & 0xFE
        np.testing.assert_array_equal(pv, expect)


def test_truncated_stream_is_prefix_decodable():
    """A truncated file without footer still streams (the format's "resume"
    property, fusion_power_video.cc:36-38)."""
    frames = testdata.plasma_frames(4, 32, 32)
    data = encode_file(frames, num_threads=0)
    # cut in the middle of the last frame chunk (before the footer)
    from fpv_tpu.format import container

    last_offset = container.parse_footer(data)[-1]
    cut = last_offset + 10
    dec = StreamingDecoder()
    got = []
    dec.decode(data[:cut], lambda ok, f, xs, ys, p: got.append(np.array(f)))
    assert len(got) == 3
    np.testing.assert_array_equal(np.stack(got), frames[:3])


@requires_reference
def test_decode_reference_grown_cg_previews_non_mult4():
    """Reference files at dims not a multiple of 4: the reference's preview
    CG transform codes xsize*ysize/16 entries (UB growth,
    fusion_power_video.cc:575-586).  Our decoder reproduces the grown-buffer
    inverse on decode only, so frames AND previews of every
    reference-produced file decode (VERDICT r2 item 7)."""
    from fpv_tpu.api.frame import FrameFlags, generate_preview
    from fpv_tpu.format import container

    h = w = 30  # 30 % 4 != 0 -> grown previews when CG is chosen
    frames = testdata.plasma_frames(4, h, w, bits=12, seed=21)
    raw = testdata.to_raw_bytes(frames << 4)
    ref_file = ref_encode(raw, w, h, 0, 0, threads=2)

    dec = RandomAccessDecoder()
    assert dec.init(ref_file)
    # main frames decode losslessly regardless of preview handling
    imgs = np.frombuffer(raw, dtype="<u2").reshape(4, h, w)
    for i in range(dec.numframes):
        got = unextract_frame(dec.decode_frame(i), 0, False)
        np.testing.assert_array_equal(
            np.frombuffer(got, dtype="<u2").reshape(h, w), imgs[i]
        )
    # at least one frame should have a CG-predicted (grown) preview on this
    # smooth content; every preview must decode and match the box filter of
    # the original high plane
    any_cg = False
    for i in range(dec.numframes):
        chunk = container.parse_frame_chunk(ref_file, dec._frame_offsets[i])
        pflags = ref_file[chunk.preview_start]
        any_cg |= bool(pflags & FrameFlags.USE_CG)
        pv = dec.decode_preview(i)
        assert pv.shape == (h // 4, w // 4)
        expect = generate_preview((imgs[i] >> 8).astype(np.uint8))
        np.testing.assert_array_equal(pv, expect)
    assert any_cg, "content did not trigger CG previews; test is vacuous"


def test_decode_file_threaded_matches_sequential():
    """Threaded decode_file (frames are independent; native stages release
    the GIL) is pixel-identical to the sequential path — the reference's
    decoders are single-threaded, so this is a strict multicore win."""
    import fpv_tpu
    from fpv_tpu.utils import testdata

    frames = testdata.plasma_frames(6, 64, 64, bits=12)
    raw = testdata.to_raw_bytes(frames)
    imgs = np.frombuffer(raw, dtype="<u2").reshape(6, 64, 64)
    data = fpv_tpu.encode_file(imgs, shift=4, num_threads=0)
    seq = fpv_tpu.decode_file(data)
    par = fpv_tpu.decode_file(data, num_threads=4)
    np.testing.assert_array_equal(seq, par)


def test_native_decompress_image_matches_python_path(monkeypatch):
    """The whole-image native decode fast path is bit-exact vs the
    numpy/python oracle across flag configurations (delta on/off, CG,
    NO_LOW_BYTES), and malformed bitstreams raise ValueError on both."""
    import fpv_tpu
    from fpv_tpu.format import container
    from fpv_tpu.utils import testdata

    if container._native_decompress_image() is None:
        pytest.skip("native extension not built")
    for bits, shift in [(12, 4), (8, 8), (16, 0)]:
        frames = testdata.plasma_frames(5, 48, 64, bits=bits)
        raw = testdata.to_raw_bytes(frames)
        imgs = np.frombuffer(raw, dtype="<u2").reshape(5, 48, 64)
        data = fpv_tpu.encode_file(imgs, shift=shift, num_threads=0)
        nat = fpv_tpu.decode_file(data)
        monkeypatch.setenv("FPV_TPU_COMPAT_NATIVE", "0")
        ref = fpv_tpu.decode_file(data)
        monkeypatch.delenv("FPV_TPU_COMPAT_NATIVE")
        np.testing.assert_array_equal(nat, ref)
    # malformed: truncated brotli stream raises ValueError (both paths)
    with pytest.raises(ValueError):
        container.decompress_image(b"\x00\x01\x02", 8, 8)


def test_native_decode_writable_and_bomb_capped():
    """Native-path decode output is writable (consumers unshift in place,
    python-path parity), and an image bitstream whose planes decompress
    larger than the claimed dimensions raises ValueError instead of
    allocating unboundedly."""
    import fpv_tpu
    from fpv_tpu.format import container
    from fpv_tpu.format.bits import read_u32le
    from fpv_tpu.utils import testdata

    frames = testdata.plasma_frames(3, 64, 64, bits=12)
    raw = testdata.to_raw_bytes(frames)
    imgs = np.frombuffer(raw, dtype="<u2").reshape(3, 64, 64)
    data = fpv_tpu.encode_file(imgs, shift=4, num_threads=0)
    out = fpv_tpu.decode_file(data)
    out >>= 4  # must not raise: the decode path returns writable arrays
    # the delta image bitstream decoded with lying (smaller) dims
    dsize = read_u32le(data, 8)
    img_bs = data[8 + 5 : 8 + dsize]
    with pytest.raises(ValueError):
        container.decompress_image(img_bs, 8, 8)
