"""Profile transcoding: FPV1 <-> FPVT, lossless both ways."""

import numpy as np
import pytest

from fpv_tpu.api.decoder import decode_file
from fpv_tpu.api.encoder import encode_file
from fpv_tpu.api.transcode import (
    sniff_profile,
    transcode,
    transcode_to_fpv1,
    transcode_to_fpvt,
)
from fpv_tpu.utils import testdata

from conftest import ref_encode, requires_reference
from test_cli import run_cli


def _fpvt_decode(data: bytes) -> np.ndarray:
    from fpv_tpu.api.fpvt_codec import decode_file_fpvt

    return decode_file_fpvt(data)


def test_fpv1_to_fpvt_roundtrip():
    frames = testdata.plasma_frames(5, 24, 40, bits=12)  # raw 12-bit
    fpv1 = encode_file(frames, shift=4)
    out = transcode_to_fpvt(fpv1, shift=4, frames_per_batch=3)
    assert sniff_profile(out) == "fpvt"
    np.testing.assert_array_equal(_fpvt_decode(out), decode_file(fpv1))
    # the reference CLI layout (frame 0 == delta) earns the stored-once flag
    from fpv_tpu.format.fpvt import Header

    assert Header.parse(out).delta_is_frame0
    assert Header.parse(out).shift == 4


def test_fpv1_to_fpvt_distinct_delta():
    frames = testdata.plasma_frames(4, 16, 24)
    delta = testdata.plasma_frames(1, 16, 24, seed=9)[0]
    fpv1 = encode_file(frames, delta_frame=delta)
    out = transcode_to_fpvt(fpv1, frames_per_batch=2)
    from fpv_tpu.format.fpvt import Header

    assert not Header.parse(out).delta_is_frame0
    np.testing.assert_array_equal(_fpvt_decode(out), decode_file(fpv1))


def test_fpv1_to_fpvt_wrong_shift_rejected():
    # left-aligned samples with nonzero low bits are not representable at
    # shift=4; the transcoder must refuse rather than silently truncate
    frames = testdata.plasma_frames(2, 16, 16, bits=16)
    frames |= 1
    fpv1 = encode_file(frames, shift=0)
    with pytest.raises(ValueError, match="not representable"):
        transcode_to_fpvt(fpv1, shift=4)


def test_fpvt_to_fpv1_roundtrip():
    from fpv_tpu.api.fpvt_codec import encode_file_fpvt

    frames = testdata.plasma_frames(5, 24, 32, bits=12)
    fpvt = encode_file_fpvt(frames, shift=4, frames_per_batch=2)
    out = transcode_to_fpv1(fpvt)
    assert sniff_profile(out) == "fpv1"
    np.testing.assert_array_equal(decode_file(out), _fpvt_decode(fpvt))


def test_fpvt_to_fpv1_drops_timestamps_with_warning():
    from fpv_tpu.api.fpvt_codec import encode_file_fpvt

    frames = testdata.plasma_frames(3, 16, 16)
    ts = np.arange(3, dtype=np.int64) * 1000
    fpvt = encode_file_fpvt(frames, frames_per_batch=2, timestamps=ts)
    with pytest.warns(UserWarning, match="timestamp"):
        out = transcode_to_fpv1(fpvt)
    np.testing.assert_array_equal(decode_file(out), _fpvt_decode(fpvt))


def test_fpv1_to_fpvt_big_endian_roundtrip():
    # big-endian raw contract: the FPVT header records it, and the final
    # FPV1 re-encode reproduces the same decoded pixels
    frames = testdata.plasma_frames(3, 16, 24, bits=12)
    raw = testdata.to_raw_bytes(frames, shift=4, big_endian=True)
    imgs = np.frombuffer(raw, dtype="<u2").reshape(3, 16, 24)
    fpv1 = encode_file(imgs, shift=4, big_endian=True)
    out = transcode_to_fpvt(fpv1, shift=4, big_endian=True)
    from fpv_tpu.format.fpvt import Header

    hdr = Header.parse(out)
    assert hdr.big_endian and hdr.shift == 4
    np.testing.assert_array_equal(_fpvt_decode(out), decode_file(fpv1))
    back = transcode_to_fpv1(out)
    np.testing.assert_array_equal(decode_file(back), decode_file(fpv1))


def test_transcode_same_profile_is_identity():
    frames = testdata.plasma_frames(2, 16, 16)
    fpv1 = encode_file(frames)
    assert transcode(fpv1, "fpv1") == fpv1
    with pytest.raises(ValueError, match="unknown profile"):
        transcode(fpv1, "zip")


@requires_reference
def test_reference_file_to_fpvt_and_back():
    """A file produced by the compiled reference transcodes to FPVT and
    back; the final FPV1 decodes to the reference stream's exact pixels."""
    frames = testdata.plasma_frames(4, 24, 40, bits=12)
    raw = testdata.to_raw_bytes(frames, shift=4)
    ref_file = ref_encode(raw, 40, 24, 0, 4)
    fpvt = transcode_to_fpvt(ref_file, shift=4, frames_per_batch=2)
    np.testing.assert_array_equal(_fpvt_decode(fpvt), decode_file(ref_file))
    back = transcode_to_fpv1(fpvt)
    np.testing.assert_array_equal(decode_file(back), decode_file(ref_file))


def test_cli_transcode_pipe():
    frames = testdata.plasma_frames(3, 16, 24, bits=12)
    fpv1 = encode_file(frames, shift=4)
    fpvt = run_cli("fpv_tpu.cli.transcode", ["fpvt", "4"], fpv1)
    assert fpvt[:4] == b"FPVT"
    back = run_cli("fpv_tpu.cli.transcode", ["fpv1"], fpvt)
    np.testing.assert_array_equal(decode_file(back), decode_file(fpv1))


def test_cli_transcode_usage():
    import os
    import subprocess
    import sys

    from conftest import REPO

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    p = subprocess.run(
        [sys.executable, "-m", "fpv_tpu.cli.transcode", "gif"],
        input=b"", capture_output=True, cwd=REPO, env=env,
    )
    assert p.returncode == 1 and b"Usage" in p.stderr
