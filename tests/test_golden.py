"""Golden wire-format fixtures: readability of every shipped format
version, plus a hash pin on the current writer's output.

The reference treats its format as a frozen contract (the normative spec
comment, /root/reference/fusion_power_video.cc:30-155); FPVT versions v4
and v5 were produced by the GENUINE historical writers extracted from git
history (see tests/golden/make_fixtures.py).  If one of these stops
decoding, the reader broke compatibility — fix the reader, never the
fixture.  If a hash pin fails, the writer's wire output changed: that is
only OK together with a VERSION bump, a new fixture for the old version,
and a refreshed pin.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pytest

from fpv_tpu.api.decoder import decode_file
from fpv_tpu.api.encoder import encode_file
from fpv_tpu.api.fpvt_codec import decode_file_fpvt, encode_file_fpvt
from fpv_tpu.format import fpvt

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

ENC = dict(shift=4, frames_per_batch=4, chunk_log2=8)
ENC_NOISE = dict(shift=0, frames_per_batch=4, chunk_log2=8)


@pytest.fixture(scope="module")
def inputs():
    with np.load(os.path.join(GOLDEN, "inputs.npz")) as z:
        return {k: z[k] for k in z.files}


def _blob(name: str) -> bytes:
    with open(os.path.join(GOLDEN, name), "rb") as f:
        return f.read()


@pytest.mark.parametrize("name,version", [("v4.fpvt", 4), ("v5.fpvt", 5)])
def test_historical_fpvt_fixture_decodes(inputs, name, version):
    data = _blob(name)
    assert data[4] == version
    want = (inputs["drift"].astype(np.uint16) << 4).astype(np.uint16)
    np.testing.assert_array_equal(decode_file_fpvt(data), want)


def test_current_fpvt_fixture_decodes(inputs):
    data = _blob(f"v{fpvt.VERSION}_drift.fpvt")
    assert data[4] == fpvt.VERSION
    want = (inputs["drift"].astype(np.uint16) << 4).astype(np.uint16)
    np.testing.assert_array_equal(decode_file_fpvt(data), want)


def test_raw_fpvt_fixture_decodes(inputs):
    """The raw fixture must both decode losslessly AND actually contain a
    CODING_RAW stream (else it is not pinning the v6 feature)."""
    from fpv_tpu.api.fpvt_codec import FpvtReader
    from fpv_tpu.ops.rans_layout import CODING_RAW

    data = _blob(f"v{fpvt.VERSION}_raw.fpvt")
    np.testing.assert_array_equal(decode_file_fpvt(data), inputs["noise16"])
    r = FpvtReader(data)
    pb = r._parse_batch(r._batches[0][0])
    assert any(ps is not None and ps.coding == CODING_RAW
               for ps in (pb.high, pb.low, pb.preview))


def test_fpv1_fixture_decodes(inputs):
    want = (inputs["drift"].astype(np.uint16) << 4).astype(np.uint16)
    np.testing.assert_array_equal(decode_file(_blob("v1_drift.fpv")), want)


def test_writer_hash_pins(inputs):
    """Re-encode the committed inputs with the CURRENT writer and compare
    SHA-256 against the pinned hashes — any silent wire change fails here
    before it can orphan old files."""
    with open(os.path.join(GOLDEN, "hashes.json")) as f:
        pins = json.load(f)
    got = {
        f"v{fpvt.VERSION}_drift.fpvt": encode_file_fpvt(
            inputs["drift"], **ENC),
        f"v{fpvt.VERSION}_raw.fpvt": encode_file_fpvt(
            inputs["noise16"], **ENC_NOISE),
        "v1_drift.fpv": encode_file(inputs["drift"], shift=4, num_threads=0),
    }
    assert set(got) == set(pins)
    for name, blob in got.items():
        assert hashlib.sha256(blob).hexdigest() == pins[name], (
            f"{name}: writer wire output changed — if intentional, bump "
            "VERSION, add a fixture for the old version, refresh the pin")


def test_fixture_bytes_match_pins():
    """The committed fixture files themselves match the pinned hashes
    (guards against corrupted/regenerated-but-not-repinned fixtures)."""
    with open(os.path.join(GOLDEN, "hashes.json")) as f:
        pins = json.load(f)
    for name, want in pins.items():
        assert hashlib.sha256(_blob(name)).hexdigest() == want, name
