"""FPV1 container format (reference-compatible), host-side layer.

Implements the normative format of fusion_power_video.cc:30-155 with the
code-over-comment corrections (previews are 1/4 scale per dimension, preview
chunk layout per Frame::OutputFull at fusion_power_video.cc:830-846):

    file   := header deltaframe frame* footer
    header := xsize:u32le ysize:u32le
    deltaframe := size:u32le flag:u8=1 image            (size includes itself)
    frame  := size:u32le flag:u8=0 preview_size:u32le   (preview_size includes
              preview_image image                        the preview flags byte)
    image  := flags:u8 [brotli(low)] brotli(high)
    footer := size:u32le flag:u8=2 offset:u64le* count:u64le

This module does chunk framing and per-image (de)serialization against the
brotli bridge; prediction/plane math lives in fpv_tpu.api.frame and
fpv_tpu.ops.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from fpv_tpu.api.frame import (
    ChunkFlags,
    FrameFlags,
    FramePlanes,
    combine_planes,
    combine_planes_delta,
)
from fpv_tpu.entropy import brotli
from fpv_tpu.format.bits import read_u32le, read_u64le, u32le, u64le, out_of_bounds
from fpv_tpu.models import predictors

MAX_IMAGE_SIZE = 1_000_000_000  # OOM guard (fusion_power_video.cc:164)
MAX_DIM = 65536


def serialize_image(planes: FramePlanes) -> bytes:
    """Predicted byte planes -> image bitstream (flags + brotli streams).

    Matches Frame::ApplyBrotliCompression + OutputCore
    (fusion_power_video.cc:643-688, 820-828): flags byte, compressed low
    stream (unless NO_LOW_BYTES), compressed high stream.
    """
    flags = int(planes.flags)
    parts = [bytes([flags])]
    if not flags & FrameFlags.NO_LOW_BYTES:
        assert planes.low is not None
        parts.append(brotli.compress(planes.low.tobytes()))
    parts.append(brotli.compress(planes.high.tobytes()))
    return b"".join(parts)


def serialize_preview_image(preview: np.ndarray, main_flags: int) -> bytes:
    """Preview image bitstream with flags ``(main & USE_CG) | NO_LOW_BYTES``.

    Port of the preview section of Frame::OutputFull
    (fusion_power_video.cc:841-843).
    """
    flags = (int(main_flags) & FrameFlags.USE_CG) | FrameFlags.NO_LOW_BYTES
    return bytes([flags]) + brotli.compress(preview.tobytes())


@dataclasses.dataclass
class DecodedImage:
    """Raw decode result of one image bitstream (before plane combine)."""

    flags: int
    high: np.ndarray
    low: np.ndarray


def parse_image(
    data: bytes, xsize: int, ysize: int, grown_size: int | None = None
) -> DecodedImage:
    """Decode flags + brotli planes + CG reconstruction (not delta).

    First half of DecompressImage (fusion_power_video.cc:296-333): parse
    flags, decode low then high brotli streams (two concatenated streams),
    un-apply clamped-gradient prediction on the high plane.

    ``grown_size``: additionally-accepted CG-plane length, for decoding
    reference-encoded previews of frames whose dimensions are not
    multiples of 4.  The reference's preview CG transform iterates
    ``full_size/16`` entries with stride ``xsize/4``
    (fusion_power_video.cc:575-586) — out of bounds of its own
    ``(x/4)*(y/4)`` preview (UB), silently growing the coded buffer to
    full_size/16.  The CG inverse of the first (x/4)*(y/4) entries depends
    only on earlier entries, so running the inverse over the grown flat
    buffer and truncating reconstructs the true preview pixels exactly.
    Our encoder never produces such streams (it codes the real preview
    extent); this is decode-side tolerance only.
    """
    if not data:
        raise ValueError("out of bounds")
    flags = data[0]
    use_cg = bool(flags & FrameFlags.USE_CG)
    zero_low = bool(flags & FrameFlags.NO_LOW_BYTES)
    if not xsize or not ysize:
        raise ValueError("invalid image dimensions")
    numpixels = xsize * ysize
    pos = 1
    if zero_low:
        low = np.zeros((ysize, xsize), dtype=np.uint8)
    else:
        low_bytes, pos = brotli.decompress_stream(data, pos)
        if len(low_bytes) == numpixels:
            low = np.frombuffer(low_bytes, dtype=np.uint8).reshape(
                ysize, xsize
            )
        elif grown_size is not None and len(low_bytes) == grown_size:
            low = (
                np.frombuffer(low_bytes, dtype=np.uint8)[:numpixels]
                .reshape(ysize, xsize)
            )
        else:
            raise ValueError("wrong decompressed plane size")
    high_bytes, pos = brotli.decompress_stream(data, pos)
    if len(high_bytes) == numpixels:
        high = np.frombuffer(high_bytes, dtype=np.uint8).reshape(ysize, xsize)
        if use_cg:
            high = predictors.cg_decode(high)
    elif (
        grown_size is not None
        and use_cg
        and len(high_bytes) == grown_size
        and grown_size > numpixels
    ):
        # reference grown-preview semantics: CG-invert the flat grown
        # buffer at stride xsize, then truncate to the true extent
        rows = -(-grown_size // xsize)
        buf = np.zeros(rows * xsize, np.uint8)
        buf[:grown_size] = np.frombuffer(high_bytes, dtype=np.uint8)
        dec = predictors.cg_decode(buf.reshape(rows, xsize))
        high = dec.reshape(-1)[:numpixels].reshape(ysize, xsize)
    else:
        raise ValueError("wrong decompressed plane size")
    return DecodedImage(flags=flags, high=high, low=low)


def _native_decompress_image():
    """fpv_native.decompress_image if available (FPV_TPU_COMPAT_NATIVE=0
    forces the Python/numpy path, the tested oracle)."""
    import os

    if os.environ.get("FPV_TPU_COMPAT_NATIVE") == "0":
        return None
    return getattr(brotli._native, "decompress_image", None)


def decompress_image(
    data: bytes,
    xsize: int,
    ysize: int,
    delta_frame: np.ndarray | None = None,
    grown_size: int | None = None,
) -> np.ndarray:
    """Full DecompressImage (fusion_power_video.cc:296-347) -> uint16 [H, W].

    Fast path: the whole pipeline (brotli planes, un-CG scan, delta add +
    combine) runs in one GIL-released native call; the grown-preview UB
    tolerance (``grown_size``) stays on the Python path."""
    native = None if grown_size is not None else _native_decompress_image()
    if native is not None:
        delta = (
            None
            if delta_frame is None
            else np.ascontiguousarray(delta_frame, dtype=np.uint16)
        )
        out = native(bytes(data), xsize, ysize, delta)
        return np.frombuffer(out, dtype=np.uint16).reshape(ysize, xsize)
    img = parse_image(data, xsize, ysize, grown_size=grown_size)
    if img.flags & FrameFlags.USE_DELTA:
        if delta_frame is None:
            raise ValueError("delta frame not given")
        return combine_planes_delta(img.high, img.low, delta_frame)
    return combine_planes(img.high, img.low)


def serialize_header(xsize: int, ysize: int) -> bytes:
    return u32le(xsize) + u32le(ysize)


def serialize_delta_chunk(image_bitstream: bytes) -> bytes:
    """size:u32 (incl. itself) + chunk flag 1 + image (fusion_power_video.cc:60-65)."""
    size = 4 + 1 + len(image_bitstream)
    return u32le(size) + bytes([ChunkFlags.DELTA_FRAME]) + image_bitstream


def serialize_frame_chunk(preview_bitstream: bytes, image_bitstream: bytes) -> bytes:
    """Frame chunk per Frame::OutputFull (fusion_power_video.cc:830-846).

    ``preview_bitstream`` includes its flags byte; the stored preview_size
    field counts that byte (``preview_.size() + 1`` in the reference).
    """
    total_size = 9 + len(preview_bitstream) + len(image_bitstream)
    return (
        u32le(total_size)
        + bytes([ChunkFlags.FRAME])
        + u32le(len(preview_bitstream))
        + preview_bitstream
        + image_bitstream
    )


def serialize_footer(frame_offsets: list[int]) -> bytes:
    """Frame-index footer (Encoder::WriteFrameIndex, fusion_power_video.cc:1185-1197)."""
    size = 5 + 8 * len(frame_offsets) + 8
    out = bytearray()
    out += u32le(size)
    out.append(ChunkFlags.FRAME_INDEX)
    for off in frame_offsets:
        out += u64le(off)
    out += u64le(len(frame_offsets))
    return bytes(out)


@dataclasses.dataclass
class ParsedFrameChunk:
    """Offsets of one frame chunk's sections within the file."""

    chunk_size: int
    preview_start: int  # offset of preview image bitstream (incl. flags byte)
    preview_size: int  # including the preview flags byte
    main_start: int
    main_size: int


def parse_frame_chunk(data: bytes, pos: int) -> ParsedFrameChunk:
    """Validate + locate the sections of the frame chunk at ``pos``."""
    if out_of_bounds(pos, 9, len(data)):
        raise ValueError("out of bounds")
    frame_size = read_u32le(data, pos)
    if frame_size < 9:
        raise ValueError("frame too small")
    if out_of_bounds(pos, frame_size, len(data)):
        raise ValueError("out of bounds")
    flag = data[pos + 4]
    if flag != ChunkFlags.FRAME:
        raise ValueError("not a standard frame")
    preview_size = read_u32le(data, pos + 5)
    if preview_size > frame_size - 9:
        raise ValueError("preview too large")
    return ParsedFrameChunk(
        chunk_size=frame_size,
        preview_start=pos + 9,
        preview_size=preview_size,
        main_start=pos + 9 + preview_size,
        main_size=frame_size - preview_size - 9,
    )


def parse_footer(data: bytes) -> list[int]:
    """Frame offsets from the footer (RandomAccessDecoder::Init,
    fusion_power_video.cc:993-1012)."""
    size = len(data)
    if size < 8:
        raise ValueError("data too small")
    num_frames = read_u64le(data, size - 8)
    if num_frames > size // 16:
        raise ValueError("too many frames")
    footer_size = 5 + 8 * num_frames + 8
    if footer_size > size:
        raise ValueError("footer too large")
    pos = size - footer_size
    if read_u32le(data, pos) != footer_size:
        raise ValueError("footer size mismatch")
    if data[pos + 4] != ChunkFlags.FRAME_INDEX:
        raise ValueError("must end with frame index")
    pos += 5
    return [read_u64le(data, pos + 8 * i) for i in range(num_frames)]
