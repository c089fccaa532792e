"""Functional frame model.

The reference models a frame as a mutable state machine (``class Frame``,
fusion_power_video.h:75-139) holding byte planes plus state/flags bits.  Here
a frame is immutable data — a :class:`FramePlanes` of numpy (host) or JAX
(device) arrays — and each pipeline stage is a pure function.  Flags are data
computed by the stage functions, not hidden state.

Host/numpy reference semantics live here; batched device versions are in
:mod:`fpv_tpu.ops`.
"""

from __future__ import annotations

import dataclasses
import enum

import numpy as np

from fpv_tpu.models import heuristics, predictors


class FrameFlags(enum.IntFlag):
    """Per-image bitstream flags (fusion_power_video.h:68-73)."""

    NONE = 0
    USE_DELTA = 1
    USE_CG = 2
    NO_LOW_BYTES = 4


class ChunkFlags(enum.IntEnum):
    """Container chunk type flags (fusion_power_video.cc:104-109)."""

    FRAME = 0
    DELTA_FRAME = 1
    FRAME_INDEX = 2


@dataclasses.dataclass
class FramePlanes:
    """Byte planes of one frame. ``low`` may be None (shift==8 path)."""

    high: np.ndarray  # [H, W] uint8
    low: np.ndarray | None  # [H, W] uint8 or None
    preview: np.ndarray | None = None  # [H//4, W//4] uint8 or None
    flags: int = 0
    timestamp: int = -1

    @property
    def xsize(self) -> int:
        return self.high.shape[1]

    @property
    def ysize(self) -> int:
        return self.high.shape[0]


def split_planes(
    img: np.ndarray, shift: int = 0, big_endian: bool = False, timestamp: int = -1
) -> FramePlanes:
    """uint16 [H, W] image -> byte planes, replicating Frame's import ctor.

    Exact port of fusion_power_video.cc:370-451 including the
    rotate-based combined endian-swap + shift path (:405-417), the
    ``shift == 8`` low-plane drop (:399-403, 429-433), and NO_LOW_BYTES
    detection (:447-449).  ``img`` is the raw data reinterpreted as
    native-little-endian uint16, as the reference CLI does.
    """
    from fpv_tpu.ops.planes import validate_shift

    validate_shift(shift, big_endian)
    if np.asarray(img).dtype == np.uint8:
        # 8-bit direct input: the sample bytes ARE the high plane and the
        # low plane is absent (Frame's uint8 ctor,
        # fusion_power_video.cc:453-465 — which ignores shift/endianness).
        # Identical bitstream to widening to uint16 and splitting with
        # shift=8 little-endian; session layers enforce that stream config
        # so the file's decode contract (unextract shift) holds.
        high = np.ascontiguousarray(img, dtype=np.uint8)
        return FramePlanes(
            high=high, low=None, flags=int(FrameFlags.NO_LOW_BYTES),
            timestamp=timestamp,
        )
    img = np.ascontiguousarray(img, dtype=np.uint16)
    flags = 0
    low: np.ndarray | None
    if big_endian:
        if shift == 0:
            high = (img & 0xFF).astype(np.uint8)
            low = ((img >> 8) & 0xFF).astype(np.uint8)
        elif shift == 8:
            high = ((img >> 8) & 0xFF).astype(np.uint8)
            low = None
        else:
            # high = rotl(pixel, shift) & 0xff ; low = (pixel >> (8-shift)) & 0xff
            high = (((img << shift) | (img >> (16 - shift))) & 0xFF).astype(np.uint8)
            low = ((img >> (8 - shift)) & 0xFF).astype(np.uint8)
    else:
        if shift == 0:
            high = ((img >> 8) & 0xFF).astype(np.uint8)
            low = (img & 0xFF).astype(np.uint8)
        elif shift == 8:
            high = (img & 0xFF).astype(np.uint8)
            low = None
        else:
            shifted = (img << shift).astype(np.uint16)
            high = ((shifted >> 8) & 0xFF).astype(np.uint8)
            low = (shifted & 0xFF).astype(np.uint8)
    if low is None or not low.any():
        flags |= FrameFlags.NO_LOW_BYTES
    return FramePlanes(high=high, low=low, flags=flags, timestamp=timestamp)


def adopt_planes(
    high: np.ndarray, low: np.ndarray | None = None, timestamp: int = -1
) -> FramePlanes:
    """Adopt pre-split byte planes without a combine/split round trip.

    Parity with the reference's plane-adopting Frame ctor
    (fusion_power_video.cc:467-489): a camera driver that already delivers
    byte planes enters the pipeline directly.  NO_LOW_BYTES is derived the
    same way the image ctor does (:447-449): low missing OR all zero — so a
    plane-adopted frame encodes byte-identically to the equivalent combined
    uint16 image.
    """
    high = np.ascontiguousarray(high, dtype=np.uint8)
    if high.ndim != 2:
        raise ValueError("high plane must be [H, W] uint8")
    flags = 0
    if low is not None:
        low = np.ascontiguousarray(low, dtype=np.uint8)
        if low.shape != high.shape:
            raise ValueError("low plane shape must match high plane")
        if not low.any():
            flags |= FrameFlags.NO_LOW_BYTES
    else:
        flags |= FrameFlags.NO_LOW_BYTES
    return FramePlanes(high=high, low=low, flags=int(flags), timestamp=timestamp)


def generate_preview(high: np.ndarray) -> np.ndarray:
    """1/4-scale preview: 4x4 box filter, ``(sum/16) & 0xfe``.

    Port of fusion_power_video.cc:491-515.  Note the format comment claims
    1/8th scale (fusion_power_video.cc:74-77) but the code uses 1/4; code is
    authoritative.  Only full 4x4 blocks are emitted (floor division).
    """
    h, w = high.shape
    ph, pw = h // 4, w // 4
    if ph == 0 or pw == 0:
        return np.zeros((ph, pw), dtype=np.uint8)
    blocks = high[: ph * 4, : pw * 4].reshape(ph, 4, pw, 4).astype(np.uint32)
    sums = blocks.sum(axis=(1, 3))
    return ((sums // 16) & 0xFE).astype(np.uint8)


def cg_encode_preview_np(preview: np.ndarray, xsize: int, ysize: int) -> np.ndarray:
    """CG-predict the preview the way the reference does.

    fusion_power_video.cc:575-586 treats the preview as a flat buffer of
    ``xsize*ysize/16`` entries with row stride ``xsize/4``.  For dimensions
    that are multiples of 4 this equals a normal [ysize//4, xsize//4] CG
    transform; for other dimensions the reference reads out of bounds (UB),
    which we do not replicate — we use the actual preview extent.
    """
    ph, pw = ysize // 4, xsize // 4
    return predictors.cg_encode(preview.reshape(ph, pw))


def predict(
    planes: FramePlanes,
    delta: FramePlanes | None,
    make_preview: bool = True,
) -> FramePlanes:
    """Full prediction stage: preview + optional delta + optional CG.

    Port of Frame::Predict (fusion_power_video.cc:777-785): the preview is
    generated from the *unpredicted* high plane first; delta prediction is
    considered only when a delta frame exists; CG prediction of the main high
    plane also transforms the preview when taken.
    """
    high = planes.high
    low = planes.low
    flags = int(planes.flags)
    preview = generate_preview(high) if make_preview else None

    if delta is not None:
        if heuristics.decide_delta(high):
            high = predictors.delta_encode_np(high, delta.high)
            if low is not None and delta.low is not None:
                low = predictors.delta_encode_np(low, delta.low)
            flags |= FrameFlags.USE_DELTA

    if heuristics.decide_cg(high):
        high = predictors.cg_encode(high)
        if preview is not None and preview.size:
            preview = predictors.cg_encode(preview)
        flags |= FrameFlags.USE_CG

    return FramePlanes(
        high=high, low=low, preview=preview, flags=flags, timestamp=planes.timestamp
    )


def unpredict(
    planes: FramePlanes, delta: FramePlanes | None
) -> FramePlanes:
    """Inverse of :func:`predict` for the main planes (not the preview)."""
    high = planes.high
    low = planes.low
    flags = int(planes.flags)
    if flags & FrameFlags.USE_CG:
        high = predictors.cg_decode(high)
    if flags & FrameFlags.USE_DELTA:
        if delta is None:
            raise ValueError("delta frame required to unpredict")
        high = predictors.delta_decode_np(high, delta.high)
        if low is not None and delta.low is not None:
            low = predictors.delta_decode_np(low, delta.low)
    return FramePlanes(
        high=high,
        low=low,
        preview=planes.preview,
        flags=flags & FrameFlags.NO_LOW_BYTES,
        timestamp=planes.timestamp,
    )


def combine_planes(high: np.ndarray, low: np.ndarray | None) -> np.ndarray:
    """(high, low) byte planes -> uint16 image (fusion_power_video.cc:341-343)."""
    img = high.astype(np.uint16) << 8
    if low is not None:
        img |= low.astype(np.uint16)
    return img


def combine_planes_delta(
    high: np.ndarray, low: np.ndarray, delta_img: np.ndarray
) -> np.ndarray:
    """Delta-add + combine, matching DecompressImage's fused loop.

    fusion_power_video.cc:335-339:
    ``img = ((high + (delta>>8)) << 8) | ((low + (delta&0xff)) & 0xff)``
    with uint16 wraparound on the high sum.
    """
    dh = (delta_img >> 8).astype(np.uint8)
    dl = (delta_img & 0xFF).astype(np.uint8)
    hi = (high.astype(np.uint8) + dh).astype(np.uint8)
    lo = (low.astype(np.uint8) + dl).astype(np.uint8)
    return (hi.astype(np.uint16) << 8) | lo


def unextract_frame(
    img: np.ndarray, shift: int, big_endian: bool
) -> np.ndarray:
    """uint16 frame -> original raw bytes (fusion_power_video.cc:850-862)."""
    u = (np.asarray(img, dtype=np.uint16) >> shift).astype(np.uint16)
    a = (u & 0xFF).astype(np.uint8)
    b = (u >> 8).astype(np.uint8)
    if big_endian:
        a, b = b, a
    out = np.empty(img.size * 2, dtype=np.uint8)
    out[0::2] = a.reshape(-1)
    out[1::2] = b.reshape(-1)
    return out
