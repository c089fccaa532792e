"""Streaming and random-access decoders for FPV1 (reference format) files.

``StreamingDecoder`` is an incremental push-parser with the exact buffer
semantics of the reference (fusion_power_video.cc:866-956): bytes are
appended, all complete frames are decoded and delivered through a callback,
and the unconsumed tail is retained.  ``RandomAccessDecoder`` parses header +
delta frame + footer once and then decodes any frame or preview in any order
(fusion_power_video.cc:961-1070).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from fpv_tpu.format import container
from fpv_tpu.format.bits import out_of_bounds, read_u32le

StreamCallback = Callable[[bool, np.ndarray | None, int, int, object], None]


class StreamingDecoder:
    """Incremental FPV1 decoder (fusion_power_video.cc:866-956)."""

    def __init__(self) -> None:
        self._xsize = 0
        self._ysize = 0
        self._delta: np.ndarray | None = None
        self._buffer = bytearray()

    def decode(
        self, data: bytes, callback: StreamCallback, payload: object = None
    ) -> None:
        """Feed bytes; invoke ``callback(ok, frame, xsize, ysize, payload)``
        for every newly-completed frame."""
        self._buffer += data
        # parse straight off the bytearray: copying the whole retained
        # buffer per call would make chunked feeding of one large frame
        # quadratic (only the consumed slices handed to decompress_image
        # are materialized)
        buf = self._buffer
        pos = 0

        def fail(_msg: str) -> None:
            callback(False, None, 0, 0, payload)

        has_header = self._delta is not None
        if self._delta is None and len(buf) > 13:
            xsize = read_u32le(buf, 0)
            ysize = read_u32le(buf, 4)
            pos = 8
            if xsize == 0 or ysize == 0:
                return fail("invalid image dimensions")
            if (
                xsize > container.MAX_DIM
                or ysize > container.MAX_DIM
                or xsize * ysize > container.MAX_IMAGE_SIZE
            ):
                return fail("image too large")
            deltasize = read_u32le(buf, pos)
            if deltasize < 5:
                return fail("too small for delta frame")
            if buf[pos + 4] != container.ChunkFlags.DELTA_FRAME:
                return fail("not a delta frame")
            if deltasize + pos <= len(buf):
                try:
                    self._delta = container.decompress_image(
                        buf[pos + 5 : pos + deltasize], xsize, ysize
                    )
                except ValueError:
                    return fail("decompressing delta frame failed")
                self._xsize, self._ysize = xsize, ysize
                pos += deltasize
                has_header = True
            else:
                pos = 0

        while has_header and pos + 9 <= len(buf):
            frame_size = read_u32le(buf, pos)
            flag = buf[pos + 4]
            if flag == container.ChunkFlags.FRAME_INDEX:
                break  # footer reached, end of frames
            if flag != container.ChunkFlags.FRAME:
                return fail("not a standard frame")
            if pos + frame_size > len(buf):
                break
            preview_size = read_u32le(buf, pos + 5)
            if preview_size > frame_size:
                return fail("preview size too large")
            main = buf[pos + 9 + preview_size : pos + frame_size]
            try:
                frame = container.decompress_image(
                    main, self._xsize, self._ysize, self._delta
                )
            except ValueError:
                return fail("decompressing frame failed")
            pos += frame_size
            callback(True, frame, self._xsize, self._ysize, payload)

        del self._buffer[:pos]


class RandomAccessDecoder:
    """Random-access FPV1 decoder (fusion_power_video.cc:961-1070)."""

    def __init__(self) -> None:
        self._data = b""
        self._xsize = 0
        self._ysize = 0
        self._delta: np.ndarray | None = None
        self._frame_offsets: list[int] = []

    @property
    def xsize(self) -> int:
        return self._xsize

    @property
    def ysize(self) -> int:
        return self._ysize

    @property
    def preview_xsize(self) -> int:
        return self._xsize // 4

    @property
    def preview_ysize(self) -> int:
        return self._ysize // 4

    @property
    def numframes(self) -> int:
        return len(self._frame_offsets)

    @property
    def delta_frame(self) -> np.ndarray:
        """The stream's delta frame (left-aligned uint16 [H, W]); valid
        after :meth:`init`.  Exposed for transcoding: the reference keeps
        it private (fusion_power_video.h:143-172)."""
        if self._delta is None:
            raise RuntimeError("init() has not succeeded")
        return self._delta.reshape(self._ysize, self._xsize)

    def init(self, data: bytes) -> bool:
        """Parse header, delta frame and footer; True on success."""
        try:
            self._init_raises(data)
            return True
        except (ValueError, IndexError, KeyError):
            return False

    def _init_raises(self, data: bytes) -> None:
        if len(data) < 12:
            raise ValueError("data too small to contain header")
        self._data = bytes(data)
        xsize = read_u32le(data, 0)
        ysize = read_u32le(data, 4)
        if xsize == 0 or ysize == 0:
            raise ValueError("invalid image dimensions")
        if (
            xsize > container.MAX_DIM
            or ysize > container.MAX_DIM
            or xsize * ysize > container.MAX_IMAGE_SIZE
        ):
            raise ValueError("image too large")
        pos = 8
        delta_size = read_u32le(data, pos)
        if out_of_bounds(pos, delta_size, len(data)):
            raise ValueError("out of bounds")
        if delta_size < 5:
            raise ValueError("delta frame too small")
        if data[12] != container.ChunkFlags.DELTA_FRAME:
            raise ValueError("must begin with delta frame")
        self._delta = container.decompress_image(
            data[pos + 5 : pos + delta_size], xsize, ysize
        )
        self._xsize, self._ysize = xsize, ysize
        self._frame_offsets = container.parse_footer(data)

    def decode_frame(self, index: int) -> np.ndarray:
        """Decode frame ``index`` -> uint16 [H, W]."""
        chunk = container.parse_frame_chunk(self._data, self._frame_offsets[index])
        main = self._data[chunk.main_start : chunk.main_start + chunk.main_size]
        return container.decompress_image(
            main, self._xsize, self._ysize, self._delta
        )

    def decode_preview(self, index: int) -> np.ndarray:
        """Decode the preview of frame ``index`` -> uint8 [H//4, W//4].

        Per fusion_power_video.cc:1038-1070: the preview bitstream is decoded
        as a (xsize/4, ysize/4) image and the high bytes are returned.

        Tolerates the reference's grown CG previews at dimensions that are
        not multiples of 4 (the encoder-side UB at
        fusion_power_video.cc:575-586 codes ``xsize*ysize/16`` entries; see
        container.parse_image grown_size) — every reference-produced file
        decodes, previews included.
        """
        chunk = container.parse_frame_chunk(self._data, self._frame_offsets[index])
        pdata = self._data[chunk.preview_start : chunk.preview_start + chunk.preview_size]
        img16 = container.decompress_image(
            pdata, self.preview_xsize, self.preview_ysize, self._delta,
            grown_size=(self._xsize * self._ysize) // 16,
        )
        return (img16 >> 8).astype(np.uint8)


def decode_file(
    data: bytes, num_threads: int = 0, dtype=np.uint16
) -> np.ndarray:
    """Convenience one-shot decode of an FPV1 file -> [N, H, W] uint16.

    ``num_threads`` > 1 decodes frames concurrently: frames are
    independent given the delta frame, and the hot stages (brotli, the CG
    reconstruction scan) run in GIL-released native code — so unlike the
    reference's single-threaded decoders (fusion_power_video.cc:866-1070)
    this scales with host cores.

    ``dtype=np.uint8`` returns the original 8-bit samples of a stream that
    was encoded from uint8 frames (shift==8 layout: the sample is the high
    byte).  FPV1 files record no bit depth, so the caller asserts it —
    exactly like the reference CLI's shift argument."""
    dec = RandomAccessDecoder()
    if not dec.init(data):
        raise ValueError("invalid FPV1 file")
    if num_threads > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=num_threads) as pool:
            out = np.stack(
                list(pool.map(dec.decode_frame, range(dec.numframes)))
            )
    else:
        out = np.stack([dec.decode_frame(i) for i in range(dec.numframes)])
    if np.dtype(dtype) == np.uint8:
        return (out >> 8).astype(np.uint8)
    return out.astype(dtype, copy=False)
