"""Brotli bridge: byte-exact compatibility entropy backend.

The reference format's entropy layer is libbrotli at quality 1, default
window/mode (fusion_power_video.cc:166-169, 653-654).  Byte-exact encode
compatibility is only achievable by calling the same deterministic libbrotli
encoder, so this module bridges to the system libbrotli.

Two backends, best first:

* the native C++ extension ``fpv_native`` (see ``native/``), which links
  libbrotli and also provides fast CPU scan kernels;
* a ctypes binding straight onto ``libbrotlienc.so.1`` / ``libbrotlidec.so.1``.

Both produce identical bytes (same library).  The decompress entry point
mirrors ``BrotliDecompress`` (fusion_power_video.cc:186-214): it decodes ONE
brotli stream out of a buffer that may contain two concatenated streams and
reports where the stream ended.
"""

from __future__ import annotations

import ctypes
import ctypes.util

QUALITY = 1  # FPV_BROTLI_QUALITY (fusion_power_video.cc:169)
DEFAULT_WINDOW = 22  # BROTLI_DEFAULT_WINDOW
MODE_GENERIC = 0  # BROTLI_DEFAULT_MODE

_native = None
try:  # pragma: no cover - exercised when the extension is built
    import fpv_native as _native  # type: ignore
except Exception:
    _native = None


def reload_native() -> bool:
    """Re-attempt the fpv_native import (after an in-place build that
    happened later than this module's first import — see
    fpv_tpu.utils.nativebuild).  Returns availability."""
    global _native
    if _native is None:
        try:
            import importlib

            importlib.invalidate_caches()
            import fpv_native as _m  # type: ignore

            _native = _m
            # other modules bind fpv_native at import time too
            from fpv_tpu.models import predictors as _pred

            _pred._native = _m
        except Exception:
            _native = None
    return _native is not None


class _CtypesBrotli:
    """Minimal ctypes binding of the stable brotli C API."""

    # BrotliDecoderResult values (public API, RFC 7932 implementation)
    DECODER_RESULT_ERROR = 0
    DECODER_RESULT_SUCCESS = 1
    DECODER_RESULT_NEEDS_MORE_INPUT = 2
    DECODER_RESULT_NEEDS_MORE_OUTPUT = 3

    def __init__(self) -> None:
        self._enc = self._load("brotlienc")
        self._dec = self._load("brotlidec")

        self._enc.BrotliEncoderCompress.restype = ctypes.c_int
        self._enc.BrotliEncoderCompress.argtypes = [
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_size_t,
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_char_p,
        ]
        self._enc.BrotliEncoderMaxCompressedSize.restype = ctypes.c_size_t
        self._enc.BrotliEncoderMaxCompressedSize.argtypes = [ctypes.c_size_t]

        self._dec.BrotliDecoderCreateInstance.restype = ctypes.c_void_p
        self._dec.BrotliDecoderCreateInstance.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        self._dec.BrotliDecoderDestroyInstance.restype = None
        self._dec.BrotliDecoderDestroyInstance.argtypes = [ctypes.c_void_p]
        self._dec.BrotliDecoderDecompressStream.restype = ctypes.c_int
        self._dec.BrotliDecoderDecompressStream.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_void_p,
            ctypes.c_void_p,
        ]
        self._dec.BrotliDecoderTakeOutput.restype = ctypes.POINTER(ctypes.c_uint8)
        self._dec.BrotliDecoderTakeOutput.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_size_t),
        ]

    @staticmethod
    def _load(stem: str) -> ctypes.CDLL:
        for name in (f"lib{stem}.so.1", f"lib{stem}.so", ctypes.util.find_library(stem)):
            if not name:
                continue
            try:
                return ctypes.CDLL(name)
            except OSError:
                continue
        raise OSError(f"cannot locate lib{stem}")

    def max_compressed_size(self, input_size: int) -> int:
        return int(self._enc.BrotliEncoderMaxCompressedSize(input_size))

    def compress(self, data: bytes, quality: int = QUALITY,
                 lgwin: int = DEFAULT_WINDOW, mode: int = MODE_GENERIC) -> bytes:
        out_size = ctypes.c_size_t(self.max_compressed_size(len(data)))
        out = ctypes.create_string_buffer(out_size.value)
        ok = self._enc.BrotliEncoderCompress(
            quality, lgwin, mode, len(data), data, ctypes.byref(out_size), out
        )
        if not ok:
            raise RuntimeError("brotli compression failed")
        return out.raw[: out_size.value]

    def decompress_stream(self, data: bytes, pos: int = 0) -> tuple[bytes, int]:
        """Decode one brotli stream starting at ``pos``; return (bytes, end_pos)."""
        state = self._dec.BrotliDecoderCreateInstance(None, None, None)
        if not state:
            raise RuntimeError("couldn't init brotli decoder")
        try:
            buf = (ctypes.c_uint8 * max(1, len(data) - pos)).from_buffer_copy(
                data[pos:] if pos < len(data) else b"\x00"
            )
            avail_in = ctypes.c_size_t(len(data) - pos)
            next_in = ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8))
            chunks: list[bytes] = []
            result = self.DECODER_RESULT_NEEDS_MORE_OUTPUT
            while True:
                avail_out = ctypes.c_size_t(0)
                result = self._dec.BrotliDecoderDecompressStream(
                    state,
                    ctypes.byref(avail_in),
                    ctypes.byref(next_in),
                    ctypes.byref(avail_out),
                    None,
                    None,
                )
                if result != self.DECODER_RESULT_NEEDS_MORE_OUTPUT:
                    break
                out_size = ctypes.c_size_t(0)
                out_buf = self._dec.BrotliDecoderTakeOutput(
                    state, ctypes.byref(out_size)
                )
                if out_size.value:
                    chunks.append(ctypes.string_at(out_buf, out_size.value))
            # drain any remaining buffered output
            out_size = ctypes.c_size_t(0)
            out_buf = self._dec.BrotliDecoderTakeOutput(state, ctypes.byref(out_size))
            if out_size.value:
                chunks.append(ctypes.string_at(out_buf, out_size.value))
            end_pos = len(data) - avail_in.value
            if result != self.DECODER_RESULT_SUCCESS:
                raise ValueError("brotli decompression failed")
            return b"".join(chunks), end_pos
        finally:
            self._dec.BrotliDecoderDestroyInstance(state)


_ctypes_impl: _CtypesBrotli | None = None


def _impl() -> _CtypesBrotli:
    global _ctypes_impl
    if _ctypes_impl is None:
        _ctypes_impl = _CtypesBrotli()
    return _ctypes_impl


def compress(data: bytes, quality: int = QUALITY, lgwin: int = DEFAULT_WINDOW) -> bytes:
    """Brotli-compress ``data`` exactly as the reference does."""
    if _native is not None:
        return _native.brotli_compress(bytes(data), quality, lgwin)
    return _impl().compress(bytes(data), quality, lgwin)


def decompress_stream(data: bytes, pos: int = 0) -> tuple[bytes, int]:
    """Decode one brotli stream at ``pos``; returns (decoded, end_pos)."""
    if _native is not None:
        return _native.brotli_decompress_stream(bytes(data), pos)
    return _impl().decompress_stream(bytes(data), pos)


def max_compressed_size(input_size: int) -> int:
    """``BrotliEncoderMaxCompressedSize`` (fusion_power_video.cc:355-361)."""
    if _native is not None:
        return _native.brotli_max_compressed_size(input_size)
    return _impl().max_compressed_size(input_size)


def compress_into(data, dest, quality: int = QUALITY) -> int:
    """Compress directly into the writable buffer ``dest``; returns the
    compressed size.  Zero-copy when the native extension is built; the
    ctypes fallback compresses then copies (functionally identical)."""
    if _native is not None and hasattr(_native, "brotli_compress_into"):
        return _native.brotli_compress_into(data, dest, quality)
    out = compress(bytes(data), quality)
    memoryview(dest).cast("B")[: len(out)] = out
    return len(out)
