"""Apache Arrow frontend: frames -> arrow.RecordBatch stream.

Rebuild of the reference's optional ``arrow/arrow_encoder.{h,cc}``: the same
split -> predict -> compress pipeline as the columnar subsystem, but each
flushed batch is an ``arrow.RecordBatch`` with columns

    timestamp (ns) | deltaPredicted | cgPredicted | preview |
    highBytePlane | lowBytePlane          (binary, brotli plane streams)

and schema metadata carrying xsize / ysize / shiftedLeft plus the compressed
delta-frame planes (arrow/arrow_encoder.cc:81-94), so a RecordBatch stream is
fully self-describing.  Binary columns build zero-copy, like the reference's
MutableBinaryBuilder (arrow/arrow_encoder.h:59-108): frames brotli-compress
DIRECTLY into a preallocated resizable Arrow buffer and flush wraps the
buffers into a BinaryArray without copying.

Requires pyarrow; importing this module without it raises ImportError.
"""

from __future__ import annotations

import threading
import queue
from concurrent.futures import Future, ThreadPoolExecutor

import numpy as np
import pyarrow as pa

from fpv_tpu.api import frame as frame_ops
from fpv_tpu.api.frame import FrameFlags, FramePlanes
from fpv_tpu.entropy import brotli


class MutableBinaryBuilder:
    """Zero-copy Arrow BinaryArray builder.

    The role of the reference's ``MutableBinaryBuilder``
    (arrow/arrow_encoder.h:59-108): ``next_item`` hands the producer a
    writable window of the preallocated resizable data buffer (growing it
    when needed), ``advance`` commits the bytes actually written and bumps
    the offsets array, and ``finish`` assembles the BinaryArray from the
    (offsets, data) buffers without copying the payload."""

    def __init__(self, capacity: int = 1 << 20) -> None:
        self._buf = pa.allocate_buffer(capacity, resizable=True)
        self._size = 0
        self._offsets = [0]

    def next_item(self, max_size: int) -> memoryview:
        if self._size + max_size > self._buf.size:
            self._buf.resize(max(self._size + max_size, 2 * self._buf.size))
        return memoryview(self._buf)[self._size : self._size + max_size]

    def advance(self, nbytes: int) -> None:
        self._size += nbytes
        self._offsets.append(self._size)

    def append_empty(self) -> None:
        self._offsets.append(self._size)

    def finish(self) -> pa.Array:
        n = len(self._offsets) - 1
        offsets = pa.py_buffer(np.asarray(self._offsets, np.int32))
        data = pa.py_buffer(memoryview(self._buf)[: self._size])
        arr = pa.Array.from_buffers(pa.binary(), n, [None, offsets, data])
        # the emitted array aliases the old buffer; start a fresh one
        self._buf = pa.allocate_buffer(1 << 20, resizable=True)
        self._size = 0
        self._offsets = [0]
        return arr

SCHEMA_FIELDS = [
    pa.field("timestamp", pa.timestamp("ns"), nullable=False),
    pa.field("deltaPredicted", pa.bool_(), nullable=False),
    pa.field("cgPredicted", pa.bool_(), nullable=False),
    pa.field("preview", pa.binary(), nullable=False),
    pa.field("highBytePlane", pa.binary(), nullable=False),
    pa.field("lowBytePlane", pa.binary(), nullable=False),
]


def make_schema(
    xsize: int, ysize: int, shifted_left: int, delta: FramePlanes
) -> pa.Schema:
    """Self-describing schema with the compressed delta frame in metadata."""
    predicted = frame_ops.predict(delta, None, make_preview=False)
    high = brotli.compress(predicted.high.tobytes())
    low = (
        brotli.compress(predicted.low.tobytes())
        if predicted.low is not None
        else b""
    )
    cg = bool(predicted.flags & FrameFlags.USE_CG)
    return pa.schema(
        SCHEMA_FIELDS,
        metadata={
            b"xsize": str(xsize).encode(),
            b"ysize": str(ysize).encode(),
            b"shiftedLeft": str(shifted_left).encode(),
            b"deltaFrameHighPlane": high,
            b"deltaFrameLowPlane": low,
            b"deltaFrameCGPredicted": b"true" if cg else b"false",
        },
    )


class ArrowEncoder:
    """push_frame -> futures; RecordBatches delivered to a consumer callback."""

    def __init__(
        self,
        xsize: int,
        ysize: int,
        shift_to_left_align: int,
        big_endian: bool,
        record_batch_consumer,
        frames_per_batch: int = 10,
        num_workers: int = 2,
    ) -> None:
        self._xsize = xsize
        self._ysize = ysize
        self._shift = shift_to_left_align
        self._big_endian = big_endian
        self._consumer = record_batch_consumer
        self._frames_per_batch = frames_per_batch
        self._pool = ThreadPoolExecutor(max_workers=num_workers)
        self._queue: queue.Queue = queue.Queue()
        self._lock = threading.Lock()
        self._closing = False
        self._closing_future: Future = Future()
        self._delta: FramePlanes | None = None
        self._schema: pa.Schema | None = None
        self._schema_ready = threading.Event()
        self._ts: list = []
        self._dp: list = []
        self._cg: list = []
        self._pv_b = MutableBinaryBuilder()
        self._hi_b = MutableBinaryBuilder()
        self._lo_b = MutableBinaryBuilder()
        self._latest_ts = -1
        self._thread = threading.Thread(target=self._encoder_task, daemon=True)
        self._thread.start()

    def push_frame(self, timestamp: int, img: np.ndarray, info=None) -> Future:
        with self._lock:
            if self._closing:
                f: Future = Future()
                f.set_exception(RuntimeError("encoder closing"))
                return f
        if np.asarray(img).dtype == np.uint8:
            # 8-bit direct input (Frame's uint8 ctor,
            # fusion_power_video.cc:453-465); see columnar.push_frame
            from fpv_tpu.ops.planes import validate_u8_config

            validate_u8_config(self._shift, self._big_endian)
        img = np.asarray(img, dtype=np.uint16).reshape(self._ysize, self._xsize)
        if self._delta is None:
            self._delta = frame_ops.split_planes(
                img.copy(), self._shift, self._big_endian, timestamp
            )
            self._pool.submit(self._prepare_schema)
            self._queue.put(self._pool.submit(self._predict, self._delta))
            done: Future = Future()
            done.set_result(info)
            return done
        img = img.copy()
        fut_frame: Future = Future()
        self._queue.put(fut_frame)
        done = Future()

        def work():
            planes = frame_ops.split_planes(
                img, self._shift, self._big_endian, timestamp
            )
            done.set_result(info)
            try:
                fut_frame.set_result(self._predict(planes))
            except BaseException as e:  # pragma: no cover
                fut_frame.set_exception(e)

        self._pool.submit(work)
        return done

    def _predict(self, planes: FramePlanes) -> FramePlanes:
        return frame_ops.predict(planes, self._delta, make_preview=True)

    def _prepare_schema(self) -> None:
        self._schema = make_schema(
            self._xsize, self._ysize, self._shift, self._delta
        )
        self._schema_ready.set()

    def close(self) -> Future:
        with self._lock:
            if not self._closing:
                self._closing = True
                self._queue.put(None)
        return self._closing_future

    def _flush(self) -> None:
        if self._delta is None:
            # no frame was ever pushed: there is no schema to wait for
            # (close() on an empty encoder must not deadlock)
            self._consumer(None)
            return
        self._schema_ready.wait()
        if not self._ts:
            self._consumer(None)
            return
        self._latest_ts = self._ts[-1]
        batch = pa.RecordBatch.from_arrays(
            [
                pa.array(np.asarray(self._ts, np.int64), pa.timestamp("ns")),
                pa.array(self._dp, pa.bool_()),
                pa.array(self._cg, pa.bool_()),
                self._pv_b.finish(),
                self._hi_b.finish(),
                self._lo_b.finish(),
            ],
            schema=self._schema,
        )
        self._ts, self._dp, self._cg = [], [], []
        self._consumer(batch)

    def _compress_row(self, planes: FramePlanes) -> None:
        """Compress one predicted frame DIRECTLY into the column builders
        (role of CompressPreparedFrame, arrow/arrow_encoder.cc:97-113)."""
        for plane, builder in (
            (planes.preview, self._pv_b),
            (planes.high, self._hi_b),
            (
                None if planes.flags & FrameFlags.NO_LOW_BYTES else planes.low,
                self._lo_b,
            ),
        ):
            if plane is None or plane.size == 0:
                builder.append_empty()
                continue
            mv = builder.next_item(brotli.max_compressed_size(plane.size))
            builder.advance(brotli.compress_into(np.ascontiguousarray(plane), mv))
        self._ts.append(planes.timestamp)
        self._dp.append(bool(planes.flags & FrameFlags.USE_DELTA))
        self._cg.append(bool(planes.flags & FrameFlags.USE_CG))

    def _encoder_task(self) -> None:
        try:
            while True:
                item = self._queue.get()
                if item is None:
                    self._flush()
                    self._closing_future.set_result(self._latest_ts)
                    return
                planes = item.result() if isinstance(item, Future) else item
                self._compress_row(planes)
                if len(self._ts) >= self._frames_per_batch:
                    self._flush()
        except Exception as e:
            # a failed predict/compress future must surface through
            # close()/join(), not silently kill the serializer thread
            self._closing_future.set_exception(e)

    def join(self) -> None:
        self.close().result()
        self._thread.join(timeout=60)
        self._pool.shutdown(wait=True)


def decode_record_batch(batch: pa.RecordBatch, image_type=None):
    """Decode every frame of a RecordBatch -> list of uint16 [H, W] images.

    Counterpart the reference never shipped: reconstructs frames from a
    self-describing RecordBatch using the schema metadata delta planes.
    """
    from fpv_tpu.models.predictors import cg_decode as cg_decode_np

    md = batch.schema.metadata
    xsize = int(md[b"xsize"])
    ysize = int(md[b"ysize"])
    dh_raw, _ = brotli.decompress_stream(md[b"deltaFrameHighPlane"])
    dhigh = np.frombuffer(dh_raw, np.uint8).reshape(ysize, xsize)
    if md[b"deltaFrameCGPredicted"] == b"true":
        dhigh = cg_decode_np(dhigh)
    if md[b"deltaFrameLowPlane"]:
        dl_raw, _ = brotli.decompress_stream(md[b"deltaFrameLowPlane"])
        dlow = np.frombuffer(dl_raw, np.uint8).reshape(ysize, xsize)
    else:
        dlow = np.zeros_like(dhigh)

    out = []
    for i in range(batch.num_rows):
        high_raw, _ = brotli.decompress_stream(
            batch.column("highBytePlane")[i].as_py()
        )
        high = np.frombuffer(high_raw, np.uint8).reshape(ysize, xsize)
        if batch.column("cgPredicted")[i].as_py():
            high = cg_decode_np(high)
        low_bytes = batch.column("lowBytePlane")[i].as_py()
        delta_predicted = batch.column("deltaPredicted")[i].as_py()
        if low_bytes:
            low_raw, _ = brotli.decompress_stream(low_bytes)
            low = np.frombuffer(low_raw, np.uint8).reshape(ysize, xsize)
            if delta_predicted:
                low = (low + dlow).astype(np.uint8)
        else:
            # NO_LOW_BYTES: the ORIGINAL frame's low plane was all zero and
            # no low stream was stored — output zeros, do NOT add the delta
            # frame's low plane (columnar.extract_image semantics; a frame
            # can be delta-predicted AND low-less at the same time)
            low = np.zeros_like(high)
        if delta_predicted:
            high = (high + dhigh).astype(np.uint8)
        out.append((high.astype(np.uint16) << 8) | low)
    return out
