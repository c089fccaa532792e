// Native runtime components: brotli bridge + hot CPU scan kernels.
//
// The reference's entropy layer is libbrotli called from C++
// (fusion_power_video.cc:186-214, 643-728); byte-exact FPV1 files require
// calling the same deterministic encoder, so this extension links the system
// libbrotli.  It also provides the compat-path scan kernels whose data
// dependencies defeat vectorization in numpy/XLA:
//
//  * cg_decode: the reference's flat-buffer clamped-gradient reconstruction
//    (fusion_power_video.cc:326-333) — sequential by design (each pixel
//    needs its already-reconstructed neighbors, including the previous
//    row's last pixel for column 0);
//  * cg_encode: the parallelizable forward transform, for completeness.
//
// Built with plain CPython C API (no pybind11 dependency).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <stdint.h>
#include <string.h>

#include <vector>

#include "brotli/decode.h"
#include "brotli/encode.h"

namespace {

// Branchless clamped gradient (fusion_power_video.cc:247-252).
static inline uint8_t ClampedGradient(uint8_t n, uint8_t w, uint8_t nw) {
  const uint8_t i = n < w ? n : w;
  const uint8_t a = n > w ? n : w;
  const uint8_t gradient = (uint8_t)(n + w - nw);
  const uint8_t clamped = (nw < i) ? a : gradient;
  return (nw > a) ? i : clamped;
}

PyObject* py_brotli_max_compressed_size(PyObject*, PyObject* args) {
  Py_ssize_t n;
  if (!PyArg_ParseTuple(args, "n", &n)) return nullptr;
  return PyLong_FromSize_t(BrotliEncoderMaxCompressedSize((size_t)n));
}

PyObject* py_brotli_compress(PyObject*, PyObject* args) {
  Py_buffer buf;
  int quality = 1, lgwin = BROTLI_DEFAULT_WINDOW;
  if (!PyArg_ParseTuple(args, "y*|ii", &buf, &quality, &lgwin)) return nullptr;
  size_t max_size = BrotliEncoderMaxCompressedSize(buf.len);
  if (max_size == 0) max_size = 64;
  std::vector<uint8_t> out(max_size);
  size_t encoded = max_size;
  BROTLI_BOOL ok;
  Py_BEGIN_ALLOW_THREADS;
  ok = BrotliEncoderCompress(quality, lgwin, BROTLI_DEFAULT_MODE,
                             (size_t)buf.len, (const uint8_t*)buf.buf,
                             &encoded, out.data());
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&buf);
  if (!ok) {
    PyErr_SetString(PyExc_RuntimeError, "brotli compression failed");
    return nullptr;
  }
  return PyBytes_FromStringAndSize((const char*)out.data(), (Py_ssize_t)encoded);
}

// brotli_compress_into(data, dest_writable_buffer, quality=1) -> nbytes:
// compresses directly into caller-owned memory (the zero-copy Arrow
// builder's arena; role of MutableBinaryBuilder, arrow/arrow_encoder.h:59-108).
PyObject* py_brotli_compress_into(PyObject*, PyObject* args) {
  Py_buffer src, dst;
  int quality = 1;
  if (!PyArg_ParseTuple(args, "y*w*|i", &src, &dst, &quality)) return nullptr;
  size_t need = BrotliEncoderMaxCompressedSize((size_t)src.len);
  if (need == 0) need = 64;
  if ((size_t)dst.len < need) {
    PyBuffer_Release(&src);
    PyBuffer_Release(&dst);
    PyErr_SetString(PyExc_ValueError, "destination buffer too small");
    return nullptr;
  }
  size_t encoded = (size_t)dst.len;
  BROTLI_BOOL ok;
  Py_BEGIN_ALLOW_THREADS;
  ok = BrotliEncoderCompress(quality, BROTLI_DEFAULT_WINDOW,
                             BROTLI_DEFAULT_MODE, (size_t)src.len,
                             (const uint8_t*)src.buf, &encoded,
                             (uint8_t*)dst.buf);
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&src);
  PyBuffer_Release(&dst);
  if (!ok) {
    PyErr_SetString(PyExc_RuntimeError, "brotli compression failed");
    return nullptr;
  }
  return PyLong_FromSize_t(encoded);
}

enum : int { kUseDelta = 1, kUseCG = 2, kNoLow = 4 };

// Decode one brotli stream out of buf starting at *pos; advances *pos to
// the stream end (the reference's BrotliDecompress contract,
// fusion_power_video.cc:186-214).  Runs without touching Python state so
// callers can hold the GIL released.  ``cap``: abort (returning false) as
// soon as the output exceeds this many bytes — callers that know the
// exact plane size pass it so a crafted brotli bomb cannot allocate
// arbitrarily; pass SIZE_MAX for unbounded streams.
static bool BrotliDecompressVec(const uint8_t* buf, size_t len, size_t* pos,
                                std::vector<uint8_t>* out,
                                size_t cap = (size_t)-1) {
  BrotliDecoderState* state =
      BrotliDecoderCreateInstance(nullptr, nullptr, nullptr);
  if (!state) return false;
  size_t avail_in = len - *pos;
  const uint8_t* next_in = buf + *pos;
  BrotliDecoderResult result;
  for (;;) {
    size_t avail_out = 0;
    result = BrotliDecoderDecompressStream(state, &avail_in, &next_in,
                                           &avail_out, nullptr, nullptr);
    if (result != BROTLI_DECODER_RESULT_NEEDS_MORE_OUTPUT) break;
    size_t out_size = 0;
    const uint8_t* out_buf = BrotliDecoderTakeOutput(state, &out_size);
    if (out_size > 0) out->insert(out->end(), out_buf, out_buf + out_size);
    if (out->size() > cap) {
      BrotliDecoderDestroyInstance(state);
      return false;  // oversize: fail the frame instead of growing on
    }
  }
  {
    size_t out_size = 0;
    const uint8_t* out_buf = BrotliDecoderTakeOutput(state, &out_size);
    if (out_size > 0) out->insert(out->end(), out_buf, out_buf + out_size);
  }
  *pos = len - avail_in;
  BrotliDecoderDestroyInstance(state);
  return result == BROTLI_DECODER_RESULT_SUCCESS && out->size() <= cap;
}

// Decode ONE brotli stream starting at pos; returns (bytes, end_pos) —
// mirrors the reference's BrotliDecompress wrapper that supports two
// concatenated streams (fusion_power_video.cc:186-214).
PyObject* py_brotli_decompress_stream(PyObject*, PyObject* args) {
  Py_buffer buf;
  Py_ssize_t pos = 0;
  if (!PyArg_ParseTuple(args, "y*|n", &buf, &pos)) return nullptr;
  if (pos < 0 || pos > buf.len) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "pos out of range");
    return nullptr;
  }
  std::vector<uint8_t> out;
  size_t end_pos = (size_t)pos;
  bool ok;
  Py_BEGIN_ALLOW_THREADS;
  ok = BrotliDecompressVec((const uint8_t*)buf.buf, (size_t)buf.len, &end_pos,
                           &out);
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&buf);
  if (!ok) {
    PyErr_SetString(PyExc_ValueError, "brotli decompression failed");
    return nullptr;
  }
  PyObject* data = PyBytes_FromStringAndSize((const char*)out.data(),
                                             (Py_ssize_t)out.size());
  if (!data) return nullptr;
  PyObject* ret = Py_BuildValue("(Nn)", data, (Py_ssize_t)end_pos);
  return ret;
}

// cg_decode(residual_bytes, xsize) -> bytes: sequential flat-buffer inverse
// scan (fusion_power_video.cc:326-333).
PyObject* py_cg_decode(PyObject*, PyObject* args) {
  Py_buffer buf;
  Py_ssize_t xsize;
  if (!PyArg_ParseTuple(args, "y*n", &buf, &xsize)) return nullptr;
  if (xsize <= 0) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "invalid xsize");
    return nullptr;
  }
  PyObject* out_obj = PyBytes_FromStringAndSize((const char*)buf.buf, buf.len);
  if (!out_obj) {
    PyBuffer_Release(&buf);
    return nullptr;
  }
  uint8_t* p = (uint8_t*)PyBytes_AS_STRING(out_obj);
  const size_t size = (size_t)buf.len;
  const size_t xs = (size_t)xsize;
  Py_BEGIN_ALLOW_THREADS;
  for (size_t i = xs + 1; i < size; i++) {
    p[i] = (uint8_t)(p[i] + ClampedGradient(p[i - xs], p[i - 1], p[i - xs - 1]));
  }
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&buf);
  return out_obj;
}

// cg_encode(plane_bytes, xsize) -> bytes: forward residual (reads original
// neighbors; fusion_power_video.cc:564-572).
PyObject* py_cg_encode(PyObject*, PyObject* args) {
  Py_buffer buf;
  Py_ssize_t xsize;
  if (!PyArg_ParseTuple(args, "y*n", &buf, &xsize)) return nullptr;
  if (xsize <= 0) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "invalid xsize");
    return nullptr;
  }
  PyObject* out_obj = PyBytes_FromStringAndSize(nullptr, buf.len);
  if (!out_obj) {
    PyBuffer_Release(&buf);
    return nullptr;
  }
  const uint8_t* src = (const uint8_t*)buf.buf;
  uint8_t* dst = (uint8_t*)PyBytes_AS_STRING(out_obj);
  const size_t size = (size_t)buf.len;
  const size_t xs = (size_t)xsize;
  Py_BEGIN_ALLOW_THREADS;
  {
    const size_t head = size < xs + 1 ? size : xs + 1;
    memcpy(dst, src, head);
    for (size_t i = xs + 1; i < size; i++) {
      dst[i] = (uint8_t)(src[i] -
                         ClampedGradient(src[i - xs], src[i - 1], src[i - xs - 1]));
    }
  }
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&buf);
  return out_obj;
}

// decompress_image(image_bitstream, xsize, ysize, delta u16|None)
//   -> u16 frame bytes (native-LE)
//
// Whole-image FPV1 decode fast path: the full DecompressImage pipeline
// (fusion_power_video.cc:296-347 — flags byte, two concatenated brotli
// plane streams, un-CG scan, delta add + plane combine) in one
// GIL-released call.  The grown-preview UB tolerance stays in the Python
// path (format/container.parse_image grown_size): this function rejects
// mismatched plane sizes like the reference does.
PyObject* py_decompress_image(PyObject*, PyObject* args) {
  Py_buffer data, delta_buf = {};
  PyObject* delta_obj;
  Py_ssize_t xsize, ysize;
  if (!PyArg_ParseTuple(args, "y*nnO", &data, &xsize, &ysize, &delta_obj))
    return nullptr;
  if (xsize <= 0 || ysize <= 0 || xsize > 65536 || ysize > 65536) {
    PyBuffer_Release(&data);
    PyErr_SetString(PyExc_ValueError, "invalid image dimensions");
    return nullptr;
  }
  const size_t n = (size_t)xsize * (size_t)ysize;
  if (data.len < 1) {
    PyBuffer_Release(&data);
    PyErr_SetString(PyExc_ValueError, "out of bounds");
    return nullptr;
  }
  const uint8_t* in = (const uint8_t*)data.buf;
  const int flags = in[0];
  const bool use_delta = flags & kUseDelta;
  const bool use_cg = flags & kUseCG;
  const bool zero_low = flags & kNoLow;
  const uint16_t* delta = nullptr;
  if (delta_obj != Py_None) {
    if (PyObject_GetBuffer(delta_obj, &delta_buf, PyBUF_SIMPLE) < 0 ||
        (size_t)delta_buf.len != n * 2) {
      PyBuffer_Release(&data);
      if (delta_buf.obj) PyBuffer_Release(&delta_buf);
      PyErr_SetString(PyExc_ValueError, "bad delta buffer");
      return nullptr;
    }
    delta = (const uint16_t*)delta_buf.buf;
  }
  if (use_delta && !delta) {
    PyBuffer_Release(&data);
    if (delta) PyBuffer_Release(&delta_buf);
    PyErr_SetString(PyExc_ValueError, "delta frame not given");
    return nullptr;
  }
  // bytearray, not bytes: np.frombuffer over it yields a WRITABLE array,
  // matching the python path's mutability (consumers unshift in place)
  PyObject* out_obj = PyByteArray_FromStringAndSize(nullptr, (Py_ssize_t)(n * 2));
  if (!out_obj) {
    PyBuffer_Release(&data);
    if (delta) PyBuffer_Release(&delta_buf);
    return nullptr;
  }
  uint16_t* out = (uint16_t*)PyByteArray_AS_STRING(out_obj);
  const char* err = nullptr;
  Py_BEGIN_ALLOW_THREADS;
  try {
  do {
    std::vector<uint8_t> low, high;
    size_t pos = 1;
    if (zero_low) {
      low.assign(n, 0);
    } else if (!BrotliDecompressVec(in, (size_t)data.len, &pos, &low, n)) {
      err = "brotli decompression failed";
      break;
    }
    if (!BrotliDecompressVec(in, (size_t)data.len, &pos, &high, n)) {
      err = "brotli decompression failed";
      break;
    }
    if (low.size() != n || high.size() != n) {
      err = "wrong decompressed plane size";
      break;
    }
    if (use_cg) {
      uint8_t* p = high.data();
      const size_t xs = (size_t)xsize;
      for (size_t i = xs + 1; i < n; i++)
        p[i] = (uint8_t)(p[i] +
                         ClampedGradient(p[i - xs], p[i - 1], p[i - xs - 1]));
    }
    if (use_delta) {
      // fusion_power_video.cc:340-343 wraparound semantics
      for (size_t i = 0; i < n; i++) {
        const uint8_t hi = (uint8_t)(high[i] + (uint8_t)(delta[i] >> 8));
        const uint8_t lo = (uint8_t)(low[i] + (uint8_t)(delta[i] & 0xff));
        out[i] = (uint16_t)(((uint16_t)hi << 8) | lo);
      }
    } else {
      for (size_t i = 0; i < n; i++)
        out[i] = (uint16_t)(((uint16_t)high[i] << 8) | low[i]);
    }
  } while (0);
  } catch (...) {
    // bad_alloc etc. must not unwind through CPython C frames
    err = "out of memory decoding frame";
  }
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&data);
  if (delta) PyBuffer_Release(&delta_buf);
  if (err) {
    Py_DECREF(out_obj);
    PyErr_SetString(PyExc_ValueError, err);
    return nullptr;
  }
  return out_obj;
}

// ---------------------------------------------------------------------------
// Whole-frame FPV1 compress fast path.
//
// The compat path's per-frame cost on this host is dominated by Python/numpy
// staging between stages; this runs the full pipeline of
// fpv_tpu.api.frame.predict + container.serialize_image natively (semantics:
// fusion_power_video.cc:370-489 split, :491-515 preview, :517-564 decisions
// with the int32/uint64 EstimateEntropy quirks, :566-586 CG forward,
// :643-728 brotli q1) in one GIL-released call.

static inline int FloorLog2U64(uint64_t v) {
  int r = -1;
  while (v) { v >>= 1; r++; }
  return r;
}

// Bit-exact port of EstimateEntropy (fusion_power_video.cc:235-244; see
// fpv_tpu/models/heuristics.py for the integer-width analysis).
static uint64_t EstimateEntropy(const uint64_t counts[256]) {
  int32_t sum32 = 0;
  for (int i = 0; i < 256; i++) sum32 = (int32_t)(sum32 + (int32_t)counts[i]);
  if (sum32 == 0) return 0;
  uint64_t sum_u64 = (uint64_t)(int64_t)sum32;
  int log2sum = FloorLog2U64(sum32 > 0 ? (uint64_t)sum32 : sum_u64);
  int64_t total = 0;
  for (int i = 0; i < 256; i++) {
    uint64_t v = counts[i];
    if (!v) continue;
    total += (int64_t)v * (log2sum - FloorLog2U64(v));
  }
  int32_t acc32 = (int32_t)(uint32_t)((uint64_t)total & 0xFFFFFFFFu);
  uint64_t sum_of_logs = (uint64_t)(int64_t)acc32;
  return (uint64_t)(1024u * sum_of_logs) / sum_u64;
}

static bool BrotliQ1(const uint8_t* data, size_t n, std::vector<uint8_t>* out) {
  size_t max_size = BrotliEncoderMaxCompressedSize(n);
  if (max_size == 0) max_size = 64;
  out->resize(max_size);
  size_t encoded = max_size;
  if (!BrotliEncoderCompress(1, BROTLI_DEFAULT_WINDOW, BROTLI_DEFAULT_MODE, n,
                             data, &encoded, out->data()))
    return false;
  out->resize(encoded);
  return true;
}

// Shared post-split frame pipeline (preview + delta decision + CG decision
// + brotli q1), operating on the byte planes in place.  Factored out so the
// plane-adopting ingest path (the reference's plane ctor,
// fusion_power_video.cc:467-489) runs the IDENTICAL stages as image ingest
// — byte-identical bitstreams by construction.  Runs without the GIL; the
// kNoLow bit of *flags_io must already reflect the low plane.  Returns
// false on brotli failure.
static bool CompressFromPlanes(std::vector<uint8_t>& high,
                               std::vector<uint8_t>& low, bool has_low,
                               size_t xsize, size_t ysize,
                               const uint8_t* delta_high,
                               const uint8_t* delta_low, bool use_delta,
                               bool make_preview, int* flags_io,
                               std::vector<uint8_t>* comp_high,
                               std::vector<uint8_t>* comp_low,
                               std::vector<uint8_t>* comp_preview) {
  const size_t size = xsize * ysize;
  int flags = *flags_io;
  std::vector<uint8_t> preview;

  // --- 1/4-scale preview from the unpredicted high plane (:491-515)
  const size_t ph = ysize / 4, pw = xsize / 4;
  if (make_preview) {
    preview.resize(ph * pw);
    for (size_t py = 0; py < ph; py++) {
      for (size_t px = 0; px < pw; px++) {
        uint32_t sum = 0;
        for (size_t dy = 0; dy < 4; dy++)
          for (size_t dx = 0; dx < 4; dx++)
            sum += high[(py * 4 + dy) * xsize + px * 4 + dx];
        preview[py * pw + px] = (uint8_t)((sum / 16) & 0xFE);
      }
    }
  }

  // --- delta decision (:517-533; degenerate always-zero "delta"
  // histogram, so USE_DELTA iff EstimateEntropy(sampled high) > 0)
  if (use_delta && delta_high) {
    uint64_t counta[256] = {0};
    for (size_t i = 0; i < size; i += 15) counta[high[i]]++;
    if (0 < EstimateEntropy(counta)) {
      flags |= kUseDelta;
      for (size_t i = 0; i < size; i++) high[i] = (uint8_t)(high[i] - delta_high[i]);
      if (has_low && delta_low)
        for (size_t i = 0; i < size; i++) low[i] = (uint8_t)(low[i] - delta_low[i]);
    }
  }

  // --- CG decision on the (possibly delta-predicted) high plane
  // (:546-564), flat-buffer neighbor semantics including row wrap
  {
    uint64_t counta[256] = {0}, countb[256] = {0};
    for (size_t i = xsize + 1; i < size; i += 31) {
      uint8_t a = high[i];
      uint8_t r = (uint8_t)(a - ClampedGradient(high[i - xsize], high[i - 1],
                                                high[i - xsize - 1]));
      counta[a]++;
      countb[r]++;
    }
    if (EstimateEntropy(countb) < EstimateEntropy(counta)) {
      flags |= kUseCG;
      // forward transform in reverse scan order: reads original neighbors
      for (size_t i = size - 1; i >= xsize + 1; i--) {
        high[i] = (uint8_t)(high[i] - ClampedGradient(high[i - xsize], high[i - 1],
                                                      high[i - xsize - 1]));
      }
      if (make_preview && ph > 0 && pw > 0) {
        for (size_t i = ph * pw - 1; i >= pw + 1; i--) {
          preview[i] = (uint8_t)(preview[i] -
                                 ClampedGradient(preview[i - pw], preview[i - 1],
                                                 preview[i - pw - 1]));
        }
      }
    }
  }

  // --- brotli q1 entropy coding (:643-688)
  if (!(flags & kNoLow) && !BrotliQ1(low.data(), size, comp_low)) return false;
  if (!BrotliQ1(high.data(), size, comp_high)) return false;
  if (make_preview && !BrotliQ1(preview.data(), preview.size(), comp_preview))
    return false;
  *flags_io = flags;
  return true;
}

// Shared result serializer: flags byte + [low stream] + high stream
// (OutputCore, fusion_power_video.cc:820-828), plus the preview bitstream
// with its flags byte (OutputFull :842).  Steals nothing; copies into
// PyBytes.
static PyObject* BuildFrameResult(int flags,
                                  const std::vector<uint8_t>& comp_high,
                                  const std::vector<uint8_t>& comp_low,
                                  const std::vector<uint8_t>& comp_preview,
                                  bool make_preview) {
  std::vector<uint8_t> image_bs;
  image_bs.reserve(1 + comp_low.size() + comp_high.size());
  image_bs.push_back((uint8_t)flags);
  image_bs.insert(image_bs.end(), comp_low.begin(), comp_low.end());
  image_bs.insert(image_bs.end(), comp_high.begin(), comp_high.end());
  PyObject* image_obj = PyBytes_FromStringAndSize((const char*)image_bs.data(),
                                                  (Py_ssize_t)image_bs.size());
  if (!image_obj) return nullptr;
  PyObject* preview_obj;
  if (make_preview) {
    std::vector<uint8_t> pv_bs;
    pv_bs.reserve(1 + comp_preview.size());
    pv_bs.push_back((uint8_t)((flags & kUseCG) | kNoLow));
    pv_bs.insert(pv_bs.end(), comp_preview.begin(), comp_preview.end());
    preview_obj = PyBytes_FromStringAndSize((const char*)pv_bs.data(),
                                            (Py_ssize_t)pv_bs.size());
    if (!preview_obj) { Py_DECREF(image_obj); return nullptr; }
  } else {
    preview_obj = Py_None;
    Py_INCREF(Py_None);
  }
  return Py_BuildValue("(iNN)", flags, image_obj, preview_obj);
}

// compress_frame(img u16 native-LE, xsize, ysize, shift, big_endian,
//                delta_high|None, delta_low|None, use_delta_frame,
//                make_preview) -> (flags, image_bs, preview_bs|None)
PyObject* py_compress_frame(PyObject*, PyObject* args) {
  Py_buffer img_buf, dh_buf = {}, dl_buf = {};
  PyObject* dh_obj;
  PyObject* dl_obj;
  Py_ssize_t xsize, ysize, shift;
  int big_endian, use_delta, make_preview;
  if (!PyArg_ParseTuple(args, "y*nnnpOOpp", &img_buf, &xsize, &ysize, &shift,
                        &big_endian, &dh_obj, &dl_obj, &use_delta,
                        &make_preview))
    return nullptr;
  // dims first (bounded multiply: 65536^2 * 2 fits size_t; unchecked
  // xsize*ysize could wrap size_t and sail past the buffer-length check),
  // then the shift domain: big-endian shift > 8 would drive the rotate
  // split below into a negative shift count (C++ UB) — the Python split
  // paths reject the same configurations (ops/planes.validate_shift)
  if (xsize <= 0 || ysize <= 0 || xsize > 65536 || ysize > 65536) {
    PyBuffer_Release(&img_buf);
    PyErr_SetString(PyExc_ValueError, "bad image dimensions");
    return nullptr;
  }
  if (shift < 0 || shift > 16 || (big_endian && shift > 8)) {
    PyBuffer_Release(&img_buf);
    PyErr_SetString(PyExc_ValueError, "unsupported shift configuration");
    return nullptr;
  }
  const size_t size = (size_t)xsize * (size_t)ysize;
  if ((size_t)img_buf.len < size * 2) {
    PyBuffer_Release(&img_buf);
    PyErr_SetString(PyExc_ValueError, "bad image buffer");
    return nullptr;
  }
  const uint8_t* delta_high = nullptr;
  const uint8_t* delta_low = nullptr;
  if (dh_obj != Py_None) {
    if (PyObject_GetBuffer(dh_obj, &dh_buf, PyBUF_SIMPLE) < 0 ||
        (size_t)dh_buf.len != size) {
      PyBuffer_Release(&img_buf);
      PyErr_SetString(PyExc_ValueError, "bad delta high buffer");
      return nullptr;
    }
    delta_high = (const uint8_t*)dh_buf.buf;
  }
  if (dl_obj != Py_None) {
    if (PyObject_GetBuffer(dl_obj, &dl_buf, PyBUF_SIMPLE) < 0 ||
        (size_t)dl_buf.len != size) {
      PyBuffer_Release(&img_buf);
      if (delta_high) PyBuffer_Release(&dh_buf);
      PyErr_SetString(PyExc_ValueError, "bad delta low buffer");
      return nullptr;
    }
    delta_low = (const uint8_t*)dl_buf.buf;
  }

  int flags = 0;
  bool failed = false;
  std::vector<uint8_t> high(size), low, preview;
  std::vector<uint8_t> comp_high, comp_low, comp_preview;
  Py_BEGIN_ALLOW_THREADS;
  do {
    const uint16_t* img = (const uint16_t*)img_buf.buf;
    // --- plane split (fusion_power_video.cc:370-451 semantics)
    bool has_low = shift != 8;
    if (has_low) low.resize(size);
    if (!big_endian) {
      if (shift == 0) {
        for (size_t i = 0; i < size; i++) { high[i] = img[i] >> 8; low[i] = img[i] & 0xFF; }
      } else if (shift == 8) {
        for (size_t i = 0; i < size; i++) high[i] = img[i] & 0xFF;
      } else {
        for (size_t i = 0; i < size; i++) {
          uint16_t v = (uint16_t)(img[i] << shift);
          high[i] = v >> 8; low[i] = v & 0xFF;
        }
      }
    } else {
      if (shift == 0) {
        for (size_t i = 0; i < size; i++) { high[i] = img[i] & 0xFF; low[i] = img[i] >> 8; }
      } else if (shift == 8) {
        for (size_t i = 0; i < size; i++) high[i] = img[i] >> 8;
      } else {
        for (size_t i = 0; i < size; i++) {
          uint16_t p = img[i];
          high[i] = (uint8_t)(((p << shift) | (p >> (16 - shift))) & 0xFF);
          low[i] = (uint8_t)((p >> (8 - shift)) & 0xFF);
        }
      }
    }
    bool low_nonzero = false;
    for (size_t i = 0; i < low.size(); i++)
      if (low[i]) { low_nonzero = true; break; }
    if (!has_low || !low_nonzero) flags |= kNoLow;

    if (!CompressFromPlanes(high, low, has_low, (size_t)xsize, (size_t)ysize,
                            delta_high, delta_low, use_delta, make_preview,
                            &flags, &comp_high, &comp_low, &comp_preview)) {
      failed = true;
      break;
    }
  } while (false);
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&img_buf);
  if (delta_high) PyBuffer_Release(&dh_buf);
  if (delta_low) PyBuffer_Release(&dl_buf);
  if (failed) {
    PyErr_SetString(PyExc_RuntimeError, "brotli compression failed");
    return nullptr;
  }

  return BuildFrameResult(flags, comp_high, comp_low, comp_preview,
                          make_preview);
}

// compress_frame_planes(high u8, low u8|None, xsize, ysize,
//                       delta_high|None, delta_low|None, use_delta_frame,
//                       make_preview) -> (flags, image_bs, preview_bs|None)
//
// Plane-adopting ingest: the pre-split byte planes enter the pipeline
// directly, skipping the u16 combine/split round trip — the reference's
// plane-adopting Frame ctor (fusion_power_video.cc:467-489).  Produces
// bitstreams byte-identical to compress_frame on the corresponding
// combined image (same NO_LOW detection: a missing OR all-zero low plane
// sets the flag, matching the image ctor's :447-449).
PyObject* py_compress_frame_planes(PyObject*, PyObject* args) {
  Py_buffer high_buf, low_buf = {}, dh_buf = {}, dl_buf = {};
  PyObject* low_obj;
  PyObject* dh_obj;
  PyObject* dl_obj;
  Py_ssize_t xsize, ysize;
  int use_delta, make_preview;
  if (!PyArg_ParseTuple(args, "y*OnnOOpp", &high_buf, &low_obj, &xsize,
                        &ysize, &dh_obj, &dl_obj, &use_delta, &make_preview))
    return nullptr;
  if (xsize <= 0 || ysize <= 0 || xsize > 65536 || ysize > 65536) {
    PyBuffer_Release(&high_buf);
    PyErr_SetString(PyExc_ValueError, "bad image dimensions");
    return nullptr;
  }
  const size_t size = (size_t)xsize * (size_t)ysize;
  if ((size_t)high_buf.len != size) {
    PyBuffer_Release(&high_buf);
    PyErr_SetString(PyExc_ValueError, "bad high plane buffer");
    return nullptr;
  }
  bool has_low = low_obj != Py_None;
  if (has_low) {
    if (PyObject_GetBuffer(low_obj, &low_buf, PyBUF_SIMPLE) < 0 ||
        (size_t)low_buf.len != size) {
      PyBuffer_Release(&high_buf);
      PyErr_SetString(PyExc_ValueError, "bad low plane buffer");
      return nullptr;
    }
  }
  const uint8_t* delta_high = nullptr;
  const uint8_t* delta_low = nullptr;
  if (dh_obj != Py_None) {
    if (PyObject_GetBuffer(dh_obj, &dh_buf, PyBUF_SIMPLE) < 0 ||
        (size_t)dh_buf.len != size) {
      PyBuffer_Release(&high_buf);
      if (has_low) PyBuffer_Release(&low_buf);
      PyErr_SetString(PyExc_ValueError, "bad delta high buffer");
      return nullptr;
    }
    delta_high = (const uint8_t*)dh_buf.buf;
  }
  if (dl_obj != Py_None) {
    if (PyObject_GetBuffer(dl_obj, &dl_buf, PyBUF_SIMPLE) < 0 ||
        (size_t)dl_buf.len != size) {
      PyBuffer_Release(&high_buf);
      if (has_low) PyBuffer_Release(&low_buf);
      if (delta_high) PyBuffer_Release(&dh_buf);
      PyErr_SetString(PyExc_ValueError, "bad delta low buffer");
      return nullptr;
    }
    delta_low = (const uint8_t*)dl_buf.buf;
  }

  int flags = 0;
  bool failed = false;
  std::vector<uint8_t> high, low;
  std::vector<uint8_t> comp_high, comp_low, comp_preview;
  Py_BEGIN_ALLOW_THREADS;
  do {
    const uint8_t* hp = (const uint8_t*)high_buf.buf;
    high.assign(hp, hp + size);
    bool low_nonzero = false;
    if (has_low) {
      const uint8_t* lp = (const uint8_t*)low_buf.buf;
      low.assign(lp, lp + size);
      for (size_t i = 0; i < size; i++)
        if (low[i]) { low_nonzero = true; break; }
    }
    if (!has_low || !low_nonzero) flags |= kNoLow;
    if (!CompressFromPlanes(high, low, has_low, (size_t)xsize, (size_t)ysize,
                            delta_high, delta_low, use_delta, make_preview,
                            &flags, &comp_high, &comp_low, &comp_preview)) {
      failed = true;
      break;
    }
  } while (false);
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&high_buf);
  if (has_low) PyBuffer_Release(&low_buf);
  if (delta_high) PyBuffer_Release(&dh_buf);
  if (delta_low) PyBuffer_Release(&dl_buf);
  if (failed) {
    PyErr_SetString(PyExc_RuntimeError, "brotli compression failed");
    return nullptr;
  }
  return BuildFrameResult(flags, comp_high, comp_low, comp_preview,
                          make_preview);
}

PyMethodDef methods[] = {
    {"compress_frame", py_compress_frame, METH_VARARGS,
     "compress_frame(img, xsize, ysize, shift, big_endian, delta_high, "
     "delta_low, use_delta, make_preview) -> (flags, image_bs, preview_bs)"},
    {"compress_frame_planes", py_compress_frame_planes, METH_VARARGS,
     "compress_frame_planes(high, low, xsize, ysize, delta_high, delta_low, "
     "use_delta, make_preview) -> (flags, image_bs, preview_bs) — pre-split "
     "byte-plane ingest (plane-adopting ctor parity)"},
    {"brotli_compress", py_brotli_compress, METH_VARARGS,
     "brotli_compress(data, quality=1, lgwin=22) -> bytes"},
    {"brotli_compress_into", py_brotli_compress_into, METH_VARARGS,
     "brotli_compress_into(data, dest, quality=1) -> nbytes"},
    {"brotli_decompress_stream", py_brotli_decompress_stream, METH_VARARGS,
     "brotli_decompress_stream(data, pos=0) -> (bytes, end_pos)"},
    {"brotli_max_compressed_size", py_brotli_max_compressed_size, METH_VARARGS,
     "brotli_max_compressed_size(n) -> int"},
    {"decompress_image", py_decompress_image, METH_VARARGS,
     "decompress_image(image_bitstream, xsize, ysize, delta_u16|None) -> "
     "u16 frame bytes (whole-image FPV1 decode in one GIL-released call)"},
    {"cg_decode", py_cg_decode, METH_VARARGS,
     "cg_decode(residual, xsize) -> bytes (flat-buffer inverse CG scan)"},
    {"cg_encode", py_cg_encode, METH_VARARGS,
     "cg_encode(plane, xsize) -> bytes (flat-buffer CG residual)"},
    {nullptr, nullptr, 0, nullptr},
};

struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "fpv_native",
    "Native brotli bridge and scan kernels for fpv_tpu", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_fpv_native(void) { return PyModule_Create(&moduledef); }
