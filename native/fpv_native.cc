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
  BrotliDecoderState* state = BrotliDecoderCreateInstance(nullptr, nullptr, nullptr);
  if (!state) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_RuntimeError, "couldn't init brotli decoder");
    return nullptr;
  }
  std::vector<uint8_t> out;
  size_t avail_in = (size_t)(buf.len - pos);
  const uint8_t* next_in = (const uint8_t*)buf.buf + pos;
  BrotliDecoderResult result;
  Py_BEGIN_ALLOW_THREADS;
  for (;;) {
    size_t avail_out = 0;
    result = BrotliDecoderDecompressStream(state, &avail_in, &next_in,
                                           &avail_out, nullptr, nullptr);
    if (result != BROTLI_DECODER_RESULT_NEEDS_MORE_OUTPUT) break;
    size_t out_size = 0;
    const uint8_t* out_buf = BrotliDecoderTakeOutput(state, &out_size);
    if (out_size > 0) out.insert(out.end(), out_buf, out_buf + out_size);
  }
  {
    size_t out_size = 0;
    const uint8_t* out_buf = BrotliDecoderTakeOutput(state, &out_size);
    if (out_size > 0) out.insert(out.end(), out_buf, out_buf + out_size);
  }
  Py_END_ALLOW_THREADS;
  size_t end_pos = (size_t)buf.len - avail_in;
  BrotliDecoderDestroyInstance(state);
  PyBuffer_Release(&buf);
  if (result != BROTLI_DECODER_RESULT_SUCCESS) {
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

PyMethodDef methods[] = {
    {"brotli_compress", py_brotli_compress, METH_VARARGS,
     "brotli_compress(data, quality=1, lgwin=22) -> bytes"},
    {"brotli_decompress_stream", py_brotli_decompress_stream, METH_VARARGS,
     "brotli_decompress_stream(data, pos=0) -> (bytes, end_pos)"},
    {"brotli_max_compressed_size", py_brotli_max_compressed_size, METH_VARARGS,
     "brotli_max_compressed_size(n) -> int"},
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
