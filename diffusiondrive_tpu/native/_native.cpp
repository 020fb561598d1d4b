// Native data-loader hot paths (CPython extension, no pybind11).
//
// The reference's performance-critical IO is delegated to native deps
// (SURVEY §2.9: nuplan's LidarPointCloud / GEOS / OpenCV). This extension
// provides the pieces our loader would otherwise do in slow Python:
//
//  - lzf_decompress:  PCD `binary_compressed` payloads (liblzf algorithm,
//    re-implemented from the format spec). ~100-1000x the pure-python
//    fallback in common/dataclasses.py.
//  - histogram2d:     uint32 2D bin counting for host-side feature caching
//    (np.histogramdd spends most time computing bin edges generically).
//
// Build: diffusiondrive_tpu/native/__init__.py compiles this lazily with
// g++ -O3 and caches the .so next to the source.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <vector>

// ---------------------------------------------------------------------------
// LZF decompression (format-compatible with liblzf's lzf_decompress)
// ---------------------------------------------------------------------------

static Py_ssize_t lzf_decompress_impl(const uint8_t* in, Py_ssize_t in_len,
                                      uint8_t* out, Py_ssize_t out_cap) {
  Py_ssize_t ip = 0, op = 0;
  while (ip < in_len) {
    uint32_t ctrl = in[ip++];
    if (ctrl < 32) {  // literal run of ctrl+1 bytes
      Py_ssize_t run = (Py_ssize_t)ctrl + 1;
      if (op + run > out_cap || ip + run > in_len) return -1;
      std::memcpy(out + op, in + ip, run);
      ip += run;
      op += run;
    } else {  // back reference
      Py_ssize_t len = ctrl >> 5;
      if (len == 7) {
        if (ip >= in_len) return -1;
        len += in[ip++];
      }
      if (ip >= in_len) return -1;
      Py_ssize_t ref = op - (((Py_ssize_t)(ctrl & 0x1f)) << 8) - in[ip++] - 1;
      if (ref < 0 || op + len + 2 > out_cap) return -1;
      // byte-by-byte: references may overlap their own output
      for (Py_ssize_t i = 0; i < len + 2; ++i) {
        out[op] = out[ref];
        ++op;
        ++ref;
      }
    }
  }
  return op;
}

static PyObject* py_lzf_decompress(PyObject* self, PyObject* args) {
  Py_buffer data;
  Py_ssize_t expected;
  if (!PyArg_ParseTuple(args, "y*n", &data, &expected)) return nullptr;

  PyObject* out_bytes = PyBytes_FromStringAndSize(nullptr, expected);
  if (!out_bytes) {
    PyBuffer_Release(&data);
    return nullptr;
  }
  Py_ssize_t produced;
  Py_BEGIN_ALLOW_THREADS
  produced = lzf_decompress_impl((const uint8_t*)data.buf, data.len,
                                 (uint8_t*)PyBytes_AS_STRING(out_bytes), expected);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&data);
  if (produced < 0) {
    Py_DECREF(out_bytes);
    PyErr_SetString(PyExc_ValueError, "corrupt LZF stream");
    return nullptr;
  }
  if (produced != expected) {
    _PyBytes_Resize(&out_bytes, produced);
  }
  return out_bytes;
}

// ---------------------------------------------------------------------------
// 2D histogram: float32 x/y -> uint32 counts over a regular grid
// ---------------------------------------------------------------------------

static PyObject* py_histogram2d(PyObject* self, PyObject* args) {
  Py_buffer xs, ys;
  double min_x, max_x, min_y, max_y;
  int bins;
  if (!PyArg_ParseTuple(args, "y*y*ddddi", &xs, &ys, &min_x, &max_x, &min_y, &max_y, &bins))
    return nullptr;
  Py_ssize_t n = xs.len / (Py_ssize_t)sizeof(float);
  if (ys.len / (Py_ssize_t)sizeof(float) != n) {
    PyBuffer_Release(&xs);
    PyBuffer_Release(&ys);
    PyErr_SetString(PyExc_ValueError, "x/y length mismatch");
    return nullptr;
  }
  PyObject* out_bytes = PyBytes_FromStringAndSize(nullptr, (Py_ssize_t)bins * bins * 4);
  if (!out_bytes) {
    PyBuffer_Release(&xs);
    PyBuffer_Release(&ys);
    return nullptr;
  }
  uint32_t* hist = (uint32_t*)PyBytes_AS_STRING(out_bytes);
  std::memset(hist, 0, (size_t)bins * bins * 4);
  const float* x = (const float*)xs.buf;
  const float* y = (const float*)ys.buf;
  const double sx = bins / (max_x - min_x);
  const double sy = bins / (max_y - min_y);
  Py_BEGIN_ALLOW_THREADS
  for (Py_ssize_t i = 0; i < n; ++i) {
    const double xv = x[i], yv = y[i];
    if (xv < min_x || xv > max_x || yv < min_y || yv > max_y) continue;
    int ix = (int)((xv - min_x) * sx);
    int iy = (int)((yv - min_y) * sy);
    if (ix >= bins) ix = bins - 1;  // right edge closed
    if (iy >= bins) iy = bins - 1;
    hist[(size_t)ix * bins + iy] += 1;
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&xs);
  PyBuffer_Release(&ys);
  return out_bytes;
}

static PyMethodDef Methods[] = {
    {"lzf_decompress", py_lzf_decompress, METH_VARARGS,
     "lzf_decompress(data: bytes, expected_size: int) -> bytes"},
    {"histogram2d", py_histogram2d, METH_VARARGS,
     "histogram2d(x_f32: bytes, y_f32: bytes, min_x, max_x, min_y, max_y, bins) -> uint32 bytes"},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_native",
                                       "Native data-loader hot paths", -1, Methods};

PyMODINIT_FUNC PyInit__native(void) { return PyModule_Create(&moduledef); }
