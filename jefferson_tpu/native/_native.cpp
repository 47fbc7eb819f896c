// jefferson_tpu native runtime: C++ host-side components.
//
// The reference's host runtime is native C++ throughout (libsndfile I/O,
// pinned-buffer block feeding, overlap-save memmove — reference:
// Jefferson/src/Audio.cu:119-157, Jefferson/src/cudaPart.cu:21-63).  This
// module is the TPU build's native equivalent for the host-side hot paths:
//
//   decode_wav(bytes)                 -> (float32 array [frames, ch], rate)
//   encode_pcm(float32 array, bits)   -> bytes (PCM 16/24/32, interleaved)
//   fed_stream(signal, blocks, fpb)   -> wrapped playhead stream
//   build_segments(stream, hist, fpb, pad) -> overlap-save windows [B, pad]
//
// Built with scripts/build_native.py (plain g++, CPython + NumPy C API —
// no pybind11 in this environment).  jefferson_tpu.native falls back to the
// pure-NumPy implementations when this extension is absent.

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct FmtInfo {
  uint16_t tag = 0;
  uint16_t channels = 0;
  uint32_t rate = 0;
  uint16_t bits = 0;
};

bool read_u32(const uint8_t* d, size_t len, size_t off, uint32_t* out) {
  if (off + 4 > len) return false;
  std::memcpy(out, d + off, 4);
  return true;
}

// Parse RIFF/WAVE, locate fmt + data chunks. Returns false on malformed input.
bool parse_wav(const uint8_t* d, size_t len, FmtInfo* fmt, size_t* data_off,
               size_t* data_len) {
  if (len < 12 || std::memcmp(d, "RIFF", 4) || std::memcmp(d + 8, "WAVE", 4))
    return false;
  size_t pos = 12;
  bool have_fmt = false, have_data = false;
  while (pos + 8 <= len) {
    uint32_t size;
    if (!read_u32(d, len, pos + 4, &size)) return false;
    const uint8_t* id = d + pos;
    size_t body = pos + 8;
    size_t body_end = body + size;
    if (body_end > len) body_end = len;
    if (!have_fmt && !std::memcmp(id, "fmt ", 4) && body_end - body >= 16) {
      std::memcpy(&fmt->tag, d + body, 2);
      std::memcpy(&fmt->channels, d + body + 2, 2);
      std::memcpy(&fmt->rate, d + body + 4, 4);
      std::memcpy(&fmt->bits, d + body + 14, 2);
      if (fmt->tag == 0xFFFE && body_end - body >= 26)
        std::memcpy(&fmt->tag, d + body + 24, 2);  // EXTENSIBLE SubFormat
      have_fmt = true;
    } else if (!have_data && !std::memcmp(id, "data", 4)) {
      *data_off = body;
      *data_len = body_end - body;
      have_data = true;
    }
    pos = body + size + (size & 1);
  }
  return have_fmt && have_data;
}

PyObject* decode_wav(PyObject*, PyObject* args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
  const uint8_t* d = static_cast<const uint8_t*>(buf.buf);
  size_t len = buf.len;
  FmtInfo fmt;
  size_t off = 0, dlen = 0;
  if (!parse_wav(d, len, &fmt, &off, &dlen)) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "malformed WAV (missing fmt/data)");
    return nullptr;
  }
  const int ch = fmt.channels ? fmt.channels : 1;
  const size_t bytes_per = fmt.bits / 8;
  if (bytes_per == 0) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "zero bit depth");
    return nullptr;
  }
  const size_t frames = dlen / (bytes_per * ch);
  npy_intp dims[2] = {static_cast<npy_intp>(frames), ch};
  PyObject* arr = PyArray_SimpleNew(2, dims, NPY_FLOAT32);
  if (!arr) {
    PyBuffer_Release(&buf);
    return nullptr;
  }
  float* out = static_cast<float*>(PyArray_DATA(reinterpret_cast<PyArrayObject*>(arr)));
  const uint8_t* p = d + off;
  const size_t n = frames * ch;
  bool ok = true;
  if (fmt.tag == 3 && fmt.bits == 32) {
    std::memcpy(out, p, n * 4);
  } else if (fmt.tag == 3 && fmt.bits == 64) {
    const double* s = reinterpret_cast<const double*>(p);
    for (size_t i = 0; i < n; i++) out[i] = static_cast<float>(s[i]);
  } else if (fmt.tag == 1 && fmt.bits == 16) {
    const int16_t* s = reinterpret_cast<const int16_t*>(p);
    const float k = 1.0f / 32768.0f;
    for (size_t i = 0; i < n; i++) out[i] = s[i] * k;
  } else if (fmt.tag == 1 && fmt.bits == 24) {
    const double k = 1.0 / 8388608.0;
    for (size_t i = 0; i < n; i++) {
      int32_t v = p[3 * i] | (p[3 * i + 1] << 8) | (p[3 * i + 2] << 16);
      if (v >= (1 << 23)) v -= (1 << 24);
      out[i] = static_cast<float>(v * k);
    }
  } else if (fmt.tag == 1 && fmt.bits == 32) {
    const int32_t* s = reinterpret_cast<const int32_t*>(p);
    const double k = 1.0 / 2147483648.0;
    for (size_t i = 0; i < n; i++) out[i] = static_cast<float>(s[i] * k);
  } else if (fmt.tag == 1 && fmt.bits == 8) {
    const float k = 1.0f / 128.0f;
    for (size_t i = 0; i < n; i++) out[i] = (static_cast<int>(p[i]) - 128) * k;
  } else {
    ok = false;
  }
  PyBuffer_Release(&buf);
  if (!ok) {
    Py_DECREF(arr);
    PyErr_Format(PyExc_ValueError, "unsupported WAV format tag=%d bits=%d",
                 fmt.tag, fmt.bits);
    return nullptr;
  }
  return Py_BuildValue("(Ni)", arr, static_cast<int>(fmt.rate));
}

PyObject* encode_pcm(PyObject*, PyObject* args) {
  PyObject* in;
  int bits;
  if (!PyArg_ParseTuple(args, "Oi", &in, &bits)) return nullptr;
  PyArrayObject* arr = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(in, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED));
  if (!arr) return nullptr;
  const size_t n = static_cast<size_t>(PyArray_SIZE(arr));
  const float* x = static_cast<const float*>(PyArray_DATA(arr));
  const double scale = static_cast<double>(1LL << (bits - 1));
  const double lo = -scale, hi = scale - 1;
  PyObject* bytes = PyBytes_FromStringAndSize(nullptr, n * (bits / 8));
  if (!bytes) {
    Py_DECREF(arr);
    return nullptr;
  }
  uint8_t* o = reinterpret_cast<uint8_t*>(PyBytes_AS_STRING(bytes));
  auto quant = [&](size_t i) -> int64_t {
    double v = static_cast<double>(x[i]) * scale;
    v = v < lo ? lo : (v > hi ? hi : v);
    // round half away from zero like np.rint? np.rint is half-to-even; match it
    double r = std::nearbyint(v);
    return static_cast<int64_t>(r);
  };
  if (bits == 16) {
    int16_t* s = reinterpret_cast<int16_t*>(o);
    for (size_t i = 0; i < n; i++) s[i] = static_cast<int16_t>(quant(i));
  } else if (bits == 24) {
    for (size_t i = 0; i < n; i++) {
      int32_t v = static_cast<int32_t>(quant(i));
      o[3 * i] = v & 0xFF;
      o[3 * i + 1] = (v >> 8) & 0xFF;
      o[3 * i + 2] = (v >> 16) & 0xFF;
    }
  } else if (bits == 32) {
    int32_t* s = reinterpret_cast<int32_t*>(o);
    for (size_t i = 0; i < n; i++) s[i] = static_cast<int32_t>(quant(i));
  } else {
    Py_DECREF(arr);
    Py_DECREF(bytes);
    PyErr_SetString(PyExc_ValueError, "bits must be 16, 24 or 32");
    return nullptr;
  }
  Py_DECREF(arr);
  return bytes;
}

// fed_stream(signal float32[n], num_blocks, fpb) -> float32[num_blocks*fpb]
// Wrapping playhead (reference: Jefferson/src/Audio.cu:121-139).
PyObject* fed_stream(PyObject*, PyObject* args) {
  PyObject* in;
  long num_blocks, fpb;
  if (!PyArg_ParseTuple(args, "Oll", &in, &num_blocks, &fpb)) return nullptr;
  PyArrayObject* arr = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(in, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED));
  if (!arr) return nullptr;
  const size_t n = static_cast<size_t>(PyArray_SIZE(arr));
  if (n == 0) {
    Py_DECREF(arr);
    PyErr_SetString(PyExc_ValueError, "empty signal");
    return nullptr;
  }
  const float* x = static_cast<const float*>(PyArray_DATA(arr));
  npy_intp total = num_blocks * fpb;
  npy_intp dims[1] = {total};
  PyObject* outo = PyArray_SimpleNew(1, dims, NPY_FLOAT32);
  float* o = static_cast<float*>(PyArray_DATA(reinterpret_cast<PyArrayObject*>(outo)));
  size_t pos = 0;
  npy_intp i = 0;
  while (i < total) {
    size_t chunk = n - pos;
    if (static_cast<npy_intp>(chunk) > total - i) chunk = total - i;
    std::memcpy(o + i, x + pos, chunk * sizeof(float));
    i += chunk;
    pos += chunk;
    if (pos == n) pos = 0;
  }
  Py_DECREF(arr);
  return outo;
}

// build_segments(stream float32[B*fpb], hist float32[pad-fpb], fpb, pad)
//   -> float32[B, pad] overlap-save windows
PyObject* build_segments(PyObject*, PyObject* args) {
  PyObject *in, *hin;
  long fpb, pad;
  if (!PyArg_ParseTuple(args, "OOll", &in, &hin, &fpb, &pad)) return nullptr;
  PyArrayObject* arr = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(in, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED));
  PyArrayObject* harr = reinterpret_cast<PyArrayObject*>(
      PyArray_FROM_OTF(hin, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED));
  if (!arr || !harr) {
    Py_XDECREF(arr);
    Py_XDECREF(harr);
    return nullptr;
  }
  const long hist = pad - fpb;
  if (PyArray_SIZE(harr) != hist || PyArray_SIZE(arr) % fpb) {
    Py_DECREF(arr);
    Py_DECREF(harr);
    PyErr_SetString(PyExc_ValueError, "bad stream/history sizes");
    return nullptr;
  }
  const long b = PyArray_SIZE(arr) / fpb;
  const float* x = static_cast<const float*>(PyArray_DATA(arr));
  const float* h = static_cast<const float*>(PyArray_DATA(harr));
  // concatenated view: [hist | stream]
  std::vector<float> full(hist + b * fpb);
  std::memcpy(full.data(), h, hist * sizeof(float));
  std::memcpy(full.data() + hist, x, b * fpb * sizeof(float));
  npy_intp dims[2] = {b, pad};
  PyObject* outo = PyArray_SimpleNew(2, dims, NPY_FLOAT32);
  float* o = static_cast<float*>(PyArray_DATA(reinterpret_cast<PyArrayObject*>(outo)));
  for (long i = 0; i < b; i++)
    std::memcpy(o + i * pad, full.data() + i * fpb, pad * sizeof(float));
  Py_DECREF(arr);
  Py_DECREF(harr);
  return outo;
}

PyMethodDef methods[] = {
    {"decode_wav", decode_wav, METH_VARARGS, "decode WAV bytes -> (float32[frames,ch], rate)"},
    {"encode_pcm", encode_pcm, METH_VARARGS, "float32 array, bits -> PCM bytes"},
    {"fed_stream", fed_stream, METH_VARARGS, "wrapping playhead stream"},
    {"build_segments", build_segments, METH_VARARGS, "overlap-save windows"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef mod = {PyModuleDef_HEAD_INIT, "_jefferson_native",
                   "native host runtime for jefferson_tpu", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__jefferson_native(void) {
  PyObject* m = PyModule_Create(&mod);
  if (!m) return nullptr;
  import_array();
  return m;
}
