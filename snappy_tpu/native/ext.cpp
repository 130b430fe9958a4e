// CPython C-extension binding for the native host runtime.
//
// The ctypes binding (``__init__.py``) costs ~2.5-3 us per call in
// argument marshalling — visible as the dispatch floor on small and
// cache-resident inputs (BENCH_HOST.md, 200-byte row). This module is
// the zero-overhead twin: the same exported C core (core.cpp is
// compiled straight into this .so), reached through a direct
// METH_VARARGS call with buffer-protocol arguments (~0.2 us), with the
// GIL released around codec work so Python threads overlap.
//
// It is optional: ``__init__.py`` builds and imports it on demand and
// falls back to ctypes when Python headers or a compiler are missing.
// Error structs map back to the exact Python exceptions through a
// handler installed from Python (same values as the ctypes ``_raise``).
//
// Role parity: reference ``snappy-cpp/src/lib.rs`` keeps its FFI shim
// this thin, too — parse arguments, call the core, surface errors.

#include <Python.h>

#include "core.cpp"

namespace {

// Installed from Python: callable(code, a, b, c) that raises the exact
// snappy_tpu.error exception for a stpu_error struct.
PyObject* g_error_handler = nullptr;

PyObject* raise_native(const stpu_error& e) {
  if (g_error_handler == nullptr) {
    PyErr_Format(PyExc_RuntimeError, "native codec error %d (no handler)",
                 (int)e.code);
    return nullptr;
  }
  PyObject* r = PyObject_CallFunction(
      g_error_handler, "iKKK", (int)e.code, (unsigned long long)e.a,
      (unsigned long long)e.b, (unsigned long long)e.c);
  Py_XDECREF(r);
  // The handler always raises; if it somehow returned, raise generically.
  if (!PyErr_Occurred())
    PyErr_Format(PyExc_RuntimeError, "native codec error %d", (int)e.code);
  return nullptr;
}

PyObject* set_error_handler(PyObject*, PyObject* arg) {
  Py_XINCREF(arg);
  Py_XDECREF(g_error_handler);
  g_error_handler = arg;
  Py_RETURN_NONE;
}

PyObject* py_compress_into(PyObject*, PyObject* args) {
  Py_buffer src, dst;
  if (!PyArg_ParseTuple(args, "y*w*", &src, &dst)) return nullptr;
  stpu_error e;
  int64_t n;
  Py_BEGIN_ALLOW_THREADS
  n = stpu_compress((const uint8_t*)src.buf, (uint64_t)src.len,
                    (uint8_t*)dst.buf, (uint64_t)dst.len, &e);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&src);
  PyBuffer_Release(&dst);
  if (n < 0) return raise_native(e);
  return PyLong_FromLongLong(n);
}

PyObject* py_decompress_into(PyObject*, PyObject* args) {
  Py_buffer src, dst;
  if (!PyArg_ParseTuple(args, "y*w*", &src, &dst)) return nullptr;
  stpu_error e;
  int64_t n;
  Py_BEGIN_ALLOW_THREADS
  n = stpu_decompress((const uint8_t*)src.buf, (uint64_t)src.len,
                      (uint8_t*)dst.buf, (uint64_t)dst.len, &e);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&src);
  PyBuffer_Release(&dst);
  if (n < 0) return raise_native(e);
  return PyLong_FromLongLong(n);
}

PyObject* py_decompress_len(PyObject*, PyObject* args) {
  Py_buffer src;
  if (!PyArg_ParseTuple(args, "y*", &src)) return nullptr;
  stpu_error e;
  int64_t n = stpu_decompress_len((const uint8_t*)src.buf, (uint64_t)src.len, &e);
  PyBuffer_Release(&src);
  if (n < 0) return raise_native(e);
  return PyLong_FromLongLong(n);
}

PyObject* py_scan_ops(PyObject*, PyObject* args) {
  Py_buffer src, dst;
  if (!PyArg_ParseTuple(args, "y*w*", &src, &dst)) return nullptr;
  int64_t n;
  Py_BEGIN_ALLOW_THREADS
  n = stpu_scan_ops((const uint8_t*)src.buf, (uint64_t)src.len, (uint8_t*)dst.buf);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&src);
  PyBuffer_Release(&dst);
  return PyLong_FromLongLong(n);
}

PyObject* py_crc32c(PyObject*, PyObject* args) {
  Py_buffer src;
  if (!PyArg_ParseTuple(args, "y*", &src)) return nullptr;
  uint32_t v;
  Py_BEGIN_ALLOW_THREADS
  v = stpu_crc32c((const uint8_t*)src.buf, (size_t)src.len);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&src);
  return PyLong_FromUnsignedLong(v);
}

PyObject* py_crc32c_masked(PyObject*, PyObject* args) {
  Py_buffer src;
  if (!PyArg_ParseTuple(args, "y*", &src)) return nullptr;
  uint32_t v;
  Py_BEGIN_ALLOW_THREADS
  v = stpu_crc32c_masked((const uint8_t*)src.buf, (size_t)src.len);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&src);
  return PyLong_FromUnsignedLong(v);
}

PyMethodDef methods[] = {
    {"set_error_handler", set_error_handler, METH_O,
     "Install callable(code, a, b, c) that raises the mapped exception."},
    {"compress_into", py_compress_into, METH_VARARGS,
     "compress_into(src, dst) -> bytes written"},
    {"decompress_into", py_decompress_into, METH_VARARGS,
     "decompress_into(src, dst) -> bytes written"},
    {"decompress_len", py_decompress_len, METH_VARARGS,
     "decompress_len(src) -> declared decompressed length"},
    {"scan_ops", py_scan_ops, METH_VARARGS,
     "scan_ops(body, bits_out) -> op count (fills op-start bitmap)"},
    {"crc32c", py_crc32c, METH_VARARGS, "crc32c(buf) -> uint32"},
    {"crc32c_masked", py_crc32c_masked, METH_VARARGS,
     "crc32c_masked(buf) -> uint32"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_snappy_ext",
    "Zero-overhead CPython binding to the snappy_tpu native core.",
    -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__snappy_ext(void) { return PyModule_Create(&moduledef); }
