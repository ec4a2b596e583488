// scdepth_io — native input pipeline for sc-depth-tpu.
//
// The fused TPU train step runs in ~4 ms per batch; Python-side JPEG decode
// would starve it. This module provides GIL-releasing, internally threaded
// JPEG decode (+ optional bilinear resize) producing uint8 HWC arrays, with
// a batch API that decodes a whole snippet batch in one call.
//
// Exposed functions (CPython C API, no pybind11):
//   decode_jpeg(path, height=0, width=0)           -> uint8 [H, W, 3]
//   decode_jpeg_batch(paths, height, width, threads=0)
//                                                   -> uint8 [N, H, W, 3]
//
// Uses libjpeg DCT scaling to decode near the target size, then exact
// bilinear resize. Build: python native/build.py

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <jpeglib.h>

#include <atomic>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG file into RGB uint8. Returns empty vector on failure.
// If target dims are set, uses libjpeg scale_num to decode close to (and not
// below) the target, recording the decoded dims.
bool DecodeJpegFile(const std::string& path, int target_h, int target_w,
                    std::vector<unsigned char>* out, int* out_h, int* out_w) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  if (target_h > 0 && target_w > 0) {
    // Pick the smallest DCT scale k/8 that keeps both dims >= target.
    for (int k = 1; k <= 8; ++k) {
      long h = (static_cast<long>(cinfo.image_height) * k + 7) / 8;
      long w = (static_cast<long>(cinfo.image_width) * k + 7) / 8;
      if (h >= target_h && w >= target_w) {
        cinfo.scale_num = k;
        cinfo.scale_denom = 8;
        break;
      }
    }
  }

  jpeg_start_decompress(&cinfo);
  const int h = cinfo.output_height;
  const int w = cinfo.output_width;
  const int c = cinfo.output_components;  // 3 for RGB, 1 for grayscale
  std::vector<unsigned char> rows(static_cast<size_t>(h) * w * c);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = rows.data() +
        static_cast<size_t>(cinfo.output_scanline) * w * c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);

  if (c == 3) {
    *out = std::move(rows);
  } else {  // expand grayscale to RGB
    out->resize(static_cast<size_t>(h) * w * 3);
    for (size_t i = 0; i < static_cast<size_t>(h) * w; ++i) {
      (*out)[3 * i] = (*out)[3 * i + 1] = (*out)[3 * i + 2] = rows[i * c];
    }
  }
  *out_h = h;
  *out_w = w;
  return true;
}

// Bilinear resize RGB uint8 (half-pixel centers, like cv2 INTER_LINEAR).
void ResizeBilinear(const unsigned char* src, int sh, int sw,
                    unsigned char* dst, int dh, int dw) {
  if (sh == dh && sw == dw) {
    std::memcpy(dst, src, static_cast<size_t>(sh) * sw * 3);
    return;
  }
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = static_cast<int>(fy);
    int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
    float wy = fy - y0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      int x0 = static_cast<int>(fx);
      int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
      float wx = fx - x0;
      const unsigned char* p00 = src + (static_cast<size_t>(y0) * sw + x0) * 3;
      const unsigned char* p01 = src + (static_cast<size_t>(y0) * sw + x1) * 3;
      const unsigned char* p10 = src + (static_cast<size_t>(y1) * sw + x0) * 3;
      const unsigned char* p11 = src + (static_cast<size_t>(y1) * sw + x1) * 3;
      unsigned char* q = dst + (static_cast<size_t>(y) * dw + x) * 3;
      for (int ch = 0; ch < 3; ++ch) {
        float v = (1 - wy) * ((1 - wx) * p00[ch] + wx * p01[ch]) +
                  wy * ((1 - wx) * p10[ch] + wx * p11[ch]);
        q[ch] = static_cast<unsigned char>(v + 0.5f);
      }
    }
  }
}

// Decode + resize into a preallocated [H, W, 3] uint8 slot.
bool DecodeInto(const std::string& path, int th, int tw, unsigned char* slot) {
  std::vector<unsigned char> raw;
  int h = 0, w = 0;
  if (!DecodeJpegFile(path, th, tw, &raw, &h, &w)) return false;
  ResizeBilinear(raw.data(), h, w, slot, th, tw);
  return true;
}

PyObject* py_decode_jpeg(PyObject*, PyObject* args, PyObject* kwargs) {
  const char* path = nullptr;
  int height = 0, width = 0;
  static const char* kwlist[] = {"path", "height", "width", nullptr};
  if (!PyArg_ParseTupleAndKeywords(args, kwargs, "s|ii",
                                   const_cast<char**>(kwlist), &path, &height,
                                   &width)) {
    return nullptr;
  }

  std::vector<unsigned char> raw;
  int h = 0, w = 0;
  bool ok;
  Py_BEGIN_ALLOW_THREADS;
  ok = DecodeJpegFile(path, height, width, &raw, &h, &w);
  Py_END_ALLOW_THREADS;
  if (!ok) {
    PyErr_Format(PyExc_IOError, "failed to decode %s", path);
    return nullptr;
  }

  int oh = height > 0 ? height : h;
  int ow = width > 0 ? width : w;
  npy_intp dims[3] = {oh, ow, 3};
  PyObject* arr = PyArray_SimpleNew(3, dims, NPY_UINT8);
  if (!arr) return nullptr;
  auto* dst = static_cast<unsigned char*>(
      PyArray_DATA(reinterpret_cast<PyArrayObject*>(arr)));
  Py_BEGIN_ALLOW_THREADS;
  ResizeBilinear(raw.data(), h, w, dst, oh, ow);
  Py_END_ALLOW_THREADS;
  return arr;
}

PyObject* py_decode_jpeg_batch(PyObject*, PyObject* args, PyObject* kwargs) {
  PyObject* paths_obj = nullptr;
  int height = 0, width = 0, threads = 0;
  static const char* kwlist[] = {"paths", "height", "width", "threads",
                                 nullptr};
  if (!PyArg_ParseTupleAndKeywords(args, kwargs, "Oii|i",
                                   const_cast<char**>(kwlist), &paths_obj,
                                   &height, &width, &threads)) {
    return nullptr;
  }
  PyObject* seq = PySequence_Fast(paths_obj, "paths must be a sequence");
  if (!seq) return nullptr;
  const Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);

  std::vector<std::string> paths;
  paths.reserve(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* item = PySequence_Fast_GET_ITEM(seq, i);
    const char* s = PyUnicode_AsUTF8(item);
    if (!s) {
      Py_DECREF(seq);
      return nullptr;
    }
    paths.emplace_back(s);
  }
  Py_DECREF(seq);

  npy_intp dims[4] = {n, height, width, 3};
  PyObject* arr = PyArray_SimpleNew(4, dims, NPY_UINT8);
  if (!arr) return nullptr;
  auto* base = static_cast<unsigned char*>(
      PyArray_DATA(reinterpret_cast<PyArrayObject*>(arr)));
  const size_t slot_size = static_cast<size_t>(height) * width * 3;

  int n_threads = threads > 0 ? threads
                              : static_cast<int>(
                                    std::thread::hardware_concurrency());
  if (n_threads > n) n_threads = static_cast<int>(n);
  if (n_threads < 1) n_threads = 1;

  std::atomic<long> next(0);
  std::atomic<long> failed(-1);
  {
    Py_BEGIN_ALLOW_THREADS;
    std::vector<std::thread> pool;
    pool.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) {
      pool.emplace_back([&]() {
        for (;;) {
          long i = next.fetch_add(1);
          if (i >= n) return;
          if (!DecodeInto(paths[i], height, width, base + i * slot_size)) {
            failed.store(i);
          }
        }
      });
    }
    for (auto& th : pool) th.join();
    Py_END_ALLOW_THREADS;
  }

  if (failed.load() >= 0) {
    Py_DECREF(arr);
    PyErr_Format(PyExc_IOError, "failed to decode %s",
                 paths[failed.load()].c_str());
    return nullptr;
  }
  return arr;
}

PyMethodDef kMethods[] = {
    {"decode_jpeg", reinterpret_cast<PyCFunction>(py_decode_jpeg),
     METH_VARARGS | METH_KEYWORDS,
     "decode_jpeg(path, height=0, width=0) -> uint8 [H, W, 3]"},
    {"decode_jpeg_batch", reinterpret_cast<PyCFunction>(py_decode_jpeg_batch),
     METH_VARARGS | METH_KEYWORDS,
     "decode_jpeg_batch(paths, height, width, threads=0) -> uint8 [N,H,W,3]"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "scdepth_io",
    "Native JPEG decode/resize for the sc-depth-tpu input pipeline.", -1,
    kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit_scdepth_io(void) {
  import_array();
  return PyModule_Create(&kModule);
}
