// Native threaded frame loader for harp_tpu.
//
// TPU-native replacement for the reference's 20-worker torch DataLoader
// (optimize_sequence.py:399 + utils/data_util.py): the whole video sequence
// is decoded ONCE into packed float32 arrays (then device_put), so there is
// no per-step host loader in the training loop at all. This extension makes
// that one-time ingest fast:
//   - decode_jpeg_batch(paths, gray) -> float32 (N,H,W,3) or (N,H,W) in [0,1]
//     (libjpeg, std::thread pool)
//   - erode_masks(masks, iterations) -> 3x3 min-filter erosion, matching
//     cv2.erode(ones(3,3)) on the CPU side (utils/data_util.py:18-20)
//
// Pure CPython C API + libjpeg; no pybind11 (not in the image).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode one JPEG into out (H*W*3 float32, scaled 1/255). Returns false on
// failure or dimension mismatch.
bool decode_one(const std::string& path, int expect_h, int expect_w,
                bool gray, float* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = gray ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  const int c = cinfo.output_components;
  if (h != expect_h || w != expect_w) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  std::vector<uint8_t> row(static_cast<size_t>(w) * c);
  uint8_t* rowp = row.data();
  const float scale = 1.0f / 255.0f;
  const int out_c = gray ? 1 : 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    const int y = cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &rowp, 1);
    float* dst = out + static_cast<size_t>(y) * w * out_c;
    for (int x = 0; x < w * out_c; ++x) dst[x] = rowp[x] * scale;
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Probe dimensions of the first image.
bool probe(const std::string& path, int* h, int* w) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  jpeg_abort_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

PyObject* decode_jpeg_batch(PyObject*, PyObject* args) {
  PyObject* path_list;
  int gray = 0;
  int n_threads = 0;
  if (!PyArg_ParseTuple(args, "O|ii", &path_list, &gray, &n_threads)) return nullptr;
  if (!PyList_Check(path_list)) {
    PyErr_SetString(PyExc_TypeError, "paths must be a list of str");
    return nullptr;
  }
  const Py_ssize_t n = PyList_Size(path_list);
  std::vector<std::string> paths(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* item = PyList_GetItem(path_list, i);
    const char* s = PyUnicode_AsUTF8(item);
    if (!s) return nullptr;
    paths[i] = s;
  }
  if (n == 0) {
    PyErr_SetString(PyExc_ValueError, "empty path list");
    return nullptr;
  }

  int H = 0, W = 0;
  bool ok_probe;
  Py_BEGIN_ALLOW_THREADS
  ok_probe = probe(paths[0], &H, &W);
  Py_END_ALLOW_THREADS
  if (!ok_probe) {
    PyErr_Format(PyExc_IOError, "cannot read %s", paths[0].c_str());
    return nullptr;
  }

  const int C = gray ? 1 : 3;
  const size_t frame = static_cast<size_t>(H) * W * C;
  PyObject* bytes = PyByteArray_FromStringAndSize(nullptr, 0);
  if (PyByteArray_Resize(bytes, static_cast<Py_ssize_t>(n * frame * sizeof(float))) != 0) {
    Py_XDECREF(bytes);
    return nullptr;
  }
  float* out = reinterpret_cast<float*>(PyByteArray_AsString(bytes));

  std::atomic<long> next(0);
  std::atomic<long> failed(-1);
  int workers = n_threads > 0 ? n_threads
                              : static_cast<int>(std::thread::hardware_concurrency());
  if (workers < 1) workers = 1;
  if (workers > n) workers = static_cast<int>(n);

  Py_BEGIN_ALLOW_THREADS
  std::vector<std::thread> pool;
  for (int t = 0; t < workers; ++t) {
    pool.emplace_back([&]() {
      for (;;) {
        long i = next.fetch_add(1);
        if (i >= n || failed.load() >= 0) break;
        if (!decode_one(paths[i], H, W, gray, out + i * frame)) failed.store(i);
      }
    });
  }
  for (auto& th : pool) th.join();
  Py_END_ALLOW_THREADS

  long bad = failed.load();
  if (bad >= 0) {
    Py_DECREF(bytes);
    PyErr_Format(PyExc_IOError, "failed to decode %s (missing/corrupt/size mismatch)",
                 paths[bad].c_str());
    return nullptr;
  }
  // (bytes, n, H, W, C) — Python side wraps with numpy.frombuffer.
  return Py_BuildValue("(Niiii)", bytes, (int)n, H, W, C);
}

PyObject* erode_masks(PyObject*, PyObject* args) {
  Py_buffer buf;
  int n, h, w, iters;
  if (!PyArg_ParseTuple(args, "y*iiii", &buf, &n, &h, &w, &iters)) return nullptr;
  if (buf.len != static_cast<Py_ssize_t>(sizeof(float)) * n * h * w) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "buffer size mismatch");
    return nullptr;
  }
  PyObject* bytes = PyByteArray_FromStringAndSize(nullptr, 0);
  if (PyByteArray_Resize(bytes, buf.len) != 0) {
    PyBuffer_Release(&buf);
    Py_XDECREF(bytes);
    return nullptr;
  }
  float* out = reinterpret_cast<float*>(PyByteArray_AsString(bytes));
  const float* in = reinterpret_cast<const float*>(buf.buf);
  std::memcpy(out, in, buf.len);

  Py_BEGIN_ALLOW_THREADS
  std::vector<float> tmp(static_cast<size_t>(h) * w);
  for (int img = 0; img < n; ++img) {
    float* m = out + static_cast<size_t>(img) * h * w;
    for (int it = 0; it < iters; ++it) {
      for (int y = 0; y < h; ++y) {
        for (int x = 0; x < w; ++x) {
          float v = m[y * w + x];
          for (int dy = -1; dy <= 1; ++dy) {
            int yy = y + dy;
            if (yy < 0 || yy >= h) continue;
            for (int dx = -1; dx <= 1; ++dx) {
              int xx = x + dx;
              if (xx < 0 || xx >= w) continue;
              float u = m[yy * w + xx];
              if (u < v) v = u;
            }
          }
          tmp[y * w + x] = v;
        }
      }
      std::memcpy(m, tmp.data(), sizeof(float) * h * w);
    }
  }
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&buf);
  return bytes;
}

PyMethodDef methods[] = {
    {"decode_jpeg_batch", decode_jpeg_batch, METH_VARARGS,
     "decode_jpeg_batch(paths, gray=0, n_threads=0) -> (bytearray, n, h, w, c)"},
    {"erode_masks", erode_masks, METH_VARARGS,
     "erode_masks(buffer, n, h, w, iterations) -> bytearray"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_frameloader",
    "Threaded libjpeg frame loading + mask erosion", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__frameloader() { return PyModule_Create(&module); }
