// Native host data-path ops for maxsquareloss_tpu.
//
// The reference's host pipeline decodes PNGs with PIL/libpng and remaps /
// normalizes in Python-side numpy (datasets/cityscapes_Dataset.py —
// SURVEY.md C1/§3.4, hard part #5: host decode throughput bottlenecks the
// TPU step rate before the chip does). This module fuses the hot path in
// C++ on top of libpng, one pass over the pixels, GIL released:
//
//   decode_png(bytes)                 -> (buffer, h, w, channels, bitdepth)
//   decode_remap(bytes, lut_i32)      -> (int32 buffer, h, w)   labels
//   decode_normalize_bgr(bytes, mean) -> (float32 buffer, h, w) images
//
// Python-side wrappers (maxsquareloss_tpu/data/hostops.py) view the
// returned bytes objects as numpy arrays without copying. CPython C API
// only — no pybind11 on this image.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <png.h>

#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct PngImage {
  std::vector<uint8_t> data;  // row-major, native channel order
  uint32_t h = 0, w = 0;
  int channels = 0;
  int bitdepth = 0;  // 8 or 16 (16-bit stays big-endian-swapped to host)
};

struct MemReader {
  const uint8_t* p;
  size_t size;
  size_t off;
};

void read_fn(png_structp png, png_bytep out, png_size_t n) {
  MemReader* r = static_cast<MemReader*>(png_get_io_ptr(png));
  if (r->off + n > r->size) {
    png_error(png, "read past end of PNG buffer");
  }
  std::memcpy(out, r->p + r->off, n);
  r->off += n;
}

// Decode a PNG from memory. expand_rgb=true forces 8-bit RGB output
// (palette/gray expanded, alpha stripped, 16-bit downshifted) — the image
// path. expand_rgb=false keeps the raw bit depth & channels — the label
// path (Cityscapes labels are 8-bit gray, SYNTHIA 16-bit RGBA-ish).
bool decode(const uint8_t* buf, size_t size, bool expand_rgb, PngImage* out,
            std::string* err) {
  if (size < 8 || png_sig_cmp(buf, 0, 8)) {
    *err = "not a PNG";
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    *err = "png_create_read_struct failed";
    return false;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    *err = "png_create_info_struct failed";
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    *err = "libpng decode error";
    return false;
  }
  MemReader reader{buf, size, 0};
  png_set_read_fn(png, &reader, read_fn);
  png_read_info(png, info);

  int bitdepth = png_get_bit_depth(png, info);
  int color = png_get_color_type(png, info);

  if (expand_rgb) {
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && bitdepth < 8)
      png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (bitdepth == 16) png_set_strip_16(png);
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
      png_set_gray_to_rgb(png);
    png_set_strip_alpha(png);
  } else {
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (bitdepth < 8) png_set_packing(png);
    if (bitdepth == 16) png_set_swap(png);  // little-endian host order
  }
  png_read_update_info(png, info);

  out->h = png_get_image_height(png, info);
  out->w = png_get_image_width(png, info);
  out->channels = png_get_channels(png, info);
  out->bitdepth = png_get_bit_depth(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  out->data.resize(rowbytes * out->h);
  std::vector<png_bytep> rows(out->h);
  for (uint32_t y = 0; y < out->h; ++y) {
    rows[y] = out->data.data() + y * rowbytes;
  }
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

PyObject* py_decode_png(PyObject*, PyObject* args) {
  Py_buffer view;
  int expand_rgb = 1;
  if (!PyArg_ParseTuple(args, "y*|p", &view, &expand_rgb)) return nullptr;
  PngImage img;
  std::string err;
  bool ok;
  Py_BEGIN_ALLOW_THREADS;
  ok = decode(static_cast<const uint8_t*>(view.buf), view.len,
              expand_rgb != 0, &img, &err);
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&view);
  if (!ok) {
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }
  PyObject* bytes = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(img.data.data()),
      static_cast<Py_ssize_t>(img.data.size()));
  if (!bytes) return nullptr;
  return Py_BuildValue("(Niiii)", bytes, static_cast<int>(img.h),
                       static_cast<int>(img.w), img.channels, img.bitdepth);
}

// Fused: decode label PNG (8- or 16-bit; first channel) + LUT remap → int32.
PyObject* py_decode_remap(PyObject*, PyObject* args) {
  Py_buffer view, lut_view;
  if (!PyArg_ParseTuple(args, "y*y*", &view, &lut_view)) return nullptr;
  if (lut_view.len % 4 != 0 || lut_view.len == 0) {
    PyBuffer_Release(&view);
    PyBuffer_Release(&lut_view);
    PyErr_SetString(PyExc_ValueError, "lut must be int32 bytes");
    return nullptr;
  }
  const int32_t* lut = static_cast<const int32_t*>(lut_view.buf);
  const int64_t lut_n = lut_view.len / 4;

  PngImage img;
  std::string err;
  bool ok;
  std::vector<int32_t> out;
  Py_BEGIN_ALLOW_THREADS;
  ok = decode(static_cast<const uint8_t*>(view.buf), view.len,
              /*expand_rgb=*/false, &img, &err);
  if (ok) {
    const size_t n = static_cast<size_t>(img.h) * img.w;
    out.resize(n);
    if (img.bitdepth == 16) {
      const uint16_t* px = reinterpret_cast<const uint16_t*>(img.data.data());
      const int c = img.channels;
      for (size_t i = 0; i < n; ++i) {
        int64_t v = px[i * c];  // channel 0 (SYNTHIA class id)
        out[i] = lut[v < lut_n ? v : lut_n - 1];
      }
    } else {
      const uint8_t* px = img.data.data();
      const int c = img.channels;
      for (size_t i = 0; i < n; ++i) {
        int64_t v = px[i * c];
        out[i] = lut[v < lut_n ? v : lut_n - 1];
      }
    }
  }
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&view);
  PyBuffer_Release(&lut_view);
  if (!ok) {
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }
  PyObject* bytes = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(out.data()),
      static_cast<Py_ssize_t>(out.size() * 4));
  if (!bytes) return nullptr;
  return Py_BuildValue("(Nii)", bytes, static_cast<int>(img.h),
                       static_cast<int>(img.w));
}

// Fused: decode RGB PNG + RGB→BGR − mean (caffe normalization) → float32.
PyObject* py_decode_normalize_bgr(PyObject*, PyObject* args) {
  Py_buffer view;
  float m0, m1, m2;  // BGR means
  if (!PyArg_ParseTuple(args, "y*fff", &view, &m0, &m1, &m2)) return nullptr;
  PngImage img;
  std::string err;
  bool ok;
  std::vector<float> out;
  Py_BEGIN_ALLOW_THREADS;
  ok = decode(static_cast<const uint8_t*>(view.buf), view.len,
              /*expand_rgb=*/true, &img, &err);
  if (ok) {
    const size_t n = static_cast<size_t>(img.h) * img.w;
    out.resize(n * 3);
    const uint8_t* px = img.data.data();
    for (size_t i = 0; i < n; ++i) {
      const float r = px[i * 3 + 0], g = px[i * 3 + 1], b = px[i * 3 + 2];
      out[i * 3 + 0] = b - m0;
      out[i * 3 + 1] = g - m1;
      out[i * 3 + 2] = r - m2;
    }
  }
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&view);
  if (!ok) {
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }
  PyObject* bytes = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(out.data()),
      static_cast<Py_ssize_t>(out.size() * 4));
  if (!bytes) return nullptr;
  return Py_BuildValue("(Nii)", bytes, static_cast<int>(img.h),
                       static_cast<int>(img.w));
}

// ---------------------------------------------------------------------------
// Gaussian blur, byte-exact vs PIL (reverse-engineered round 4).
//
// Pillow's ImageFilter.GaussianBlur is a sequence of extended box filters
// (Gwosdek et al., SSVM 2011): sigma -> one fractional box radius R = l + a
// applied 3x horizontally then 3x vertically, every pass quantizing to uint8
// through 24.8-style fixed point. The float32/double mixing below mirrors
// Pillow's C expressions exactly (float locals, double literals promote);
// validated byte-identical against Pillow 12.1 on 300+ random
// (sigma, image) draws and the training radius range (tests/test_hostops.py).

float gaussian_box_radius(float radius, int passes) {
  float sigma2 = radius * radius / passes;
  float L = std::sqrt(12.0 * sigma2 + 1.0);        // double expr -> float
  float l = std::floor((L - 1.0) / 2.0);           // double expr -> float
  float a = (2 * l + 1) * (l * (l + 1) - 3 * sigma2);
  a /= 6 * (sigma2 - (l + 1) * (l + 1));
  return l + a;
}

inline uint8_t box_round(uint32_t acc) {
  return static_cast<uint8_t>((acc + (1u << 23)) >> 24);
}

// One horizontal fixed-point box pass over the whole image. Edge columns
// use replicate-clamped scalar code; the interior loop is branchless and
// contiguous over the interleaved row (auto-vectorizes; d == 0 — the whole
// training radius range, sigma < 1.17 — gets a dedicated 3-tap form).
void blur_pass_h(const uint8_t* in, uint8_t* out, int h, int w, int c, int d,
                 uint32_t ww, uint32_t fw) {
  const int64_t row = static_cast<int64_t>(w) * c;
  const int lo = d + 1, hi = w - d - 2;  // interior: all taps in-bounds
  for (int y = 0; y < h; ++y) {
    const uint8_t* r = in + y * row;
    uint8_t* o = out + y * row;
    auto clamped = [&](int x) {
      for (int ch = 0; ch < c; ++ch) {
        uint32_t S = 0;
        for (int k = -d; k <= d; ++k) {
          int xx = x + k;
          xx = xx < 0 ? 0 : (xx >= w ? w - 1 : xx);
          S += r[xx * c + ch];
        }
        int xl = x - d - 1, xh = x + d + 1;
        xl = xl < 0 ? 0 : xl;
        xh = xh >= w ? w - 1 : xh;
        uint32_t acc = ww * S +
                       fw * (static_cast<uint32_t>(r[xl * c + ch]) +
                             r[xh * c + ch]);
        o[x * c + ch] = box_round(acc);
      }
    };
    const int edge_lo = lo < w ? lo : w;
    for (int x = 0; x < edge_lo; ++x) clamped(x);
    for (int x = (hi + 1 > lo ? hi + 1 : lo); x < w; ++x) clamped(x);
    if (hi >= lo) {
      const int64_t i0 = static_cast<int64_t>(lo) * c;
      const int64_t i1 = static_cast<int64_t>(hi + 1) * c;
      if (d == 0) {
        for (int64_t i = i0; i < i1; ++i) {
          o[i] = box_round(ww * r[i] +
                           fw * (static_cast<uint32_t>(r[i - c]) + r[i + c]));
        }
      } else {
        const int64_t dc = static_cast<int64_t>(d) * c;
        for (int64_t i = i0; i < i1; ++i) {
          uint32_t S = 0;
          for (int64_t k = i - dc; k <= i + dc; k += c) S += r[k];
          o[i] = box_round(ww * S +
                           fw * (static_cast<uint32_t>(r[i - dc - c]) +
                                 r[i + dc + c]));
        }
      }
    }
  }
}

// One vertical pass: whole contiguous rows per output row (auto-vectorizes).
void blur_pass_v(const uint8_t* in, uint8_t* out, int h, int w, int c, int d,
                 uint32_t ww, uint32_t fw) {
  const int64_t row = static_cast<int64_t>(w) * c;
  std::vector<const uint8_t*> taps(2 * d + 1);
  auto rp = [&](int y) {
    y = y < 0 ? 0 : (y >= h ? h - 1 : y);
    return in + static_cast<int64_t>(y) * row;
  };
  for (int y = 0; y < h; ++y) {
    uint8_t* o = out + static_cast<int64_t>(y) * row;
    const uint8_t* elo = rp(y - d - 1);
    const uint8_t* ehi = rp(y + d + 1);
    if (d == 0) {
      const uint8_t* cur = rp(y);
      for (int64_t i = 0; i < row; ++i) {
        o[i] = box_round(ww * cur[i] +
                         fw * (static_cast<uint32_t>(elo[i]) + ehi[i]));
      }
    } else {
      for (int k = 0; k < 2 * d + 1; ++k) taps[k] = rp(y + k - d);
      for (int64_t i = 0; i < row; ++i) {
        uint32_t S = 0;
        for (int k = 0; k < 2 * d + 1; ++k) S += taps[k][i];
        o[i] = box_round(ww * S +
                         fw * (static_cast<uint32_t>(elo[i]) + ehi[i]));
      }
    }
  }
}

// Full blur: 3 horizontal passes then 3 vertical passes (Pillow's order),
// every pass quantizing to uint8; ping-pong between data and tmp so the
// result lands back in `data`.
void gaussian_blur_u8(uint8_t* data, int h, int w, int c, float radius,
                      int passes) {
  float R = gaussian_box_radius(radius, passes);
  int d = static_cast<int>(R);
  uint32_t ww = static_cast<uint32_t>((1 << 24) / (R * 2 + 1));
  uint32_t fw = ((1u << 24) - (d * 2 + 1) * ww) / 2;
  std::vector<uint8_t> tmp(static_cast<size_t>(h) * w * c);
  uint8_t* a = data;
  uint8_t* b = tmp.data();
  for (int p = 0; p < passes; ++p) {
    blur_pass_h(a, b, h, w, c, d, ww, fw);
    std::swap(a, b);
  }
  for (int p = 0; p < passes; ++p) {
    blur_pass_v(a, b, h, w, c, d, ww, fw);
    std::swap(a, b);
  }
  if (a != data) {
    std::memcpy(data, a, tmp.size());
  }
}

// gaussian_blur(data_u8, h, w, c, radius) -> blurred uint8 bytes.
PyObject* py_gaussian_blur(PyObject*, PyObject* args) {
  Py_buffer view;
  int h, w, c;
  float radius;
  if (!PyArg_ParseTuple(args, "y*iiif", &view, &h, &w, &c, &radius)) {
    return nullptr;
  }
  if (static_cast<int64_t>(h) * w * c != view.len || h < 1 || w < 1 ||
      c < 1) {
    PyBuffer_Release(&view);
    PyErr_SetString(PyExc_ValueError, "buffer size != h*w*c");
    return nullptr;
  }
  std::vector<uint8_t> buf(static_cast<const uint8_t*>(view.buf),
                           static_cast<const uint8_t*>(view.buf) + view.len);
  PyBuffer_Release(&view);
  Py_BEGIN_ALLOW_THREADS;
  if (radius != 0.0f) {  // PIL returns a copy untouched at radius 0
    gaussian_blur_u8(buf.data(), h, w, c, radius, 3);
  }
  Py_END_ALLOW_THREADS;
  return PyBytes_FromStringAndSize(reinterpret_cast<const char*>(buf.data()),
                                   static_cast<Py_ssize_t>(buf.size()));
}

PyMethodDef kMethods[] = {
    {"decode_png", py_decode_png, METH_VARARGS,
     "decode_png(data, expand_rgb=True) -> (bytes, h, w, channels, bitdepth)"},
    {"decode_remap", py_decode_remap, METH_VARARGS,
     "decode_remap(data, lut_i32_bytes) -> (int32 bytes, h, w)"},
    {"decode_normalize_bgr", py_decode_normalize_bgr, METH_VARARGS,
     "decode_normalize_bgr(data, b_mean, g_mean, r_mean) -> (f32 bytes, h, w)"},
    {"gaussian_blur", py_gaussian_blur, METH_VARARGS,
     "gaussian_blur(data_u8, h, w, c, radius) -> uint8 bytes "
     "(byte-exact PIL GaussianBlur)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_hostops",
    "Native fused PNG decode / remap / normalize for the data loader.",
    -1, kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit__hostops(void) { return PyModule_Create(&kModule); }
