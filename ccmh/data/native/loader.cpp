// Native batch image loader: JPEG decode + PIL-style antialiased bicubic
// resize + CLIP normalization, multi-threaded, GIL-free.
//
// The reference feeds its GPU from torch DataLoader worker *processes*
// running PIL per item (train/base.py:87-92, dataset/base.py:35-44).  On
// TPU the encode path sustains >11k images/s/chip, so host decode becomes
// the bottleneck; this loader replaces the per-item Python path with one
// ctypes call per batch that fans out across C++ threads.
//
// Semantics mirror dataset/base.py:35-44 exactly:
//   train: resize short side to R (bicubic, antialiased), center crop RxR
//   eval:  resize to (R, R)
//   both:  /255, CLIP mean/std normalize, NHWC float32
//
// The resampler reproduces PIL's convolution resampling (support-2 bicubic
// with a=-0.5, support scaled by the downscale factor) in float32; pixel
// differences vs PIL's fixed-point path are < 1/255.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr float kMean[3] = {0.48145466f, 0.4578275f, 0.40821073f};
constexpr float kStd[3] = {0.26862954f, 0.26130258f, 0.27577711f};

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

// Shared scanline loop once a source manager is attached.
bool read_decompress(jpeg_decompress_struct& cinfo, std::vector<uint8_t>& rgb,
                     int& w, int& h) {
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  w = cinfo.output_width;
  h = cinfo.output_height;
  rgb.resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  return true;
}

// Decode a JPEG file into an RGB uint8 buffer.  Returns false on failure.
bool decode_jpeg(const char* path, std::vector<uint8_t>& rgb, int& w, int& h) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return false;

  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(fp);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  const bool good = read_decompress(cinfo, rgb, w, h);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(fp);
  return good;
}

// Decode a JPEG from an in-memory buffer (the serving path: clients POST
// raw image bytes; no temp files).  Returns false on failure.
bool decode_jpeg_mem(const uint8_t* buf, size_t len, std::vector<uint8_t>& rgb,
                     int& w, int& h) {
  if (buf == nullptr || len == 0) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, static_cast<unsigned long>(len));
  const bool good = read_decompress(cinfo, rgb, w, h);
  jpeg_destroy_decompress(&cinfo);
  return good;
}

// PIL bicubic kernel (a = -0.5), support 2.
inline float bicubic(float x) {
  constexpr float a = -0.5f;
  x = std::fabs(x);
  if (x < 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
  if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
  return 0.0f;
}

struct FilterTable {
  int ksize;                 // taps per output pixel
  std::vector<int> bounds;   // [out, 2] (start, count)
  std::vector<float> coeffs; // [out, ksize]
};

// Precompute PIL-style antialiased coefficients for in_size -> out_size.
FilterTable make_filter(int in_size, int out_size) {
  FilterTable t;
  const double scale = static_cast<double>(in_size) / out_size;
  const double fscale = std::max(scale, 1.0);
  const double support = 2.0 * fscale;     // bicubic support * antialias
  t.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  t.bounds.resize(out_size * 2);
  t.coeffs.assign(static_cast<size_t>(out_size) * t.ksize, 0.0f);
  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    float* k = &t.coeffs[static_cast<size_t>(xx) * t.ksize];
    double ss = 0.0;
    for (int x = 0; x < xmax; ++x) {
      double wgt = bicubic(static_cast<float>((x + xmin - center + 0.5) / fscale));
      k[x] = static_cast<float>(wgt);
      ss += wgt;
    }
    if (ss != 0.0)
      for (int x = 0; x < xmax; ++x) k[x] = static_cast<float>(k[x] / ss);
    t.bounds[xx * 2] = xmin;
    t.bounds[xx * 2 + 1] = xmax;
  }
  return t;
}

// Separable resize, planar per channel: contiguous inner loops the
// compiler can vectorise (the interleaved-RGB formulation is ~1.7x
// slower).  src is interleaved RGB; dst is interleaved RGB.
void resize_rgb(const float* src, int sw, int sh, float* dst, int dw, int dh) {
  FilterTable fh = make_filter(sw, dw);
  FilterTable fv = make_filter(sh, dh);
  std::vector<float> plane(static_cast<size_t>(sw) * sh);
  std::vector<float> tmp(static_cast<size_t>(sh) * dw);
  std::vector<float> out_plane(static_cast<size_t>(dh) * dw);
  for (int c = 0; c < 3; ++c) {
    // deinterleave one channel
    const size_t npx = static_cast<size_t>(sw) * sh;
    for (size_t i = 0; i < npx; ++i) plane[i] = src[i * 3 + c];
    // horizontal pass (PIL stores it as uint8/clip8, rounds half UP: clamp
    // + round the intermediate, else bicubic overshoot on high-contrast
    // data diverges)
    for (int y = 0; y < sh; ++y) {
      const float* srow = plane.data() + static_cast<size_t>(y) * sw;
      float* trow = tmp.data() + static_cast<size_t>(y) * dw;
      for (int x = 0; x < dw; ++x) {
        const int xmin = fh.bounds[x * 2], xmax = fh.bounds[x * 2 + 1];
        const float* k = &fh.coeffs[static_cast<size_t>(x) * fh.ksize];
        const float* p = srow + xmin;
        float acc = 0.0f;
        for (int i = 0; i < xmax; ++i) acc += p[i] * k[i];
        trow[x] = static_cast<float>(static_cast<int>(
            std::min(std::max(acc, 0.0f), 255.0f) + 0.5f));
      }
    }
    // vertical pass: accumulate rows (contiguous, vectorises over x)
    for (int y = 0; y < dh; ++y) {
      const int ymin = fv.bounds[y * 2], ymax = fv.bounds[y * 2 + 1];
      const float* k = &fv.coeffs[static_cast<size_t>(y) * fv.ksize];
      float* drow = out_plane.data() + static_cast<size_t>(y) * dw;
      std::memset(drow, 0, sizeof(float) * dw);
      for (int i = 0; i < ymax; ++i) {
        const float ki = k[i];
        const float* trow = tmp.data() + static_cast<size_t>(ymin + i) * dw;
        for (int x = 0; x < dw; ++x) drow[x] += trow[x] * ki;
      }
    }
    // reinterleave
    const size_t dpx = static_cast<size_t>(dw) * dh;
    for (size_t i = 0; i < dpx; ++i) dst[i * 3 + c] = out_plane[i];
  }
}

// One item: decode -> (train: short-side resize + center crop | eval:
// square resize) -> exactly one of:
//   out_f32[R, R, 3]  CLIP-normalized float32 (the direct feed path)
//   out_u8 [R, R, 3]  post-resize uint8, pre-normalization (the decoded-
//                     tensor cache path, data/cache.py — normalization then
//                     happens on-device, clip/model.py normalize_pixels)
bool process_rgb(const std::vector<uint8_t>& rgb, int w, int h, int resolution,
                 int is_train, float* out_f32, uint8_t* out_u8) {
  std::vector<float> fsrc(rgb.size());
  for (size_t i = 0; i < rgb.size(); ++i) fsrc[i] = static_cast<float>(rgb[i]);

  const int R = resolution;
  std::vector<float> resized;
  const float* crop_src;
  int cw, ch;
  if (is_train) {
    // round(dim * R / short) like the python pipeline (dataset.py
    // _transform).  Python's round() is half-to-even; std::lrint follows
    // the current FP rounding mode, which defaults to round-to-nearest-
    // even — std::lround (half away from zero) would shift the center
    // crop by 1px on exact-.5 scales and break bit-parity with the PIL
    // fallback items mixed into the same batch.
    const int short_side = std::min(w, h);
    const double scale = static_cast<double>(R) / short_side;
    const int nw = static_cast<int>(std::lrint(w * scale));
    const int nh = static_cast<int>(std::lrint(h * scale));
    resized.resize(static_cast<size_t>(nw) * nh * 3);
    resize_rgb(fsrc.data(), w, h, resized.data(), nw, nh);
    crop_src = resized.data();
    cw = nw;
    ch = nh;
  } else {
    resized.resize(static_cast<size_t>(R) * R * 3);
    resize_rgb(fsrc.data(), w, h, resized.data(), R, R);
    crop_src = resized.data();
    cw = R;
    ch = R;
  }
  const int left = (cw - R) / 2;
  const int top = (ch - R) / 2;
  for (int y = 0; y < R; ++y) {
    const float* srow = crop_src + (static_cast<size_t>(top + y) * cw + left) * 3;
    for (int x = 0; x < R; ++x) {
      for (int c = 0; c < 3; ++c) {
        // PIL rounds the resampled float back to uint8 (half up) pre-ToTensor
        float v = std::min(std::max(srow[x * 3 + c], 0.0f), 255.0f);
        const int q = static_cast<int>(v + 0.5f);
        const size_t o = (static_cast<size_t>(y) * R + x) * 3 + c;
        if (out_u8 != nullptr) {
          out_u8[o] = static_cast<uint8_t>(q);
        } else {
          out_f32[o] = (static_cast<float>(q) * (1.0f / 255.0f) - kMean[c]) / kStd[c];
        }
      }
    }
  }
  return true;
}

bool load_one(const char* path, int resolution, int is_train, float* out_f32,
              uint8_t* out_u8) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!decode_jpeg(path, rgb, w, h)) return false;
  return process_rgb(rgb, w, h, resolution, is_train, out_f32, out_u8);
}

bool load_one_mem(const uint8_t* buf, size_t len, int resolution, int is_train,
                  float* out_f32, uint8_t* out_u8) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!decode_jpeg_mem(buf, len, rgb, w, h)) return false;
  return process_rgb(rgb, w, h, resolution, is_train, out_f32, out_u8);
}

}  // namespace

extern "C" {

// Decode a batch of JPEG paths into out[n, R, R, 3] float32 NHWC using
// n_threads workers.  ok[i] = 1 on success, 0 on failure (caller falls
// back to the Python path for failed items).  Returns count of failures.
int ccmh_batch_load(const char** paths, int n, int resolution, int is_train,
                    float* out, uint8_t* ok, int n_threads) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const size_t stride = static_cast<size_t>(resolution) * resolution * 3;
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      const bool good =
          load_one(paths[i], resolution, is_train, out + stride * i, nullptr);
      ok[i] = good ? 1 : 0;
      if (!good) failures.fetch_add(1);
    }
  };
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> threads;
  for (int t = 1; t < n_threads; ++t) threads.emplace_back(worker);
  worker();
  for (auto& th : threads) th.join();
  return failures.load();
}

// uint8 variant feeding the decoded-tensor cache: identical decode/resize/
// crop, output is the post-resize uint8 image (what PIL yields before
// ToTensor), so cached bytes are bit-identical to the PIL fallback path.
int ccmh_batch_load_u8(const char** paths, int n, int resolution, int is_train,
                       uint8_t* out, uint8_t* ok, int n_threads) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const size_t stride = static_cast<size_t>(resolution) * resolution * 3;
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      const bool good =
          load_one(paths[i], resolution, is_train, nullptr, out + stride * i);
      ok[i] = good ? 1 : 0;
      if (!good) failures.fetch_add(1);
    }
  };
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> threads;
  for (int t = 1; t < n_threads; ++t) threads.emplace_back(worker);
  worker();
  for (auto& th : threads) th.join();
  return failures.load();
}

// In-memory variant (the serving path): bufs[i]/lens[i] hold raw JPEG
// bytes (e.g. base64-decoded request payloads).  Same transform and
// float32 CLIP-normalized NHWC output as ccmh_batch_load.
int ccmh_batch_load_mem(const uint8_t** bufs, const int64_t* lens, int n,
                        int resolution, int is_train, float* out, uint8_t* ok,
                        int n_threads) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const size_t stride = static_cast<size_t>(resolution) * resolution * 3;
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      const bool good = load_one_mem(bufs[i], static_cast<size_t>(lens[i]),
                                     resolution, is_train, out + stride * i,
                                     nullptr);
      ok[i] = good ? 1 : 0;
      if (!good) failures.fetch_add(1);
    }
  };
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> threads;
  for (int t = 1; t < n_threads; ++t) threads.emplace_back(worker);
  worker();
  for (auto& th : threads) th.join();
  return failures.load();
}

}  // extern "C"
