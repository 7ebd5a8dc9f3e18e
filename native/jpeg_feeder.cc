// Native host-side JPEG feeder: parallel decode + staging resize.
//
// The reference feeds its GPU from 16-20 forked DataLoader workers whose
// per-sample cost is PIL JPEG decode + resize (/root/reference/train.py:
// 821-826, 652-654). This library is the TPU-native equivalent of that
// worker pool for production hosts: one C call decodes a whole batch with
// a std::thread pool (libjpeg, the same codec PIL wraps) and resizes to
// the staging edge, writing float32 [0,1] NHWC directly into a
// caller-provided numpy buffer — no Python object churn, no GIL.
//
// Resize semantics (antialias=1, the default via data/native.py): Pillow
// parity — separable bicubic (a = -0.5) with the filter support widened by
// the downscale factor, exactly the convolution resampling Image.resize's
// default BICUBIC filter performs. Differences vs PIL stay within ~1/255
// (PIL rounds its intermediate pass to uint8; we keep float). antialias=0
// keeps the legacy non-antialiased bilinear (jax.image.resize convention).
//
// dct_scale=1: ask libjpeg to decode at the largest 1/2^k DCT scale that
// keeps both dims >= 2x the staging edge (quality margin for the
// antialias filter), then resize from there. Cuts decode time on large
// photos; pixels are no longer bit-parity with a full-res decode, so it is
// opt-in. Reported dims are always the ORIGINAL image dims (the label
// scalers need them).
//
// Build: g++ -O3 -shared -fPIC -o _jpeg_feeder.so jpeg_feeder.cc -ljpeg -pthread

#include <cstddef>  // jpeglib.h needs size_t/FILE declared first
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode one JPEG file to RGB888. orig_w/orig_h always get the full image
// dims; w/h get the decoded (possibly DCT-scaled) dims. Returns false on
// any decode error.
bool decode_rgb(const char* path, std::vector<unsigned char>& rgb, int* w,
                int* h, int* orig_w, int* orig_h, int staging,
                bool dct_scale) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  *orig_w = cinfo.image_width;
  *orig_h = cinfo.image_height;
  if (dct_scale) {
    // Largest power-of-two reduction keeping >= 2x staging in both dims.
    int denom = 1;
    while (denom < 8 && (cinfo.image_width / (denom * 2) >= 2 * staging) &&
           (cinfo.image_height / (denom * 2) >= 2 * staging)) {
      denom *= 2;
    }
    cinfo.scale_num = 1;
    cinfo.scale_denom = denom;
  }
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  rgb.resize(static_cast<size_t>(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

// Bilinear resize (half-pixel centers, clamped edges) RGB888 -> float32
// [0,1], (s, s, 3) row-major into out. Non-antialiased (legacy mode).
void resize_bilinear(const unsigned char* src, int w, int h, int s,
                     float* out) {
  const float sx = static_cast<float>(w) / s;
  const float sy = static_cast<float>(h) / s;
  for (int oy = 0; oy < s; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y1 = y0 + 1;
    if (y0 < 0) y0 = 0;
    if (y1 < 0) y1 = 0;
    if (y0 > h - 1) y0 = h - 1;
    if (y1 > h - 1) y1 = h - 1;
    for (int ox = 0; ox < s; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(std::floor(fx));
      float wx = fx - x0;
      int x1 = x0 + 1;
      if (x0 < 0) x0 = 0;
      if (x1 < 0) x1 = 0;
      if (x0 > w - 1) x0 = w - 1;
      if (x1 > w - 1) x1 = w - 1;
      const unsigned char* p00 = src + (static_cast<size_t>(y0) * w + x0) * 3;
      const unsigned char* p01 = src + (static_cast<size_t>(y0) * w + x1) * 3;
      const unsigned char* p10 = src + (static_cast<size_t>(y1) * w + x0) * 3;
      const unsigned char* p11 = src + (static_cast<size_t>(y1) * w + x1) * 3;
      float* o = out + (static_cast<size_t>(oy) * s + ox) * 3;
      for (int c = 0; c < 3; ++c) {
        float top = p00[c] + (p01[c] - p00[c]) * wx;
        float bot = p10[c] + (p11[c] - p10[c]) * wx;
        o[c] = (top + (bot - top) * wy) * (1.0f / 255.0f);
      }
    }
  }
}

// Keys' bicubic kernel with a = -0.5 (Pillow's BICUBIC filter).
double bicubic_filter(double x) {
  const double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

// Pillow-convention coefficient table for one axis: support widened by the
// downscale factor (this is what makes the filter antialiasing), window
// [center - support + 0.5, center + support + 0.5), weights normalized.
void precompute_coeffs(int in_size, int out_size, std::vector<int>& bounds,
                       std::vector<double>& kk, int* ksize_out) {
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 2.0 * filterscale;  // bicubic support = 2
  const int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  bounds.assign(static_cast<size_t>(out_size) * 2, 0);
  kk.assign(static_cast<size_t>(out_size) * ksize, 0.0);
  const double ss = 1.0 / filterscale;
  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* k = &kk[static_cast<size_t>(xx) * ksize];
    double ww = 0.0;
    for (int x = 0; x < xmax; ++x) {
      double wgt = bicubic_filter((x + xmin - center + 0.5) * ss);
      k[x] = wgt;
      ww += wgt;
    }
    if (ww != 0.0) {
      for (int x = 0; x < xmax; ++x) k[x] /= ww;
    }
    bounds[xx * 2] = xmin;
    bounds[xx * 2 + 1] = xmax;
  }
  *ksize_out = ksize;
}

// Separable antialiased bicubic (Pillow-parity) RGB888 -> float32 [0,1].
void resize_bicubic_pil(const unsigned char* src, int w, int h, int s,
                        float* out) {
  std::vector<int> hb, vb;
  std::vector<double> hk, vk;
  int hks = 0, vks = 0;
  precompute_coeffs(w, s, hb, hk, &hks);
  precompute_coeffs(h, s, vb, vk, &vks);

  // Horizontal pass: (h, w, 3) u8 -> (h, s, 3) float (unrounded — PIL
  // rounds to uint8 here, a <=1/255 difference we accept for float output).
  std::vector<float> tmp(static_cast<size_t>(h) * s * 3);
  for (int y = 0; y < h; ++y) {
    const unsigned char* row = src + static_cast<size_t>(y) * w * 3;
    for (int xx = 0; xx < s; ++xx) {
      const int xmin = hb[xx * 2], xmax = hb[xx * 2 + 1];
      const double* k = &hk[static_cast<size_t>(xx) * hks];
      double acc0 = 0, acc1 = 0, acc2 = 0;
      for (int x = 0; x < xmax; ++x) {
        const unsigned char* p = row + static_cast<size_t>(xmin + x) * 3;
        acc0 += p[0] * k[x];
        acc1 += p[1] * k[x];
        acc2 += p[2] * k[x];
      }
      float* o = &tmp[(static_cast<size_t>(y) * s + xx) * 3];
      o[0] = static_cast<float>(acc0);
      o[1] = static_cast<float>(acc1);
      o[2] = static_cast<float>(acc2);
    }
  }
  // Vertical pass: (h, s, 3) -> (s, s, 3), scaled to [0,1], clamped (the
  // bicubic kernel overshoots on edges; PIL clips to uint8 range).
  for (int yy = 0; yy < s; ++yy) {
    const int ymin = vb[yy * 2], ymax = vb[yy * 2 + 1];
    const double* k = &vk[static_cast<size_t>(yy) * vks];
    for (int xx = 0; xx < s; ++xx) {
      double acc0 = 0, acc1 = 0, acc2 = 0;
      for (int y = 0; y < ymax; ++y) {
        const float* p = &tmp[(static_cast<size_t>(ymin + y) * s + xx) * 3];
        acc0 += p[0] * k[y];
        acc1 += p[1] * k[y];
        acc2 += p[2] * k[y];
      }
      float* o = out + (static_cast<size_t>(yy) * s + xx) * 3;
      const double inv = 1.0 / 255.0;
      double v0 = acc0 * inv, v1 = acc1 * inv, v2 = acc2 * inv;
      o[0] = static_cast<float>(v0 < 0 ? 0 : (v0 > 1 ? 1 : v0));
      o[1] = static_cast<float>(v1 < 0 ? 0 : (v1 > 1 ? 1 : v1));
      o[2] = static_cast<float>(v2 < 0 ? 0 : (v2 > 1 ? 1 : v2));
    }
  }
}

}  // namespace

extern "C" {

// Decode n JPEGs and resize each to (staging, staging, 3) float32 [0,1].
// out: n*staging*staging*3 floats; dims: n*2 ints (ORIGINAL h, w).
// antialias: 1 = Pillow-parity bicubic (Image.resize default), 0 = legacy
// non-antialiased bilinear. dct_scale: 1 = libjpeg scaled decode when the
// source is >= 4x the staging edge (see header comment).
// Returns the number of files that FAILED to decode (their slots are
// zero-filled, dims 0x0) — 0 means full success.
int decode_resize_batch(const char** paths, int n, int staging, float* out,
                        int* dims, int n_threads, int antialias,
                        int dct_scale) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    std::vector<unsigned char> rgb;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      float* slot = out + static_cast<size_t>(i) * staging * staging * 3;
      int w = 0, h = 0, ow = 0, oh = 0;
      if (decode_rgb(paths[i], rgb, &w, &h, &ow, &oh, staging,
                     dct_scale != 0)) {
        if (antialias) {
          resize_bicubic_pil(rgb.data(), w, h, staging, slot);
        } else {
          resize_bilinear(rgb.data(), w, h, staging, slot);
        }
        dims[2 * i] = oh;
        dims[2 * i + 1] = ow;
      } else {
        std::memset(slot, 0, sizeof(float) * staging * staging * 3);
        dims[2 * i] = 0;
        dims[2 * i + 1] = 0;
        failures.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> pool;
  int k = n_threads < n ? n_threads : n;
  for (int t = 0; t < k; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
