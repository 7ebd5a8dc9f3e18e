// Native host-side JPEG feeder: parallel decode + staging resize.
//
// The reference feeds its GPU from 16-20 forked DataLoader workers whose
// per-sample cost is PIL JPEG decode + resize (/root/reference/train.py:
// 821-826, 652-654). This library is the TPU-native equivalent of that
// worker pool for production hosts: one C call decodes a whole batch with
// a std::thread pool (libjpeg, the same codec PIL wraps) and bilinearly
// resizes to the staging edge, writing float32 [0,1] NHWC directly into a
// caller-provided numpy buffer — no Python object churn, no GIL.
//
// Resize semantics: plain (non-antialiased) bilinear with half-pixel
// centers — matches jax.image.resize(..., "bilinear"), NOT PIL's
// antialiased filter; the deviation is a low-pass difference on
// downscale, documented in data/native.py.
//
// Build: g++ -O3 -shared -fPIC -o _jpeg_feeder.so jpeg_feeder.cc -ljpeg -pthread

#include <cstddef>  // jpeglib.h needs size_t/FILE declared first
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdio>
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

// Decode one JPEG file to RGB888. Returns false on any decode error.
bool decode_rgb(const char* path, std::vector<unsigned char>& rgb, int* w,
                int* h) {
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
// [0,1], (s, s, 3) row-major into out.
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

}  // namespace

extern "C" {

// Decode n JPEGs and resize each to (staging, staging, 3) float32 [0,1].
// out: n*staging*staging*3 floats; dims: n*2 ints (original h, w).
// Returns the number of files that FAILED to decode (their slots are
// zero-filled, dims 0x0) — 0 means full success.
int decode_resize_batch(const char** paths, int n, int staging, float* out,
                        int* dims, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    std::vector<unsigned char> rgb;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      float* slot = out + static_cast<size_t>(i) * staging * staging * 3;
      int w = 0, h = 0;
      if (decode_rgb(paths[i], rgb, &w, &h)) {
        resize_bilinear(rgb.data(), w, h, staging, slot);
        dims[2 * i] = h;
        dims[2 * i + 1] = w;
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
