// Native host-side frame ops for the vsr_tpu pipeline.
//
// The reference gets its host image ops from OpenCV's C++ (resize, blend);
// our hot loop spends its host time in paste-back: upscale the 640x120
// inpainted band to the video width and blend it into the frame under the
// mask (backend/inpaint/sttn_auto_inpaint.py:312-315 semantics). Doing that
// as two cv2 calls costs two full-band passes plus a temporary; this fuses
// bilinear upsample + masked blend into one multithreaded pass and writes
// straight into the frame buffer.
//
// Bilinear sampling matches cv2.resize(INTER_LINEAR) geometry (half-pixel
// centers, edge clamp) with float weights; outputs may differ from OpenCV's
// fixed-point path by at most 1 LSB (tested).
//
// Exposed as a C ABI for ctypes; built with scripts/build_native.sh or
// lazily by vsr_tpu/native/__init__.py.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

struct LerpIndex {
  int i0, i1;
  float w;
};

static void build_axis(int in_size, int out_size, std::vector<LerpIndex>& out) {
  out.resize(out_size);
  const float scale = static_cast<float>(in_size) / out_size;
  for (int i = 0; i < out_size; ++i) {
    float src = (i + 0.5f) * scale - 0.5f;
    int i0 = static_cast<int>(std::floor(src));
    float w = src - i0;
    int i1 = i0 + 1;
    if (i0 < 0) { i0 = 0; i1 = 0; w = 0.f; }
    if (i1 >= in_size) { i1 = in_size - 1; if (i0 >= in_size) i0 = in_size - 1; }
    out[i] = {i0, i1, w};
  }
}

static void run_rows(int rows, int n_threads,
                     const std::function<void(int, int)>& fn) {
  if (n_threads <= 1) {
    fn(0, rows);
    return;
  }
  std::vector<std::thread> pool;
  const int chunk = (rows + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int lo = t * chunk;
    const int hi = std::min(rows, lo + chunk);
    if (lo >= hi) break;
    pool.emplace_back(fn, lo, hi);
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Fused: comp (comp_h x comp_w x 3, uint8) bilinear-resized to
// (band_h x band_w) and blended into frame rows [y0, y0+band_h) under
// mask01 (band_h x band_w, uint8 {0,1}):
//   frame = mask * resized + (1 - mask) * frame
// frame: full image (frame_w x frame_h x 3), row stride frame_w*3.
void paste_band_blend(uint8_t* frame, int frame_w,
                      const uint8_t* comp, int comp_h, int comp_w,
                      const uint8_t* mask01,
                      int y0, int band_h, int band_w,
                      int n_threads) {
  std::vector<LerpIndex> ys, xs;
  build_axis(comp_h, band_h, ys);
  build_axis(comp_w, band_w, xs);

  auto work = [&](int row_lo, int row_hi) {
    for (int y = row_lo; y < row_hi; ++y) {
      const LerpIndex ly = ys[y];
      const uint8_t* row0 = comp + static_cast<size_t>(ly.i0) * comp_w * 3;
      const uint8_t* row1 = comp + static_cast<size_t>(ly.i1) * comp_w * 3;
      uint8_t* dst = frame + (static_cast<size_t>(y0 + y) * frame_w) * 3;
      const uint8_t* mrow = mask01 + static_cast<size_t>(y) * band_w;
      const float wy = ly.w;
      for (int x = 0; x < band_w; ++x) {
        if (!mrow[x]) continue;
        const LerpIndex lx = xs[x];
        const float wx = lx.w;
        const float w00 = (1 - wy) * (1 - wx), w01 = (1 - wy) * wx;
        const float w10 = wy * (1 - wx), w11 = wy * wx;
        const uint8_t* p00 = row0 + lx.i0 * 3;
        const uint8_t* p01 = row0 + lx.i1 * 3;
        const uint8_t* p10 = row1 + lx.i0 * 3;
        const uint8_t* p11 = row1 + lx.i1 * 3;
        uint8_t* d = dst + x * 3;
        for (int c = 0; c < 3; ++c) {
          const float v = w00 * p00[c] + w01 * p01[c]
                        + w10 * p10[c] + w11 * p11[c];
          d[c] = static_cast<uint8_t>(v + 0.5f);
        }
      }
    }
  };
  run_rows(band_h, n_threads, work);
}

// Bilinear resize of a band crop (rows [y0, y0+crop_h) of the frame) to
// out (out_h x out_w x 3). Used for the model-input downscale.
void crop_resize(const uint8_t* frame, int frame_w,
                 int y0, int crop_h, int crop_w,
                 uint8_t* out, int out_h, int out_w,
                 int n_threads) {
  std::vector<LerpIndex> ys, xs;
  build_axis(crop_h, out_h, ys);
  build_axis(crop_w, out_w, xs);
  const uint8_t* base = frame + static_cast<size_t>(y0) * frame_w * 3;

  auto work = [&](int row_lo, int row_hi) {
    for (int y = row_lo; y < row_hi; ++y) {
      const LerpIndex ly = ys[y];
      const uint8_t* row0 = base + static_cast<size_t>(ly.i0) * frame_w * 3;
      const uint8_t* row1 = base + static_cast<size_t>(ly.i1) * frame_w * 3;
      uint8_t* dst = out + static_cast<size_t>(y) * out_w * 3;
      const float wy = ly.w;
      for (int x = 0; x < out_w; ++x) {
        const LerpIndex lx = xs[x];
        const float wx = lx.w;
        const float w00 = (1 - wy) * (1 - wx), w01 = (1 - wy) * wx;
        const float w10 = wy * (1 - wx), w11 = wy * wx;
        const uint8_t* p00 = row0 + lx.i0 * 3;
        const uint8_t* p01 = row0 + lx.i1 * 3;
        const uint8_t* p10 = row1 + lx.i0 * 3;
        const uint8_t* p11 = row1 + lx.i1 * 3;
        uint8_t* d = dst + x * 3;
        for (int c = 0; c < 3; ++c) {
          const float v = w00 * p00[c] + w01 * p01[c]
                        + w10 * p10[c] + w11 * p11[c];
          d[c] = static_cast<uint8_t>(v + 0.5f);
        }
      }
    }
  };
  run_rows(out_h, n_threads, work);
}

}  // extern "C"
