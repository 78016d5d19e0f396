// hdyolo_native: first-party C++ core for the host-side data pipeline.
//
// Replaces the reference's third-party native dependencies for the per-sample
// hot loop (SURVEY.md §2.3): pycocotools' C RLE codec and OpenCV's fillPoly /
// resize paths used by the dataset workers
// (/root/reference/metayolo/engines/image_utils.py:299-381,
//  /root/reference/metayolo/datasets.py:462-519).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image). All masks
// are row-major uint8/float32; RLE uses the COCO uncompressed convention
// (column-major runs, first run counts zeros).
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------- RLE
// counts -> binary mask (h, w) row-major.
void rle_decode(const int64_t* counts, int64_t n_counts, int64_t h, int64_t w,
                uint8_t* out) {
  std::memset(out, 0, static_cast<size_t>(h) * w);
  int64_t pos = 0;  // position in column-major order
  uint8_t val = 0;
  const int64_t total = h * w;
  for (int64_t i = 0; i < n_counts && pos < total; ++i) {
    int64_t run = counts[i];
    if (val) {
      int64_t end = std::min(pos + run, total);
      for (int64_t p = pos; p < end; ++p) {
        // column-major index p -> (row, col)
        out[(p % h) * w + (p / h)] = 1;
      }
    }
    pos += run;
    val ^= 1;
  }
}

// binary mask (h, w) row-major -> counts; returns number of counts written
// (or -1 if max_counts exceeded).
int64_t rle_encode(const uint8_t* mask, int64_t h, int64_t w, int64_t* counts,
                   int64_t max_counts) {
  int64_t n = 0;
  int64_t run = 0;
  uint8_t cur = 0;  // RLE starts with the zero run
  for (int64_t col = 0; col < w; ++col) {
    for (int64_t row = 0; row < h; ++row) {
      uint8_t v = mask[row * w + col] ? 1 : 0;
      if (v == cur) {
        ++run;
      } else {
        if (n >= max_counts) return -1;
        counts[n++] = run;
        cur = v;
        run = 1;
      }
    }
  }
  if (n >= max_counts) return -1;
  counts[n++] = run;
  return n;
}

// ------------------------------------------------------ polygon rasterization
// Even-odd scanline fill of n_polys polygons (xy float pairs, concatenated;
// poly_sizes gives vertex counts) into a (h, w) uint8 mask. Matches
// cv2.fillPoly closely enough for training targets (pixel-center sampling).
void fill_polys(const float* pts, const int64_t* poly_sizes, int64_t n_polys,
                int64_t h, int64_t w, uint8_t* out) {
  std::memset(out, 0, static_cast<size_t>(h) * w);
  std::vector<float> xs;
  const float* p = pts;
  for (int64_t k = 0; k < n_polys; ++k) {
    const int64_t n = poly_sizes[k];
    for (int64_t row = 0; row < h; ++row) {
      const float y = static_cast<float>(row) + 0.0f;  // cv2 uses integer grid
      xs.clear();
      for (int64_t i = 0; i < n; ++i) {
        const float x0 = p[2 * i], y0 = p[2 * i + 1];
        const int64_t j = (i + 1) % n;
        const float x1 = p[2 * j], y1 = p[2 * j + 1];
        if ((y0 <= y && y1 > y) || (y1 <= y && y0 > y)) {
          xs.push_back(x0 + (y - y0) / (y1 - y0) * (x1 - x0));
        }
      }
      std::sort(xs.begin(), xs.end());
      for (size_t i = 0; i + 1 < xs.size(); i += 2) {
        int64_t x_start = static_cast<int64_t>(std::ceil(xs[i]));
        int64_t x_end = static_cast<int64_t>(std::floor(xs[i + 1]));
        x_start = std::max<int64_t>(x_start, 0);
        x_end = std::min<int64_t>(x_end, w - 1);
        for (int64_t x = x_start; x <= x_end; ++x) out[row * w + x] = 1;
      }
    }
    p += 2 * n;
  }
}

// ------------------------------------------------------------ bilinear resize
static inline float sample_bilinear(const float* src, int64_t h, int64_t w,
                                    float y, float x) {
  y = std::max(0.0f, std::min(y, static_cast<float>(h - 1)));
  x = std::max(0.0f, std::min(x, static_cast<float>(w - 1)));
  const int64_t y0 = static_cast<int64_t>(y), x0 = static_cast<int64_t>(x);
  const int64_t y1 = std::min(y0 + 1, h - 1), x1 = std::min(x0 + 1, w - 1);
  const float ly = y - y0, lx = x - x0;
  return (1 - ly) * ((1 - lx) * src[y0 * w + x0] + lx * src[y0 * w + x1]) +
         ly * ((1 - lx) * src[y1 * w + x0] + lx * src[y1 * w + x1]);
}

// cv2.INTER_LINEAR-compatible resize (half-pixel centers).
void bilinear_resize(const float* src, int64_t sh, int64_t sw, float* dst,
                     int64_t dh, int64_t dw) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int64_t i = 0; i < dh; ++i) {
    const float y = (i + 0.5f) * sy - 0.5f;
    for (int64_t j = 0; j < dw; ++j) {
      const float x = (j + 0.5f) * sx - 0.5f;
      dst[i * dw + j] = sample_bilinear(src, sh, sw, y, x);
    }
  }
}

// ---------------------------------------------------------- in-box mask crop
// Crop mask to box (xyxy, rounded like the reference) and resize to (m, m) —
// the 28x28 training-target op (datasets.py:462-519). Returns 0, or -1 for a
// degenerate box (caller zero-fills).
int64_t box_crop_resize(const float* mask, int64_t h, int64_t w,
                        const float* box, float* out, int64_t m) {
  int64_t x0 = static_cast<int64_t>(std::lround(box[0]));
  int64_t y0 = static_cast<int64_t>(std::lround(box[1]));
  int64_t x1 = static_cast<int64_t>(std::lround(box[2]));
  int64_t y1 = static_cast<int64_t>(std::lround(box[3]));
  x0 = std::max<int64_t>(x0, 0);
  y0 = std::max<int64_t>(y0, 0);
  x1 = std::min<int64_t>(x1, w);
  y1 = std::min<int64_t>(y1, h);
  if (x1 <= x0 || y1 <= y0) return -1;
  const int64_t ch = y1 - y0, cw = x1 - x0;
  std::vector<float> crop(static_cast<size_t>(ch) * cw);
  for (int64_t i = 0; i < ch; ++i)
    std::memcpy(&crop[i * cw], &mask[(y0 + i) * w + x0], cw * sizeof(float));
  bilinear_resize(crop.data(), ch, cw, out, m, m);
  return 0;
}

// --------------------------------------------------------------- batched API
// Decode B RLE masks (offsets into a shared counts buffer) in one call —
// amortizes ctypes overhead for dataset workers.
void rle_decode_batch(const int64_t* counts, const int64_t* offsets,
                      const int64_t* lengths, int64_t b, int64_t h, int64_t w,
                      uint8_t* out) {
  for (int64_t k = 0; k < b; ++k) {
    rle_decode(counts + offsets[k], lengths[k], h, w, out + k * h * w);
  }
}

}  // extern "C"
