// Native host-side input path: gather + normalize + flip basket assembly.
//
// Replaces the hot inner loop of the data pipeline (the reference uses
// torch DataLoader worker processes, src/loader.py:185-206; our Python
// fallback is studiogan_tpu/data/pipeline.py:_make_basket).  One pass
// over the selected images converts uint8 HWC -> float32 [-1,1] with
// optional horizontal flip, writing straight into the basket buffer the
// TPU runtime consumes — no intermediate numpy temporaries.
//
// Built with OpenMP; exposed through a plain C ABI for ctypes.

#include <cstdint>
#include <cstring>

extern "C" {

// imgs:    (num_images, H, W, C) uint8, contiguous
// indices: (n,) int64 into imgs
// flips:   (n,) uint8 (1 = horizontal flip)
// out:     (n, H, W, C) float32
void assemble_basket(const uint8_t* imgs, const int64_t* indices,
                     const uint8_t* flips, float* out, int64_t n,
                     int64_t h, int64_t w, int64_t c) {
  // exact uint8 -> [-1,1] lookup (i/127.5 - 1, matching numpy semantics)
  float lut[256];
  for (int i = 0; i < 256; ++i) {
    lut[i] = static_cast<float>(static_cast<double>(i) / 127.5 - 1.0);
  }
  const int64_t hwc = h * w * c;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* src = imgs + indices[i] * hwc;
    float* dst = out + i * hwc;
    if (!flips[i]) {
      for (int64_t j = 0; j < hwc; ++j) {
        dst[j] = lut[src[j]];
      }
    } else {
      for (int64_t y = 0; y < h; ++y) {
        const uint8_t* srow = src + y * w * c;
        float* drow = dst + y * w * c;
        for (int64_t x = 0; x < w; ++x) {
          const uint8_t* sp = srow + (w - 1 - x) * c;
          float* dp = drow + x * c;
          for (int64_t ch = 0; ch < c; ++ch) {
            dp[ch] = lut[sp[ch]];
          }
        }
      }
    }
  }
}

// uint8 quantization of generated images: float32 [-1,1] -> uint8,
// (x+1)*127.5 + 0.5 clamped (reference ops.py:251-255), used by the
// eval feature-extraction pipeline.
void quantize_images(const float* in, uint8_t* out, int64_t n) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    float v = (in[i] + 1.0f) * 127.5f + 0.5f;
    if (v < 0.0f) v = 0.0f;
    if (v > 255.0f) v = 255.0f;
    out[i] = static_cast<uint8_t>(v);
  }
}

}  // extern "C"
