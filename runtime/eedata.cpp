// eedata: native host-side data runtime for edge_enhancement_tpu.
//
// The reference delegates its host data path to PyTorch's C++ DataLoader
// workers, torchvision transforms (PIL/C) and OpenCV. This library provides
// the TPU framework's equivalent: batch assembly and augmentation kernels
// operating on uint8 NHWC buffers, exposed through a C ABI consumed via
// ctypes (see edge_enhancement_tpu/data/native.py).
//
// Kernels:
//   ee_gather_to_float   gather a shuffled batch + uint8 -> float32 [0,1]
//   ee_hflip             conditional horizontal flip per sample
//   ee_pad_crop          pad-by-P + random crop (CIFAR augmentation)
//   ee_rotate_bilinear   random rotation, bilinear, zero fill (CIFAR)
//   ee_resize_bilinear   batched bilinear resize (ImageNet-style crops)
//
// Build: python runtime/build.py  (g++ -O3 -march=native -fopenmp)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Gather rows `idx[0..n)` from a (N, H*W*C) uint8 image store into a float32
// batch scaled to [0, 1]. The gather and conversion fuse into one pass.
void ee_gather_to_float(const uint8_t* images, const int64_t* idx, int64_t n,
                        int64_t sample_elems, float* out) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t* src = images + idx[i] * sample_elems;
        float* dst = out + i * sample_elems;
        constexpr float kInv = 1.0f / 255.0f;
        for (int64_t j = 0; j < sample_elems; ++j) dst[j] = src[j] * kInv;
    }
}

// Gather uint8 rows without conversion (when augmentation runs on uint8).
void ee_gather_u8(const uint8_t* images, const int64_t* idx, int64_t n,
                  int64_t sample_elems, uint8_t* out) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        std::memcpy(out + i * sample_elems, images + idx[i] * sample_elems,
                    sample_elems);
    }
}

// In-place conditional horizontal flip. flags[i] != 0 -> flip sample i.
void ee_hflip(uint8_t* imgs, int64_t n, int64_t h, int64_t w, int64_t c,
              const uint8_t* flags) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        if (!flags[i]) continue;
        uint8_t* img = imgs + i * h * w * c;
        for (int64_t y = 0; y < h; ++y) {
            uint8_t* row = img + y * w * c;
            for (int64_t x = 0; x < w / 2; ++x) {
                for (int64_t k = 0; k < c; ++k) {
                    std::swap(row[x * c + k], row[(w - 1 - x) * c + k]);
                }
            }
        }
    }
}

// Zero-pad each sample by `pad` on every side, then crop h x w at
// (oy[i], ox[i]) with 0 <= oy, ox <= 2*pad. Equivalent to torchvision
// RandomCrop(size, padding=pad).
void ee_pad_crop(const uint8_t* in, uint8_t* out, int64_t n, int64_t h,
                 int64_t w, int64_t c, int64_t pad, const int32_t* oy,
                 const int32_t* ox) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t* src = in + i * h * w * c;
        uint8_t* dst = out + i * h * w * c;
        const int64_t sy = oy[i] - pad;  // source start row (may be < 0)
        const int64_t sx = ox[i] - pad;
        for (int64_t y = 0; y < h; ++y) {
            const int64_t yy = y + sy;
            uint8_t* drow = dst + y * w * c;
            if (yy < 0 || yy >= h) {
                std::memset(drow, 0, w * c);
                continue;
            }
            const uint8_t* srow = src + yy * w * c;
            const int64_t x0 = std::max<int64_t>(0, -sx);
            const int64_t x1 = std::min<int64_t>(w, w - sx);
            if (x0 > 0) std::memset(drow, 0, x0 * c);
            if (x1 > x0)
                std::memcpy(drow + x0 * c, srow + (x0 + sx) * c, (x1 - x0) * c);
            if (x1 < w) std::memset(drow + x1 * c, 0, (w - x1) * c);
        }
    }
}

// Rotate each sample by angles[i] degrees around the centre, bilinear
// sampling, zero fill (torchvision RandomRotation semantics, expand=False).
void ee_rotate_bilinear(const uint8_t* in, uint8_t* out, int64_t n, int64_t h,
                        int64_t w, int64_t c, const float* angles) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t* src = in + i * h * w * c;
        uint8_t* dst = out + i * h * w * c;
        const float a = angles[i] * 3.14159265358979323846f / 180.0f;
        const float ca = std::cos(a), sa = std::sin(a);
        const float cy = (h - 1) * 0.5f, cx = (w - 1) * 0.5f;
        for (int64_t y = 0; y < h; ++y) {
            for (int64_t x = 0; x < w; ++x) {
                // inverse-rotate the output coordinate into source space
                const float dy = y - cy, dx = x - cx;
                const float sy = ca * dy + sa * dx + cy;
                const float sx = -sa * dy + ca * dx + cx;
                uint8_t* px = dst + (y * w + x) * c;
                if (sy < 0 || sy > h - 1 || sx < 0 || sx > w - 1) {
                    std::memset(px, 0, c);
                    continue;
                }
                const int64_t y0 = (int64_t)sy, x0 = (int64_t)sx;
                const int64_t y1 = std::min(y0 + 1, h - 1);
                const int64_t x1 = std::min(x0 + 1, w - 1);
                const float fy = sy - y0, fx = sx - x0;
                for (int64_t k = 0; k < c; ++k) {
                    const float v00 = src[(y0 * w + x0) * c + k];
                    const float v01 = src[(y0 * w + x1) * c + k];
                    const float v10 = src[(y1 * w + x0) * c + k];
                    const float v11 = src[(y1 * w + x1) * c + k];
                    const float v = v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
                                  + v10 * fy * (1 - fx) + v11 * fy * fx;
                    px[k] = (uint8_t)std::min(255.0f, std::max(0.0f, v + 0.5f));
                }
            }
        }
    }
}

// Batched bilinear resize of crop boxes: for sample i, resize the box
// (by[i], bx[i], bh[i], bw[i]) of the source (sh x sw) to (oh x ow).
// Covers RandomResizedCrop / Resize+CenterCrop.
void ee_resize_bilinear(const uint8_t* in, uint8_t* out, int64_t n,
                        int64_t sh, int64_t sw, int64_t c,
                        const int32_t* by, const int32_t* bx,
                        const int32_t* bh, const int32_t* bw,
                        int64_t oh, int64_t ow) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t* src = in + i * sh * sw * c;
        uint8_t* dst = out + i * oh * ow * c;
        const float scale_y = (float)bh[i] / oh;
        const float scale_x = (float)bw[i] / ow;
        for (int64_t y = 0; y < oh; ++y) {
            const float sy = std::min((float)(sh - 1),
                                      by[i] + (y + 0.5f) * scale_y - 0.5f);
            const float syc = std::max(0.0f, sy);
            const int64_t y0 = (int64_t)syc;
            const int64_t y1 = std::min(y0 + 1, sh - 1);
            const float fy = syc - y0;
            for (int64_t x = 0; x < ow; ++x) {
                const float sx = std::min((float)(sw - 1),
                                          bx[i] + (x + 0.5f) * scale_x - 0.5f);
                const float sxc = std::max(0.0f, sx);
                const int64_t x0 = (int64_t)sxc;
                const int64_t x1 = std::min(x0 + 1, sw - 1);
                const float fx = sxc - x0;
                uint8_t* px = dst + (y * ow + x) * c;
                for (int64_t k = 0; k < c; ++k) {
                    const float v00 = src[(y0 * sw + x0) * c + k];
                    const float v01 = src[(y0 * sw + x1) * c + k];
                    const float v10 = src[(y1 * sw + x0) * c + k];
                    const float v11 = src[(y1 * sw + x1) * c + k];
                    const float v = v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
                                  + v10 * fy * (1 - fx) + v11 * fy * fx;
                    px[k] = (uint8_t)std::min(255.0f, std::max(0.0f, v + 0.5f));
                }
            }
        }
    }
}

int ee_num_threads() {
#ifdef _OPENMP
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"
