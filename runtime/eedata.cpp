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
//   ee_jpeg_dims         parse JPEG header -> (h, w) without decoding
//   ee_decode_jpeg_batch decode + crop-box + bilinear resize, batched.
//                        Streams the ImageNet train/eval pipeline from the
//                        original files (reference utils/data_loader.py:
//                        ImageFolder + DataLoader workers) with libjpeg
//                        DCT-scaled decode: the IDCT runs at the smallest
//                        M/8 scale that still covers the target resolution.
//
// Build: python runtime/build.py  (g++ -O3 -march=native -fopenmp -ljpeg)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <algorithm>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

#ifdef EE_HAVE_JPEG
#include <jpeglib.h>
#include <jerror.h>
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

#ifdef EE_HAVE_JPEG

namespace {

struct EeJpegErr {
    jpeg_error_mgr pub;
    jmp_buf jump;
};

void ee_jpeg_error_exit(j_common_ptr cinfo) {
    EeJpegErr* err = reinterpret_cast<EeJpegErr*>(cinfo->err);
    longjmp(err->jump, 1);
}

// Decode one JPEG with the crop box (by, bx, bh, bw) given in ORIGINAL image
// coordinates (bh <= 0 means full image), bilinear-resized to (oh, ow) RGB.
// The IDCT runs at the smallest M/8 scale covering (oh, ow). Returns 0 on ok.
int decode_one(const uint8_t* data, int64_t len, int32_t by, int32_t bx,
               int32_t bh, int32_t bw, int64_t oh, int64_t ow, uint8_t* out) {
    jpeg_decompress_struct cinfo;
    EeJpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = ee_jpeg_error_exit;
    // every buffer that is live across a libjpeg call is constructed BEFORE
    // setjmp: error_exit longjmps here, and jumping over a vector's lifetime
    // would skip its destructor (leak + UB)
    std::vector<uint8_t> buf;     // scaled crop rows, RGB
    std::vector<uint8_t> rowbuf;  // discard buffer for rows above the box
    if (setjmp(jerr.jump)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
                 static_cast<unsigned long>(len));
    jpeg_read_header(&cinfo, TRUE);
    const int64_t full_h = cinfo.image_height, full_w = cinfo.image_width;
    if (bh <= 0 || bw <= 0) { by = 0; bx = 0;
        bh = (int32_t)full_h; bw = (int32_t)full_w; }
    by = std::max(0, std::min(by, (int32_t)full_h - 1));
    bx = std::max(0, std::min(bx, (int32_t)full_w - 1));
    bh = std::max(1, std::min(bh, (int32_t)full_h - by));
    bw = std::max(1, std::min(bw, (int32_t)full_w - bx));

    // smallest scale M/8 with scaled crop >= target (cap 8/8 = full size)
    int m = 8;
    for (int cand = 1; cand <= 8; ++cand) {
        if ((int64_t)bh * cand >= oh * 8 && (int64_t)bw * cand >= ow * 8) {
            m = cand;
            break;
        }
    }
    cinfo.scale_num = m;
    cinfo.scale_denom = 8;
    cinfo.out_color_space = JCS_RGB;
    cinfo.dct_method = JDCT_IFAST;
    jpeg_start_decompress(&cinfo);
    const int64_t sh = cinfo.output_height, sw = cinfo.output_width;
    // crop box in scaled coordinates
    const double sy_scale = (double)sh / full_h, sx_scale = (double)sw / full_w;
    int64_t cby = (int64_t)(by * sy_scale), cbx = (int64_t)(bx * sx_scale);
    int64_t cbh = std::max<int64_t>(1, (int64_t)std::lround(bh * sy_scale));
    int64_t cbw = std::max<int64_t>(1, (int64_t)std::lround(bw * sx_scale));
    cby = std::min(cby, sh - 1); cbx = std::min(cbx, sw - 1);
    cbh = std::min(cbh, sh - cby); cbw = std::min(cbw, sw - cbx);

    buf.resize((size_t)cbh * sw * 3);
    rowbuf.resize((size_t)sw * 3);
    JSAMPROW rowptr[1];
    int64_t row = 0;
    while (cinfo.output_scanline < cinfo.output_height) {
        const int64_t y = cinfo.output_scanline;
        if (y >= cby && y < cby + cbh) {
            rowptr[0] = buf.data() + (size_t)(y - cby) * sw * 3;
        } else if (y >= cby + cbh) {
            jpeg_abort_decompress(&cinfo);  // skip the tail entirely
            break;
        } else {
            rowptr[0] = rowbuf.data();      // discard rows above the box
        }
        jpeg_read_scanlines(&cinfo, rowptr, 1);
        row = y;
    }
    (void)row;
    if (cinfo.output_scanline >= cinfo.output_height) {
        jpeg_finish_decompress(&cinfo);
    }
    jpeg_destroy_decompress(&cinfo);

    // bilinear resize of the (cbh, cbw) box (rows in buf, x-offset cbx).
    // Q8 fixed-point weights with precomputed per-column tables: the host
    // data path must stay integer-only (measured: float per-pixel math
    // dominates decode time on low-IPC cores).
    std::vector<int32_t> xoff0(ow), xoff1(ow), wx(ow);
    {
        const int64_t scale_x_q16 = (cbw << 16) / ow;
        for (int64_t x = 0; x < ow; ++x) {
            int64_t sx_q16 = ((2 * x + 1) * scale_x_q16 - (1 << 16)) / 2;
            sx_q16 = std::max<int64_t>(0,
                std::min<int64_t>(sx_q16, (cbw - 1) << 16));
            const int64_t x0 = sx_q16 >> 16;
            const int64_t x1 = std::min(x0 + 1, cbw - 1);
            xoff0[x] = (int32_t)((cbx + x0) * 3);
            xoff1[x] = (int32_t)((cbx + x1) * 3);
            wx[x] = (int32_t)((sx_q16 >> 8) & 0xff);
        }
    }
    const int64_t scale_y_q16 = (cbh << 16) / oh;
    for (int64_t y = 0; y < oh; ++y) {
        int64_t sy_q16 = ((2 * y + 1) * scale_y_q16 - (1 << 16)) / 2;
        sy_q16 = std::max<int64_t>(0,
            std::min<int64_t>(sy_q16, (cbh - 1) << 16));
        const int64_t y0 = sy_q16 >> 16;
        const int64_t y1 = std::min(y0 + 1, cbh - 1);
        const int32_t fy = (int32_t)((sy_q16 >> 8) & 0xff);
        const uint8_t* r0 = buf.data() + (size_t)y0 * sw * 3;
        const uint8_t* r1 = buf.data() + (size_t)y1 * sw * 3;
        uint8_t* px = out + y * ow * 3;
        for (int64_t x = 0; x < ow; ++x) {
            const int32_t x0 = xoff0[x], x1 = xoff1[x], fx = wx[x];
            for (int k = 0; k < 3; ++k) {
                const int32_t top = (r0[x0 + k] << 8)
                                  + (r0[x1 + k] - r0[x0 + k]) * fx;
                const int32_t bot = (r1[x0 + k] << 8)
                                  + (r1[x1 + k] - r1[x0 + k]) * fx;
                px[x * 3 + k] =
                    (uint8_t)(((top << 8) + (bot - top) * fy + (1 << 15)) >> 16);
            }
        }
    }
    return 0;
}

}  // namespace

int ee_jpeg_dims(const uint8_t* data, int64_t len, int32_t* h, int32_t* w);

namespace {

// torchvision RandomResizedCrop box from 40 pre-drawn uniforms (10 tries x
// {scale, log-ratio, y, x}); centre-square fallback. Mirrored in Python
// (edge_enhancement_tpu/data/datasets.py::rrc_box_from_draws) so the native
// and fallback pipelines produce identical crops from the same draws.
void rrc_box(const float* d, int64_t h, int64_t w, int32_t* box) {
    const double area = (double)h * w;
    const double lr_lo = std::log(3.0 / 4.0), lr_hi = std::log(4.0 / 3.0);
    for (int t = 0; t < 10; ++t) {
        const double target_area = (0.08 + d[t * 4] * 0.92) * area;
        const double ratio = std::exp(lr_lo + d[t * 4 + 1] * (lr_hi - lr_lo));
        const int64_t bw = (int64_t)std::lround(std::sqrt(target_area * ratio));
        const int64_t bh = (int64_t)std::lround(std::sqrt(target_area / ratio));
        if (bw > 0 && bw <= w && bh > 0 && bh <= h) {
            // double precision: the Python twin computes f64(draw) * int
            box[0] = (int32_t)((double)d[t * 4 + 2] * (double)(h - bh + 1));
            box[1] = (int32_t)((double)d[t * 4 + 3] * (double)(w - bw + 1));
            box[2] = (int32_t)bh;
            box[3] = (int32_t)bw;
            return;
        }
    }
    const int64_t s = std::min(h, w);
    box[0] = (int32_t)((h - s) / 2);
    box[1] = (int32_t)((w - s) / 2);
    box[2] = (int32_t)s;
    box[3] = (int32_t)s;
}

// Resize(short=eval_resize) + CenterCrop(eval_crop) as one original-
// resolution box (see datasets.py::eval_center_box).
void center_box(int64_t h, int64_t w, int32_t eval_resize, int32_t eval_crop,
                int32_t* box) {
    const int64_t s = std::min(h, w);
    int64_t side = (int64_t)std::lround((double)s * eval_crop / eval_resize);
    side = std::max<int64_t>(1, side);
    box[0] = (int32_t)((h - side) / 2);
    box[1] = (int32_t)((w - side) / 2);
    box[2] = (int32_t)side;
    box[3] = (int32_t)side;
}

}  // namespace

// One-call streaming batch: read each file, decode + crop + resize (+hflip)
// (+uint8 -> float32 [0,1] while the image is still cache-hot).
// paths_blob: NUL-terminated UTF-8 paths back to back; path_offsets[i] is
// the start of path i. mode: 0 = full-image resize, 1 = RandomResizedCrop
// (draws = n x 40 uniforms), 2 = eval centre box (eval_resize/eval_crop).
// flip_flags (may be NULL): apply horizontal flip per sample after resize.
// Exactly one of out_u8 / out_f32 must be non-NULL.
// Returns the number of failures (their slots zeroed).
int ee_stream_decode_files(const char* paths_blob, const int64_t* path_offsets,
                           int64_t n, int32_t mode, const float* draws,
                           int32_t eval_resize, int32_t eval_crop,
                           int64_t oh, int64_t ow, uint8_t* out_u8,
                           float* out_f32, const uint8_t* flip_flags) {
    int failures = 0;
    const int64_t elems = oh * ow * 3;
#pragma omp parallel
    {
        std::vector<uint8_t> tmp(out_f32 ? (size_t)elems : 0);
#pragma omp for schedule(dynamic) reduction(+ : failures)
        for (int64_t i = 0; i < n; ++i) {
            uint8_t* dst = out_u8 ? out_u8 + i * elems : tmp.data();
            const char* path = paths_blob + path_offsets[i];
            std::vector<uint8_t> bytes;
            FILE* f = std::fopen(path, "rb");
            if (f) {
                std::fseek(f, 0, SEEK_END);
                const long sz = std::ftell(f);
                std::fseek(f, 0, SEEK_SET);
                if (sz > 0) {
                    bytes.resize((size_t)sz);
                    if (std::fread(bytes.data(), 1, (size_t)sz, f) != (size_t)sz)
                        bytes.clear();
                }
                std::fclose(f);
            }
            int rc = 1;
            if (!bytes.empty()) {
                int32_t h = 0, w = 0;
                if (ee_jpeg_dims(bytes.data(), (int64_t)bytes.size(), &h, &w) == 0) {
                    int32_t box[4] = {0, 0, -1, -1};
                    if (mode == 1) {
                        rrc_box(draws + i * 40, h, w, box);
                    } else if (mode == 2) {
                        center_box(h, w, eval_resize, eval_crop, box);
                    }
                    rc = decode_one(bytes.data(), (int64_t)bytes.size(), box[0],
                                    box[1], box[2], box[3], oh, ow, dst);
                }
            }
            if (rc != 0) {
                if (out_u8) std::memset(dst, 0, (size_t)elems);
                if (out_f32)
                    std::memset(out_f32 + i * elems, 0, (size_t)elems * 4);
                failures += 1;
                continue;
            }
            if (flip_flags && flip_flags[i]) {
                for (int64_t y = 0; y < oh; ++y) {
                    uint8_t* row = dst + y * ow * 3;
                    for (int64_t x = 0; x < ow / 2; ++x) {
                        for (int k = 0; k < 3; ++k)
                            std::swap(row[x * 3 + k], row[(ow - 1 - x) * 3 + k]);
                    }
                }
            }
            if (out_f32) {
                float* fdst = out_f32 + i * elems;
                constexpr float kInv = 1.0f / 255.0f;
                for (int64_t j = 0; j < elems; ++j) fdst[j] = dst[j] * kInv;
            }
        }
    }
    return failures;
}

// Header-only dimension query (no pixel decode). Returns 0 on success.
int ee_jpeg_dims(const uint8_t* data, int64_t len, int32_t* h, int32_t* w) {
    jpeg_decompress_struct cinfo;
    EeJpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = ee_jpeg_error_exit;
    if (setjmp(jerr.jump)) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
                 static_cast<unsigned long>(len));
    jpeg_read_header(&cinfo, TRUE);
    *h = (int32_t)cinfo.image_height;
    *w = (int32_t)cinfo.image_width;
    jpeg_destroy_decompress(&cinfo);
    return 0;
}

// Batched decode: `blob` holds n concatenated JPEG byte streams
// (offsets/lens), boxes is (n, 4) int32 rows (by, bx, bh, bw) in original
// coordinates (bh <= 0 -> full image). Output (n, oh, ow, 3) uint8 RGB.
// Returns the number of failed decodes (their output slots are zeroed).
int ee_decode_jpeg_batch(const uint8_t* blob, const int64_t* offsets,
                         const int64_t* lens, int64_t n, const int32_t* boxes,
                         int64_t oh, int64_t ow, uint8_t* out) {
    int failures = 0;
#pragma omp parallel for schedule(dynamic) reduction(+ : failures)
    for (int64_t i = 0; i < n; ++i) {
        uint8_t* dst = out + i * oh * ow * 3;
        const int rc = decode_one(blob + offsets[i], lens[i], boxes[i * 4],
                                  boxes[i * 4 + 1], boxes[i * 4 + 2],
                                  boxes[i * 4 + 3], oh, ow, dst);
        if (rc != 0) {
            std::memset(dst, 0, (size_t)oh * ow * 3);
            failures += 1;
        }
    }
    return failures;
}

int ee_has_jpeg() { return 1; }

#else  // !EE_HAVE_JPEG

int ee_jpeg_dims(const uint8_t*, int64_t, int32_t*, int32_t*) { return 2; }
int ee_decode_jpeg_batch(const uint8_t*, const int64_t*, const int64_t*,
                         int64_t n, const int32_t*, int64_t, int64_t,
                         uint8_t*) { return (int)n; }
int ee_stream_decode_files(const char*, const int64_t*, int64_t n, int32_t,
                           const float*, int32_t, int32_t, int64_t, int64_t,
                           uint8_t*, float*, const uint8_t*) { return (int)n; }
int ee_has_jpeg() { return 0; }

#endif  // EE_HAVE_JPEG

}  // extern "C"
