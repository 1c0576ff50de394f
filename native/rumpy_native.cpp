// rumpy_native — host-side native kernels for rumpy_tpu.
//
// The reference delegated its native work to external binaries (the JM
// H.264 encoder via subprocess + temp YUV files, libjpeg via PIL —
// SURVEY.md §2). This library brings the host-side compute in-process:
//
//   * pil_resize_u8    — bit-exact Pillow bicubic/bilinear resampling
//                        (INT32 fixed point, 22 fractional bits), used by
//                        offline datagen when JAX dispatch overhead would
//                        dominate (thousands of small images);
//   * h264_intra_u8    — JM-style pure-intra H.264 approximation on
//                        YUV 4:2:0 (BT.601 conversion, chroma subsample,
//                        8x8 DCT, QP-derived flat quantization, IDCT,
//                        upsample, back to RGB). Unlike the on-device
//                        4:4:4 DCT codec, this includes the chroma
//                        subsampling the JM pipeline applies;
//   * entropy_patch_u8 — local-histogram entropy + box pooling for
//                        entropy patch selection on host workers.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

constexpr int kPrecisionBits = 32 - 8 - 2;  // Pillow 8bpc fixed point

double bicubic_filter(double x) {
  const double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

double bilinear_filter(double x) {
  x = std::fabs(x);
  return x < 1.0 ? 1.0 - x : 0.0;
}

struct Coeffs {
  std::vector<int> bounds;   // xmin per output pixel
  std::vector<int> sizes;    // number of taps
  std::vector<int32_t> k;    // ksize per row, fixed point
  int ksize;
};

// Pillow precompute_coeffs + normalize_coeffs_8bpc, exactly.
Coeffs precompute(int in_size, int out_size, int filter_id) {
  double support0 = filter_id == 0 ? 2.0 : 1.0;
  auto filter = filter_id == 0 ? bicubic_filter : bilinear_filter;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = support0 * filterscale;
  int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  Coeffs c;
  c.ksize = ksize;
  c.bounds.resize(out_size);
  c.sizes.resize(out_size);
  c.k.assign(static_cast<size_t>(out_size) * ksize, 0);
  std::vector<double> prek(ksize);
  double ss = 1.0 / filterscale;
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double ww = 0.0;
    for (int x = 0; x < xmax; ++x) {
      double w = filter((x + xmin - center + 0.5) * ss);
      prek[x] = w;
      ww += w;
    }
    for (int x = 0; x < xmax; ++x) {
      double w = ww != 0.0 ? prek[x] / ww : prek[x];
      c.k[static_cast<size_t>(xx) * ksize + x] =
          w < 0 ? static_cast<int32_t>(-0.5 + w * (1 << kPrecisionBits))
                : static_cast<int32_t>(0.5 + w * (1 << kPrecisionBits));
    }
    c.bounds[xx] = xmin;
    c.sizes[xx] = xmax;
  }
  return c;
}

inline uint8_t clip8(int64_t in) {
  if (in >= (1LL << kPrecisionBits << 8)) return 255;
  if (in <= 0) return 0;
  return static_cast<uint8_t>(in >> kPrecisionBits);
}

}  // namespace

extern "C" {

// Bit-exact Pillow resize: src (h, w, ch) uint8 -> dst (oh, ow, ch).
// filter_id: 0 = bicubic, 1 = bilinear.
void pil_resize_u8(const uint8_t* src, int h, int w, int ch,
                   uint8_t* dst, int oh, int ow, int filter_id) {
  Coeffs ch_coef = precompute(w, ow, filter_id);
  Coeffs cv_coef = precompute(h, oh, filter_id);
  // horizontal pass into temp (h, ow, ch)
  std::vector<uint8_t> temp(static_cast<size_t>(h) * ow * ch);
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < ow; ++x) {
      int xmin = ch_coef.bounds[x];
      int n = ch_coef.sizes[x];
      const int32_t* k = &ch_coef.k[static_cast<size_t>(x) * ch_coef.ksize];
      for (int c = 0; c < ch; ++c) {
        int64_t ss = 1LL << (kPrecisionBits - 1);
        for (int i = 0; i < n; ++i)
          ss += static_cast<int64_t>(
                    src[(static_cast<size_t>(y) * w + xmin + i) * ch + c]) *
                k[i];
        temp[(static_cast<size_t>(y) * ow + x) * ch + c] = clip8(ss);
      }
    }
  }
  // vertical pass
  for (int y = 0; y < oh; ++y) {
    int ymin = cv_coef.bounds[y];
    int n = cv_coef.sizes[y];
    const int32_t* k = &cv_coef.k[static_cast<size_t>(y) * cv_coef.ksize];
    for (int x = 0; x < ow; ++x) {
      for (int c = 0; c < ch; ++c) {
        int64_t ss = 1LL << (kPrecisionBits - 1);
        for (int i = 0; i < n; ++i)
          ss += static_cast<int64_t>(
                    temp[(static_cast<size_t>(ymin + i) * ow + x) * ch + c]) *
                k[i];
        dst[(static_cast<size_t>(y) * ow + x) * ch + c] = clip8(ss);
      }
    }
  }
}

namespace {

void dct8(const double in[8], double out[8]) {
  for (int u = 0; u < 8; ++u) {
    double cu = u == 0 ? std::sqrt(1.0 / 8.0) : std::sqrt(2.0 / 8.0);
    double s = 0.0;
    for (int x = 0; x < 8; ++x)
      s += in[x] * std::cos((2 * x + 1) * u * M_PI / 16.0);
    out[u] = cu * s;
  }
}

void idct8(const double in[8], double out[8]) {
  for (int x = 0; x < 8; ++x) {
    double s = 0.0;
    for (int u = 0; u < 8; ++u) {
      double cu = u == 0 ? std::sqrt(1.0 / 8.0) : std::sqrt(2.0 / 8.0);
      s += cu * in[u] * std::cos((2 * x + 1) * u * M_PI / 16.0);
    }
    out[x] = s;
  }
}

// 8x8 block DCT -> flat quantization by qstep -> IDCT, in place on a plane.
void quantize_plane(std::vector<double>& plane, int h, int w, double qstep) {
  std::vector<double> block(64), tmp(64);
  for (int by = 0; by < h; by += 8) {
    for (int bx = 0; bx < w; bx += 8) {
      // rows
      for (int y = 0; y < 8; ++y) {
        double row[8], out[8];
        for (int x = 0; x < 8; ++x) row[x] = plane[(by + y) * w + bx + x];
        dct8(row, out);
        for (int x = 0; x < 8; ++x) block[y * 8 + x] = out[x];
      }
      // cols
      for (int x = 0; x < 8; ++x) {
        double col[8], out[8];
        for (int y = 0; y < 8; ++y) col[y] = block[y * 8 + x];
        dct8(col, out);
        for (int y = 0; y < 8; ++y)
          tmp[y * 8 + x] = std::round(out[y] / qstep) * qstep;
      }
      // inverse
      for (int x = 0; x < 8; ++x) {
        double col[8], out[8];
        for (int y = 0; y < 8; ++y) col[y] = tmp[y * 8 + x];
        idct8(col, out);
        for (int y = 0; y < 8; ++y) block[y * 8 + x] = out[y];
      }
      for (int y = 0; y < 8; ++y) {
        double row[8], out[8];
        for (int x = 0; x < 8; ++x) row[x] = block[y * 8 + x];
        idct8(row, out);
        for (int x = 0; x < 8; ++x) plane[(by + y) * w + bx + x] = out[x];
      }
    }
  }
}

}  // namespace

// JM-style pure-intra H.264 approximation: rgb (h, w, 3) uint8, QP 0..51.
// Includes BT.601 conversion and 4:2:0 chroma subsampling like the JM
// pipeline; h and w must be even (the JM even-dimension constraint the
// reference's downsampler enforces).
void h264_intra_u8(const uint8_t* rgb, int h, int w, int qp, uint8_t* out) {
  int ph = (h + 7) / 8 * 8, pw = (w + 7) / 8 * 8;
  int ch2 = h / 2, cw2 = w / 2;
  int pch = (ch2 + 7) / 8 * 8, pcw = (cw2 + 7) / 8 * 8;
  std::vector<double> Y(static_cast<size_t>(ph) * pw, 0.0);
  std::vector<double> Cb(static_cast<size_t>(pch) * pcw, 128.0);
  std::vector<double> Cr(static_cast<size_t>(pch) * pcw, 128.0);
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const uint8_t* p = &rgb[(static_cast<size_t>(y) * w + x) * 3];
      double r = p[0], g = p[1], b = p[2];
      Y[static_cast<size_t>(y) * pw + x] =
          0.299 * r + 0.587 * g + 0.114 * b;
    }
  }
  for (int y = 0; y < ch2; ++y) {
    for (int x = 0; x < cw2; ++x) {
      double r = 0, g = 0, b = 0;
      for (int dy = 0; dy < 2; ++dy)
        for (int dx = 0; dx < 2; ++dx) {
          const uint8_t* p =
              &rgb[(static_cast<size_t>(2 * y + dy) * w + 2 * x + dx) * 3];
          r += p[0]; g += p[1]; b += p[2];
        }
      r /= 4; g /= 4; b /= 4;
      Cb[static_cast<size_t>(y) * pcw + x] =
          128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b;
      Cr[static_cast<size_t>(y) * pcw + x] =
          128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b;
    }
  }
  // pad replicate
  for (int y = 0; y < ph; ++y)
    for (int x = 0; x < pw; ++x)
      if (y >= h || x >= w)
        Y[static_cast<size_t>(y) * pw + x] =
            Y[static_cast<size_t>(std::min(y, h - 1)) * pw +
              std::min(x, w - 1)];
  for (int y = 0; y < pch; ++y)
    for (int x = 0; x < pcw; ++x)
      if (y >= ch2 || x >= cw2) {
        Cb[static_cast<size_t>(y) * pcw + x] =
            Cb[static_cast<size_t>(std::min(y, ch2 - 1)) * pcw +
               std::min(x, cw2 - 1)];
        Cr[static_cast<size_t>(y) * pcw + x] =
            Cr[static_cast<size_t>(std::min(y, ch2 - 1)) * pcw +
               std::min(x, cw2 - 1)];
      }
  double qstep = 0.625 * std::pow(2.0, qp / 6.0);
  quantize_plane(Y, ph, pw, qstep);
  quantize_plane(Cb, pch, pcw, qstep);
  quantize_plane(Cr, pch, pcw, qstep);
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      double yy = Y[static_cast<size_t>(y) * pw + x];
      double cb =
          Cb[static_cast<size_t>(y / 2) * pcw + x / 2] - 128.0;
      double cr =
          Cr[static_cast<size_t>(y / 2) * pcw + x / 2] - 128.0;
      double r = yy + 1.402 * cr;
      double g = yy - 0.344136 * cb - 0.714136 * cr;
      double b = yy + 1.772 * cb;
      uint8_t* p = &out[(static_cast<size_t>(y) * w + x) * 3];
      p[0] = static_cast<uint8_t>(std::clamp(std::round(r), 0.0, 255.0));
      p[1] = static_cast<uint8_t>(std::clamp(std::round(g), 0.0, 255.0));
      p[2] = static_cast<uint8_t>(std::clamp(std::round(b), 0.0, 255.0));
    }
  }
}

// Local-histogram entropy at `region`, average-pooled at crop_size, argmax
// -> best patch corner (y, x). gray: (h, w) uint8.
void entropy_patch_u8(const uint8_t* gray, int h, int w, int region,
                      int crop_size, int* best_y, int* best_x) {
  std::vector<double> ent(static_cast<size_t>(h) * w, 0.0);
  int half = region / 2;
  std::vector<int> hist(256);
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      std::fill(hist.begin(), hist.end(), 0);
      int count = 0;
      for (int dy = -half; dy < region - half; ++dy) {
        int yy = y + dy;
        if (yy < 0 || yy >= h) continue;
        for (int dx = -half; dx < region - half; ++dx) {
          int xx = x + dx;
          if (xx < 0 || xx >= w) continue;
          ++hist[gray[static_cast<size_t>(yy) * w + xx]];
          ++count;
        }
      }
      double e = 0.0;
      for (int v : hist)
        if (v > 0) {
          double p = static_cast<double>(v) / count;
          e -= p * std::log2(p);
        }
      ent[static_cast<size_t>(y) * w + x] = e;
    }
  }
  double best = -1.0;
  *best_y = 0;
  *best_x = 0;
  for (int y = 0; y + crop_size <= h; ++y) {
    for (int x = 0; x + crop_size <= w; ++x) {
      double s = 0.0;
      for (int dy = 0; dy < crop_size; ++dy)
        for (int dx = 0; dx < crop_size; ++dx)
          s += ent[static_cast<size_t>(y + dy) * w + x + dx];
      if (s > best) {
        best = s;
        *best_y = y;
        *best_x = x;
      }
    }
  }
}

}  // extern "C"
