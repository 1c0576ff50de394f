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
//   * h264_intra_u8    — H.264 intra toolchain on YUV 4:2:0 (BT.601
//                        conversion, chroma subsample, macroblock-order
//                        Intra_4x4/Intra_16x16 with RD mode decision,
//                        spec integer transform/quant/DC-Hadamard,
//                        in-loop deblocking, back to RGB). Unlike the
//                        on-device 4:4:4 DCT codec, this includes the
//                        chroma subsampling the JM pipeline applies;
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

// ---------------------------------------------------------------------------
// H.264 intra-frame codec (ITU-T H.264 / ISO 14496-10 toolchain),
// mirroring the JM encoder_baseline.cfg configuration the reference
// drives (IntraPeriod=1, RDOptimization=1, CAVLC):
//   * macroblock raster coding order with the spec's 4x4 Z-scan inside
//     each MB and coded-block-derived above-right availability (6.4.11);
//   * Intra_4x4 (all 9 modes, most-probable-mode signalling cost) and
//     Intra_16x16 (V/H/DC/plane + luma DC Hadamard stage, 8.3.3/8.5.10)
//     chosen per MB by rate-distortion cost SSD + lambda*R with JM's
//     lambda_mode = 0.85*2^((QP-12)/3) and R the table-exact CAVLC bit
//     count (coeff_token/levels/total_zeros/run_before, Tables 9-5..10);
//   * one shared chroma prediction mode per MB across Cb/Cr (7.4.5),
//     2x2 chroma-DC Hadamard, chroma-QP mapping (Table 8-15);
//   * 4x4 integer transform with the spec quantization multiplier /
//     rescale tables; in-loop deblocking (bS=4 on MB edges, bS=3 on
//     internal 4x4 edges, spec alpha/beta/tc0 tables);
//   * real Annex-B bitstream emission (SPS+PPS+IDR, constrained
//     baseline, CAVLC) — the reconstruction is verified bit-exact
//     against libavcodec's independent decoder in tests/test_native.py.
// Remaining deviations from the JM binary itself: the luma-mode RD pass
// costs the chroma cbp contribution as zero (JM folds chroma into one
// MB decision), and JM's heuristic mode shortcuts are not mimicked — so
// mode DECISIONS can differ from lencod near cost ties; streams are
// conformant and decoder-verified rather than byte-identical to JM's.
// Set RUMPY_TPU_JM_BIN to drive a real JM binary when byte-parity with
// a specific JM build matters.
// ---------------------------------------------------------------------------

namespace h264 {

static const int kMF[6][3] = {  // quant multipliers per qp%6, pos class
    {13107, 5243, 8066}, {11916, 4660, 7490}, {10082, 4194, 6554},
    {9362, 3647, 5825},  {8192, 3355, 5243},  {7282, 2893, 4559}};
static const int kV[6][3] = {   // dequant rescale per qp%6, pos class
    {10, 16, 13}, {11, 18, 14}, {13, 20, 16},
    {14, 23, 18}, {16, 25, 20}, {18, 29, 23}};

inline int pos_class(int i, int j) {
  bool ie = (i & 1) == 0, je = (j & 1) == 0;
  if (ie && je) return 0;
  if (!ie && !je) return 1;
  return 2;
}

// Table 8-15: luma QP -> chroma QP
inline int chroma_qp(int qp) {
  static const int tab[22] = {29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36,
                              36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39};
  if (qp < 30) return qp;
  return tab[std::min(qp, 51) - 30];
}

// Deblocking tables (Table 8-16): alpha/beta per index 0..51
static const int kAlpha[52] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28,
    32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144, 162, 182,
    203, 226, 255, 255};
static const int kBeta[52] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8,
    9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16,
    17, 17, 18, 18};
// Table 8-17 tc0, column for bS=3 (internal intra edges)
static const int kTc0Bs3[52] = {
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3,
    3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16,
    18, 20, 23, 25};

inline int clip255(int v) { return v < 0 ? 0 : (v > 255 ? 255 : v); }
inline int iclip(int v, int lo, int hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// forward core transform W = Cf X CfT
void fwd4x4(const int in[16], int out[16]) {
  int tmp[16];
  for (int i = 0; i < 4; ++i) {  // rows
    const int* r = &in[i * 4];
    int s03 = r[0] + r[3], d03 = r[0] - r[3];
    int s12 = r[1] + r[2], d12 = r[1] - r[2];
    tmp[i * 4 + 0] = s03 + s12;
    tmp[i * 4 + 1] = 2 * d03 + d12;
    tmp[i * 4 + 2] = s03 - s12;
    tmp[i * 4 + 3] = d03 - 2 * d12;
  }
  for (int j = 0; j < 4; ++j) {  // cols
    int c0 = tmp[0 * 4 + j], c1 = tmp[1 * 4 + j], c2 = tmp[2 * 4 + j],
        c3 = tmp[3 * 4 + j];
    int s03 = c0 + c3, d03 = c0 - c3;
    int s12 = c1 + c2, d12 = c1 - c2;
    out[0 * 4 + j] = s03 + s12;
    out[1 * 4 + j] = 2 * d03 + d12;
    out[2 * 4 + j] = s03 - s12;
    out[3 * 4 + j] = d03 - 2 * d12;
  }
}

// inverse core transform with final (x + 32) >> 6
void inv4x4(const int in[16], int out[16]) {
  int tmp[16];
  for (int i = 0; i < 4; ++i) {  // rows
    const int* r = &in[i * 4];
    int e0 = r[0] + r[2], e1 = r[0] - r[2];
    int e2 = (r[1] >> 1) - r[3], e3 = r[1] + (r[3] >> 1);
    tmp[i * 4 + 0] = e0 + e3;
    tmp[i * 4 + 1] = e1 + e2;
    tmp[i * 4 + 2] = e1 - e2;
    tmp[i * 4 + 3] = e0 - e3;
  }
  for (int j = 0; j < 4; ++j) {  // cols
    int c0 = tmp[0 * 4 + j], c1 = tmp[1 * 4 + j], c2 = tmp[2 * 4 + j],
        c3 = tmp[3 * 4 + j];
    int e0 = c0 + c2, e1 = c0 - c2;
    int e2 = (c1 >> 1) - c3, e3 = c1 + (c3 >> 1);
    out[0 * 4 + j] = (e0 + e3 + 32) >> 6;
    out[1 * 4 + j] = (e1 + e2 + 32) >> 6;
    out[2 * 4 + j] = (e1 - e2 + 32) >> 6;
    out[3 * 4 + j] = (e0 - e3 + 32) >> 6;
  }
}

inline int bitlen(int v) {
  int n = 0;
  while (v) {
    ++n;
    v >>= 1;
  }
  return n;
}

// ---------------------------------------------------------------------------
// CAVLC entropy coding (spec 9.2) and bitstream writing (7.3/7.4). The
// encoder both COUNTS bits (exact RD rate term) and EMITS them (real
// Annex-B streams, verified bit-exact against libavcodec's decoder in
// tests/test_native.py). All VLC tables are ITU-T H.264 spec constants
// (Tables 9-5/9-7/9-8/9-9/9-10), reproduced like the transform/quant
// tables above.
// ---------------------------------------------------------------------------

struct BitWriter {
  std::vector<uint8_t> buf;  // RBSP bytes (no emulation prevention yet)
  uint32_t acc = 0;
  int nbits = 0;
  void put(uint32_t val, int n) {  // MSB-first, n <= 25
    acc = (acc << n) | (val & ((n >= 32) ? 0xFFFFFFFFu : ((1u << n) - 1)));
    nbits += n;
    while (nbits >= 8) {
      nbits -= 8;
      buf.push_back((uint8_t)(acc >> nbits));
    }
  }
  void put_ue(uint32_t v) {  // Exp-Golomb (9.1)
    int len = bitlen((int)(v + 1));
    put(0, len - 1);
    put(v + 1, len);
  }
  void put_se(int v) { put_ue(v <= 0 ? (uint32_t)(-2 * v) : 2 * v - 1); }
  void rbsp_trailing() {  // stop bit + byte alignment
    put(1, 1);
    if (nbits) put(0, 8 - nbits);
  }
};

inline int ue_len(uint32_t v) { return 2 * bitlen((int)(v + 1)) - 1; }
inline int se_len(int v) {
  return ue_len(v <= 0 ? (uint32_t)(-2 * v) : 2 * v - 1);
}

struct Vlc {
  uint8_t len;
  uint16_t val;
};

// Table 9-5 coeff_token. Rows: TotalCoeff 0..16, cols TrailingOnes 0..3.
static const Vlc kCT0[17][4] = {  // 0 <= nC < 2
    {{1, 1}, {0, 0}, {0, 0}, {0, 0}},
    {{6, 5}, {2, 1}, {0, 0}, {0, 0}},
    {{8, 7}, {6, 4}, {3, 1}, {0, 0}},
    {{9, 7}, {8, 6}, {7, 5}, {5, 3}},
    {{10, 7}, {9, 6}, {8, 5}, {6, 3}},
    {{11, 7}, {10, 6}, {9, 5}, {7, 4}},
    {{13, 15}, {11, 6}, {10, 5}, {8, 4}},
    {{13, 11}, {13, 14}, {11, 5}, {9, 4}},
    {{13, 8}, {13, 10}, {13, 13}, {10, 4}},
    {{14, 15}, {14, 14}, {13, 9}, {11, 4}},
    {{14, 11}, {14, 10}, {14, 13}, {13, 12}},
    {{15, 15}, {15, 14}, {14, 9}, {14, 12}},
    {{15, 11}, {15, 10}, {15, 13}, {14, 8}},
    {{16, 15}, {15, 1}, {15, 9}, {15, 12}},
    {{16, 11}, {16, 14}, {16, 13}, {15, 8}},
    {{16, 7}, {16, 10}, {16, 9}, {16, 12}},
    {{16, 4}, {16, 6}, {16, 5}, {16, 8}}};
static const Vlc kCT1[17][4] = {  // 2 <= nC < 4
    {{2, 3}, {0, 0}, {0, 0}, {0, 0}},
    {{6, 11}, {2, 2}, {0, 0}, {0, 0}},
    {{6, 7}, {5, 7}, {3, 3}, {0, 0}},
    {{7, 7}, {6, 10}, {6, 9}, {4, 5}},
    {{8, 7}, {6, 6}, {6, 5}, {4, 4}},
    {{8, 4}, {7, 6}, {7, 5}, {5, 6}},
    {{9, 7}, {8, 6}, {8, 5}, {6, 8}},
    {{11, 15}, {9, 6}, {9, 5}, {6, 4}},
    {{11, 11}, {11, 14}, {11, 13}, {7, 4}},
    {{12, 15}, {11, 10}, {11, 9}, {9, 4}},
    {{12, 11}, {12, 14}, {12, 13}, {11, 12}},
    {{12, 8}, {12, 10}, {12, 9}, {11, 8}},
    {{13, 15}, {13, 14}, {13, 13}, {12, 12}},
    {{13, 11}, {13, 10}, {13, 9}, {13, 12}},
    {{13, 7}, {14, 11}, {13, 6}, {13, 8}},
    {{14, 9}, {14, 8}, {14, 10}, {13, 1}},
    {{14, 7}, {14, 6}, {14, 5}, {14, 4}}};
static const Vlc kCT2[17][4] = {  // 4 <= nC < 8
    {{4, 15}, {0, 0}, {0, 0}, {0, 0}},
    {{6, 15}, {4, 14}, {0, 0}, {0, 0}},
    {{6, 11}, {5, 15}, {4, 13}, {0, 0}},
    {{6, 8}, {5, 12}, {5, 14}, {4, 12}},
    {{7, 15}, {5, 10}, {5, 11}, {4, 11}},
    {{7, 11}, {5, 8}, {5, 9}, {4, 10}},
    {{7, 9}, {6, 14}, {6, 13}, {4, 9}},
    {{7, 8}, {6, 10}, {6, 9}, {4, 8}},
    {{8, 15}, {7, 14}, {7, 13}, {5, 13}},
    {{8, 11}, {8, 14}, {7, 10}, {6, 12}},
    {{9, 15}, {8, 10}, {8, 13}, {7, 12}},
    {{9, 11}, {9, 14}, {8, 9}, {8, 12}},
    {{9, 8}, {9, 10}, {9, 13}, {8, 8}},
    {{10, 13}, {9, 7}, {9, 9}, {9, 12}},
    {{10, 9}, {10, 12}, {10, 11}, {10, 10}},
    {{10, 5}, {10, 8}, {10, 7}, {10, 6}},
    {{10, 1}, {10, 4}, {10, 3}, {10, 2}}};
static const Vlc kCTC[5][4] = {  // chroma DC (nC == -1), 4:2:0
    {{2, 1}, {0, 0}, {0, 0}, {0, 0}},
    {{6, 7}, {1, 1}, {0, 0}, {0, 0}},
    {{6, 4}, {6, 6}, {3, 1}, {0, 0}},
    {{6, 3}, {7, 3}, {7, 2}, {6, 5}},
    {{6, 2}, {8, 3}, {8, 2}, {7, 0}}};

inline Vlc coeff_token_vlc(int nC, int tc, int t1) {
  if (nC == -1) return kCTC[tc][t1];
  if (nC < 2) return kCT0[tc][t1];
  if (nC < 4) return kCT1[tc][t1];
  if (nC < 8) return kCT2[tc][t1];
  // FLC: 6 bits; TotalCoeff==0 is the reserved value 3
  if (tc == 0) return Vlc{6, 3};
  return Vlc{6, (uint16_t)(((tc - 1) << 2) | t1)};
}

// Tables 9-7/9-8 total_zeros for 4x4 blocks; row = TotalCoeff-1,
// col = total_zeros.
static const Vlc kTZ[15][16] = {
    {{1, 1}, {3, 3}, {3, 2}, {4, 3}, {4, 2}, {5, 3}, {5, 2}, {6, 3},
     {6, 2}, {7, 3}, {7, 2}, {8, 3}, {8, 2}, {9, 3}, {9, 2}, {9, 1}},
    {{3, 7}, {3, 6}, {3, 5}, {3, 4}, {3, 3}, {4, 5}, {4, 4}, {4, 3},
     {4, 2}, {5, 3}, {5, 2}, {6, 3}, {6, 2}, {6, 1}, {6, 0}, {0, 0}},
    {{4, 5}, {3, 7}, {3, 6}, {3, 5}, {4, 4}, {4, 3}, {3, 4}, {3, 3},
     {4, 2}, {5, 3}, {5, 2}, {6, 1}, {5, 1}, {6, 0}, {0, 0}, {0, 0}},
    {{5, 3}, {3, 7}, {4, 5}, {4, 4}, {3, 6}, {3, 5}, {3, 4}, {4, 3},
     {3, 3}, {4, 2}, {5, 2}, {5, 1}, {5, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{4, 5}, {4, 4}, {4, 3}, {3, 7}, {3, 6}, {3, 5}, {3, 4}, {3, 3},
     {4, 2}, {5, 1}, {4, 1}, {5, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{6, 1}, {5, 1}, {3, 7}, {3, 6}, {3, 5}, {3, 4}, {3, 3}, {3, 2},
     {4, 1}, {3, 1}, {6, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{6, 1}, {5, 1}, {3, 5}, {3, 4}, {3, 3}, {2, 3}, {3, 2}, {4, 1},
     {3, 1}, {6, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{6, 1}, {4, 1}, {5, 1}, {3, 3}, {2, 3}, {2, 2}, {3, 2}, {3, 1},
     {6, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{6, 1}, {6, 0}, {4, 1}, {2, 3}, {2, 2}, {3, 1}, {2, 1}, {5, 1},
     {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{5, 1}, {5, 0}, {3, 1}, {2, 3}, {2, 2}, {2, 1}, {4, 1}, {0, 0},
     {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{4, 0}, {4, 1}, {3, 1}, {3, 2}, {1, 1}, {3, 3}, {0, 0}, {0, 0},
     {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{4, 0}, {4, 1}, {2, 1}, {1, 1}, {3, 1}, {0, 0}, {0, 0}, {0, 0},
     {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{3, 0}, {3, 1}, {1, 1}, {2, 1}, {0, 0}, {0, 0}, {0, 0}, {0, 0},
     {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{2, 0}, {2, 1}, {1, 1}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0},
     {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}},
    {{1, 0}, {1, 1}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0},
     {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}, {0, 0}}};

// Table 9-9(a): total_zeros for chroma DC (4:2:0); row = TotalCoeff-1.
static const Vlc kTZC[3][4] = {
    {{1, 1}, {2, 1}, {3, 1}, {3, 0}},
    {{1, 1}, {2, 1}, {2, 0}, {0, 0}},
    {{1, 1}, {1, 0}, {0, 0}, {0, 0}}};

// Table 9-10 run_before; row = min(zerosLeft,7)-1, col = run_before.
static const Vlc kRB[7][15] = {
    {{1, 1}, {1, 0}},
    {{1, 1}, {2, 1}, {2, 0}},
    {{2, 3}, {2, 2}, {2, 1}, {2, 0}},
    {{2, 3}, {2, 2}, {2, 1}, {3, 1}, {3, 0}},
    {{2, 3}, {2, 2}, {3, 3}, {3, 2}, {3, 1}, {3, 0}},
    {{2, 3}, {3, 0}, {3, 1}, {3, 3}, {3, 2}, {3, 5}, {3, 4}},
    {{3, 7}, {3, 6}, {3, 5}, {3, 4}, {3, 3}, {3, 2}, {3, 1}, {4, 1},
     {5, 1}, {6, 1}, {7, 1}, {8, 1}, {9, 1}, {10, 1}, {11, 1}}};

// Encode (bw != null) or cost (bw == null) one residual block with CAVLC
// (spec 9.2). zz: levels in scan order, length maxc (16 for full 4x4 /
// chroma-DC 4, 15 for AC-only). nC selects the coeff_token table (-1 for
// chroma DC). Returns the exact bit count; *tc_out (optional) receives
// TotalCoeff for the caller's nC bookkeeping.
int cavlc_block(BitWriter* bw, const int* zz, int maxc, int nC,
                int* tc_out = nullptr) {
  int pos[16], n = 0;
  for (int i = 0; i < maxc; ++i)
    if (zz[i]) pos[n++] = i;
  if (tc_out) *tc_out = n;
  int t1 = 0;
  while (t1 < 3 && t1 < n && std::abs(zz[pos[n - 1 - t1]]) == 1) ++t1;
  Vlc ct = coeff_token_vlc(nC, n, t1);
  int bits = ct.len;
  if (bw) bw->put(ct.val, ct.len);
  if (n == 0) return bits;
  for (int k = 0; k < t1; ++k) {  // trailing-one signs, high freq first
    bits += 1;
    if (bw) bw->put(zz[pos[n - 1 - k]] < 0 ? 1 : 0, 1);
  }
  int suffix_len = (n > 10 && t1 < 3) ? 1 : 0;
  for (int k = t1; k < n; ++k) {  // remaining levels, high freq first
    int level = zz[pos[n - 1 - k]];
    int code = level > 0 ? 2 * level - 2 : -2 * level - 1;
    if (k == t1 && t1 < 3) code -= 2;
    if (suffix_len == 0) {
      if (code < 14) {
        bits += code + 1;
        if (bw) bw->put(1, code + 1);
      } else if (code < 30) {
        bits += 15 + 4;
        if (bw) {
          bw->put(1, 15);
          bw->put((uint32_t)(code - 14), 4);
        }
      } else {
        bits += 16 + 12;
        if (bw) {
          bw->put(1, 16);
          bw->put((uint32_t)(code - 30), 12);
        }
      }
    } else {
      int prefix = code >> suffix_len;
      if (prefix < 15) {
        bits += prefix + 1 + suffix_len;
        if (bw) {
          bw->put(1, prefix + 1);
          bw->put((uint32_t)(code & ((1 << suffix_len) - 1)), suffix_len);
        }
      } else {
        bits += 16 + 12;
        if (bw) {
          bw->put(1, 16);
          bw->put((uint32_t)(code - (15 << suffix_len)), 12);
        }
      }
    }
    if (suffix_len == 0) suffix_len = 1;
    if (std::abs(level) > (3 << (suffix_len - 1)) && suffix_len < 6)
      ++suffix_len;
  }
  int total_zeros = pos[n - 1] + 1 - n;
  if (n < maxc) {
    Vlc tz = (nC == -1) ? kTZC[n - 1][total_zeros] : kTZ[n - 1][total_zeros];
    bits += tz.len;
    if (bw) bw->put(tz.val, tz.len);
  }
  int zeros_left = total_zeros;
  for (int k = n - 1; k > 0 && zeros_left > 0; --k) {
    int run = pos[k] - pos[k - 1] - 1;
    Vlc rb = kRB[std::min(zeros_left, 7) - 1][run];
    bits += rb.len;
    if (bw) bw->put(rb.val, rb.len);
    zeros_left -= run;
  }
  return bits;
}

// 4x4 zigzag scan (Figure 8-8): raster index of each scan position.
static const int kZig[16] = {0, 1, 4, 8, 5, 2, 3, 6,
                             9, 12, 13, 10, 7, 11, 14, 15};

// Levels are clamped so every levelCode fits CAVLC's 12-bit escape
// suffix (spec profile constraint; reachable only near QP 0 on
// pathological residuals, where the clamp costs a fraction of one
// quantization step).
inline int clamp_level(int z) { return z > 2047 ? 2047 : z; }

// quantize transformed coeffs w[start..15] -> dequantized raster wq AND
// the quantized levels in zigzag scan order zz[16] (scan positions below
// `start` forced to zero: start=1 is the AC-only path whose DC travels
// through a Hadamard side channel). Returns the nonzero-level count.
int quant4x4(const int w[16], int wq[16], int zz[16], int qp, int start) {
  int qbits = 15 + qp / 6, rem = qp % 6;
  int64_t f = (1LL << qbits) / 3;  // intra rounding offset
  int nz = 0;
  int lev[16];
  for (int i = 0; i < 4; ++i) {
    for (int j = 0; j < 4; ++j) {
      int idx = i * 4 + j;
      if (idx < start) {
        lev[idx] = 0;
        wq[idx] = 0;
        continue;
      }
      int c = pos_class(i, j);
      int64_t a = std::llabs((int64_t)w[idx]);
      int z = clamp_level((int)((a * kMF[rem][c] + f) >> qbits));
      if (z) ++nz;
      z = w[idx] < 0 ? -z : z;
      lev[idx] = z;
      wq[idx] = (z * kV[rem][c]) << (qp / 6);  // dequant
    }
  }
  for (int s = 0; s < 16; ++s) zz[s] = lev[kZig[s]];
  return nz;
}

// residual -> transform/quant/dequant/inverse -> reconstructed residual;
// fills the zigzag levels for CAVLC costing/writing, returns nnz.
int tq4x4(const int res[16], int rec[16], int zz[16], int qp) {
  int w[16], wq[16];
  fwd4x4(res, w);
  int nz = quant4x4(w, wq, zz, qp, 0);
  inv4x4(wq, rec);
  return nz;
}

// chroma-DC side path (spec 8.5.11 order): raw DC coefficients of the 4
// sub-blocks -> 2x2 Hadamard -> quant -> inverse Hadamard -> dequant,
// returning the scaled DC to inject into each block's inverse transform.
// levels[4] receives the quantized DC levels in coding (raster) order —
// exactly what ChromaDCLevel carries in the bitstream.
int chroma_dc(const int dc_in[4], int dc_out[4], int levels[4], int qp) {
  int qbits = 15 + qp / 6, rem = qp % 6;
  int64_t f = (1LL << qbits) / 3;
  int had[4] = {dc_in[0] + dc_in[1] + dc_in[2] + dc_in[3],
                dc_in[0] - dc_in[1] + dc_in[2] - dc_in[3],
                dc_in[0] + dc_in[1] - dc_in[2] - dc_in[3],
                dc_in[0] - dc_in[1] - dc_in[2] + dc_in[3]};
  int zq[4], nz = 0;
  for (int k = 0; k < 4; ++k) {
    int64_t a = std::llabs((int64_t)had[k]);
    int z = clamp_level((int)((a * kMF[rem][0] + 2 * f) >> (qbits + 1)));
    if (z) ++nz;
    zq[k] = had[k] < 0 ? -z : z;
    levels[k] = zq[k];
  }
  int ih[4] = {zq[0] + zq[1] + zq[2] + zq[3], zq[0] - zq[1] + zq[2] - zq[3],
               zq[0] + zq[1] - zq[2] - zq[3], zq[0] - zq[1] - zq[2] + zq[3]};
  for (int k = 0; k < 4; ++k) {
    if (qp >= 6)
      dc_out[k] = (ih[k] * kV[rem][0]) << (qp / 6 - 1);
    else
      dc_out[k] = (ih[k] * kV[rem][0]) >> 1;
  }
  return nz;
}

struct Plane {
  std::vector<uint8_t> d;
  int h, w;
  uint8_t at(int y, int x) const { return d[(size_t)y * w + x]; }
  uint8_t& at(int y, int x) { return d[(size_t)y * w + x]; }
};

// prediction neighbors relative to block origin (by, bx): p(-1,-1)=corner,
// p(x,-1)=above[x] (8 samples incl. above-right with the spec's
// p[3,-1] substitution), p(-1,y)=left[y].
struct Nbr {
  int above[8];
  int left[4];
  int corner;
  bool has_top, has_left;
};

// tr_ok: whether the above-right 4x4 block is already reconstructed in
// coding order (spec 6.4.11/8.3.1: under macroblock coding order the
// above-right neighbor of e.g. the 4th 4x4 block of an MB is NOT yet
// coded even though it is inside the frame; the caller derives this from
// its coded-block bitmap, which reproduces the spec availability table).
Nbr gather(const Plane& rec, int by, int bx, bool tr_ok) {
  Nbr n;
  n.has_top = by > 0;
  n.has_left = bx > 0;
  bool has_tr = tr_ok && by > 0 && bx + 4 < rec.w;
  for (int i = 0; i < 8; ++i) {
    int x = bx + i;
    if (i < 4)
      n.above[i] = n.has_top ? rec.at(by - 1, std::min(x, rec.w - 1)) : 128;
    else if (has_tr)
      n.above[i] = rec.at(by - 1, std::min(x, rec.w - 1));
    else if (n.has_top)
      n.above[i] = rec.at(by - 1, bx + 3);  // p[3,-1] substitution
    else
      n.above[i] = 128;
  }
  for (int i = 0; i < 4; ++i)
    n.left[i] =
        n.has_left ? rec.at(std::min(by + i, rec.h - 1), bx - 1) : 128;
  n.corner = (n.has_top && n.has_left) ? rec.at(by - 1, bx - 1) : 128;
  return n;
}

// 9 luma 4x4 prediction modes (spec 8.3.1.2). pred[16] row-major.
// Returns false if the mode's required neighbors are unavailable.
bool predict4(const Nbr& n, int mode, int pred[16]) {
  const int* t = n.above;
  const int* l = n.left;
  int m = n.corner;
  auto P = [&](int y, int x, int v) { pred[y * 4 + x] = v; };
  switch (mode) {
    case 0:  // vertical
      if (!n.has_top) return false;
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) P(y, x, t[x]);
      return true;
    case 1:  // horizontal
      if (!n.has_left) return false;
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) P(y, x, l[y]);
      return true;
    case 2: {  // DC (always available, with fallbacks)
      int v;
      if (n.has_top && n.has_left)
        v = (t[0] + t[1] + t[2] + t[3] + l[0] + l[1] + l[2] + l[3] + 4) >> 3;
      else if (n.has_top)
        v = (t[0] + t[1] + t[2] + t[3] + 2) >> 2;
      else if (n.has_left)
        v = (l[0] + l[1] + l[2] + l[3] + 2) >> 2;
      else
        v = 128;
      for (int i = 0; i < 16; ++i) pred[i] = v;
      return true;
    }
    case 3:  // diagonal down-left
      if (!n.has_top) return false;
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) {
          if (x == 3 && y == 3)
            P(y, x, (t[6] + 3 * t[7] + 2) >> 2);
          else
            P(y, x, (t[x + y] + 2 * t[x + y + 1] + t[x + y + 2] + 2) >> 2);
        }
      return true;
    case 4:  // diagonal down-right
      if (!(n.has_top && n.has_left)) return false;
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) {
          int k = x - y;
          if (k > 0)
            P(y, x,
              ((k >= 2 ? t[k - 2] : m) + 2 * t[k - 1] + t[k] + 2) >> 2);
          else if (k == 0)
            P(y, x, (t[0] + 2 * m + l[0] + 2) >> 2);
          else
            P(y, x,
              ((-k >= 2 ? l[-k - 2] : m) + 2 * l[-k - 1] + l[-k] + 2) >> 2);
        }
      return true;
    case 5:  // vertical-right
      if (!(n.has_top && n.has_left)) return false;
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) {
          int z = 2 * x - y;
          int i = x - (y >> 1);
          if (z >= 0 && (z & 1) == 0)
            P(y, x, ((i >= 1 ? t[i - 1] : m) + t[i] + 1) >> 1);
          else if (z >= 1)
            P(y, x, ((i >= 2 ? t[i - 2] : m) + 2 * (i >= 1 ? t[i - 1] : m) +
                     t[i] + 2) >> 2);
          else if (z == -1)
            P(y, x, (l[0] + 2 * m + t[0] + 2) >> 2);
          else
            P(y, x, (l[y - 2 * x - 1] + 2 * l[y - 2 * x - 2] +
                     (y - 2 * x - 3 >= 0 ? l[y - 2 * x - 3] : m) + 2) >> 2);
        }
      return true;
    case 6:  // horizontal-down
      if (!(n.has_top && n.has_left)) return false;
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) {
          int z = 2 * y - x;
          int i = y - (x >> 1);
          if (z >= 0 && (z & 1) == 0)
            P(y, x, ((i >= 1 ? l[i - 1] : m) + l[i] + 1) >> 1);
          else if (z >= 1)
            P(y, x, ((i >= 2 ? l[i - 2] : m) + 2 * (i >= 1 ? l[i - 1] : m) +
                     l[i] + 2) >> 2);
          else if (z == -1)
            P(y, x, (t[0] + 2 * m + l[0] + 2) >> 2);
          else
            P(y, x, (t[x - 2 * y - 1] + 2 * t[x - 2 * y - 2] +
                     (x - 2 * y - 3 >= 0 ? t[x - 2 * y - 3] : m) + 2) >> 2);
        }
      return true;
    case 7:  // vertical-left
      if (!n.has_top) return false;
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) {
          int i = x + (y >> 1);
          if ((y & 1) == 0)
            P(y, x, (t[i] + t[i + 1] + 1) >> 1);
          else
            P(y, x, (t[i] + 2 * t[i + 1] + t[i + 2] + 2) >> 2);
        }
      return true;
    case 8:  // horizontal-up
      if (!n.has_left) return false;
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x) {
          int z = x + 2 * y;
          int i = y + (x >> 1);
          if (z > 5)
            P(y, x, l[3]);
          else if (z == 5)
            P(y, x, (l[2] + 3 * l[3] + 2) >> 2);
          else if ((z & 1) == 0)
            P(y, x, (l[i] + l[i + 1] + 1) >> 1);
          else
            P(y, x, (l[i] + 2 * l[i + 1] + l[i + 2] + 2) >> 2);
        }
      return true;
  }
  return false;
}

// 16x16 luma intra prediction (spec 8.3.3): 0=V, 1=H, 2=DC, 3=plane.
// Reads only samples OUTSIDE the macroblock (above row / left column of
// previously coded MBs). Returns false when required neighbors are
// unavailable.
bool predict16(const Plane& rec, int by, int bx, int mode, int pred[256]) {
  bool has_top = by > 0, has_left = bx > 0;
  int t[16], l[16];
  for (int i = 0; i < 16; ++i) {
    t[i] = has_top ? rec.at(by - 1, std::min(bx + i, rec.w - 1)) : 0;
    l[i] = has_left ? rec.at(std::min(by + i, rec.h - 1), bx - 1) : 0;
  }
  switch (mode) {
    case 0:  // vertical
      if (!has_top) return false;
      for (int y = 0; y < 16; ++y)
        for (int x = 0; x < 16; ++x) pred[y * 16 + x] = t[x];
      return true;
    case 1:  // horizontal
      if (!has_left) return false;
      for (int y = 0; y < 16; ++y)
        for (int x = 0; x < 16; ++x) pred[y * 16 + x] = l[y];
      return true;
    case 2: {  // DC with the spec's availability fallbacks
      int st = 0, sl = 0, v;
      for (int i = 0; i < 16; ++i) {
        st += t[i];
        sl += l[i];
      }
      if (has_top && has_left)
        v = (st + sl + 16) >> 5;
      else if (has_top)
        v = (st + 8) >> 4;
      else if (has_left)
        v = (sl + 8) >> 4;
      else
        v = 128;
      for (int i = 0; i < 256; ++i) pred[i] = v;
      return true;
    }
    case 3: {  // plane (spec 8.3.3.4)
      if (!(has_top && has_left)) return false;
      int m = rec.at(by - 1, bx - 1);
      int H = 0, V = 0;
      for (int i = 0; i < 8; ++i) {
        H += (i + 1) * (t[8 + i] - (i == 7 ? m : t[6 - i]));
        V += (i + 1) * (l[8 + i] - (i == 7 ? m : l[6 - i]));
      }
      int a = 16 * (l[15] + t[15]);
      int b = (5 * H + 32) >> 6, c = (5 * V + 32) >> 6;
      for (int y = 0; y < 16; ++y)
        for (int x = 0; x < 16; ++x)
          pred[y * 16 + x] =
              clip255((a + b * (x - 7) + c * (y - 7) + 16) >> 5);
      return true;
    }
  }
  return false;
}

// 4x4 Hadamard of the 16 luma-DC terms. Forward includes the encoder's
// /2 pre-scale (JM dct_luma_16x16 / x264 dct4x4dc); inverse is the plain
// +-1 butterfly — together with the (qbits+1) quant shift and the
// (spec 8.5.10) <<(qp/6-2) dequant this reconstructs DC at the same
// scale the 4x4 inverse transform expects (verified: flat frames at QP0
// round-trip losslessly).
void hadamard_dc_fwd(const int in[16], int out[16]) {
  int tmp[16];
  for (int i = 0; i < 4; ++i) {
    const int* r = &in[i * 4];
    int s03 = r[0] + r[3], d03 = r[0] - r[3];
    int s12 = r[1] + r[2], d12 = r[1] - r[2];
    tmp[i * 4 + 0] = s03 + s12;
    tmp[i * 4 + 1] = d03 + d12;
    tmp[i * 4 + 2] = s03 - s12;
    tmp[i * 4 + 3] = d03 - d12;
  }
  for (int j = 0; j < 4; ++j) {
    int c0 = tmp[j], c1 = tmp[4 + j], c2 = tmp[8 + j], c3 = tmp[12 + j];
    int s03 = c0 + c3, d03 = c0 - c3;
    int s12 = c1 + c2, d12 = c1 - c2;
    out[0 * 4 + j] = (s03 + s12) >> 1;
    out[1 * 4 + j] = (d03 + d12) >> 1;
    out[2 * 4 + j] = (s03 - s12) >> 1;
    out[3 * 4 + j] = (d03 - d12) >> 1;
  }
}

void hadamard_dc_inv(const int in[16], int out[16]) {
  int tmp[16];
  for (int i = 0; i < 4; ++i) {
    const int* r = &in[i * 4];
    int s03 = r[0] + r[3], d03 = r[0] - r[3];
    int s12 = r[1] + r[2], d12 = r[1] - r[2];
    tmp[i * 4 + 0] = s03 + s12;
    tmp[i * 4 + 1] = d03 + d12;
    tmp[i * 4 + 2] = s03 - s12;
    tmp[i * 4 + 3] = d03 - d12;
  }
  for (int j = 0; j < 4; ++j) {
    int c0 = tmp[j], c1 = tmp[4 + j], c2 = tmp[8 + j], c3 = tmp[12 + j];
    int s03 = c0 + c3, d03 = c0 - c3;
    int s12 = c1 + c2, d12 = c1 - c2;
    out[0 * 4 + j] = s03 + s12;
    out[1 * 4 + j] = d03 + d12;
    out[2 * 4 + j] = s03 - s12;
    out[3 * 4 + j] = d03 - d12;
  }
}

// 4x4 luma blocks of an MB in the spec's coding order (6.4.3 inverse
// 4x4 luma block scan): Z order of 8x8 quadrants, Z order inside each.
static const int kZX[16] = {0, 4, 0, 4, 8, 12, 8, 12,
                            0, 4, 0, 4, 8, 12, 8, 12};
static const int kZY[16] = {0, 0, 4, 4, 0, 0, 4, 4,
                            8, 8, 12, 12, 8, 8, 12, 12};

struct LumaStats {
  long long n_mb = 0, n_i16 = 0, nnz = 0;
};

// Per-macroblock syntax record: everything macroblock_layer (7.3.5)
// needs, captured during encoding and serialized by write_slice_data.
struct MBRec {
  uint8_t i16 = 0;          // 1 = Intra_16x16, 0 = Intra_4x4
  uint8_t i16_mode = 0;     // 0=V 1=H 2=DC 3=plane (spec numbering)
  int8_t modes4[16];        // Intra_4x4 modes in 4x4 scan order
  uint8_t cbp_luma = 0;     // 4 bits (I4x4 8x8 quadrants) or 0/15 (I16)
  uint8_t cbp_chroma = 0;   // 0 none / 1 DC only / 2 DC+AC
  uint8_t chroma_mode = 0;  // 0=DC 1=H 2=V 3=plane (spec 7.4.5 numbering)
  int16_t luma_zz[16][16];  // per 4x4 block (scan order), zigzag levels;
                            // I16: AC levels live at zigzag 1..15
  int16_t dc_zz[16];        // I16 luma DC levels, zigzag of the 4x4 grid
  int16_t cdc[2][4];        // chroma DC levels per plane, coding order
  int16_t cac_zz[2][4][16];  // chroma AC per plane / raster 4x4 / zigzag
};

// Table 9-4, intra column: coded_block_pattern -> Exp-Golomb codeNum
// (inverse of the decoder's codeNum -> cbp mapping).
static const uint8_t kCodeToIntraCbp[48] = {
    47, 31, 15, 0,  23, 27, 29, 30, 7,  11, 13, 14, 39, 43, 45, 46,
    16, 3,  5,  10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1,  2,  4,
    8,  17, 18, 20, 24, 6,  9,  22, 25, 32, 33, 34, 36, 40, 38, 41};
inline int intra_cbp_code(int cbp) {
  static int inv[48];
  static bool init = false;
  if (!init) {
    for (int i = 0; i < 48; ++i) inv[kCodeToIntraCbp[i]] = i;
    init = true;
  }
  return inv[cbp];
}

// nC for coeff_token (spec 9.2.1): mean of the available left/above
// blocks' TotalCoeff. tc maps are per-4x4-block planes; -1 = outside
// picture.
inline int derive_nC(int nA, int nB) {
  if (nA >= 0 && nB >= 0) return (nA + nB + 1) >> 1;
  if (nA >= 0) return nA;
  if (nB >= 0) return nB;
  return 0;
}

// local 4x4 block coords (row, col) -> scan index (inverse of kZX/kZY)
static const int kScanOf[4][4] = {
    {0, 1, 4, 5}, {2, 3, 6, 7}, {8, 9, 12, 13}, {10, 11, 14, 15}};

// Encode the luma plane in macroblock raster order, mirroring the JM
// encoder_baseline.cfg configuration the reference drives
// (RDOptimization=1): per-MB choice between Intra_4x4 (9 modes per
// block, most-probable-mode signalling) and Intra_16x16 (4 modes, DC
// Hadamard stage) by rate-distortion cost SSD + lambda*R with JM's
// lambda_mode = 0.85 * 2^((QP-12)/3). R is the table-exact CAVLC bit
// count (coeff_token with neighbor-derived nC, levels, total_zeros,
// run_before) plus the exact mode/cbp/qp-delta signalling bits — the
// chroma contribution to cbp/mb_type is not yet known in this pass and
// is costed as zero (the one rate approximation left; JM folds chroma
// into the same decision). When `recs` is given, every macroblock's
// syntax elements are recorded for bitstream serialization.
void code_luma(Plane& rec, const std::vector<int>& src, int qp,
               LumaStats* st = nullptr, std::vector<MBRec>* recs = nullptr) {
  int bw = rec.w / 4, bh = rec.h / 4;
  int mbw = rec.w / 16;
  std::vector<uint8_t> coded((size_t)bw * bh, 0);
  std::vector<int8_t> mode4((size_t)bw * bh, 2);
  std::vector<int16_t> ltc((size_t)bw * bh, 0);  // TotalCoeff per 4x4
  double lambda = 0.85 * std::pow(2.0, (qp - 12) / 3.0);

  for (int my = 0; my < rec.h; my += 16) {
    for (int mx = 0; mx < rec.w; mx += 16) {
      int mby = my / 4, mbx = mx / 4;  // MB origin in 4x4-block coords
      uint8_t tcf[16] = {0};           // trial coded flags, scan order
      int tmodes[16];
      int ttc4[16] = {0};      // trial TotalCoeff per block, scan order
      int tzz4[16][16];        // trial zigzag levels, scan order
      auto blk_coded = [&](int byy, int bxx) -> bool {
        if (byy < 0 || bxx < 0 || byy >= bh || bxx >= bw) return false;
        if (byy >= mby && byy < mby + 4 && bxx >= mbx && bxx < mbx + 4)
          return tcf[kScanOf[byy - mby][bxx - mbx]] != 0;
        return coded[(size_t)byy * bw + bxx] != 0;
      };
      auto blk_mode = [&](int byy, int bxx) -> int {
        if (byy < 0 || bxx < 0) return -1;  // outside picture
        if (byy >= mby && byy < mby + 4 && bxx >= mbx && bxx < mbx + 4)
          return tmodes[kScanOf[byy - mby][bxx - mbx]];
        return mode4[(size_t)byy * bw + bxx];
      };
      auto blk_tc4 = [&](int byy, int bxx) -> int {
        if (byy < 0 || bxx < 0) return -1;  // outside picture
        if (byy >= mby && byy < mby + 4 && bxx >= mbx && bxx < mbx + 4)
          return ttc4[kScanOf[byy - mby][bxx - mbx]];
        return ltc[(size_t)byy * bw + bxx];
      };

      // ---- Intra_4x4 trial: sequential in scan order, reconstructing
      // into `rec` so later blocks predict from the trial reconstruction
      double cost4 = lambda * 1.0;  // mb_type ue(0)
      long long nnz4 = 0;
      int nC4[16];  // per-block nC, for the empty-quadrant rate rebate
      for (int b = 0; b < 16; ++b) {
        int bx = mx + kZX[b], by = my + kZY[b];
        bool tr = blk_coded(by / 4 - 1, bx / 4 + 1);
        Nbr n = gather(rec, by, bx, tr);
        int ml = blk_mode(by / 4, bx / 4 - 1);
        int ma = blk_mode(by / 4 - 1, bx / 4);
        int mpm = (ml < 0 || ma < 0) ? 2 : std::min(ml, ma);
        int nC = derive_nC(blk_tc4(by / 4, bx / 4 - 1),
                           blk_tc4(by / 4 - 1, bx / 4));
        nC4[b] = nC;
        int blk[16];
        for (int y = 0; y < 4; ++y)
          for (int x = 0; x < 4; ++x)
            blk[y * 4 + x] = src[(size_t)(by + y) * rec.w + bx + x];
        double best_cost = 1e30;
        int best_mode = 2, best_rec[16] = {0}, best_zz[16] = {0};
        int best_nnz = 0;
        for (int mode = 0; mode < 9; ++mode) {
          int pred[16];
          if (!predict4(n, mode, pred)) continue;
          int res[16], rres[16], zz[16];
          for (int i = 0; i < 16; ++i) res[i] = blk[i] - pred[i];
          int nnz = tq4x4(res, rres, zz, qp);
          int rbits = cavlc_block(nullptr, zz, 16, nC);
          double ssd = 0;
          int rc[16];
          for (int i = 0; i < 16; ++i) {
            rc[i] = clip255(pred[i] + rres[i]);
            double d = blk[i] - rc[i];
            ssd += d * d;
          }
          double cost =
              ssd + lambda * (rbits + (mode == mpm ? 1 : 4));
          if (cost < best_cost) {
            best_cost = cost;
            best_mode = mode;
            best_nnz = nnz;
            std::memcpy(best_rec, rc, sizeof(rc));
            std::memcpy(best_zz, zz, sizeof(zz));
          }
        }
        cost4 += best_cost;
        tmodes[b] = best_mode;
        tcf[b] = 1;
        ttc4[b] = best_nnz;
        std::memcpy(tzz4[b], best_zz, sizeof(best_zz));
        nnz4 += best_nnz;
        for (int y = 0; y < 4; ++y)
          for (int x = 0; x < 4; ++x)
            rec.at(by + y, bx + x) = (uint8_t)best_rec[y * 4 + x];
      }
      // cbp (luma nibble; chroma part unknown in this pass) + qp_delta
      int cbp4 = 0;
      for (int b = 0; b < 16; ++b)
        if (ttc4[b])
          cbp4 |= 1 << ((kZY[b] / 8) * 2 + kZX[b] / 8);
      cost4 += lambda * (ue_len(intra_cbp_code(cbp4)) + (cbp4 ? 1 : 0));
      // blocks inside an empty 8x8 quadrant are never written (the cbp
      // bit gates them): rebate their zero-coeff_token bits
      for (int b = 0; b < 16; ++b)
        if (!((cbp4 >> ((kZY[b] / 8) * 2 + kZX[b] / 8)) & 1))
          cost4 -= lambda * coeff_token_vlc(nC4[b], 0, 0).len;

      // ---- Intra_16x16 trial: reads only outside the MB, reconstructs
      // into a scratch buffer
      double cost16 = 1e30;
      long long nnz16 = 0;
      uint8_t rec16[256];
      int best16_mode = 2, best16_cbp = 0;
      int best16_dczz[16], best16_zz[16][16], best16_tc[16];  // raster
      auto ext_tc = [&](int byy, int bxx) -> int {
        if (byy < 0 || bxx < 0) return -1;
        return ltc[(size_t)byy * bw + bxx];
      };
      for (int mode = 0; mode < 4; ++mode) {
        int pred[256];
        if (!predict16(rec, my, mx, mode, pred)) continue;
        int wblk[16][16], dc_raw[16];
        for (int sb = 0; sb < 16; ++sb) {  // raster 4x4 grid for DC order
          int oy = (sb / 4) * 4, ox = (sb % 4) * 4;
          int res[16];
          for (int y = 0; y < 4; ++y)
            for (int x = 0; x < 4; ++x)
              res[y * 4 + x] =
                  src[(size_t)(my + oy + y) * rec.w + mx + ox + x] -
                  pred[(oy + y) * 16 + ox + x];
          fwd4x4(res, wblk[sb]);
          dc_raw[sb] = wblk[sb][0];
        }
        // DC side path: /2 Hadamard -> quant(qbits+1) -> inverse
        // Hadamard -> spec 8.5.10 scaling at kV scale: <<(qp/6-2)
        int had[16], zq[16];
        hadamard_dc_fwd(dc_raw, had);
        int qbits = 15 + qp / 6, rem = qp % 6;
        int64_t f = (1LL << qbits) / 3;
        long long nnz = 0;
        for (int k = 0; k < 16; ++k) {
          int64_t a = std::llabs((int64_t)had[k]);
          int z = clamp_level((int)((a * kMF[rem][0] + 2 * f) >>
                                    (qbits + 1)));
          if (z) ++nnz;
          zq[k] = had[k] < 0 ? -z : z;
        }
        int dczz[16];
        for (int s = 0; s < 16; ++s) dczz[s] = zq[kZig[s]];
        int ih[16];
        hadamard_dc_inv(zq, ih);
        int shift = qp / 6;
        double ssd = 0;
        uint8_t trec[256];
        int zz16[16][16], tc16[16];  // raster-indexed
        for (int sb = 0; sb < 16; ++sb) {
          int oy = (sb / 4) * 4, ox = (sb % 4) * 4;
          int wq[16];
          tc16[sb] = quant4x4(wblk[sb], wq, zz16[sb], qp, 1);
          nnz += tc16[sb];
          int dci = ih[(sb / 4) * 4 + (sb % 4)];
          wq[0] = shift >= 2
                      ? (dci * kV[rem][0]) << (shift - 2)
                      : (dci * kV[rem][0] + (1 << (1 - shift))) >>
                            (2 - shift);
          int rres[16];
          inv4x4(wq, rres);
          for (int y = 0; y < 4; ++y)
            for (int x = 0; x < 4; ++x) {
              int rc = clip255(pred[(oy + y) * 16 + ox + x] +
                               rres[y * 4 + x]);
              trec[(oy + y) * 16 + ox + x] = (uint8_t)rc;
              double d =
                  src[(size_t)(my + oy + y) * rec.w + mx + ox + x] - rc;
              ssd += d * d;
            }
        }
        int cbpL = 0;
        for (int sb = 0; sb < 16; ++sb)
          if (tc16[sb]) cbpL = 15;
        // exact rate: mb_type (chroma cbp costed 0) + qp_delta + DC +
        // (cbp-gated) AC blocks with neighbor-derived nC
        int bits = ue_len(1 + mode + 12 * (cbpL ? 1 : 0)) + 1;
        auto blk_tc16 = [&](int byy, int bxx) -> int {
          if (byy < 0 || bxx < 0) return -1;
          if (byy >= mby && byy < mby + 4 && bxx >= mbx && bxx < mbx + 4)
            return tc16[(byy - mby) * 4 + (bxx - mbx)];
          return ltc[(size_t)byy * bw + bxx];
        };
        bits += cavlc_block(nullptr, dczz, 16,
                            derive_nC(ext_tc(mby, mbx - 1),
                                      ext_tc(mby - 1, mbx)));
        if (cbpL)
          for (int sb = 0; sb < 16; ++sb) {
            int byy = mby + sb / 4, bxx = mbx + sb % 4;
            int nC = derive_nC(blk_tc16(byy, bxx - 1),
                               blk_tc16(byy - 1, bxx));
            bits += cavlc_block(nullptr, &zz16[sb][1], 15, nC);
          }
        double cost = ssd + lambda * bits;
        if (cost < cost16) {
          cost16 = cost;
          nnz16 = nnz;
          best16_mode = mode;
          best16_cbp = cbpL;
          std::memcpy(rec16, trec, sizeof(trec));
          std::memcpy(best16_dczz, dczz, sizeof(dczz));
          std::memcpy(best16_zz, zz16, sizeof(zz16));
          std::memcpy(best16_tc, tc16, sizeof(tc16));
        }
      }

      // ---- MB-level decision
      if (st) ++st->n_mb;
      MBRec* mr = recs ? &(*recs)[(size_t)(my / 16) * mbw + mx / 16]
                       : nullptr;
      if (cost16 < cost4) {
        if (st) {
          ++st->n_i16;
          st->nnz += nnz16;
        }
        for (int y = 0; y < 16; ++y)
          for (int x = 0; x < 16; ++x)
            rec.at(my + y, mx + x) = rec16[y * 16 + x];
        for (int b = 0; b < 16; ++b) {
          int row = kZY[b] / 4, col = kZX[b] / 4;
          size_t pos = (size_t)(mby + row) * bw + mbx + col;
          mode4[pos] = 2;  // I16 neighbors count as DC (spec)
          ltc[pos] = (int16_t)best16_tc[row * 4 + col];  // AC TotalCoeff
        }
        if (mr) {
          mr->i16 = 1;
          mr->i16_mode = (uint8_t)best16_mode;
          mr->cbp_luma = (uint8_t)best16_cbp;
          for (int s = 0; s < 16; ++s)
            mr->dc_zz[s] = (int16_t)best16_dczz[s];
          for (int b = 0; b < 16; ++b) {
            int sb = (kZY[b] / 4) * 4 + kZX[b] / 4;  // scan -> raster
            for (int s = 0; s < 16; ++s)
              mr->luma_zz[b][s] = (int16_t)best16_zz[sb][s];
          }
        }
      } else {
        if (st) st->nnz += nnz4;
        for (int b = 0; b < 16; ++b) {
          size_t pos = (size_t)(mby + kZY[b] / 4) * bw + mbx + kZX[b] / 4;
          mode4[pos] = (int8_t)tmodes[b];
          ltc[pos] = (int16_t)ttc4[b];
        }
        if (mr) {
          mr->i16 = 0;
          mr->cbp_luma = (uint8_t)cbp4;
          for (int b = 0; b < 16; ++b) {
            mr->modes4[b] = (int8_t)tmodes[b];
            for (int s = 0; s < 16; ++s)
              mr->luma_zz[b][s] = (int16_t)tzz4[b][s];
          }
        }
      }
      for (int b = 0; b < 16; ++b)
        coded[(size_t)(mby + kZY[b] / 4) * bw + mbx + kZX[b] / 4] = 1;
    }
  }
}

// 8x8 chroma prediction (spec 8.3.4): DC per quadrant, H, V, plane.
void predict_chroma(const Plane& rec, int by, int bx, int mode,
                    int pred[64]) {
  bool has_top = by > 0, has_left = bx > 0;
  int t[8], l[8];
  for (int i = 0; i < 8; ++i) {
    t[i] = has_top ? rec.at(by - 1, std::min(bx + i, rec.w - 1)) : 128;
    l[i] = has_left ? rec.at(std::min(by + i, rec.h - 1), bx - 1) : 128;
  }
  if (mode == 1) {  // horizontal
    for (int y = 0; y < 8; ++y)
      for (int x = 0; x < 8; ++x) pred[y * 8 + x] = l[y];
    return;
  }
  if (mode == 2) {  // vertical
    for (int y = 0; y < 8; ++y)
      for (int x = 0; x < 8; ++x) pred[y * 8 + x] = t[x];
    return;
  }
  if (mode == 3) {  // plane (spec 8.3.4.4)
    int corner = (has_top && has_left) ? rec.at(by - 1, bx - 1) : 128;
    int hsum = 0, vsum = 0;
    for (int i = 0; i < 4; ++i) {
      hsum += (i + 1) * (t[4 + i] - (i < 3 ? t[2 - i] : corner));
      vsum += (i + 1) * (l[4 + i] - (i < 3 ? l[2 - i] : corner));
    }
    int a = 16 * (l[7] + t[7]);
    int b = (17 * hsum + 16) >> 5;
    int c = (17 * vsum + 16) >> 5;
    for (int y = 0; y < 8; ++y)
      for (int x = 0; x < 8; ++x)
        pred[y * 8 + x] =
            clip255((a + b * (x - 3) + c * (y - 3) + 16) >> 5);
    return;
  }
  // DC per 4x4 quadrant (spec 8.3.4.1: corner quadrants prefer their
  // adjacent edge)
  for (int qy = 0; qy < 2; ++qy) {
    for (int qx = 0; qx < 2; ++qx) {
      int st = 0, sl = 0, v;
      for (int i = 0; i < 4; ++i) {
        st += t[qx * 4 + i];
        sl += l[qy * 4 + i];
      }
      if (qx == 1 && qy == 0 && has_top)
        v = (st + 2) >> 2;
      else if (qx == 0 && qy == 1 && has_left)
        v = (sl + 2) >> 2;
      else if (has_top && has_left)
        v = (st + sl + 4) >> 3;
      else if (has_top)
        v = (st + 2) >> 2;
      else if (has_left)
        v = (sl + 2) >> 2;
      else
        v = 128;
      for (int y = 0; y < 4; ++y)
        for (int x = 0; x < 4; ++x)
          pred[(qy * 4 + y) * 8 + qx * 4 + x] = v;
    }
  }
}

// Chroma coding with ONE shared prediction mode per macroblock covering
// BOTH planes (spec 7.4.5: intra_chroma_pred_mode is an MB-level field;
// the previous per-plane independent choice was a JM deviation), chosen
// by the same SSD + lambda*R criterion as luma with table-exact CAVLC
// rate (DC under the nC=-1 table, AC with neighbor-derived nC, gated by
// the resulting chroma cbp class). DC coefficients go through the 2x2
// Hadamard side path, AC through the normal quant. Fills the chroma
// fields of `recs` when given.
void code_chroma_joint(Plane& cb, Plane& cr, const std::vector<int>& scb,
                       const std::vector<int>& scr, int qp_luma,
                       std::vector<MBRec>* recs = nullptr) {
  int qp = chroma_qp(qp_luma);
  double lambda = 0.85 * std::pow(2.0, (qp_luma - 12) / 3.0);
  int cbw = cb.w / 4, cbh = cb.h / 4;  // 4x4-block grid
  int mbw = cb.w / 8;
  std::vector<int16_t> ctc[2];  // TotalCoeff per 4x4 block, per plane
  ctc[0].assign((size_t)cbw * cbh, 0);
  ctc[1].assign((size_t)cbw * cbh, 0);
  for (int by = 0; by < cb.h; by += 8) {
    for (int bx = 0; bx < cb.w; bx += 8) {
      int cby = by / 4, cbx = bx / 4;  // MB origin in 4x4-block coords
      bool has_top = by > 0, has_left = bx > 0;
      double best_cost = 1e30;
      uint8_t best_rec[2][64];
      int best_mode = 0, best_cbp = 0;
      int best_dc[2][4] = {{0}}, best_ac[2][4][16],
          best_tc[2][4] = {{0}};
      std::memset(best_ac, 0, sizeof(best_ac));
      for (int mode = 0; mode < 4; ++mode) {
        if (mode == 1 && !has_left) continue;
        if (mode == 2 && !has_top) continue;
        if (mode == 3 && !(has_top && has_left)) continue;
        double ssd = 0;
        uint8_t trec[2][64];
        int dlev[2][4], aczz[2][4][16], actc[2][4];
        int any_dc = 0, any_ac = 0;
        for (int pl = 0; pl < 2; ++pl) {
          Plane& rp = pl ? cr : cb;
          const std::vector<int>& sp = pl ? scr : scb;
          int pred[64];
          predict_chroma(rp, by, bx, mode, pred);
          int dc_raw[4], w4[4][16], res[16];
          for (int sb = 0; sb < 4; ++sb) {
            int oy = (sb >> 1) * 4, ox = (sb & 1) * 4;
            for (int y = 0; y < 4; ++y)
              for (int x = 0; x < 4; ++x)
                res[y * 4 + x] =
                    (int)sp[(size_t)(by + oy + y) * rp.w + bx + ox + x] -
                    pred[(oy + y) * 8 + ox + x];
            fwd4x4(res, w4[sb]);
            dc_raw[sb] = w4[sb][0];
          }
          int dc_scaled[4];
          any_dc += chroma_dc(dc_raw, dc_scaled, dlev[pl], qp);
          for (int sb = 0; sb < 4; ++sb) {
            int oy = (sb >> 1) * 4, ox = (sb & 1) * 4;
            int wq[16];
            actc[pl][sb] = quant4x4(w4[sb], wq, aczz[pl][sb], qp, 1);
            any_ac += actc[pl][sb];
            wq[0] = dc_scaled[sb];
            int rres[16];
            inv4x4(wq, rres);
            for (int y = 0; y < 4; ++y)
              for (int x = 0; x < 4; ++x) {
                int rc = clip255(pred[(oy + y) * 8 + ox + x] +
                                 rres[y * 4 + x]);
                trec[pl][(oy + y) * 8 + ox + x] = (uint8_t)rc;
                double d =
                    sp[(size_t)(by + oy + y) * rp.w + bx + ox + x] - rc;
                ssd += d * d;
              }
          }
        }
        int cbpC = any_ac ? 2 : (any_dc ? 1 : 0);
        int bits = ue_len((uint32_t)mode);
        if (cbpC >= 1)
          for (int pl = 0; pl < 2; ++pl)
            bits += cavlc_block(nullptr, dlev[pl], 4, -1);
        if (cbpC == 2) {
          auto blk_tcc = [&](int pl, int byy, int bxx) -> int {
            if (byy < 0 || bxx < 0) return -1;
            if (byy >= cby && byy < cby + 2 && bxx >= cbx &&
                bxx < cbx + 2)
              return actc[pl][(byy - cby) * 2 + (bxx - cbx)];
            return ctc[pl][(size_t)byy * cbw + bxx];
          };
          for (int pl = 0; pl < 2; ++pl)
            for (int sb = 0; sb < 4; ++sb) {
              int byy = cby + sb / 2, bxx = cbx + sb % 2;
              int nC = derive_nC(blk_tcc(pl, byy, bxx - 1),
                                 blk_tcc(pl, byy - 1, bxx));
              bits += cavlc_block(nullptr, &aczz[pl][sb][1], 15, nC);
            }
        }
        double cost = ssd + lambda * bits;
        if (cost < best_cost) {
          best_cost = cost;
          best_mode = mode;
          best_cbp = cbpC;
          std::memcpy(best_rec, trec, sizeof(trec));
          std::memcpy(best_dc, dlev, sizeof(dlev));
          std::memcpy(best_ac, aczz, sizeof(aczz));
          std::memcpy(best_tc, actc, sizeof(actc));
        }
      }
      for (int pl = 0; pl < 2; ++pl) {
        Plane& rp = pl ? cr : cb;
        for (int y = 0; y < 8; ++y)
          for (int x = 0; x < 8; ++x)
            rp.at(by + y, bx + x) = best_rec[pl][y * 8 + x];
        for (int sb = 0; sb < 4; ++sb)
          ctc[pl][(size_t)(cby + sb / 2) * cbw + cbx + sb % 2] =
              (int16_t)(best_cbp == 2 ? best_tc[pl][sb] : 0);
      }
      if (recs) {
        MBRec& mr = (*recs)[(size_t)(by / 8) * mbw + bx / 8];
        mr.chroma_mode = (uint8_t)best_mode;
        mr.cbp_chroma = (uint8_t)best_cbp;
        for (int pl = 0; pl < 2; ++pl)
          for (int sb = 0; sb < 4; ++sb) {
            mr.cdc[pl][sb] = (int16_t)best_dc[pl][sb];
            for (int s = 0; s < 16; ++s)
              mr.cac_zz[pl][sb][s] =
                  (int16_t)(best_cbp == 2 ? best_ac[pl][sb][s] : 0);
          }
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Bitstream serialization (7.3): slice_data from the MBRec records, and
// the SPS/PPS/IDR-slice RBSPs of the all-intra constrained-baseline
// stream. Verified bit-exact against libavcodec's H.264 decoder
// (tests/test_native.py::test_native_h264_bitstream_*).
// ---------------------------------------------------------------------------

void write_slice_data(BitWriter& bwr, const std::vector<MBRec>& recs,
                      int mbw, int mbh) {
  int bw = mbw * 4, bh = mbh * 4;
  std::vector<int8_t> mode4((size_t)bw * bh, 2);
  std::vector<int16_t> ltc((size_t)bw * bh, 0);
  int cbw = mbw * 2, cbh = mbh * 2;
  std::vector<int16_t> ctc[2];
  ctc[0].assign((size_t)cbw * cbh, 0);
  ctc[1].assign((size_t)cbw * cbh, 0);
  auto nb_ltc = [&](int byy, int bxx) -> int {  // committed-as-written
    if (byy < 0 || bxx < 0) return -1;
    return ltc[(size_t)byy * bw + bxx];
  };
  int zz[16];
  for (int m = 0; m < mbw * mbh; ++m) {
    const MBRec& r = recs[m];
    int mby = (m / mbw) * 4, mbx = (m % mbw) * 4;  // luma 4x4 coords
    int cby = (m / mbw) * 2, cbx = (m % mbw) * 2;  // chroma 4x4 coords
    // mb_type (7.4.5 Table 7-11: I_4x4 = 0; I_16x16 encodes pred mode
    // and both cbp classes)
    if (r.i16) {
      bwr.put_ue(1 + r.i16_mode + 4 * r.cbp_chroma +
                 12 * (r.cbp_luma ? 1 : 0));
    } else {
      bwr.put_ue(0);
      for (int b = 0; b < 16; ++b) {  // prev_intra4x4_pred_mode / rem
        auto nb_mode = [&](int byy, int bxx) -> int {
          if (byy < 0 || bxx < 0) return -1;
          if (byy >= mby && byy < mby + 4 && bxx >= mbx && bxx < mbx + 4)
            return r.modes4[kScanOf[byy - mby][bxx - mbx]];
          return mode4[(size_t)byy * bw + bxx];
        };
        int row = mby + kZY[b] / 4, col = mbx + kZX[b] / 4;
        int ml = nb_mode(row, col - 1), ma = nb_mode(row - 1, col);
        int mpm = (ml < 0 || ma < 0) ? 2 : std::min(ml, ma);
        int mode = r.modes4[b];
        if (mode == mpm) {
          bwr.put(1, 1);
        } else {
          bwr.put(0, 1);
          bwr.put((uint32_t)(mode - (mode > mpm ? 1 : 0)), 3);
        }
      }
    }
    bwr.put_ue(r.chroma_mode);
    if (!r.i16)
      bwr.put_ue(
          (uint32_t)intra_cbp_code(r.cbp_luma | (r.cbp_chroma << 4)));
    if (r.i16 || r.cbp_luma || r.cbp_chroma) bwr.put_se(0);  // mb_qp_delta
    // residual (7.3.5.3): luma DC / luma 4x4 blocks in scan order; the
    // ltc/ctc maps are committed block-by-block so left/above lookups
    // see in-MB predecessors (scan order guarantees they were written)
    if (r.i16) {
      for (int s = 0; s < 16; ++s) zz[s] = r.dc_zz[s];
      cavlc_block(&bwr, zz, 16,
                  derive_nC(nb_ltc(mby, mbx - 1), nb_ltc(mby - 1, mbx)));
      if (r.cbp_luma) {
        for (int b = 0; b < 16; ++b) {
          int row = mby + kZY[b] / 4, col = mbx + kZX[b] / 4;
          int nC = derive_nC(nb_ltc(row, col - 1), nb_ltc(row - 1, col));
          for (int s = 0; s < 16; ++s) zz[s] = r.luma_zz[b][s];
          int tc;
          cavlc_block(&bwr, &zz[1], 15, nC, &tc);
          ltc[(size_t)row * bw + col] = (int16_t)tc;
        }
      }
    } else {
      for (int b = 0; b < 16; ++b) {
        int q = (kZY[b] / 8) * 2 + kZX[b] / 8;
        if (!((r.cbp_luma >> q) & 1)) continue;  // gated off: nnz stays 0
        int row = mby + kZY[b] / 4, col = mbx + kZX[b] / 4;
        int nC = derive_nC(nb_ltc(row, col - 1), nb_ltc(row - 1, col));
        for (int s = 0; s < 16; ++s) zz[s] = r.luma_zz[b][s];
        int tc;
        cavlc_block(&bwr, zz, 16, nC, &tc);
        ltc[(size_t)row * bw + col] = (int16_t)tc;
      }
    }
    if (r.cbp_chroma)
      for (int pl = 0; pl < 2; ++pl) {
        int z4[4];
        for (int k = 0; k < 4; ++k) z4[k] = r.cdc[pl][k];
        cavlc_block(&bwr, z4, 4, -1);
      }
    if (r.cbp_chroma == 2)
      for (int pl = 0; pl < 2; ++pl)
        for (int sb = 0; sb < 4; ++sb) {
          int row = cby + sb / 2, col = cbx + sb % 2;
          auto nbc = [&](int byy, int bxx) -> int {
            if (byy < 0 || bxx < 0) return -1;
            return ctc[pl][(size_t)byy * cbw + bxx];
          };
          int nC = derive_nC(nbc(row, col - 1), nbc(row - 1, col));
          for (int s = 0; s < 16; ++s) zz[s] = r.cac_zz[pl][sb][s];
          int tc;
          cavlc_block(&bwr, &zz[1], 15, nC, &tc);
          ctc[pl][(size_t)row * cbw + col] = (int16_t)tc;
        }
    for (int b = 0; b < 16; ++b)  // commit the MPM mode map
      mode4[(size_t)(mby + kZY[b] / 4) * bw + mbx + kZX[b] / 4] =
          r.i16 ? (int8_t)2 : r.modes4[b];
  }
}

std::vector<uint8_t> make_sps(int pw, int ph, int w, int h) {
  BitWriter b;
  b.put(66, 8);    // profile_idc: (constrained) baseline
  b.put(0xC0, 8);  // constraint_set0/1, reserved zeros
  b.put((pw / 16) * (ph / 16) <= 36864 ? 51 : 60, 8);  // level_idc
  b.put_ue(0);  // seq_parameter_set_id
  b.put_ue(0);  // log2_max_frame_num_minus4
  b.put_ue(2);  // pic_order_cnt_type (no POC syntax; all-IDR)
  b.put_ue(0);  // max_num_ref_frames
  b.put(0, 1);  // gaps_in_frame_num_value_allowed_flag
  b.put_ue((uint32_t)(pw / 16 - 1));
  b.put_ue((uint32_t)(ph / 16 - 1));
  b.put(1, 1);  // frame_mbs_only_flag
  b.put(1, 1);  // direct_8x8_inference_flag
  bool crop = pw != w || ph != h;
  b.put(crop ? 1 : 0, 1);
  if (crop) {  // CropUnitX = CropUnitY = 2 (4:2:0, frame_mbs_only)
    b.put_ue(0);
    b.put_ue((uint32_t)((pw - w) / 2));
    b.put_ue(0);
    b.put_ue((uint32_t)((ph - h) / 2));
  }
  b.put(0, 1);  // vui_parameters_present_flag
  b.rbsp_trailing();
  return b.buf;
}

std::vector<uint8_t> make_pps() {
  BitWriter b;
  b.put_ue(0);  // pic_parameter_set_id
  b.put_ue(0);  // seq_parameter_set_id
  b.put(0, 1);  // entropy_coding_mode_flag: CAVLC
  b.put(0, 1);  // bottom_field_pic_order_in_frame_present_flag
  b.put_ue(0);  // num_slice_groups_minus1
  b.put_ue(0);  // num_ref_idx_l0_default_active_minus1
  b.put_ue(0);  // num_ref_idx_l1_default_active_minus1
  b.put(0, 1);  // weighted_pred_flag
  b.put(0, 2);  // weighted_bipred_idc
  b.put_se(0);  // pic_init_qp_minus26 (real QP via slice_qp_delta)
  b.put_se(0);  // pic_init_qs_minus26
  b.put_se(0);  // chroma_qp_index_offset
  b.put(0, 1);  // deblocking_filter_control_present_flag (filter on)
  b.put(0, 1);  // constrained_intra_pred_flag
  b.put(0, 1);  // redundant_pic_cnt_present_flag
  b.rbsp_trailing();
  return b.buf;
}

std::vector<uint8_t> make_idr_slice(const std::vector<MBRec>& recs,
                                    int mbw, int mbh, int qp) {
  BitWriter b;
  b.put_ue(0);  // first_mb_in_slice
  b.put_ue(7);  // slice_type: I (all slices of the picture)
  b.put_ue(0);  // pic_parameter_set_id
  b.put(0, 4);  // frame_num, u(log2_max_frame_num) = u(4)
  b.put_ue(0);  // idr_pic_id
  b.put(0, 1);  // no_output_of_prior_pics_flag
  b.put(0, 1);  // long_term_reference_flag
  b.put_se(qp - 26);  // slice_qp_delta
  write_slice_data(b, recs, mbw, mbh);
  b.rbsp_trailing();
  return b.buf;
}

// Annex-B NAL unit: start code + header + RBSP with emulation prevention
void write_nal(std::vector<uint8_t>& out, int nal_ref_idc, int type,
               const std::vector<uint8_t>& rbsp) {
  out.push_back(0);
  out.push_back(0);
  out.push_back(0);
  out.push_back(1);
  out.push_back((uint8_t)((nal_ref_idc << 5) | type));
  int zeros = 0;
  for (uint8_t byte : rbsp) {
    if (zeros >= 2 && byte <= 3) {
      out.push_back(3);
      zeros = 0;
    }
    out.push_back(byte);
    zeros = (byte == 0) ? zeros + 1 : 0;
  }
}

// in-loop deblocking (spec 8.7). All-intra: bS=4 on macroblock edges,
// bS=3 on internal transform edges. mb = macroblock size in this plane
// (16 luma, 8 chroma).
void deblock(Plane& p, int qp, int mb, bool chroma) {
  int idx = iclip(qp, 0, 51);
  int alpha = kAlpha[idx], beta = kBeta[idx];
  if (alpha == 0) return;

  auto filter_edge = [&](int y, int x, int dy, int dx, bool mb_edge) {
    int q0 = p.at(y, x);
    int p0 = p.at(y - dy, x - dx);
    int p1 = p.at(y - 2 * dy, x - 2 * dx);
    int q1 = p.at(y + dy, x + dx);
    if (std::abs(p0 - q0) >= alpha || std::abs(p1 - p0) >= beta ||
        std::abs(q1 - q0) >= beta)
      return;
    if (mb_edge && !chroma) {  // bS=4 luma strong filter
      int p2 = p.at(y - 3 * dy, x - 3 * dx);
      int p3 = p.at(y - 4 * dy, x - 4 * dx);
      int q2 = p.at(y + 2 * dy, x + 2 * dx);
      int q3 = p.at(y + 3 * dy, x + 3 * dx);
      int ap = std::abs(p2 - p0), aq = std::abs(q2 - q0);
      bool small_gap = std::abs(p0 - q0) < ((alpha >> 2) + 2);
      if (small_gap && ap < beta) {
        p.at(y - dy, x - dx) =
            (uint8_t)((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3);
        p.at(y - 2 * dy, x - 2 * dx) =
            (uint8_t)((p2 + p1 + p0 + q0 + 2) >> 2);
        p.at(y - 3 * dy, x - 3 * dx) =
            (uint8_t)((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3);
      } else {
        p.at(y - dy, x - dx) = (uint8_t)((2 * p1 + p0 + q1 + 2) >> 2);
      }
      if (small_gap && aq < beta) {
        p.at(y, x) =
            (uint8_t)((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3);
        p.at(y + dy, x + dx) = (uint8_t)((q2 + q1 + q0 + p0 + 2) >> 2);
        p.at(y + 2 * dy, x + 2 * dx) =
            (uint8_t)((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3);
      } else {
        p.at(y, x) = (uint8_t)((2 * q1 + q0 + p1 + 2) >> 2);
      }
      return;
    }
    if (mb_edge && chroma) {  // bS=4 chroma
      p.at(y - dy, x - dx) = (uint8_t)((2 * p1 + p0 + q1 + 2) >> 2);
      p.at(y, x) = (uint8_t)((2 * q1 + q0 + p1 + 2) >> 2);
      return;
    }
    // bS=3 normal filter
    int tc0 = kTc0Bs3[idx];
    if (chroma) {
      int tc = tc0 + 1;
      int delta = iclip(((q0 - p0) * 4 + (p1 - q1) + 4) >> 3, -tc, tc);
      p.at(y - dy, x - dx) = (uint8_t)clip255(p0 + delta);
      p.at(y, x) = (uint8_t)clip255(q0 - delta);
      return;
    }
    int p2 = p.at(y - 3 * dy, x - 3 * dx);
    int q2 = p.at(y + 2 * dy, x + 2 * dx);
    int ap = std::abs(p2 - p0), aq = std::abs(q2 - q0);
    int tc = tc0 + (ap < beta ? 1 : 0) + (aq < beta ? 1 : 0);
    int delta = iclip(((q0 - p0) * 4 + (p1 - q1) + 4) >> 3, -tc, tc);
    p.at(y - dy, x - dx) = (uint8_t)clip255(p0 + delta);
    p.at(y, x) = (uint8_t)clip255(q0 - delta);
    if (ap < beta)
      p.at(y - 2 * dy, x - 2 * dx) = (uint8_t)clip255(
          p1 + iclip((p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1, -tc0, tc0));
    if (aq < beta)
      p.at(y + dy, x + dx) = (uint8_t)clip255(
          q1 + iclip((q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1, -tc0, tc0));
  };

  // Per-MACROBLOCK edge order (spec 8.7): for each MB in raster order,
  // filter all of its vertical edges (left MB edge first, then internal
  // transform edges), then all of its horizontal edges — in place, so a
  // macroblock is fully filtered before the MB to its right reads those
  // samples through its own left vertical edge. (A frame-global
  // vertical-then-horizontal sweep diverges from the spec wherever both
  // filters fire near an MB corner.)
  for (int my = 0; my < p.h; my += mb) {
    for (int mx = 0; mx < p.w; mx += mb) {
      for (int dx = 0; dx < mb; dx += 4) {
        int x = mx + dx;
        if (x == 0) continue;  // picture edge: never filtered
        bool mb_edge = dx == 0;
        for (int y = my; y < my + mb; ++y)
          filter_edge(y, x, 0, 1, mb_edge);
      }
      for (int dy = 0; dy < mb; dy += 4) {
        int y = my + dy;
        if (y == 0) continue;
        bool mb_edge = dy == 0;
        for (int x = mx; x < mx + mb; ++x)
          filter_edge(y, x, 1, 0, mb_edge);
      }
    }
  }
}

}  // namespace h264

namespace {

// replicate-padded integer plane from double-precision source values
h264::Plane make_plane(const std::vector<double>& src, int h, int w,
                       int align, std::vector<int>& isrc) {
  int ph = (h + align - 1) / align * align;
  int pw = (w + align - 1) / align * align;
  h264::Plane p;
  p.h = ph;
  p.w = pw;
  p.d.assign((size_t)ph * pw, 0);
  isrc.assign((size_t)ph * pw, 0);
  for (int y = 0; y < ph; ++y)
    for (int x = 0; x < pw; ++x)
      isrc[(size_t)y * pw + x] = (int)std::lround(std::min(
          255.0, std::max(0.0, src[(size_t)std::min(y, h - 1) * w +
                                   std::min(x, w - 1)])));
  return p;
}

}  // namespace

// H.264 pure-intra frame coding on YUV 4:2:0 (the JM IntraPeriod=1
// configuration the reference drives via subprocess): BT.601 conversion,
// chroma subsampling, macroblock-order Intra_4x4/Intra_16x16 coding with
// RD mode decision, integer transform + spec quantization, luma/chroma
// DC Hadamard stages, CAVLC entropy coding, in-loop deblocking, back to
// RGB. QP 0..51. h and w must be even (the JM even-dimension constraint
// the reference's downsampler enforces).
//   out      (optional) reconstructed RGB, h*w*3;
//   stats    (optional, int64[3]) {macroblock count, Intra_16x16 count,
//            luma nonzero quantized-coefficient count};
//   out_yuv  (optional) the deblocked reconstruction as cropped planes
//            Y(h*w) + Cb(h/2*w/2) + Cr(h/2*w/2) — exactly what a
//            conformant decoder outputs for the emitted stream;
//   bs/cap   (optional) Annex-B bitstream buffer: SPS+PPS+IDR slice.
// Returns the bitstream length, negated if it did not fit in cap.
static int64_t h264_core(const uint8_t* rgb, int h, int w, int qp,
                         uint8_t* out, int64_t* stats, uint8_t* out_yuv,
                         uint8_t* bs, int64_t cap) {
  qp = std::clamp(qp, 0, 51);
  int ch2 = h / 2, cw2 = w / 2;
  std::vector<double> Y((size_t)h * w), Cb((size_t)ch2 * cw2),
      Cr((size_t)ch2 * cw2);
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const uint8_t* p = &rgb[((size_t)y * w + x) * 3];
      double r = p[0], g = p[1], b = p[2];
      Y[(size_t)y * w + x] = 0.299 * r + 0.587 * g + 0.114 * b;
    }
  }
  for (int y = 0; y < ch2; ++y) {
    for (int x = 0; x < cw2; ++x) {
      double r = 0, g = 0, b = 0;
      for (int dy = 0; dy < 2; ++dy)
        for (int dx = 0; dx < 2; ++dx) {
          const uint8_t* p =
              &rgb[((size_t)(2 * y + dy) * w + 2 * x + dx) * 3];
          r += p[0];
          g += p[1];
          b += p[2];
        }
      r /= 4;
      g /= 4;
      b /= 4;
      Cb[(size_t)y * cw2 + x] =
          128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b;
      Cr[(size_t)y * cw2 + x] =
          128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b;
    }
  }

  std::vector<int> ys, cbs, crs;
  h264::Plane py = make_plane(Y, h, w, 16, ys);
  h264::Plane pcb = make_plane(Cb, ch2, cw2, 8, cbs);
  h264::Plane pcr = make_plane(Cr, ch2, cw2, 8, crs);

  h264::LumaStats st;
  std::vector<h264::MBRec> recs;
  if (bs != nullptr) recs.resize((size_t)(py.w / 16) * (py.h / 16));
  h264::code_luma(py, ys, qp, &st, bs ? &recs : nullptr);
  h264::code_chroma_joint(pcb, pcr, cbs, crs, qp, bs ? &recs : nullptr);

  int64_t bs_len = 0;
  if (bs != nullptr) {
    std::vector<uint8_t> annexb;
    h264::write_nal(annexb, 3, 7, h264::make_sps(py.w, py.h, w, h));
    h264::write_nal(annexb, 3, 8, h264::make_pps());
    h264::write_nal(annexb, 3, 5,
                    h264::make_idr_slice(recs, py.w / 16, py.h / 16, qp));
    bs_len = (int64_t)annexb.size();
    if (bs_len <= cap)
      std::memcpy(bs, annexb.data(), annexb.size());
    else
      bs_len = -bs_len;
  }

  h264::deblock(py, qp, 16, false);
  int qpc = h264::chroma_qp(qp);
  h264::deblock(pcb, qpc, 8, true);
  h264::deblock(pcr, qpc, 8, true);
  if (stats != nullptr) {
    stats[0] = (int64_t)st.n_mb;
    stats[1] = (int64_t)st.n_i16;
    stats[2] = (int64_t)st.nnz;
  }

  if (out_yuv != nullptr) {  // cropped decoded planes, Y then Cb then Cr
    uint8_t* p = out_yuv;
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) *p++ = py.at(y, x);
    for (int y = 0; y < h / 2; ++y)
      for (int x = 0; x < w / 2; ++x) *p++ = pcb.at(y, x);
    for (int y = 0; y < h / 2; ++y)
      for (int x = 0; x < w / 2; ++x) *p++ = pcr.at(y, x);
  }

  if (out != nullptr) {
    for (int y = 0; y < h; ++y) {
      for (int x = 0; x < w; ++x) {
        double yy = py.at(y, x);
        double cb = pcb.at(y / 2, x / 2) - 128.0;
        double cr = pcr.at(y / 2, x / 2) - 128.0;
        double r = yy + 1.402 * cr;
        double g = yy - 0.344136 * cb - 0.714136 * cr;
        double b = yy + 1.772 * cb;
        uint8_t* p = &out[((size_t)y * w + x) * 3];
        p[0] = (uint8_t)std::clamp(std::round(r), 0.0, 255.0);
        p[1] = (uint8_t)std::clamp(std::round(g), 0.0, 255.0);
        p[2] = (uint8_t)std::clamp(std::round(b), 0.0, 255.0);
      }
    }
  }
  return bs_len;
}

void h264_intra_stats_u8(const uint8_t* rgb, int h, int w, int qp,
                         uint8_t* out, int64_t* stats) {
  h264_core(rgb, h, w, qp, out, stats, nullptr, nullptr, 0);
}

void h264_intra_u8(const uint8_t* rgb, int h, int w, int qp, uint8_t* out) {
  h264_core(rgb, h, w, qp, out, nullptr, nullptr, nullptr, 0);
}

// Emit a real Annex-B H.264 stream (SPS + PPS + one IDR slice,
// constrained baseline, CAVLC) for the frame, alongside the decoded
// reconstruction. out_rgb (optional): h*w*3; out_yuv (optional):
// h*w + 2*(h/2*w/2) cropped planes (the exact decoder output, for
// bit-exactness checks against third-party decoders); bs: bitstream
// buffer of capacity cap. Returns the stream length (negated if cap was
// too small — call again with a larger buffer).
int64_t h264_intra_encode_u8(const uint8_t* rgb, int h, int w, int qp,
                             uint8_t* out_rgb, uint8_t* out_yuv,
                             uint8_t* bs, int64_t cap) {
  return h264_core(rgb, h, w, qp, out_rgb, nullptr, out_yuv, bs, cap);
}

// Local-histogram entropy at `region`, average-pooled at crop_size, argmax
// -> best patch corner (y, x). gray: (h, w) uint8.
void entropy_patch_u8(const uint8_t* gray, int h, int w, int region,
                      int crop_size, int* best_y, int* best_x) {
  // Per-pixel local entropy with a column-sliding histogram: each x-step
  // adds/removes one window column (O(region) bin updates), and the
  // entropy itself is maintained incrementally via
  //   H = log2(n) - S/n,  S = sum_v count_v * log2(count_v),
  // with a precomputed v*log2(v) table — O(h*w*region) total instead of
  // the naive O(h*w*(region^2 + 256)).
  std::vector<double> ent(static_cast<size_t>(h) * w, 0.0);
  int half = region / 2;
  std::vector<double> vlog((size_t)region * region + 1, 0.0);
  for (size_t v = 2; v < vlog.size(); ++v)
    vlog[v] = (double)v * std::log2((double)v);
  std::vector<int> hist(256);
  for (int y = 0; y < h; ++y) {
    int y0 = std::max(0, y - half), y1 = std::min(h, y + region - half);
    std::fill(hist.begin(), hist.end(), 0);
    int count = 0;
    double S = 0.0;
    auto add_col = [&](int xx) {
      if (xx < 0 || xx >= w) return;
      for (int yy = y0; yy < y1; ++yy) {
        int& c = hist[gray[(size_t)yy * w + xx]];
        S += vlog[c + 1] - vlog[c];
        ++c;
        ++count;
      }
    };
    auto rm_col = [&](int xx) {
      if (xx < 0 || xx >= w) return;
      for (int yy = y0; yy < y1; ++yy) {
        int& c = hist[gray[(size_t)yy * w + xx]];
        S += vlog[c - 1] - vlog[c];
        --c;
        --count;
      }
    };
    for (int xx = -half; xx < region - half; ++xx) add_col(xx);
    for (int x = 0; x < w; ++x) {
      ent[(size_t)y * w + x] =
          count > 0 ? std::log2((double)count) - S / count : 0.0;
      rm_col(x - half);
      add_col(x + region - half);
    }
  }
  // integral image over ent -> every crop-corner sum in O(1)
  std::vector<double> integ((size_t)(h + 1) * (w + 1), 0.0);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x)
      integ[(size_t)(y + 1) * (w + 1) + x + 1] =
          ent[(size_t)y * w + x] +
          integ[(size_t)y * (w + 1) + x + 1] +
          integ[(size_t)(y + 1) * (w + 1) + x] -
          integ[(size_t)y * (w + 1) + x];
  double best = -1.0;
  *best_y = 0;
  *best_x = 0;
  for (int y = 0; y + crop_size <= h; ++y) {
    for (int x = 0; x + crop_size <= w; ++x) {
      double s = integ[(size_t)(y + crop_size) * (w + 1) + x + crop_size] -
                 integ[(size_t)y * (w + 1) + x + crop_size] -
                 integ[(size_t)(y + crop_size) * (w + 1) + x] +
                 integ[(size_t)y * (w + 1) + x];
      if (s > best) {
        best = s;
        *best_y = y;
        *best_x = x;
      }
    }
  }
}

}  // extern "C"
