// deepcabac.cpp — host-side entropy codec + quantizer for nnc_tpu.
//
// A from-scratch C++ implementation of the native codec surface the reference
// pipeline gets from the external `deepCABAC` pybind11 module (reference call
// sites: nnc_core/approximator/baseline.py:42-57,98 and
// nnc_core/coder/baseline.py:5-59). It provides:
//
//   * A binary range coder (LZMA-style carry handling, 32-bit range) with
//     adaptive two-window context models (VVC-flavoured probability update).
//   * Tensor bin syntax: sig_flag / sign_flag / abs_level_greater_j unary
//     chain (length = cabac_unary_length_minus1+1) / adaptive-Rice
//     Exp-Golomb remainder in bypass.
//   * quantLayer: uniform scalar quantization, or 8-state dependent
//     quantization (DQ) solved by Viterbi trellis search (RD cost with
//     lambda = lambda_scale * stepsize^2; lambda_scale=0 -> pure distortion).
//   * dequantLayer: inverse, tracking the same 8-state machine.
//   * Entry points: with scan_order>0 a 2D tensor is coded in independent
//     block-rows (engine + contexts + DQ state reset per row-chunk) whose
//     byte offsets are recorded, enabling parallel decode.
//
// Byte accounting is exact: the encoder's flush emits 5 trailing bytes and a
// symmetric decoder consumes exactly the same number of stream bytes, so a
// decoder can report precisely how many payload bytes a segment occupied
// without explicit length fields.
//
// Exposed as a plain C API (bound from Python via ctypes; pybind11 is not
// available in the build environment).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>
#include <thread>

// Built with -march=native: AVX2 paths compile in only where the build host
// supports them. All SIMD below performs the exact same arithmetic in the
// same FP/integer operation order as its scalar fallback, so quantization
// decisions and bitstream bytes are identical either way (golden fixtures
// pin this).
#ifdef __AVX2__
#include <immintrin.h>
#endif

namespace {

// ----------------------------------------------------------------------------
// QP math (must match nnc_tpu/core/common.py)
// ----------------------------------------------------------------------------
static inline double stepsize_from_qp(int qp, int qp_density) {
  const int k = 1 << qp_density;
  const int mul = k + (qp & (k - 1));
  const int shift = qp >> qp_density;  // arithmetic shift
  return (double)mul * std::ldexp(1.0, shift - qp_density);
}

// ----------------------------------------------------------------------------
// Context model: two-window adaptive probability (15-bit), P(bin==1).
// ----------------------------------------------------------------------------
struct Ctx {
  uint16_t a, b;  // fast and slow estimators (rates set per tensor)
  void init() { a = 1 << 14; b = 1 << 14; }
  inline uint32_t prob() const { return ((uint32_t)a + (uint32_t)b) >> 1; }
  inline void update(int bin, int as, int bs) {
    const int t = bin << 15;
    a = (uint16_t)(a + ((t - (int)a) >> as));
    b = (uint16_t)(b + ((t - (int)b) >> bs));
  }
};

// context-parameter profiles selectable per tensor (2 signaled bits);
// profile 0 is the default used when param_opt is off.
constexpr int kCtxProfiles[4][2] = {{4, 7}, {3, 6}, {5, 8}, {2, 5}};
// ProfileEstimator::bin4 unrolls these shifts as literals — keep in sync
static_assert(kCtxProfiles[0][0] == 4 && kCtxProfiles[0][1] == 7 &&
                  kCtxProfiles[1][0] == 3 && kCtxProfiles[1][1] == 6 &&
                  kCtxProfiles[2][0] == 5 && kCtxProfiles[2][1] == 8 &&
                  kCtxProfiles[3][0] == 2 && kCtxProfiles[3][1] == 5,
              "update ProfileEstimator::bin4 lane shifts");

static const uint32_t kTopValue = 1u << 24;

// ----------------------------------------------------------------------------
// Range encoder (LZMA-style shift-low carry handling)
// ----------------------------------------------------------------------------
struct RangeEncoder {
  std::vector<uint8_t>* out = nullptr;
  uint64_t low = 0;
  uint32_t range = 0xFFFFFFFFu;
  uint8_t cache = 0;
  int64_t cache_size = 1;

  void start(std::vector<uint8_t>* sink) {
    out = sink;
    low = 0;
    range = 0xFFFFFFFFu;
    cache = 0;
    cache_size = 1;
  }

  inline void shift_low() {
    if ((uint32_t)(low >> 32) != 0 || (uint32_t)low < 0xFF000000u) {
      const uint8_t carry = (uint8_t)(low >> 32);
      while (cache_size-- > 0) {
        out->push_back((uint8_t)(cache + carry));
        cache = 0xFF;
      }
      cache = (uint8_t)(low >> 24);
      cache_size = 1;
    } else {
      cache_size++;
    }
    low = (uint32_t)low << 8;
  }

  inline void encode_bin(Ctx& ctx, int bin, int as, int bs) {
    const uint32_t p = ctx.prob();  // 15-bit P(bin==1), clamped below
    uint32_t p1 = p < 128 ? 128 : (p > 32640 ? 32640 : p);
    const uint32_t bound = (range >> 15) * p1;
    // (a branchless low/range update mirroring the decoder benched
    // neutral-to-worse here — the encoder's `low` chain is longer)
    if (bin) {
      range = bound;
    } else {
      low += bound;
      range -= bound;
    }
    ctx.update(bin, as, bs);
    while (range < kTopValue) {
      range <<= 8;
      shift_low();
    }
  }

  inline void encode_bypass(int bin) {
    range >>= 1;
    if (bin) low += range;
    while (range < kTopValue) {
      range <<= 8;
      shift_low();
    }
  }

  void encode_bypass_bits(uint32_t value, int nbits) {
    for (int i = nbits - 1; i >= 0; --i) encode_bypass((value >> i) & 1);
  }

  void flush() {
    for (int i = 0; i < 5; ++i) shift_low();
  }
};

// ----------------------------------------------------------------------------
// Range decoder (symmetric byte consumption: 5 init bytes + one per norm)
// ----------------------------------------------------------------------------
struct RangeDecoder {
  const uint8_t* buf = nullptr;
  int64_t size = 0;
  int64_t pos_ = 0;
  uint32_t range = 0xFFFFFFFFu;
  uint32_t code = 0;

  // NOTE: a 64-bit buffered bulk refill (8-byte load + MSB-first shift
  // register) was tried here and measured ~15% SLOWER than the plain
  // bounds-checked byte fetch: the acc<<=8 shift register serializes
  // what is otherwise an independent, OOO-friendly load. Don't revisit.
  inline uint8_t next_byte() { return pos_ < size ? buf[pos_++] : 0; }

  inline int64_t pos() const { return pos_; }

  void start(const uint8_t* data, int64_t n, int64_t offset) {
    buf = data;
    size = n;
    pos_ = offset;
    range = 0xFFFFFFFFu;
    code = 0;
    next_byte();  // first emitted byte is always 0
    for (int i = 0; i < 4; ++i) code = (code << 8) | next_byte();
  }

  inline int decode_bin(Ctx& ctx, int as, int bs) {
    const uint32_t p = ctx.prob();
    uint32_t p1 = p < 128 ? 128 : (p > 32640 ? 32640 : p);
    const uint32_t bound = (range >> 15) * p1;
    // branchless: the bin value is data-dependent (P(1) is often near
    // 0.5) so a conditional branch here mispredicts its way to ~40% of
    // the decode time; setb+cmov/masking keeps the pipe full
    const int bin = code < bound;
    const uint32_t mask = (uint32_t)bin - 1u;  // 0 when bin==1, ~0 when 0
    code -= bound & mask;
    range = bin ? bound : range - bound;
    ctx.update(bin, as, bs);
    while (range < kTopValue) {
      range <<= 8;
      code = (code << 8) | next_byte();
    }
    return bin;
  }

  inline int decode_bypass() {
    range >>= 1;
    int bin;
    if (code >= range) {
      bin = 1;
      code -= range;
    } else {
      bin = 0;
    }
    while (range < kTopValue) {
      range <<= 8;
      code = (code << 8) | next_byte();
    }
    return bin;
  }

  uint32_t decode_bypass_bits(int nbits) {
    uint32_t v = 0;
    for (int i = 0; i < nbits; ++i) v = (v << 1) | decode_bypass();
    return v;
  }
};

// ----------------------------------------------------------------------------
// Dependent quantization: 8-state machine (3-bit state as used by the NNR
// entry-point syntax; reference hls/__init__.py:136-148 stores dq_state in 3
// bits). Transition on level parity; quantizer offset from bit 1 of state.
// ----------------------------------------------------------------------------
static const int kStateTrans[8][2] = {
    {0, 2}, {5, 7}, {1, 3}, {6, 4}, {2, 0}, {7, 5}, {3, 1}, {4, 6}};
static inline int q_offset(int state) { return (state >> 1) & 1; }

// recon for |level| m>0 with quantizer offset o: (2m - o) * delta / 2
static inline double recon_dq(int32_t level, int state, double delta) {
  if (level == 0) return 0.0;
  const double m = (double)std::llabs((long long)level);
  const double v = (2.0 * m - (double)q_offset(state)) * delta * 0.5;
  return level > 0 ? v : -v;
}

// ----------------------------------------------------------------------------
// Tensor bin syntax contexts
// ----------------------------------------------------------------------------
struct TensorCtxs {
  // fixed in-struct context storage: the bin-decode loop is a serial
  // dependency chain, so removing the per-access heap indirection of the
  // former std::vector<Ctx> members is a measurable win. gt contexts
  // beyond kMaxUnary (unary lengths no real stream uses) spill to a heap
  // vector so arbitrary cabac_unary_length_minus1 still decodes.
  static constexpr int kMaxUnary = 64;
  Ctx sig[10];            // dq: 8 (per state); no-dq: 2 (prev sig)
  Ctx sign;
  Ctx gt[kMaxUnary];      // abs_level_greater_j, j = 1..K
  std::vector<Ctx> gt_spill;
  // adaptive Rice order state for remainders
  uint64_t rem_sum = 0;
  uint64_t rem_cnt = 0;
  int a_shift = 4, b_shift = 7;  // adaptation-rate profile

  inline Ctx& gtc(int j) {
    return j < kMaxUnary ? gt[j] : gt_spill[(size_t)(j - kMaxUnary)];
  }

  void set_profile(int p) {
    a_shift = kCtxProfiles[p & 3][0];
    b_shift = kCtxProfiles[p & 3][1];
  }

  void init(int unary_len) {
    for (auto& c : sig) c.init();
    sign.init();
    for (auto& c : gt) c.init();
    const int n = std::max(1, unary_len);
    gt_spill.assign(n > kMaxUnary ? (size_t)(n - kMaxUnary) : 0, Ctx());
    for (auto& c : gt_spill) c.init();
    rem_sum = 0;
    rem_cnt = 0;
    a_shift = 4;
    b_shift = 7;
  }

  inline int rice_order() const {
    if (rem_cnt == 0) return 0;
    const uint64_t avg = rem_sum / rem_cnt;
    int g = 0;
    while ((1ull << (g + 1)) <= avg + 1 && g < 24) ++g;
    return g;
  }
  inline void rem_update(uint32_t r) {
    rem_sum += r;
    rem_cnt += 1;
  }
};

// Exp-Golomb order-g, bypass coded.
static void encode_eg(RangeEncoder& rc, uint32_t value, int g) {
  uint32_t x = value;
  int k = g;
  while (x >= (1u << k)) {
    rc.encode_bypass(0);
    x -= 1u << k;
    ++k;
  }
  rc.encode_bypass(1);
  for (int i = k - 1; i >= 0; --i) rc.encode_bypass((x >> i) & 1);
}

static uint32_t decode_eg(RangeDecoder& rc, int g) {
  uint32_t x = 0;
  int k = g;
  while (rc.decode_bypass() == 0) {
    x += 1u << k;
    ++k;
  }
  if (k > 0) x += rc.decode_bypass_bits(k);
  return x;
}

// Encode a single quantized value.
static inline void encode_value(RangeEncoder& rc, TensorCtxs& cx, int32_t q,
                                int sig_ctx, int unary_len) {
  const int as = cx.a_shift, bs = cx.b_shift;
  rc.encode_bin(cx.sig[sig_ctx], q != 0, as, bs);
  if (q == 0) return;
  rc.encode_bin(cx.sign, q < 0, as, bs);
  uint32_t m1 = (uint32_t)(std::llabs((long long)q) - 1);  // magnitude-1 >= 0
  const int K = unary_len;
  int j = 0;
  for (; j < K; ++j) {
    const int more = m1 > (uint32_t)j;
    rc.encode_bin(cx.gtc(j), more, as, bs);
    if (!more) break;
  }
  if (j == K) {
    const uint32_t rem = m1 - (uint32_t)K;
    encode_eg(rc, rem, cx.rice_order());
    cx.rem_update(rem);
  }
}

static inline int32_t decode_value(RangeDecoder& rc, TensorCtxs& cx,
                                   int sig_ctx, int unary_len) {
  const int as = cx.a_shift, bs = cx.b_shift;
  if (!rc.decode_bin(cx.sig[sig_ctx], as, bs)) return 0;
  const int neg = rc.decode_bin(cx.sign, as, bs);
  uint32_t m1 = 0;
  const int K = unary_len;
  int j = 0;
  for (; j < K; ++j) {
    if (rc.decode_bin(cx.gtc(j), as, bs))
      m1 = (uint32_t)j + 1;
    else
      break;
  }
  if (j == K) {
    const uint32_t rem = decode_eg(rc, cx.rice_order());
    cx.rem_update(rem);
    m1 = (uint32_t)K + rem;
  }
  const int64_t m = (int64_t)m1 + 1;
  return (int32_t)(neg ? -m : m);
}

static inline int sig_ctx_of(int dq_flag, int state, int prev_sig) {
  return dq_flag ? state : (8 + (prev_sig ? 1 : 0));
}

// Block-row height for scan_order s (>0): entry-point granularity.
static inline int64_t block_row_height(int scan_order) {
  return (int64_t)4 << scan_order;
}

// Number of independently coded chunks for an (h, w) tensor.
static inline int64_t num_chunks(int64_t h, int64_t w, int scan_order) {
  if (scan_order <= 0 || h <= 1 || w <= 1) return 1;
  const int64_t bh = block_row_height(scan_order);
  return (h + bh - 1) / bh;
}

// ----------------------------------------------------------------------------
// Quantizers
// ----------------------------------------------------------------------------

// Uniform scalar quantization (round-to-nearest, half away from zero).
static void quant_uniform(const float* x, int32_t* q, int64_t n, double delta) {
  const double inv = 1.0 / delta;
  for (int64_t i = 0; i < n; ++i) {
    const double v = (double)x[i] * inv;
    q[i] = (int32_t)(v >= 0 ? std::floor(v + 0.5) : -std::floor(-v + 0.5));
  }
}

// Approximate rate (in bins) of coding level q — used only when lambda > 0.
static inline double rate_est(int32_t q, int unary_len) {
  if (q == 0) return 1.0;
  const int64_t m1 = std::llabs((long long)q) - 1;
  double r = 2.0;  // sig + sign
  if (m1 < unary_len) {
    r += (double)m1 + 1.0;
  } else {
    r += (double)unary_len;
    const double rem = (double)(m1 - unary_len) + 1.0;
    r += 2.0 * std::log2(rem + 1.0) + 1.0;
  }
  return r;
}

// Predecessors of each trellis state under kStateTrans: state s2 is
// reachable from exactly two (state, parity) pairs. kPredState lists them
// with the smaller predecessor state first (matching the s-ascending scan
// order of the textbook scatter relaxation, so strict-< tie-breaking is
// preserved); kPredLane is the candidate lane q_offset(pred)*2 + parity.
static constexpr uint8_t kPredState[8][2] = {
    {0, 4}, {2, 6}, {0, 4}, {2, 6}, {3, 7}, {1, 5}, {3, 7}, {1, 5}};
static constexpr uint8_t kPredLane[8][2] = {
    {0, 1}, {2, 3}, {1, 0}, {3, 2}, {3, 2}, {0, 1}, {2, 3}, {1, 0}};

// the AVX2 relaxation in quant_dq_chunk encodes these tables as permute
// immediates; pin them so a table edit cannot silently desynchronize
static_assert(kPredState[0][0] == 0 && kPredState[1][0] == 2 &&
                  kPredState[2][0] == 0 && kPredState[3][0] == 2 &&
                  kPredState[4][0] == 3 && kPredState[5][0] == 1 &&
                  kPredState[6][0] == 3 && kPredState[7][0] == 1,
              "predA imms 0x88/0x77 stale");
static_assert(kPredState[0][1] == 4 && kPredState[1][1] == 6 &&
                  kPredState[2][1] == 4 && kPredState[3][1] == 6 &&
                  kPredState[4][1] == 7 && kPredState[5][1] == 5 &&
                  kPredState[6][1] == 7 && kPredState[7][1] == 5,
              "predB imms 0x88/0x77 stale");
static_assert(kPredLane[0][0] == 0 && kPredLane[1][0] == 2 &&
                  kPredLane[2][0] == 1 && kPredLane[3][0] == 3 &&
                  kPredLane[4][0] == 3 && kPredLane[5][0] == 0 &&
                  kPredLane[6][0] == 2 && kPredLane[7][0] == 1,
              "laneA imms 0xD8/0x63 stale");
static_assert(kPredLane[0][1] == 1 && kPredLane[1][1] == 3 &&
                  kPredLane[2][1] == 0 && kPredLane[3][1] == 2 &&
                  kPredLane[4][1] == 2 && kPredLane[5][1] == 1 &&
                  kPredLane[6][1] == 3 && kPredLane[7][1] == 0,
              "laneB imms 0x8D/0x36 stale");

// 8-state trellis (Viterbi) dependent quantization of one chunk.
// States reset to 0 at chunk start; returns nothing (q filled).
//
// Fused single pass: per element the 4 candidate costs (quantizer offset x
// level parity — predecessor-independent) are computed in registers and
// immediately relaxed into the 8 state costs in GATHER form (each next
// state reads its 2 predecessors), so the only per-element stores are the
// 4 candidate magnitudes (needed at backtrack) and a 1-byte traceback
// word (bit s = which of state s's two predecessors won). Decisions are
// bit-identical to the two-pass scatter formulation this replaces (same
// candidate expressions and FP operation order, same tie-breaking); that
// version materialized 4 n-sized cost streams plus per-(element, state)
// int32 levels and uint8 predecessors — ~9x the memory traffic — and ran
// 3x slower (151 -> ~45 ns/elem on the 1-core Xeon).
static void quant_dq_chunk(const float* x, int32_t* q, int64_t n, double delta,
                           double lambda, int unary_len) {
  constexpr int S = 8;
  const double kInf = 1e300;
  const double half = delta * 0.5;

  // lambda * rate_est(m) lookup (exact same product as the inline multiply)
  constexpr int kLutN = 1024;
  double rlut[kLutN];
  if (lambda > 0.0)
    for (int m = 0; m < kLutN; ++m)
      rlut[m] = lambda * rate_est(m, unary_len);
  auto rcost = [&](int32_t m) {
    return m < kLutN ? rlut[m] : lambda * rate_est(m, unary_len);
  };

  std::vector<int32_t> bm((size_t)n * 4);  // candidate magnitude per lane
  std::vector<uint8_t> tb((size_t)n);      // traceback: 8 winner bits
  double cost[S];
  for (int s = 1; s < S; ++s) cost[s] = kInf;
  cost[0] = 0.0;

  for (int64_t i = 0; i < n; ++i) {
    const double av = std::fabs((double)x[i]);
    double c4[4];
    int32_t* m4 = &bm[(size_t)i * 4];
    for (int o = 0; o < 2; ++o) {
      // target magnitude on this offset's grid: m* = (2|x|/delta + o) / 2.
      // Round half away from zero via truncation: both arguments are
      // >= -0.5 (mstar >= 0), so trunc(v + 0.5) == llround(v) everywhere
      // except v == -0.5 exactly (0 vs -1), where the mo < 1 clamp makes
      // the results equal anyway — no libm call in the hot loop.
      const double mstar = (av / delta) + 0.5 * (double)o;
      int64_t me = 2 * (int64_t)(mstar * 0.5 + 0.5);
      if (me < 2) me = 2;
      int64_t mo = 2 * (int64_t)((mstar - 1.0) * 0.5 + 0.5) + 1;
      if (mo < 1) mo = 1;
      const int32_t ev[3] = {0, (int32_t)me,
                             (int32_t)(me - 2 >= 2 ? me - 2 : 0)};
      double bcv = kInf;
      int32_t bmv = 0;
      for (int c = 0; c < 3; ++c) {
        const int32_t m = ev[c];
        if (c == 2 && m == 0) break;  // duplicate of candidate 0
        const double rec =
            m == 0 ? 0.0 : (2.0 * (double)m - (double)o) * half;
        const double d = av - rec;
        double cc = d * d;
        if (lambda > 0.0) cc += rcost(m);
        if (cc < bcv) {
          bcv = cc;
          bmv = m;
        }
      }
      c4[o * 2] = bcv;
      m4[o * 2] = bmv;
      {
        const double rec = (2.0 * (double)mo - (double)o) * half;
        const double d = av - rec;
        double cc = d * d;
        if (lambda > 0.0) cc += rcost((int32_t)mo);
        c4[o * 2 + 1] = cc;
        m4[o * 2 + 1] = (int32_t)mo;
      }
    }
    // gather relaxation, all in registers. Unreachable states carry
    // cost ~kInf; sums stay finite and astronomically above any feasible
    // chain, and the backtrack only ever walks finite-cost states (a
    // finite final cost implies a finite predecessor chain), so not
    // special-casing them cannot change the output.
#ifdef __AVX2__
    {
      // vectorized gather relaxation: states 0-3 / 4-7 as two 4-double
      // lanes. The permute immediates encode kPredState/kPredLane rows
      // (asserted against the tables below); b<a and (b<a ? b : a) keep
      // the scalar path's strict-< tie-breaking (VMINPD(b, a) returns a
      // on ties).
      const __m256d clo = _mm256_loadu_pd(cost);
      const __m256d chi = _mm256_loadu_pd(cost + 4);
      const __m256d cand = _mm256_loadu_pd(c4);
      // lo group (s2 = 0..3): predA = cost[{0,2,0,2}], predB = cost[{4,6,4,6}]
      //                       laneA = c4[{0,2,1,3}],  laneB = c4[{1,3,0,2}]
      const __m256d a_lo = _mm256_add_pd(_mm256_permute4x64_pd(clo, 0x88),
                                         _mm256_permute4x64_pd(cand, 0xD8));
      const __m256d b_lo = _mm256_add_pd(_mm256_permute4x64_pd(chi, 0x88),
                                         _mm256_permute4x64_pd(cand, 0x8D));
      // hi group (s2 = 4..7): predA = cost[{3,1,3,1}], predB = cost[{7,5,7,5}]
      //                       laneA = c4[{3,0,2,1}],  laneB = c4[{2,1,3,0}]
      const __m256d a_hi = _mm256_add_pd(_mm256_permute4x64_pd(clo, 0x77),
                                         _mm256_permute4x64_pd(cand, 0x63));
      const __m256d b_hi = _mm256_add_pd(_mm256_permute4x64_pd(chi, 0x77),
                                         _mm256_permute4x64_pd(cand, 0x36));
      const uint32_t take_lo = (uint32_t)_mm256_movemask_pd(
          _mm256_cmp_pd(b_lo, a_lo, _CMP_LT_OQ));
      const uint32_t take_hi = (uint32_t)_mm256_movemask_pd(
          _mm256_cmp_pd(b_hi, a_hi, _CMP_LT_OQ));
      tb[i] = (uint8_t)(take_lo | (take_hi << 4));
      _mm256_storeu_pd(cost, _mm256_min_pd(b_lo, a_lo));
      _mm256_storeu_pd(cost + 4, _mm256_min_pd(b_hi, a_hi));
    }
#else
    double nc[S];
    uint32_t tbb = 0;
    for (int s2 = 0; s2 < S; ++s2) {
      const double a = cost[kPredState[s2][0]] + c4[kPredLane[s2][0]];
      const double b = cost[kPredState[s2][1]] + c4[kPredLane[s2][1]];
      const int take = b < a;
      nc[s2] = take ? b : a;
      tbb |= (uint32_t)take << s2;
    }
    tb[i] = (uint8_t)tbb;
    for (int s = 0; s < S; ++s) cost[s] = nc[s];
#endif
  }

  // backtrack from the best final state
  int best = 0;
  for (int s = 1; s < S; ++s)
    if (cost[s] < cost[best]) best = s;
  for (int64_t i = n - 1; i >= 0; --i) {
    const int bit = (tb[i] >> best) & 1;
    const int32_t m = bm[(size_t)i * 4 + kPredLane[best][bit]];
    q[i] = x[i] < 0 ? (int32_t)-m : m;
    best = kPredState[best][bit];
  }
}

// ----------------------------------------------------------------------------
// Encoder / Decoder objects
// ----------------------------------------------------------------------------
struct Encoder {
  std::vector<uint8_t> stream;
  RangeEncoder rc;
  TensorCtxs cx;
  int unary_len = 11;          // cabac_unary_length_minus1 + 1
  int param_opt = 0;
  bool engine_open = false;
  std::vector<uint64_t> entry_points;  // of the most recent encodeLayer

  void init_ctx(int cabac_unary_length_minus1, int param_opt_flag) {
    unary_len = cabac_unary_length_minus1 + 1;
    param_opt = param_opt_flag;
    cx.init(unary_len);
  }

  void ensure_open() {
    if (!engine_open) {
      rc.start(&stream);
      engine_open = true;
    }
  }
  void close_engine() {
    if (engine_open) {
      rc.flush();
      engine_open = false;
    }
  }
};

struct Decoder {
  std::vector<uint8_t> stream;
  RangeDecoder rc;
  TensorCtxs cx;
  int unary_len = 11;
  int64_t segment_start = 0;   // where the current engine run began
  bool engine_open = false;
  std::vector<uint64_t> entry_points;     // collected by decodeLayerAndCreateEPs
  std::vector<uint64_t> set_eps;          // provided via setEntryPoints

  void init_ctx(int cabac_unary_length_minus1) {
    unary_len = cabac_unary_length_minus1 + 1;
    cx.init(unary_len);
  }
  void ensure_open() {
    if (!engine_open) {
      rc.start(stream.data(), (int64_t)stream.size(), segment_start);
      engine_open = true;
    }
  }
  void close_engine() {
    if (engine_open) {
      segment_start = rc.pos();  // exact: decoder consumes same bytes as encoder wrote
      engine_open = false;
    }
  }
};

// Encode one full int32 tensor as chunked segments. A 2-bit context-
// parameter profile is signaled at the start of every tensor; with
// param_opt the encoder trial-encodes all profiles and keeps the smallest.
static void encode_tensor_bins(RangeEncoder& rc, TensorCtxs& cx,
                               const int32_t* v, int64_t r0, int64_t r1,
                               int64_t w, int dq_flag, int unary_len) {
  int state = 0;
  int prev_sig = 0;
  for (int64_t i = r0 * w; i < r1 * w; ++i) {
    const int32_t q = v[i];
    encode_value(rc, cx, q, sig_ctx_of(dq_flag, state, prev_sig), unary_len);
    prev_sig = q != 0;
    if (dq_flag) state = kStateTrans[state][(int)(std::llabs((long long)q) & 1)];
  }
}

// ----------------------------------------------------------------------------
// Profile selection by single-pass bit estimation. The bin SEQUENCE (which
// contexts, which bins) is identical across adaptation-rate profiles — only
// the probability evolution differs — so one tensor walk scores all 4
// profiles at once with per-profile context sets and a -log2(p) cost table.
// Replaces 4 trial range-encodes (measured: encode throughput was 5x down
// with param_opt on). MUST mirror encode_value's bin syntax; drift only
// affects profile optimality, never bitstream correctness.
// ----------------------------------------------------------------------------
struct ProfileEstimator {
  static constexpr int P = 4;
  // 4-profile SoA context: the bin sequence is profile-invariant, so the
  // four (a, b) estimator pairs of one logical context live side by side
  // and the per-profile adaptation shifts are compile-time constants (the
  // lane loop is fully unrolled). Replaces four independent TensorCtxs
  // walked through member pointers (4 heap indirections per bin); the
  // arithmetic and cost accounting are identical, so the selected profile
  // — and therefore the bitstream — cannot change.
  struct C4 {
    // 32-bit lanes (not uint16 like Ctx) so the 4 profiles update as one
    // SIMD vector; the estimator arithmetic never wraps uint16 (a stays in
    // [0, 32768] by construction) so the widening is value-identical
    alignas(16) int32_t a[P], b[P];
    void init() {
      for (int p = 0; p < P; ++p) {
        a[p] = 1 << 14;
        b[p] = 1 << 14;
      }
    }
  };
  C4 sig[10];
  C4 sign;
  std::vector<C4> gt;
  uint64_t cost[P] = {0, 0, 0, 0};  // fixed point, 1/256 bit
  uint64_t bypass_bits = 0;         // identical for all profiles
  uint64_t rem_sum = 0, rem_cnt = 0;  // Rice state (profile-invariant)

  // cost tables indexed by prob>>7 (256 buckets of the 15-bit P(bin==1)).
  // Built inside a function-local static struct: C++11 magic statics make
  // the one-time init thread-safe (encode_layer_impl runs concurrently
  // under host-parallel NDU encode).
  struct CostTables {
    uint32_t t1[256], t0[256];
    CostTables() {
      for (int b = 0; b < 256; ++b) {
        const double p = ((double)b * 128.0 + 64.0) / 32768.0;
        t1[b] = (uint32_t)(-std::log2(p) * 256.0 + 0.5);
        t0[b] = (uint32_t)(-std::log2(1.0 - p) * 256.0 + 0.5);
      }
    }
  };
  static const uint32_t* table(int bin) {
    static const CostTables t;
    return bin ? t.t1 : t.t0;
  }

  void init(int unary_len) {
    for (auto& c : sig) c.init();
    sign.init();
    gt.assign((size_t)std::max(1, unary_len), C4());
    for (auto& c : gt) c.init();
    rem_sum = 0;
    rem_cnt = 0;
  }
  void reset_chunk(int unary_len) { init(unary_len); }

  inline void bin4(C4& c, int b) {
    const uint32_t* tab = table(b);
#ifdef __AVX2__
    // all four profile lanes in one vector; per-lane adaptation shifts are
    // the kCtxProfiles constants (pinned by the static_asserts below) as
    // _mm_srav_epi32 counts. Integer arithmetic — exactly the scalar path.
    const __m128i av = _mm_load_si128((const __m128i*)c.a);
    const __m128i bv = _mm_load_si128((const __m128i*)c.b);
    const __m128i idx = _mm_srli_epi32(_mm_add_epi32(av, bv), 8);
    cost[0] += tab[(uint32_t)_mm_extract_epi32(idx, 0)];
    cost[1] += tab[(uint32_t)_mm_extract_epi32(idx, 1)];
    cost[2] += tab[(uint32_t)_mm_extract_epi32(idx, 2)];
    cost[3] += tab[(uint32_t)_mm_extract_epi32(idx, 3)];
    const __m128i tv = _mm_set1_epi32(b << 15);
    _mm_store_si128(
        (__m128i*)c.a,
        _mm_add_epi32(av, _mm_srav_epi32(_mm_sub_epi32(tv, av),
                                         _mm_setr_epi32(4, 3, 5, 2))));
    _mm_store_si128(
        (__m128i*)c.b,
        _mm_add_epi32(bv, _mm_srav_epi32(_mm_sub_epi32(tv, bv),
                                         _mm_setr_epi32(7, 6, 8, 5))));
#else
    const int t = b << 15;
    // lanes unrolled with the kCtxProfiles shifts as literals (pinned by
    // the static_asserts below); same arithmetic as Ctx::prob/update
#define EST_LANE(p, as, bs)                                      \
  {                                                              \
    const uint32_t pr = ((uint32_t)c.a[p] + (uint32_t)c.b[p]) >> 1; \
    cost[p] += tab[pr >> 7];                                     \
    c.a[p] = c.a[p] + ((t - c.a[p]) >> (as));                    \
    c.b[p] = c.b[p] + ((t - c.b[p]) >> (bs));                    \
  }
    EST_LANE(0, 4, 7)
    EST_LANE(1, 3, 6)
    EST_LANE(2, 5, 8)
    EST_LANE(3, 2, 5)
#undef EST_LANE
#endif
  }

  inline int rice_order() const {  // same logic as TensorCtxs::rice_order
    if (rem_cnt == 0) return 0;
    const uint64_t avg = rem_sum / rem_cnt;
    int g = 0;
    while ((1ull << (g + 1)) <= avg + 1 && g < 24) ++g;
    return g;
  }

  // mirrors encode_value
  inline void value(int32_t q, int sig_ctx, int unary_len) {
    bin4(sig[sig_ctx], q != 0);
    if (q == 0) return;
    bin4(sign, q < 0);
    const uint32_t m1 = (uint32_t)(std::llabs((long long)q) - 1);
    const int K = unary_len;
    int j = 0;
    for (; j < K; ++j) {
      const int more = m1 > (uint32_t)j;
      bin4(gt[j], more);
      if (!more) break;
    }
    if (j == K) {
      const uint32_t rem = m1 - (uint32_t)K;
      // EG(rice_order) remainder is bypass-coded: same bits everywhere
      uint32_t x = rem;
      int k = rice_order();
      while (x >= (1u << k)) {
        bypass_bits += 1;
        x -= 1u << k;
        ++k;
      }
      bypass_bits += 1 + (uint64_t)k;
      rem_sum += rem;
      rem_cnt += 1;
    }
  }

  int best() const {
    int b = 0;
    for (int p = 1; p < P; ++p)
      if (cost[p] < cost[b]) b = p;
    return b;
  }
};

static void encode_layer_impl(Encoder& E, const int32_t* v, int64_t h,
                              int64_t w, int dq_flag, int scan_order) {
  const int64_t chunks = num_chunks(h, w, scan_order);
  const int64_t bh = chunks > 1 ? block_row_height(scan_order) : h;
  // a chunked layer starts on a fresh byte-aligned segment so the entry-
  // point anchor (layer_start) is identical on the encoder and decoder
  // (otherwise bytes of the preceding iae_v qp-delta still pending in the
  // range coder's cache would shift the encoder's anchor)
  if (chunks > 1) E.close_engine();
  const int64_t layer_start = (int64_t)E.stream.size();
  E.entry_points.clear();

  int profile = 0;
  if (E.param_opt) {
    ProfileEstimator est;
    est.init(E.unary_len);
    for (int64_t c = 0; c < chunks; ++c) {
      if (c > 0) est.reset_chunk(E.unary_len);
      const int64_t r0 = c * bh;
      const int64_t r1 = std::min(h, r0 + bh);
      // profile selection saturates long before the full walk: the
      // adaptation shifts are 2..8, so the per-profile probability
      // trajectories (and their cost gaps) are established within a few
      // thousand bins. Score a PREFIX of each chunk — the context
      // evolution over the walked region is exactly the full walk's, only
      // truncated — capped at max(16384, n/4) elements. Encoder-side
      // heuristic only: a different pick would still be a valid
      // bitstream, and the golden-fixture tests pin that the pick (and
      // therefore every byte) is unchanged on real tensors.
      const int64_t n = (r1 - r0) * w;
      const int64_t m = n <= 16384 ? n : std::max<int64_t>(16384, n >> 2);
      int state = 0;
      int prev_sig = 0;
      for (int64_t i = r0 * w; i < r0 * w + m; ++i) {
        const int32_t q = v[i];
        est.value(q, sig_ctx_of(dq_flag, state, prev_sig), E.unary_len);
        prev_sig = q != 0;
        if (dq_flag)
          state = kStateTrans[state][(int)(std::llabs((long long)q) & 1)];
      }
    }
    profile = est.best();
  }

  for (int64_t c = 0; c < chunks; ++c) {
    if (c > 0) {
      // independent chunk: record offset, reset engine + contexts
      E.close_engine();
      const uint64_t off = (uint64_t)((int64_t)E.stream.size() - layer_start);
      E.entry_points.push_back((off << 11));  // value/state fields unused
      E.cx.init(E.unary_len);
    }
    E.ensure_open();
    if (c == 0) E.rc.encode_bypass_bits((uint32_t)profile, 2);
    E.cx.set_profile(profile);
    const int64_t r0 = c * bh;
    const int64_t r1 = std::min(h, r0 + bh);
    encode_tensor_bins(E.rc, E.cx, v, r0, r1, w, dq_flag, E.unary_len);
    if (chunks > 1) E.close_engine();
  }
}

// Decode one chunk independently from absolute byte offset `start`; returns
// the end position (exact, symmetric byte accounting).
static int64_t decode_chunk_at(const uint8_t* data, int64_t size,
                               int64_t start, int32_t* v, int64_t r0,
                               int64_t r1, int64_t w, int dq_flag,
                               int unary_len, int profile, bool read_profile) {
  RangeDecoder rc;
  rc.start(data, size, start);
  TensorCtxs cx;
  cx.init(unary_len);
  if (read_profile) (void)rc.decode_bypass_bits(2);
  cx.set_profile(profile);
  int state = 0;
  int prev_sig = 0;
  for (int64_t i = r0 * w; i < r1 * w; ++i) {
    const int32_t q = decode_value(rc, cx,
                                   sig_ctx_of(dq_flag, state, prev_sig),
                                   unary_len);
    v[i] = q;
    prev_sig = q != 0;
    if (dq_flag) state = kStateTrans[state][(int)(std::llabs((long long)q) & 1)];
  }
  return rc.pos();
}

static void decode_layer_impl(Decoder& D, int32_t* v, int64_t h, int64_t w,
                              int dq_flag, int scan_order, bool create_eps) {
  const int64_t chunks = num_chunks(h, w, scan_order);
  const int64_t bh = chunks > 1 ? block_row_height(scan_order) : h;
  if (chunks > 1) D.close_engine();  // matches the encoder's anchor flush
  const int64_t layer_start = D.segment_start;
  if (create_eps) D.entry_points.clear();

  // entry-point fast path: all chunk starts are known, so block-rows decode
  // independently (threaded where cores exist; also the seek primitive for
  // random access). Mirrors the reference's setEntryPoints -> decodeLayer
  // (reference: nnc_core/coder/__init__.py:439).
  if (chunks > 1 && (int64_t)D.set_eps.size() == chunks - 1) {
    std::vector<int64_t> starts(chunks);
    starts[0] = layer_start;
    for (int64_t c = 1; c < chunks; ++c)
      starts[c] = layer_start + (int64_t)(D.set_eps[c - 1] >> 11);
    // profile is signaled once at the start of chunk 0
    RangeDecoder prc;
    prc.start(D.stream.data(), (int64_t)D.stream.size(), layer_start);
    const int profile = (int)prc.decode_bypass_bits(2);

    int64_t last_end = 0;
    auto work = [&](int64_t c0, int64_t c1) {
      for (int64_t c = c0; c < c1; ++c) {
        const int64_t r0 = c * bh;
        const int64_t r1 = std::min(h, r0 + bh);
        const int64_t end = decode_chunk_at(
            D.stream.data(), (int64_t)D.stream.size(), starts[c], v, r0, r1,
            w, dq_flag, D.unary_len, profile, c == 0);
        if (c == chunks - 1) last_end = end;
      }
    };
    const int64_t nt = std::min<int64_t>(
        chunks, std::max(1u, std::thread::hardware_concurrency()));
    if (nt > 1) {
      std::vector<std::thread> pool;
      const int64_t per = (chunks + nt - 1) / nt;
      for (int64_t t = 0; t < nt; ++t) {
        const int64_t c0 = t * per;
        const int64_t c1 = std::min(chunks, c0 + per);
        if (c0 < c1) pool.emplace_back(work, c0, c1);
      }
      for (auto& th : pool) th.join();
    } else {
      work(0, chunks);
    }
    if (create_eps) {
      for (int64_t c = 1; c < chunks; ++c)
        D.entry_points.push_back((uint64_t)(starts[c] - layer_start) << 11);
    }
    D.segment_start = last_end;
    D.engine_open = false;
    D.set_eps.clear();
    return;
  }
  D.set_eps.clear();  // stale/mismatched entry points are ignored

  int profile = 0;
  for (int64_t c = 0; c < chunks; ++c) {
    if (c > 0) {
      D.close_engine();
      if (create_eps) {
        const uint64_t off = (uint64_t)(D.segment_start - layer_start);
        D.entry_points.push_back(off << 11);
      }
      D.cx.init(D.unary_len);
    }
    D.ensure_open();
    if (c == 0) profile = (int)D.rc.decode_bypass_bits(2);
    D.cx.set_profile(profile);
    const int64_t r0 = c * bh;
    const int64_t r1 = std::min(h, r0 + bh);
    int state = 0;
    int prev_sig = 0;
    for (int64_t i = r0 * w; i < r1 * w; ++i) {
      const int32_t q = decode_value(D.rc, D.cx,
                                     sig_ctx_of(dq_flag, state, prev_sig),
                                     D.unary_len);
      v[i] = q;
      prev_sig = q != 0;
      if (dq_flag) state = kStateTrans[state][(int)(std::llabs((long long)q) & 1)];
    }
    if (chunks > 1) D.close_engine();
  }
}

}  // namespace

// ============================================================================
// C API
// ============================================================================
extern "C" {

// ---- Encoder ----
void* dc_enc_new() { return new Encoder(); }
void dc_enc_delete(void* e) { delete (Encoder*)e; }

void dc_enc_init_ctx(void* e, int cabac_unary_length_minus1, int param_opt_flag) {
  ((Encoder*)e)->init_ctx(cabac_unary_length_minus1, param_opt_flag);
}

// RD(-ish) quantization of a layer. Returns the (possibly clipped) qp.
int dc_quant_layer(const float* x, int32_t* out, int64_t h, int64_t w,
                   int dq_flag, int qp_density, int qp, double lambda_scale,
                   int cabac_unary_length_minus1, int scan_order) {
  const int64_t n = h * w;
  // int32 overflow guard: bump qp (coarser) until max level fits comfortably.
  double maxabs = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    const double a = std::fabs((double)x[i]);
    if (a > maxabs) maxabs = a;
  }
  double delta = stepsize_from_qp(qp, qp_density);
  while (maxabs / delta * 2.0 + 2.0 > 2147483000.0) {
    qp += 1;
    delta = stepsize_from_qp(qp, qp_density);
  }

  if (!dq_flag) {
    quant_uniform(x, out, n, delta);
    return qp;
  }
  const double lambda =
      lambda_scale > 0.0 ? lambda_scale * delta * delta : 0.0;
  const int unary_len = cabac_unary_length_minus1 + 1;
  const int64_t chunks = num_chunks(h, w, scan_order);
  const int64_t bh = chunks > 1 ? block_row_height(scan_order) : h;
  for (int64_t c = 0; c < chunks; ++c) {
    const int64_t r0 = c * bh;
    const int64_t r1 = std::min(h, r0 + bh);
    quant_dq_chunk(x + r0 * w, out + r0 * w, (r1 - r0) * w, delta, lambda,
                   unary_len);
  }
  return qp;
}

void dc_enc_encode_layer(void* e, const int32_t* v, int64_t h, int64_t w,
                         int dq_flag, int scan_order) {
  Encoder& E = *(Encoder*)e;
  E.ensure_open();
  encode_layer_impl(E, v, h, w, dq_flag, scan_order);
}

// Signed fixed-width integer as bypass bins in the CABAC stream.
void dc_enc_iae_v(void* e, int nbits, int32_t value) {
  Encoder& E = *(Encoder*)e;
  E.ensure_open();
  uint32_t u = (uint32_t)value & ((nbits >= 32) ? 0xFFFFFFFFu
                                                : ((1u << nbits) - 1u));
  E.rc.encode_bypass_bits(u, nbits);
}

// Terminate the engine; returns total stream length. Buffer via dc_enc_data.
int64_t dc_enc_finish(void* e) {
  Encoder& E = *(Encoder*)e;
  E.close_engine();
  return (int64_t)E.stream.size();
}

const uint8_t* dc_enc_data(void* e) { return ((Encoder*)e)->stream.data(); }

int64_t dc_enc_bytes_written(void* e) {
  return (int64_t)((Encoder*)e)->stream.size();
}

// Terminate the current engine run (segment boundary) without finishing.
void dc_enc_terminate_segment(void* e) { ((Encoder*)e)->close_engine(); }

int dc_enc_num_entry_points(void* e) {
  return (int)((Encoder*)e)->entry_points.size();
}
void dc_enc_get_entry_points(void* e, uint64_t* out) {
  Encoder& E = *(Encoder*)e;
  std::memcpy(out, E.entry_points.data(),
              E.entry_points.size() * sizeof(uint64_t));
}

// ---- Decoder ----
void* dc_dec_new() { return new Decoder(); }
void dc_dec_delete(void* d) { delete (Decoder*)d; }

void dc_dec_set_stream(void* d, const uint8_t* data, int64_t n) {
  Decoder& D = *(Decoder*)d;
  D.stream.assign(data, data + n);
  D.segment_start = 0;
  D.engine_open = false;
}

void dc_dec_init_ctx(void* d, int cabac_unary_length_minus1) {
  ((Decoder*)d)->init_ctx(cabac_unary_length_minus1);
}

int32_t dc_dec_iae_v(void* d, int nbits) {
  Decoder& D = *(Decoder*)d;
  D.ensure_open();
  uint32_t u = D.rc.decode_bypass_bits(nbits);
  if (nbits < 32 && (u & (1u << (nbits - 1)))) u |= ~((1u << nbits) - 1u);
  return (int32_t)u;
}

void dc_dec_decode_layer(void* d, int32_t* v, int64_t h, int64_t w,
                         int dq_flag, int scan_order) {
  Decoder& D = *(Decoder*)d;
  D.ensure_open();
  decode_layer_impl(D, v, h, w, dq_flag, scan_order, false);
}

void dc_dec_decode_layer_and_create_eps(void* d, int32_t* v, int64_t h,
                                        int64_t w, int dq_flag,
                                        int scan_order) {
  Decoder& D = *(Decoder*)d;
  D.ensure_open();
  decode_layer_impl(D, v, h, w, dq_flag, scan_order, true);
}

int dc_dec_num_entry_points(void* d) {
  return (int)((Decoder*)d)->entry_points.size();
}
void dc_dec_get_entry_points(void* d, uint64_t* out) {
  Decoder& D = *(Decoder*)d;
  std::memcpy(out, D.entry_points.data(),
              D.entry_points.size() * sizeof(uint64_t));
}
void dc_dec_set_entry_points(void* d, const uint64_t* eps, int n) {
  Decoder& D = *(Decoder*)d;
  D.set_eps.assign(eps, eps + n);
}

// Random access: decode only chunks [c0, c1) of a scan_order>0 layer into
// the corresponding rows of v, seeking via the entry points provided with
// dc_dec_set_entry_points (which are NOT consumed). The decoder must be
// positioned at the layer (after the per-tensor iae_v qp delta); its
// sequential position is left at the layer start.
int dc_dec_decode_rows(void* d, int32_t* v, int64_t h, int64_t w,
                       int dq_flag, int scan_order, int64_t c0, int64_t c1) {
  Decoder& D = *(Decoder*)d;
  const int64_t chunks = num_chunks(h, w, scan_order);
  const int64_t bh = chunks > 1 ? block_row_height(scan_order) : h;
  if (chunks <= 1 || (int64_t)D.set_eps.size() != chunks - 1 ||
      c0 < 0 || c1 > chunks || c0 >= c1)
    return -1;
  D.close_engine();  // anchor (symmetric with the encoder's pre-layer flush)
  const int64_t layer_start = D.segment_start;
  RangeDecoder prc;
  prc.start(D.stream.data(), (int64_t)D.stream.size(), layer_start);
  const int profile = (int)prc.decode_bypass_bits(2);
  for (int64_t c = c0; c < c1; ++c) {
    const int64_t start = c == 0 ? layer_start
        : layer_start + (int64_t)(D.set_eps[c - 1] >> 11);
    const int64_t r0 = c * bh;
    const int64_t r1 = std::min(h, r0 + bh);
    decode_chunk_at(D.stream.data(), (int64_t)D.stream.size(), start, v, r0,
                    r1, w, dq_flag, D.unary_len, profile, c == 0);
  }
  return 0;
}

// Terminate the current engine run; position advances exactly past the segment.
void dc_dec_terminate_segment(void* d) { ((Decoder*)d)->close_engine(); }

// Bytes consumed so far (exact; for unit-size verification).
int64_t dc_dec_finish(void* d) {
  Decoder& D = *(Decoder*)d;
  D.close_engine();
  return D.segment_start;
}

// Dequantize int32 levels -> float32. dq_flag selects dependent reconstruction
// (8-state machine driven by decoded level parities, reset per block-row when
// scan_order>0), matching dc_quant_layer.
void dc_dequant_layer(float* out, const int32_t* v, int64_t h, int64_t w,
                      int qp_density, int qp, int scan_order, int dq_flag) {
  const double delta = stepsize_from_qp(qp, qp_density);
  const int64_t n = h * w;
  if (!dq_flag) {
    for (int64_t i = 0; i < n; ++i) out[i] = (float)((double)v[i] * delta);
    return;
  }
  const int64_t chunks = num_chunks(h, w, scan_order);
  const int64_t bh = chunks > 1 ? block_row_height(scan_order) : h;
  // the state walk is a serial scan over level parities, but the
  // reconstruction arithmetic is not — split the two so the math pass
  // auto-vectorizes (value-identical to recon_dq: same double
  // expression, exact negation; parity of v equals parity of |v| in
  // two's complement)
  std::vector<uint8_t> off((size_t)n);
  for (int64_t c = 0; c < chunks; ++c) {
    const int64_t r0 = c * bh;
    const int64_t r1 = std::min(h, r0 + bh);
    int state = 0;
    for (int64_t i = r0 * w; i < r1 * w; ++i) {
      // zeroed where v==0 so the math pass yields an exact +0.0 there
      off[(size_t)i] = (uint8_t)(q_offset(state) & (int)(v[i] != 0));
      state = kStateTrans[state][(int)((uint32_t)v[i] & 1u)];
    }
  }
  const double half_delta = delta * 0.5;
  for (int64_t i = 0; i < n; ++i) {
    const double dq_ = (double)v[i];
    // 2|q|, the power-of-two scaling, and the final negation are exact,
    // so this matches recon_dq bit for bit (q==0 hits off==0 → +0.0);
    // fabs/copysign keep the loop branch-free so it vectorizes (the
    // ternary int64 form did not)
    const double val = (std::fabs(dq_) * 2.0 - (double)off[(size_t)i])
                       * half_delta;
    out[i] = (float)std::copysign(val, dq_);
  }
}

double dc_stepsize_from_qp(int qp, int qp_density) {
  return stepsize_from_qp(qp, qp_density);
}

}  // extern "C"
