// neural_speed_tpu native runtime library: GGUF/ggml block codecs and
// planar bit-packing — the host-side data-loader hot loops.
//
// Parity: the reference implements these natively too — ggml block
// dequantize (neural_speed/core/ne_layers.c quantize_fns + vec_dot.h block
// layouts) and BesTLA's compressWeight bit-packing
// (bestla/bestla/bestla_prologue_b.h:378-460).  The TPU build keeps device
// compute in XLA/Pallas; this library covers the CPU-bound
// checkpoint-ingestion path (GGUF -> packed QTensor), with the Python
// implementations in convert/gguf.py + ops/quantize.py as the
// reference/fallback.
//
// Build:  make -C native    (-> neural_speed_tpu/_nst_native.so)
// All layouts match the Python implementations bit-for-bit; tests
// cross-check (tests/test_native.py).

#include <cstdint>
#include <cstring>

namespace {

// fp16 (IEEE binary16) -> fp32, round-trip exact for all finite values.
inline float fp16_to_fp32(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t man = h & 0x3FF;
  uint32_t bits;
  if (exp == 0) {
    if (man == 0) {
      bits = sign;  // +-0
    } else {        // subnormal: normalize
      int shift = 0;
      while (!(man & 0x400)) {
        man <<= 1;
        ++shift;
      }
      man &= 0x3FF;
      bits = sign | ((127 - 14 - shift) << 23) | (man << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7F800000u | (man << 13);  // inf/nan
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
  }
  float f;
  std::memcpy(&f, &bits, 4);
  return f;
}

inline uint16_t rd16(const uint8_t* p) {
  uint16_t v;
  std::memcpy(&v, p, 2);
  return v;
}

inline uint32_t rd32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

}  // namespace

extern "C" {

// ---- ggml block codecs ---------------------------------------------------
// Every decoder writes unsigned codes + per-block scale(s), matching the
// Python decode_* functions in convert/gguf.py exactly.

// Q4_0: 18-byte block = d[f16] qs[16]; codes = [lo nibbles, hi nibbles].
int nst_decode_q4_0(const uint8_t* raw, int64_t nb, uint8_t* codes,
                    float* d) {
  for (int64_t b = 0; b < nb; ++b) {
    const uint8_t* blk = raw + b * 18;
    d[b] = fp16_to_fp32(rd16(blk));
    const uint8_t* qs = blk + 2;
    uint8_t* c = codes + b * 32;
    for (int i = 0; i < 16; ++i) {
      c[i] = qs[i] & 0xF;
      c[16 + i] = qs[i] >> 4;
    }
  }
  return 0;
}

// Q4_1: 20-byte block = d[f16] m[f16] qs[16].
int nst_decode_q4_1(const uint8_t* raw, int64_t nb, uint8_t* codes, float* d,
                    float* m) {
  for (int64_t b = 0; b < nb; ++b) {
    const uint8_t* blk = raw + b * 20;
    d[b] = fp16_to_fp32(rd16(blk));
    m[b] = fp16_to_fp32(rd16(blk + 2));
    const uint8_t* qs = blk + 4;
    uint8_t* c = codes + b * 32;
    for (int i = 0; i < 16; ++i) {
      c[i] = qs[i] & 0xF;
      c[16 + i] = qs[i] >> 4;
    }
  }
  return 0;
}

namespace {
inline void q5_codes(const uint8_t* qs, uint32_t qh, uint8_t* c) {
  for (int i = 0; i < 16; ++i) {
    c[i] = (qs[i] & 0xF) | (((qh >> i) & 1) << 4);
    c[16 + i] = (qs[i] >> 4) | (((qh >> (16 + i)) & 1) << 4);
  }
}
}  // namespace

// Q5_0: 22-byte block = d[f16] qh[u32] qs[16].
int nst_decode_q5_0(const uint8_t* raw, int64_t nb, uint8_t* codes,
                    float* d) {
  for (int64_t b = 0; b < nb; ++b) {
    const uint8_t* blk = raw + b * 22;
    d[b] = fp16_to_fp32(rd16(blk));
    q5_codes(blk + 6, rd32(blk + 2), codes + b * 32);
  }
  return 0;
}

// Q5_1: 24-byte block = d[f16] m[f16] qh[u32] qs[16].
int nst_decode_q5_1(const uint8_t* raw, int64_t nb, uint8_t* codes, float* d,
                    float* m) {
  for (int64_t b = 0; b < nb; ++b) {
    const uint8_t* blk = raw + b * 24;
    d[b] = fp16_to_fp32(rd16(blk));
    m[b] = fp16_to_fp32(rd16(blk + 2));
    q5_codes(blk + 8, rd32(blk + 4), codes + b * 32);
  }
  return 0;
}

// Q8_0: 34-byte block = d[f16] q[i8 x32]; codes = q + 128 (unsigned).
int nst_decode_q8_0(const uint8_t* raw, int64_t nb, uint8_t* codes,
                    float* d) {
  for (int64_t b = 0; b < nb; ++b) {
    const uint8_t* blk = raw + b * 34;
    d[b] = fp16_to_fp32(rd16(blk));
    const int8_t* q = reinterpret_cast<const int8_t*>(blk + 2);
    uint8_t* c = codes + b * 32;
    for (int i = 0; i < 32; ++i) c[i] = (uint8_t)((int)q[i] + 128);
  }
  return 0;
}

// Q6_K: 210-byte super-block = ql[128] qh[64] scales[16 i8] d[f16];
// codes unsigned 6-bit; scales[b*16+g] = d * sc[g].
int nst_decode_q6_k(const uint8_t* raw, int64_t nb, uint8_t* codes,
                    float* scales) {
  for (int64_t b = 0; b < nb; ++b) {
    const uint8_t* blk = raw + b * 210;
    const uint8_t* ql = blk;
    const uint8_t* qh = blk + 128;
    const int8_t* sc = reinterpret_cast<const int8_t*>(blk + 192);
    float d = fp16_to_fp32(rd16(blk + 208));
    uint8_t* c = codes + b * 256;
    for (int half = 0; half < 2; ++half) {
      const uint8_t* lo = ql + half * 64;
      const uint8_t* hi = qh + half * 32;
      for (int j = 0; j < 2; ++j) {
        int base = half * 128 + j * 64;
        for (int i = 0; i < 32; ++i) {
          uint8_t q4a = (lo[i] >> (4 * j)) & 0xF;
          uint8_t q4b = (lo[32 + i] >> (4 * j)) & 0xF;
          uint8_t ba = (hi[i] >> (2 * j)) & 3;
          uint8_t bb = (hi[i] >> (2 * j + 4)) & 3;
          c[base + i] = q4a | (ba << 4);
          c[base + 32 + i] = q4b | (bb << 4);
        }
      }
    }
    for (int g = 0; g < 16; ++g) scales[b * 16 + g] = d * (float)sc[g];
  }
  return 0;
}

// ---- planar bit-packing --------------------------------------------------
// word[kb, n] bit-range [w*i, w*(i+1)) holds codes[i*(K/e) + kb, n]
// (ops/quantize.py pack_plane layout).

int nst_pack_planar(const uint8_t* codes, int64_t k, int64_t n, int width,
                    uint32_t* words) {
  int e = 32 / width;
  int64_t kw = k / e;
  for (int64_t kb = 0; kb < kw; ++kb) {
    uint32_t* wrow = words + kb * n;
    std::memset(wrow, 0, sizeof(uint32_t) * n);
    for (int i = 0; i < e; ++i) {
      const uint8_t* crow = codes + (int64_t)(i * kw + kb) * n;
      int shift = width * i;
      for (int64_t j = 0; j < n; ++j)
        wrow[j] |= ((uint32_t)crow[j]) << shift;
    }
  }
  return 0;
}

int nst_unpack_planar(const uint32_t* words, int64_t kw, int64_t n, int width,
                      uint8_t* codes) {
  int e = 32 / width;
  uint32_t mask = (width == 32) ? 0xFFFFFFFFu : ((1u << width) - 1);
  for (int i = 0; i < e; ++i) {
    int shift = width * i;
    for (int64_t kb = 0; kb < kw; ++kb) {
      const uint32_t* wrow = words + kb * n;
      uint8_t* crow = codes + (int64_t)(i * kw + kb) * n;
      for (int64_t j = 0; j < n; ++j)
        crow[j] = (uint8_t)((wrow[j] >> shift) & mask);
    }
  }
  return 0;
}

// ---- RTN group quantization (sym int) ------------------------------------
// Per-group symmetric round-to-nearest over [K, N] fp32 weights: the
// converter hot loop (parity: WeightKBlockNInteger::quantizeWeight,
// bestla_prologue_b.h:472+).  codes are unsigned with offset 2^(bits-1).

int nst_rtn_quantize_sym(const float* w, int64_t k, int64_t n, int64_t group,
                         int bits, uint8_t* codes, float* scales) {
  int maxq = (1 << (bits - 1)) - 1;
  int offset = 1 << (bits - 1);
  int64_t groups = k / group;
  for (int64_t g = 0; g < groups; ++g) {
    for (int64_t j = 0; j < n; ++j) {
      float amax = 1e-8f;
      for (int64_t r = 0; r < group; ++r) {
        float v = w[(g * group + r) * n + j];
        float a = v < 0 ? -v : v;
        if (a > amax) amax = a;
      }
      float s = amax / (float)maxq;
      scales[g * n + j] = s;
      float inv = 1.0f / s;
      for (int64_t r = 0; r < group; ++r) {
        float v = w[(g * group + r) * n + j] * inv;
        int q = (int)(v >= 0 ? v + 0.5f : v - 0.5f);
        if (q > maxq) q = maxq;
        if (q < -maxq) q = -maxq;
        codes[(g * group + r) * n + j] = (uint8_t)(q + offset);
      }
    }
  }
  return 0;
}

}  // extern "C"
