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
#include <memory>
#include <mutex>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

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

// ---- SPM tokenizer (score-based greedy bigram merge) ---------------------
// Parity: the reference tokenizes natively (model_tokenize,
// model_utils.cpp:1858-1881 — the llama.cpp llm_tokenizer_spm algorithm).
// Priority-queue implementation, O(n log n) vs the Python fallback's
// rescan loop (convert/gguf.py GGUFTokenizer.encode); results are
// bit-identical: the queue pops the globally best-scoring currently-valid
// bigram, ties broken by leftmost position — exactly the Python scan order.

namespace {

struct SpmVocab {
  std::vector<std::string> tokens;
  std::vector<float> scores;
  std::unordered_map<std::string, int32_t> lookup;
};

// shared_ptr: an in-flight encode keeps its vocab alive even if
// nst_spm_free runs concurrently on another thread
std::vector<std::shared_ptr<SpmVocab>> g_spm;
std::mutex g_spm_mu;

struct SpmSym {
  int prev, next;
  const char* p;
  int n;  // bytes; 0 = merged away
};

struct SpmBigram {
  int left;     // symbol index of the left element
  float score;  // vocab score of the merged token
  int size;     // total bytes at push time (staleness check)
  int32_t id;
};

struct SpmCmp {
  // max-heap on score; ties -> leftmost first (Python scan order).
  bool operator()(const SpmBigram& a, const SpmBigram& b) const {
    return a.score < b.score || (a.score == b.score && a.left > b.left);
  }
};

inline int utf8_len(uint8_t c) {
  if (c < 0x80) return 1;
  if ((c & 0xE0) == 0xC0) return 2;
  if ((c & 0xF0) == 0xE0) return 3;
  if ((c & 0xF8) == 0xF0) return 4;
  return 1;  // invalid byte: treat as 1 (mirrors Python's per-char split)
}

}  // namespace

extern "C" {

// tokens = concatenated UTF-8 bytes, offsets[n+1] prefix offsets.
int64_t nst_spm_new(const uint8_t* bytes, const int64_t* offsets, int32_t n,
                    const float* scores) {
  auto v = std::make_shared<SpmVocab>();
  v->tokens.reserve(n);
  v->scores.assign(scores, scores + n);
  for (int32_t i = 0; i < n; ++i)
    v->tokens.emplace_back(reinterpret_cast<const char*>(bytes) + offsets[i],
                           (size_t)(offsets[i + 1] - offsets[i]));
  // duplicate tokens: last index wins (Python dict-comprehension semantics)
  for (int32_t i = 0; i < n; ++i) v->lookup[v->tokens[i]] = i;
  std::lock_guard<std::mutex> g(g_spm_mu);
  g_spm.push_back(std::move(v));
  return (int64_t)g_spm.size();  // handle = index + 1
}

void nst_spm_free(int64_t handle) {
  std::lock_guard<std::mutex> g(g_spm_mu);
  if (handle >= 1 && handle <= (int64_t)g_spm.size())
    g_spm[handle - 1].reset();
}

// text: normalized UTF-8 (caller did the "▁" substitution);
// byte_ids[256]: id of <0xXX> byte-fallback tokens, -1 if absent.
// Returns the number of ids written (<= max_out), or -1 on bad handle.
int64_t nst_spm_encode(int64_t handle, const uint8_t* text, int64_t len,
                       const int32_t* byte_ids, int32_t unk_id, int32_t* out,
                       int64_t max_out) {
  std::shared_ptr<SpmVocab> v;
  {
    std::lock_guard<std::mutex> g(g_spm_mu);
    if (handle < 1 || handle > (int64_t)g_spm.size() || !g_spm[handle - 1])
      return -1;
    v = g_spm[handle - 1];
  }
  // split into code points
  std::vector<SpmSym> syms;
  for (int64_t i = 0; i < len;) {
    int n = utf8_len(text[i]);
    if (i + n > len) n = (int)(len - i);
    SpmSym s;
    s.p = reinterpret_cast<const char*>(text) + i;
    s.n = n;
    s.prev = (int)syms.size() - 1;
    s.next = (i + n < len) ? (int)syms.size() + 1 : -1;
    syms.push_back(s);
    i += n;
  }

  std::priority_queue<SpmBigram, std::vector<SpmBigram>, SpmCmp> work;
  std::string cat;
  auto try_add = [&](int l, int r) {
    if (l < 0 || r < 0) return;
    cat.assign(syms[l].p, (size_t)(syms[l].n + syms[r].n));
    auto it = v->lookup.find(cat);
    if (it == v->lookup.end()) return;
    work.push({l, v->scores[it->second], syms[l].n + syms[r].n, it->second});
  };
  for (int i = 0; i + 1 < (int)syms.size(); ++i) try_add(i, i + 1);

  while (!work.empty()) {
    SpmBigram b = work.top();
    work.pop();
    SpmSym& l = syms[b.left];
    if (l.n == 0 || l.next < 0) continue;
    SpmSym& r = syms[l.next];
    if (l.n + r.n != b.size) continue;  // stale
    l.n += r.n;
    r.n = 0;
    l.next = r.next;
    if (r.next >= 0) syms[r.next].prev = b.left;
    try_add(l.prev, b.left);
    try_add(b.left, l.next);
  }

  int64_t m = 0;
  for (int i = 0; i >= 0 && i < (int)syms.size(); i = syms[i].next) {
    if (syms[i].n == 0) continue;
    cat.assign(syms[i].p, (size_t)syms[i].n);
    auto it = v->lookup.find(cat);
    if (it != v->lookup.end()) {
      if (m >= max_out) return m;
      out[m++] = it->second;
    } else {
      for (int j = 0; j < syms[i].n; ++j) {
        int32_t id = byte_ids[(uint8_t)cat[j]];
        if (m >= max_out) return m;
        out[m++] = id >= 0 ? id : unk_id;
      }
    }
  }
  return m;
}

}  // extern "C"
