// Fixture generator (round 5): NFloat (f4/nf4/fp8) and double-quant
// (DQ8_BNB) BesTLA storages, serialized with the reference's own
// prologue + dumped with the reference's own unpackWeight dequant as
// ground truth (same harness as gen.cpp / gen2.cpp).
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>
#include "bestla/bestla_prologue_b.h"
#include "bestla/bestla_parallel.h"
#include "bestla/bestla_gemm.h"

using namespace bestla;

static parallel::StdThreading gth;

template <class Pro, class Stor>
void dump(const char* tag, int N, int K, Pro& proB, Stor& stor,
          std::vector<float>& B) {
  proB.packWeight(N, K, B.data(), N, &stor, &gth);
  std::vector<int8_t> ser(stor.mSize);
  stor.serialize(ser.data());
  std::vector<float> deq(static_cast<size_t>(N) * K);
  proB.unpackWeight(N, K, &stor, deq.data(), N, &gth);
  std::string base = std::string("/tmp/btla_fix/") + tag;
  FILE* f = fopen((base + ".stor").c_str(), "wb");
  fwrite(ser.data(), 1, ser.size(), f); fclose(f);
  f = fopen((base + ".deq").c_str(), "wb");
  fwrite(deq.data(), 4, deq.size(), f); fclose(f);
  f = fopen((base + ".src").c_str(), "wb");
  fwrite(B.data(), 4, B.size(), f); fclose(f);
  printf("%s: mSize=%zu NPad=%d KPad=%d\n", tag, (size_t)stor.mSize,
         stor.mNPad, stor.mKPad);
}

template <class GemmCore>
void gen_nf(const char* tag, int N, int K, int blk, BTLA_DTYPE ft,
            BTLA_DTYPE st) {
  prologue_b::gemm::WeightKBlockNFloat<GemmCore> proB;
  auto stor = proB.createStorage(N, K, blk, ft, st);
  std::vector<int8_t> buf(stor.mSize);
  stor.assign(buf.data());
  std::vector<float> B(static_cast<size_t>(N) * K);
  srand(11);
  for (auto& v : B) v = (rand() % 1000 - 500) / 500.f;
  dump(tag, N, K, proB, stor, B);
}

template <class GemmCore>
void gen_int_dq(const char* tag, int N, int K, int blk, BTLA_DTYPE qt) {
  prologue_b::gemm::WeightKBlockNInteger<GemmCore> proB;
  auto stor = proB.createStorage(N, K, blk, qt, BTLA_DTYPE::DQ8_BNB,
                                 BTLA_DTYPE::F32, false);
  std::vector<int8_t> buf(stor.mSize);
  stor.assign(buf.data());
  std::vector<float> B(static_cast<size_t>(N) * K);
  srand(13);
  for (auto& v : B) v = (rand() % 1000 - 500) / 500.f;
  dump(tag, N, K, proB, stor, B);
}

int main() {
  gth.set_threads(2);
  using F32Core = gemm::SCoreRowNAvx512f<48, 8>;
  gen_nf<F32Core>("nf4_g64_f32_avx512f", 64, 256, 64,
                  BTLA_DTYPE::F4_NF4, BTLA_DTYPE::F32);
  gen_nf<F32Core>("nf4_g32_bf16_avx512f", 64, 256, 32,
                  BTLA_DTYPE::F4_NF4, BTLA_DTYPE::BF16);
  gen_nf<F32Core>("fp4e2m1_g32_f32_avx512f", 64, 256, 32,
                  BTLA_DTYPE::F4_E2M1, BTLA_DTYPE::F32);
  gen_nf<F32Core>("fp4bnb_g32_f32_avx512f", 64, 256, 32,
                  BTLA_DTYPE::F4_BNB, BTLA_DTYPE::F32);
  gen_nf<F32Core>("nf4_g32_dq8_avx512f", 64, 256, 32,
                  BTLA_DTYPE::F4_NF4, BTLA_DTYPE::DQ8_BNB);
  gen_nf<F32Core>("fp8e4m3_g128_f32_avx512f", 64, 256, 128,
                  BTLA_DTYPE::F8_E4M3, BTLA_DTYPE::F32);
  gen_nf<F32Core>("fp8e4m3_g128_e8m0_avx512f", 64, 256, 128,
                  BTLA_DTYPE::F8_E4M3, BTLA_DTYPE::F8_E8M0);
  gen_nf<F32Core>("fp8e5m2_g128_f32_avx512f", 64, 256, 128,
                  BTLA_DTYPE::F8_E5M2, BTLA_DTYPE::F32);
  gen_int_dq<F32Core>("s4_g32_dq8_avx512f", 64, 256, 32,
                      BTLA_DTYPE::S4_CLIP);
  // block > K (the reference keeps the nominal block): one spanning group
  gen_nf<F32Core>("nf4_g128_k64_f32_avx512f", 64, 64, 128,
                  BTLA_DTYPE::F4_NF4, BTLA_DTYPE::F32);
  return 0;
}
