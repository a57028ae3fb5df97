// Fixture generator: quantize+pack a known matrix with the reference
// BesTLA prologue, serialize the storage, and dump the reference
// dequantization (unpackWeight) as ground truth.
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>
#include "bestla/bestla_prologue_b.h"
#include "bestla/bestla_parallel.h"
#include "bestla/bestla_gemm.h"

using namespace bestla;

static parallel::StdThreading gth;

template <class GemmCore>
void gen(const char* tag, int N, int K, int blk, BTLA_DTYPE qt,
         BTLA_DTYPE st, bool asym) {
  prologue_b::gemm::WeightKBlockNInteger<GemmCore> proB;
  auto stor = proB.createStorage(N, K, blk, qt, st, BTLA_DTYPE::F32, asym);
  std::vector<int8_t> buf(stor.mSize);
  stor.assign(buf.data());
  std::vector<float> B(static_cast<size_t>(N) * K);
  srand(7);
  for (auto& v : B) v = (rand() % 1000 - 500) / 500.f;
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
  printf("%s: mSize=%zu CoreId=%llx NPad=%d KPad=%d\n", tag, stor.mSize,
         (unsigned long long)stor.mCoreId, stor.mNPad, stor.mKPad);
}

int main() {
  gth.set_threads(2);
  using F32Core = gemm::SCoreRowNAvx512f<48, 8>;
  using F32Avx2 = gemm::SCoreRowNAvx2<24, 4>;
  using I8Core = gemm::ICoreRowNAvx512vnniKBlock<48, 4>;
  gen<F32Core>("s4_g128_sym_f32_avx512f", 64, 256, 128,
               BTLA_DTYPE::S4_CLIP, BTLA_DTYPE::F32, false);
  gen<F32Core>("s4_g32_asym_f32_avx512f", 100, 256, 32,
               BTLA_DTYPE::S4_CLIP, BTLA_DTYPE::F32, true);
  gen<F32Avx2>("s4_g128_sym_bf16_avx2", 64, 256, 128,
               BTLA_DTYPE::S4_CLIP, BTLA_DTYPE::BF16, false);
  gen<I8Core>("s4_g128_sym_f32_vnni", 64, 256, 128,
              BTLA_DTYPE::S4_CLIP, BTLA_DTYPE::F32, false);
  gen<I8Core>("s8_g128_sym_f32_vnni", 64, 256, 128,
              BTLA_DTYPE::S8, BTLA_DTYPE::F32, false);
  gen<F32Core>("s3_g128_sym_f32_avx512f", 64, 256, 128,
               BTLA_DTYPE::S3_CLIP, BTLA_DTYPE::F32, false);
  gen<F32Core>("s5_g128_sym_f32_avx512f", 64, 256, 128,
               BTLA_DTYPE::S5_CLIP, BTLA_DTYPE::F32, false);
  gen<F32Core>("s6_g128_sym_f32_avx512f", 64, 256, 128,
               BTLA_DTYPE::S6_CLIP, BTLA_DTYPE::F32, false);
  gen<F32Core>("s7_g128_sym_f32_avx512f", 64, 256, 128,
               BTLA_DTYPE::S7_CLIP, BTLA_DTYPE::F32, false);
  gen<F32Core>("s2_g128_sym_f32_avx512f", 64, 256, 128,
               BTLA_DTYPE::S2_CLIP, BTLA_DTYPE::F32, false);
  return 0;
}
