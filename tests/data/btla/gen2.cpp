// Tiny-llama worth of BTLA-packed tensors: for each named linear, emit
// .stor (serialized storage) and .src (the float weights, [K, N] f32).
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>
#include "bestla/bestla_prologue_b.h"
#include "bestla/bestla_parallel.h"
#include "bestla/bestla_gemm.h"
using namespace bestla;
static parallel::StdThreading gth;

void gen(const char* tag, int N, int K, int blk, bool asym, unsigned seed) {
  using Core = gemm::ICoreRowNAvx512vnniKBlock<48, 4>;
  prologue_b::gemm::WeightKBlockNInteger<Core> proB;
  auto stor = proB.createStorage(N, K, blk, BTLA_DTYPE::S4_CLIP,
                                 BTLA_DTYPE::F32, BTLA_DTYPE::F32, asym);
  std::vector<int8_t> buf(stor.mSize);
  stor.assign(buf.data());
  std::vector<float> B(static_cast<size_t>(N) * K);
  srand(seed);
  for (auto& v : B) v = (rand() % 1000 - 500) / 1000.f;
  proB.packWeight(N, K, B.data(), N, &stor, &gth);
  std::vector<int8_t> ser(stor.mSize);
  stor.serialize(ser.data());
  std::string base = std::string("/tmp/btla_fix/model/") + tag;
  FILE* f = fopen((base + ".stor").c_str(), "wb");
  fwrite(ser.data(), 1, ser.size(), f); fclose(f);
  f = fopen((base + ".src").c_str(), "wb");
  fwrite(B.data(), 4, B.size(), f); fclose(f);
}

int main() {
  gth.set_threads(2);
  unsigned seed = 100;
  for (int l = 0; l < 2; l++) {
    char t[64];
    snprintf(t, 64, "l%d_wq", l); gen(t, 64, 64, 32, false, seed++);
    snprintf(t, 64, "l%d_wk", l); gen(t, 32, 64, 32, false, seed++);
    snprintf(t, 64, "l%d_wv", l); gen(t, 32, 64, 32, false, seed++);
    snprintf(t, 64, "l%d_wo", l); gen(t, 64, 64, 32, true, seed++);
    snprintf(t, 64, "l%d_w1", l); gen(t, 128, 64, 32, false, seed++);
    snprintf(t, 64, "l%d_w2", l); gen(t, 64, 128, 32, true, seed++);
    snprintf(t, 64, "l%d_w3", l); gen(t, 128, 64, 32, false, seed++);
  }
  gen("output", 256, 64, 32, false, seed++);
  printf("ok\n");
  return 0;
}
