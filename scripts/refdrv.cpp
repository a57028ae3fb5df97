// Cross-validation driver for the COMPILED reference runtime: load a ggjt
// .bin through the reference's own loader (model_init_from_gpt_params,
// model_utils.cpp:1405), greedy-decode with model_eval, and dump the f32
// logits of every step plus the greedy ids — the offline stand-in for the
// pybind Model.evaluate surface (main_pybind.cpp:440,609) used by
// scripts/ref_crosscheck.py to certify logit/token parity of the TPU stack.
//
// Build (see scripts/ref_crosscheck.py): links against the /root/repo
// build_ref artifacts of the UNMODIFIED reference tree.
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "models/model_utils/model_utils.h"

int main(int argc, char** argv) {
  if (argc < 5) {
    fprintf(stderr, "usage: %s MODEL.bin id0,id1,... N_PREDICT OUT_PREFIX\n",
            argv[0]);
    return 1;
  }
  // optional beam mode: refdrv --beam N MODEL ids N_PREDICT OUT —
  // cross-validates beam_search_flow (model_utils.h:440, the heap +
  // length-penalty semantics our runtime/beam.py mirrors)
  int beam = 0;
  if (std::string(argv[1]) == "--beam") {
    beam = atoi(argv[2]);
    argv += 2;
  }
  gpt_params params;
  params.model_arch = MODEL_LLAMA;
  params.model_name = "llama";
  params.model = argv[1];
  params.n_ctx = 256;
  params.n_threads = 1;
  params.seed = 0;
  params.warmup = false;
  params.use_mmap = false;
  params.memory_type = KV_MEM_TYPE_F32;
  if (beam > 1) {
    params.beam_search = true;
    params.beam_size = beam;
    params.length_penalty = 1.0f;
    params.do_early_stopping = false;
  }

  std::vector<model_token> ids;
  {
    char* s = argv[2];
    for (char* tok = strtok(s, ","); tok; tok = strtok(nullptr, ","))
      ids.push_back(atoi(tok));
  }
  const int n_predict = atoi(argv[3]);
  const std::string prefix = argv[4];

  model_init_backend();
  model_context* ctx = model_init_from_gpt_params(params, nullptr);
  if (!ctx) {
    fprintf(stderr, "init failed\n");
    return 2;
  }
  const int n_vocab = model_n_vocab(ctx);

  if (beam > 1) {
    // beam_search (model_utils.h:527) drives beam_search_flow::loop
    ctx->generation_conf.min_new_tokens = 0;
    model_input in{};
    in.tokens = ids.data();
    in.n_tokens = (uint32_t)ids.size();
    in.n_prompt_tokens = (uint32_t)ids.size();
    in.n_past = 0;
    in.n_total = 0;
    in.request_idx = 0;
    in.beam_idx = 0;
    in.padding_side = 0;
    in.n_padding = 0;
    std::vector<model_input> inputs = {in};
    auto res = beam_search(ctx, n_predict, inputs, params.n_threads);
    FILE* fids = fopen((prefix + ".ids").c_str(), "w");
    for (auto tok : res[0]) fprintf(fids, "%d\n", tok);
    fclose(fids);
    printf("ok beam=%d len=%zu\n", beam, res[0].size());
    model_free(ctx);
    return 0;
  }

  FILE* flog = fopen((prefix + ".logits").c_str(), "wb");
  FILE* fids = fopen((prefix + ".ids").c_str(), "w");

  auto eval_step = [&](const model_token* toks, uint32_t n, uint32_t n_past) {
    model_input in{};
    in.tokens = toks;
    in.n_tokens = n;
    in.n_prompt_tokens = 0;
    in.n_past = n_past;
    in.n_total = n_past;
    in.request_idx = 0;
    in.beam_idx = 0;
    in.padding_side = 0;
    in.n_padding = 0;
    if (model_eval(ctx, &in, 1, params.n_threads)) {
      fprintf(stderr, "eval failed\n");
      exit(3);
    }
  };

  eval_step(ids.data(), ids.size(), 0);
  uint32_t n_past = ids.size();
  model_token cur = 0;
  for (int step = 0; step < n_predict; ++step) {
    float* lg = model_get_logits(ctx);  // last-token row, n_vocab cols
    fwrite(lg, sizeof(float), n_vocab, flog);
    cur = 0;
    for (int v = 1; v < n_vocab; ++v)
      if (lg[v] > lg[cur]) cur = v;
    fprintf(fids, "%d\n", cur);
    eval_step(&cur, 1, n_past);
    n_past += 1;
  }
  fclose(flog);
  fclose(fids);
  printf("ok n_vocab=%d steps=%d\n", n_vocab, n_predict);
  model_free(ctx);
  return 0;
}
