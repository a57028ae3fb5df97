"""Run generation from a packed .npz / GGUF / HF checkpoint with full
sampling controls, StreamingLLM eviction and shift-RoPE ring KV
(parity: reference scripts/inference.py + main_run flags).

    python scripts/inference.py -m model_q4.npz --hf_config <hf-dir> -p "..."
"""

import argparse

from _common import add_gen_args, emit, kv_from_args, prompt_ids


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", required=True,
                    help=".npz (packed), .gguf, or HF dir")
    ap.add_argument("--hf_config", default=None,
                    help="HF dir/name for config+tokenizer when -m is .npz")
    add_gen_args(ap)
    args = ap.parse_args()

    from neural_speed_tpu.api import Model
    from neural_speed_tpu.models.configs import arch_from_hf_config

    kv_dtype, kv_quant = kv_from_args(args)
    model = Model()
    if args.model.endswith(".gguf"):
        model.init_from_gguf(args.model, ctx_size=args.ctx_size,
                             kv_quantized=kv_quant)
    elif args.model.endswith(".npz"):
        from transformers import AutoConfig, AutoTokenizer

        src = args.hf_config or args.model
        cfg = arch_from_hf_config(
            AutoConfig.from_pretrained(src, trust_remote_code=True).to_dict()
        )
        model.init_from_bin(cfg, args.model, ctx_size=args.ctx_size,
                            kv_quantized=kv_quant)
        try:
            model.tokenizer = AutoTokenizer.from_pretrained(
                src, trust_remote_code=True
            )
            model.eos_id = model.tokenizer.eos_token_id
        except Exception:
            model.tokenizer = None  # --prompt_ids still works
    else:
        model.init(args.model, ctx_size=args.ctx_size, kv_quantized=kv_quant)

    if args.shift_roped_k:
        model.engine.shift_roped_k = True
    model.engine.n_keep = args.n_keep
    model.engine.n_discard = args.n_discard

    ids = prompt_ids(model, args)
    out = model.generate(
        [ids] * args.batch, max_new_tokens=args.n_predict,
        do_sample=args.do_sample, temperature=args.temperature,
        top_k=args.top_k, top_p=args.top_p,
        repetition_penalty=args.repetition_penalty,
        num_beams=args.num_beams, seed=args.seed,
        speculative=args.speculative, speculative_k=args.speculative_k,
    )
    for row in out:
        print(emit(model, row))


if __name__ == "__main__":
    main()
