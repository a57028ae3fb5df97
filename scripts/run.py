"""One-click convert + quantize + generate (parity: reference scripts/run.py).

    python scripts/run.py <hf-model-or-gguf> -p "prompt" -n 64 --weight_dtype int4
"""

import argparse

from _common import (add_gen_args, add_quant_args, emit, kv_from_args,
                     prompt_ids, qspec_from_args)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model", help="HF model name/dir or .gguf file")
    add_quant_args(ap)
    add_gen_args(ap)
    ap.add_argument("--use_cache", action="store_true",
                    help="reuse runtime_outs/ packed cache")
    args = ap.parse_args()

    from neural_speed_tpu.api import Model

    kv_dtype, kv_quant = kv_from_args(args)
    model = Model()
    if args.model.endswith(".gguf"):
        model.init_from_gguf(args.model, ctx_size=args.ctx_size,
                             kv_quantized=kv_quant)
    else:
        model.init(
            args.model,
            use_quant=args.weight_dtype != "fp32",
            weight_dtype=args.weight_dtype if args.weight_dtype != "fp32"
            else "int4",
            group_size=args.group_size,
            scale_dtype=args.scale_dtype,
            alg=args.alg,
            use_cache=args.use_cache,
            ctx_size=args.ctx_size,
            kv_quantized=kv_quant,
        )

    ids = prompt_ids(model, args)
    out = model.generate(
        [ids], max_new_tokens=args.n_predict, do_sample=args.do_sample,
        temperature=args.temperature, top_k=args.top_k, top_p=args.top_p,
        repetition_penalty=args.repetition_penalty,
        num_beams=args.num_beams, seed=args.seed,
        streamer=None,
    )[0]
    print(emit(model, out))


if __name__ == "__main__":
    main()
