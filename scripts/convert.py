"""Standalone converter CLI (parity: reference scripts/convert.py →
convert_model): HF checkpoint → packed .npz (fp32/bf16 or quantized) or
→ GGUF.

    python scripts/convert.py <hf-model-or-dir> --outfile model.npz
    python scripts/convert.py <hf-model-or-dir> --outfile model.npz \
        --quantize --weight_dtype int4 --group_size 128
    python scripts/convert.py <hf-model-or-dir> --outfile model.gguf \
        --format gguf --gguf_type q4_0

Pre-quantized GPTQ/AWQ/AutoRound checkpoints are detected from
quantization_config and repacked losslessly (parity:
convert_quantized_*.py, common.py:333-797)."""

import argparse

from _common import add_quant_args, qspec_from_args


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model", help="HF model name or local checkpoint dir")
    ap.add_argument("--outfile", required=True, help="output path")
    ap.add_argument("--format", default="npz", choices=["npz", "gguf"])
    ap.add_argument("--outtype", default="f32", choices=["f32", "bf16"],
                    help="fp dtype when not quantizing (npz format)")
    ap.add_argument("--quantize", action="store_true",
                    help="quantize while converting (npz format)")
    ap.add_argument("--gguf_type", default="q4_0",
                    choices=["f32", "f16", "q4_0", "q4_1", "q5_0", "q5_1",
                             "q8_0"],
                    help="GGML tensor type for --format gguf")
    add_quant_args(ap)
    args = ap.parse_args()

    import jax.numpy as jnp
    from transformers import AutoConfig

    from neural_speed_tpu.convert import loaders
    from neural_speed_tpu.convert.gptq import (detect_quant_method,
                                               is_quantized_state_dict)
    from neural_speed_tpu.models.configs import arch_from_hf_config
    from neural_speed_tpu.runtime import serialization

    hf_cfg = AutoConfig.from_pretrained(
        args.model, trust_remote_code=True).to_dict()
    sd = loaders.load_state_dict(args.model)

    if args.format == "gguf":
        from neural_speed_tpu.convert import gguf as g

        ggml = {"f32": g.GGML_F32, "f16": g.GGML_F16, "q4_0": g.GGML_Q4_0,
                "q4_1": g.GGML_Q4_1, "q5_0": g.GGML_Q5_0,
                "q5_1": g.GGML_Q5_1, "q8_0": g.GGML_Q8_0}[args.gguf_type]
        tokens = scores = merges = None
        try:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(args.model,
                                                trust_remote_code=True)
            vocab = tok.get_vocab()
            tokens = [t for t, _ in sorted(vocab.items(),
                                           key=lambda kv: kv[1])]
        except Exception:
            pass
        g.write_hf_to_gguf(sd, hf_cfg, args.outfile, ggml_type=ggml,
                           tokens=tokens, scores=scores, merges=merges)
        print(f"wrote {args.outfile} ({args.gguf_type})")
        return

    cfg = arch_from_hf_config(hf_cfg)
    if is_quantized_state_dict(sd):
        from neural_speed_tpu.convert.gptq import (
            params_from_quantized_state_dict)

        method = detect_quant_method(hf_cfg)
        params = params_from_quantized_state_dict(sd, cfg, hf_cfg)
        print(f"repacked pre-quantized checkpoint "
              f"({method.get('quant_method', 'gptq')})")
    else:
        from neural_speed_tpu.convert.hf import params_from_state_dict

        qspec = qspec_from_args(args) if args.quantize else None
        dtype = jnp.float32 if args.outtype == "f32" else jnp.bfloat16
        params = params_from_state_dict(sd, cfg, qspec=qspec, dtype=dtype)
    serialization.save_params(args.outfile, params)
    print(f"wrote {args.outfile}")


if __name__ == "__main__":
    main()
