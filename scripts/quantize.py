"""Quantize an HF checkpoint (or re-quantize a GGUF) into our packed .npz
(parity: reference scripts/quantize.py + quant_model CLI).

    python scripts/quantize.py --model_file <hf-dir> --out_file model_q4.npz \
        --weight_dtype int4 --group_size 128 --alg sym
"""

import argparse
import time

from _common import add_quant_args, qspec_from_args


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model_file", required=True,
                    help="HF model name/dir or .gguf")
    ap.add_argument("--out_file", required=True, help="output .npz path")
    ap.add_argument("--config", default=None,
                    help="layer-wise quant config JSON (see "
                         "convert/quant_config.py)")
    add_quant_args(ap)
    args = ap.parse_args()

    from neural_speed_tpu.convert import convert_model
    from neural_speed_tpu.runtime import serialization

    t0 = time.time()
    if args.config:
        from transformers import AutoConfig

        from neural_speed_tpu.convert import loaders
        from neural_speed_tpu.convert.hf import params_from_state_dict
        from neural_speed_tpu.convert.quant_config import load_quant_config
        from neural_speed_tpu.models.configs import arch_from_hf_config

        cfg = arch_from_hf_config(AutoConfig.from_pretrained(
            args.model_file, trust_remote_code=True).to_dict())
        params = params_from_state_dict(
            loaders.load_state_dict(args.model_file), cfg,
            policy=load_quant_config(args.config))
    else:
        params, cfg = convert_model(
            args.model_file, qspec_from_args(args),
            use_quantized_model=args.use_quantized_model,
        )
    serialization.save_params(args.out_file, params)
    print(f"quantized {cfg.name} -> {args.out_file} "
          f"({args.weight_dtype} g{args.group_size} {args.alg}) "
          f"in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
