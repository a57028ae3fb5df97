"""Merge a PEFT LoRA adapter into a base model and save packed weights
(parity: reference scripts/load_peft_and_merge.py).

    python scripts/load_peft_and_merge.py --base <hf-dir> --adapter <peft-dir> \
        --out merged_q4.npz --weight_dtype int4
"""

import argparse

from _common import add_quant_args, qspec_from_args


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base", required=True)
    ap.add_argument("--adapter", required=True)
    ap.add_argument("--out", required=True)
    add_quant_args(ap)
    args = ap.parse_args()

    from transformers import AutoConfig

    from neural_speed_tpu.convert import loaders
    from neural_speed_tpu.convert import lora as L
    from neural_speed_tpu.convert.hf import params_from_state_dict
    from neural_speed_tpu.models.configs import arch_from_hf_config
    from neural_speed_tpu.runtime import serialization

    cfg = arch_from_hf_config(
        AutoConfig.from_pretrained(args.base, trust_remote_code=True).to_dict()
    )
    sd = loaders.load_state_dict(args.base)
    lsd, lcfg = L.load_lora(args.adapter)
    merged = L.merge_into_state_dict(sd, lsd, L.lora_scaling(lcfg))
    params = params_from_state_dict(merged, cfg, qspec_from_args(args))
    serialization.save_params(args.out, params)
    print(f"merged {args.adapter} into {args.base} -> {args.out}")


if __name__ == "__main__":
    main()
