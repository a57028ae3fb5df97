"""Compare our logits against HF transformers fp32 (parity: reference
scripts/cal_diff.py:23 — cosine similarity + relative L2).

    python scripts/cal_diff.py --model <hf-dir> -p "some prompt"
"""

import argparse

import numpy as np

from _common import add_quant_args


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True)
    ap.add_argument("-p", "--prompt", default="What is the meaning of life?")
    add_quant_args(ap)
    args = ap.parse_args()

    import torch
    from transformers import AutoModelForCausalLM, AutoTokenizer

    tok = AutoTokenizer.from_pretrained(args.model, trust_remote_code=True)
    ids = tok(args.prompt)["input_ids"]

    hf = AutoModelForCausalLM.from_pretrained(
        args.model, torch_dtype=torch.float32, trust_remote_code=True
    )
    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()

    from neural_speed_tpu.api import Model

    model = Model().init(
        args.model, use_quant=args.weight_dtype != "fp32",
        weight_dtype=args.weight_dtype if args.weight_dtype != "fp32"
        else "int4",
        group_size=args.group_size, scale_dtype=args.scale_dtype,
        alg=args.alg,
    )
    ours = model([ids])[0][: len(ids)]

    a = np.asarray(ours, np.float32).ravel()
    b = ref.ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    rel_l2 = float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))
    print(f"cosine similarity: {cos:.6f}")
    print(f"relative L2:       {rel_l2:.6f}")


if __name__ == "__main__":
    main()
