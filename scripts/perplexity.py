"""Sliding-window next-token perplexity (parity: reference
scripts/perplexity.py:58-148 — NLL of each next token over a long text,
evaluated in ctx-sized windows with a stride).

    python scripts/perplexity.py --model <hf-dir> --text_file wiki.txt
    python scripts/perplexity.py --model <hf-dir> --dataset wikitext
"""

import argparse
import math

import numpy as np

from _common import add_quant_args, qspec_from_args


def sliding_ppl(model, token_ids, ctx: int, stride: int) -> float:
    """Mean NLL over next-token predictions, HF-style strided windows."""
    nlls = []
    n_tok = 0
    prev_end = 0
    for start in range(0, max(len(token_ids) - 1, 1), stride):
        end = min(start + ctx, len(token_ids))
        ids = token_ids[start:end]
        target_start = max(prev_end - start, 1)
        logits = model([ids])[0]  # [T, vocab]
        x = np.asarray(logits[:-1], np.float32)
        x = x - x.max(axis=-1, keepdims=True)
        lse = np.log(np.exp(x).sum(axis=-1))
        tgt = np.asarray(ids[1:])
        tok_logp = x[np.arange(len(tgt)), tgt] - lse
        sel = tok_logp[target_start - 1:]
        nlls.append(-sel.sum())
        n_tok += len(sel)
        prev_end = end
        if end == len(token_ids):
            break
    return math.exp(sum(nlls) / max(n_tok, 1))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True)
    ap.add_argument("--text_file", default=None)
    ap.add_argument("--dataset", default=None,
                    help="HF dataset name (e.g. wikitext); needs network")
    ap.add_argument("--ctx_size", type=int, default=512)
    ap.add_argument("--stride", type=int, default=256)
    ap.add_argument("--n_tokens", type=int, default=8192,
                    help="cap evaluated tokens")
    add_quant_args(ap)
    args = ap.parse_args()

    if args.text_file:
        text = open(args.text_file).read()
    elif args.dataset:
        from datasets import load_dataset

        ds = load_dataset(args.dataset, "wikitext-2-raw-v1", split="test")
        text = "\n\n".join(ds["text"])
    else:
        raise SystemExit("need --text_file or --dataset")

    from neural_speed_tpu.api import Model

    model = Model().init(
        args.model, use_quant=args.weight_dtype != "fp32",
        weight_dtype=args.weight_dtype if args.weight_dtype != "fp32"
        else "int4",
        group_size=args.group_size, scale_dtype=args.scale_dtype,
        alg=args.alg, ctx_size=args.ctx_size,
    )
    ids = model.tokenize(text)[: args.n_tokens]
    ppl = sliding_ppl(model, ids, args.ctx_size, args.stride)
    print(f"perplexity: {ppl:.4f}  ({len(ids)} tokens, ctx {args.ctx_size}, "
          f"stride {args.stride}, {args.weight_dtype})")


if __name__ == "__main__":
    main()
