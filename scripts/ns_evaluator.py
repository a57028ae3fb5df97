"""lm-evaluation-harness adapter (parity: reference scripts/ns_evaluator.py
`NSLM` model class — loglikelihood + greedy generation over our engine).

    python scripts/ns_evaluator.py --model <hf-dir> --tasks lambada_openai

Requires `lm_eval` (not bundled); the adapter class is importable without it.
"""

import argparse
from typing import List, Tuple

import numpy as np

from _common import add_quant_args


class NSTLM:
    """Minimal lm-eval-harness `LM` interface over neural_speed_tpu.

    Implements loglikelihood / loglikelihood_rolling / generate_until on
    top of Model.__call__ logits and Model.generate (the same surface the
    reference adapter wraps, ns_evaluator.py:53-655).
    """

    def __init__(self, model, batch_size: int = 1):
        self.model = model
        self.batch_size = batch_size

    # -- helpers --------------------------------------------------------
    def _logprobs(self, ids: List[int]) -> np.ndarray:
        logits = np.asarray(self.model([ids])[0][: len(ids)], np.float32)
        x = logits - logits.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    def loglikelihood(self, requests) -> List[Tuple[float, bool]]:
        out = []
        for req in requests:
            context, continuation = req.args if hasattr(req, "args") else req
            ctx_ids = self.model.tokenize(context)
            full_ids = self.model.tokenize(context + continuation)
            cont_ids = full_ids[len(ctx_ids):]
            lp = self._logprobs(full_ids)
            tgt = np.asarray(full_ids[1:])
            tok_lp = lp[np.arange(len(tgt)), tgt]
            span = tok_lp[len(ctx_ids) - 1:]
            greedy = bool(
                (lp[len(ctx_ids) - 1:-1].argmax(-1) == cont_ids).all()
            )
            out.append((float(span.sum()), greedy))
        return out

    def loglikelihood_rolling(self, requests) -> List[float]:
        out = []
        for req in requests:
            (text,) = req.args if hasattr(req, "args") else (req,)
            ids = self.model.tokenize(text)
            lp = self._logprobs(ids)
            tgt = np.asarray(ids[1:])
            out.append(float(lp[np.arange(len(tgt)), tgt].sum()))
        return out

    def generate_until(self, requests) -> List[str]:
        outs = []
        for req in requests:
            context, gen_kwargs = req.args if hasattr(req, "args") else req
            until = gen_kwargs.get("until", [])
            max_new = gen_kwargs.get("max_gen_toks", 128)
            ids = self.model.tokenize(context)
            toks = self.model.generate([ids], max_new_tokens=max_new,
                                       ignore_prompt=True)[0]
            text = self.model.detokenize(toks)
            for stop in until:
                pos = text.find(stop)
                if pos >= 0:
                    text = text[:pos]
            outs.append(text)
        return outs


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True)
    ap.add_argument("--tasks", default="lambada_openai")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=1)
    add_quant_args(ap)
    args = ap.parse_args()

    try:
        import lm_eval
        from lm_eval.api.model import LM
    except ImportError:
        raise SystemExit("lm_eval is not installed in this environment")

    from neural_speed_tpu.api import Model

    model = Model().init(
        args.model, use_quant=args.weight_dtype != "fp32",
        weight_dtype=args.weight_dtype if args.weight_dtype != "fp32"
        else "int4",
        group_size=args.group_size, alg=args.alg,
    )

    class _LM(LM, NSTLM):  # lm-eval registry shim
        def __init__(self):
            LM.__init__(self)
            NSTLM.__init__(self, model, batch_size=args.batch_size)

    results = lm_eval.simple_evaluate(
        model=_LM(), tasks=args.tasks.split(","), limit=args.limit
    )
    print(results["results"])


if __name__ == "__main__":
    main()
