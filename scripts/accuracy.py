"""Accuracy evaluation entry (parity: reference scripts/accuracy.py
cli_evaluate — an lm-evaluation-harness front end over the engine).

    python scripts/accuracy.py --model <hf-dir> --tasks lambada_openai

Delegates to the NSTLM adapter in ns_evaluator.py; `lm_eval` must be
installed (it is not bundled in this image — the adapter itself has no
hard dependency and is unit-testable without it)."""

import argparse
import sys

from _common import add_quant_args


def cli_evaluate(args_list=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", "--model_name", dest="model", required=True)
    ap.add_argument("--tasks", default="lambada_openai")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=1)
    add_quant_args(ap)
    args = ap.parse_args(args_list)

    # same flag surface as ns_evaluator's CLI — reuse its main under our
    # arg spelling (reference: accuracy.cli_evaluate wraps lm_eval)
    argv = ["ns_evaluator.py", "--model", args.model, "--tasks", args.tasks,
            "--weight_dtype", args.weight_dtype,
            "--group_size", str(args.group_size), "--alg", args.alg,
            "--batch_size", str(args.batch_size)]
    if args.limit is not None:
        argv += ["--limit", str(args.limit)]
    import ns_evaluator

    sys.argv = argv
    ns_evaluator.main()


if __name__ == "__main__":
    cli_evaluate()
