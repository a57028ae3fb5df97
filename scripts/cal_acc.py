"""Accuracy-evaluation convenience wrapper (parity: reference
scripts/cal_acc.py — argparse shim over accuracy.cli_evaluate).

    python scripts/cal_acc.py --model_name <hf-dir> --tasks lambada_openai
"""

import argparse

from accuracy import cli_evaluate

if __name__ == "__main__":
    ap = argparse.ArgumentParser(
        description="Evaluate accuracy for a model")
    ap.add_argument("--model_name", type=str, required=True)
    ap.add_argument("--tasks", type=str, default="lambada_openai")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--weight_dtype", default="int4")
    ap.add_argument("--group_size", type=int, default=128)
    ap.add_argument("--alg", default="sym")
    a = ap.parse_args()
    argv = ["--model", a.model_name, "--tasks", a.tasks,
            "--weight_dtype", a.weight_dtype,
            "--group_size", str(a.group_size), "--alg", a.alg]
    if a.limit is not None:
        argv += ["--limit", str(a.limit)]
    cli_evaluate(argv)
