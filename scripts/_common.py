"""Shared helpers for the L7 scripts (parity: reference scripts/ layer)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def add_quant_args(ap: argparse.ArgumentParser) -> None:
    """Quantization flags (parity: scripts/quantize.py flag set)."""
    ap.add_argument("--weight_dtype", default="int4",
                    choices=["int1", "int2", "int3", "int4", "int5", "int6",
                             "int7", "int8", "nf4", "fp4", "fp8_e4m3",
                             "fp8_e5m2", "fp32"],
                    help="weight quantization dtype (fp32 = no quant)")
    ap.add_argument("--group_size", type=int, default=128,
                    help="quant group size (-1 = per-channel)")
    ap.add_argument("--scale_dtype", default="fp32",
                    choices=["fp32", "bf16"])
    ap.add_argument("--alg", default="sym", choices=["sym", "asym"])
    ap.add_argument("--use_quantized_model", action="store_true",
                    help="ingest a GPTQ/AWQ/AutoRound checkpoint")


def add_gen_args(ap: argparse.ArgumentParser) -> None:
    """Generation flags (parity: gpt_params / main_run flag set)."""
    ap.add_argument("-p", "--prompt", default="Once upon a time")
    ap.add_argument("--prompt_ids", default=None,
                    help="comma-separated token ids (skips the tokenizer)")
    ap.add_argument("-n", "--n_predict", type=int, default=128)
    ap.add_argument("--ctx_size", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--do_sample", action="store_true")
    ap.add_argument("--temperature", type=float, default=0.8)
    ap.add_argument("--top_k", type=int, default=40)
    ap.add_argument("--top_p", type=float, default=0.95)
    ap.add_argument("--repetition_penalty", type=float, default=1.1)
    ap.add_argument("--num_beams", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--memory_dtype", default="auto",
                    choices=["auto", "bf16", "f16", "f32", "int8"],
                    help="KV cache dtype (int8 = quantized cache)")
    ap.add_argument("--shift_roped_k", action="store_true",
                    help="shift-RoPE ring-buffer KV (infinite inference)")
    ap.add_argument("--n_keep", type=int, default=4,
                    help="attention-sink tokens kept on eviction")
    ap.add_argument("--n_discard", type=int, default=-1,
                    help="tokens discarded on eviction (-1 = half)")
    ap.add_argument("--speculative", action="store_true",
                    help="prompt-lookup speculative greedy decoding")
    ap.add_argument("--speculative_k", type=int, default=7,
                    help="draft tokens verified per step")


def qspec_from_args(args):
    if args.weight_dtype == "fp32":
        return None
    from neural_speed_tpu.ops.qtypes import named_qspec

    return named_qspec(
        args.weight_dtype, group_size=args.group_size,
        symmetric=(args.alg == "sym"),
        scale_dtype={"fp32": "float32", "bf16": "bfloat16"}[args.scale_dtype],
    )


def kv_from_args(args):
    import jax.numpy as jnp

    quantized = args.memory_dtype == "int8"
    dtype = jnp.float32 if args.memory_dtype == "f32" else jnp.bfloat16
    return dtype, quantized


def prompt_ids(model, args):
    if args.prompt_ids:
        return [int(t) for t in args.prompt_ids.split(",")]
    if model.tokenizer is None:
        raise SystemExit("no tokenizer available — pass --prompt_ids")
    return model.tokenize(args.prompt)


def emit(model, ids) -> str:
    return (model.detokenize(ids) if model.tokenizer is not None
            else " ".join(map(str, ids)))
