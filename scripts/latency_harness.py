"""Latency percentile harness (parity: tests/model-test
cpp_graph_inference.sh + calculate_percentiles.py — p50/p90/p99 eval
latency over an input-length x output-length grid, plus memory).

    python scripts/latency_harness.py --layers 32            # llama2-7B shape
    python scripts/latency_harness.py --small                # smoke
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def pct(xs, p):
    return float(np.percentile(np.asarray(xs), p))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--in_lens", default="32,512,1024")
    ap.add_argument("--out_len", type=int, default=32)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from neural_speed_tpu.models.arch import ArchConfig
    from neural_speed_tpu.ops import kv_cache as kvc
    from neural_speed_tpu.ops.qtypes import QSpec, QType
    from neural_speed_tpu.runtime.engine import decode_n_steps, prefill_step
    from neural_speed_tpu.utils.synthetic import llama2_7b_arch, synth_params

    if args.small:
        cfg = ArchConfig(name="llama", vocab_size=1024, hidden_size=512,
                         n_layers=4, n_heads=8, n_kv_heads=8,
                         intermediate_size=1024,
                         max_position_embeddings=args.ctx)
    else:
        import dataclasses

        cfg = llama2_7b_arch()
        if args.layers != 32:
            cfg = dataclasses.replace(cfg, n_layers=args.layers)
    params = synth_params(cfg, QSpec(QType.INT, 4, 128, True))
    jax.block_until_ready(params)

    rows = []
    for in_len in [int(x) for x in args.in_lens.split(",")]:
        ids = jnp.zeros((1, in_len), jnp.int32)
        lens = jnp.full((1,), in_len, jnp.int32)
        start = jnp.zeros((1,), jnp.int32)
        first, decode_ms = [], []
        for it in range(args.iters + 1):
            cache = kvc.init_cache(cfg.n_layers, 1, args.ctx,
                                   cfg.n_kv_heads, cfg.head_dim,
                                   jnp.bfloat16)
            tic = time.perf_counter()
            logits, cache = prefill_step(params, cfg, cache, ids, lens,
                                         start)
            logits.block_until_ready()
            t_first = time.perf_counter() - tic
            tok = jnp.argmax(logits, -1).astype(jnp.int32).reshape((1,))
            tic = time.perf_counter()
            toks, cache = decode_n_steps(params, cfg, cache, tok,
                                         jnp.ones((1,), bool), args.out_len)
            toks.block_until_ready()
            t_dec = (time.perf_counter() - tic) / args.out_len
            if it == 0:
                continue  # drop compile iteration
            first.append(t_first * 1e3)
            decode_ms.append(t_dec * 1e3)
        rows.append({
            "input_len": in_len, "output_len": args.out_len,
            "first_token_ms": {p: round(pct(first, q), 2)
                               for p, q in (("p50", 50), ("p90", 90),
                                            ("p99", 99))},
            "next_token_ms": {p: round(pct(decode_ms, q), 2)
                              for p, q in (("p50", 50), ("p90", 90),
                                           ("p99", 99))},
        })
        print(json.dumps(rows[-1]), flush=True)

    try:
        import resource

        peak_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
        print(json.dumps({"host_peak_rss_mb": round(peak_mb, 1)}))
    except Exception:
        pass


if __name__ == "__main__":
    main()
