"""Per-op decomposition of the B=1 decode step on chip.

Builds the 7B int4-g128 engine (int8 KV), prefills near the bench context,
then captures a device trace of a 64-step device-chained decode and prints
the per-op self-time table (utils/profiler.per_op_table).  This is the
evidence base for the round-2 decode optimization work (VERDICT r1 item 1:
attack the non-GEMM ~5 ms/step).

Usage: python scripts/decode_profile.py [--layers 32] [--ctx 2048]
       [--prompt 1900] [--steps 64] [--kv int8] [--top 40]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def _profile_prefill(args, params, cfg, cache, ids, lens, start):
    """Per-op self-time table of ONE warm prefill_step (TTFT breakdown).

    Roofline context: 7B bf16 prefill at T tokens is MXU-bound —
    2*6.7e9*T flops; at v5e's 197 TFLOP/s bf16 peak the 1975-token ideal
    is ~134 ms vs ~330 ms measured (2026-08-19) — this table is the
    evidence base for closing that gap."""
    import collections
    import re
    import sys
    import tempfile
    import time

    import jax

    from neural_speed_tpu.runtime.engine import prefill_step
    from neural_speed_tpu.utils.profiler import per_op_table

    # distinct input per call: the tunnel dedups identical dispatches
    ids2 = ids.at[:, 0].set(7)
    tic = time.time()
    logits, cache = prefill_step(params, cfg, cache, ids2, lens, start)
    float(logits[0, 0])
    print(f"warm prefill ({int(lens[0])} tokens): "
          f"{(time.time()-tic)*1e3:.1f} ms", file=sys.stderr)
    d = tempfile.mkdtemp(prefix="nst_prefill_prof_")
    ids3 = ids.at[:, 0].set(9)
    with jax.profiler.trace(d):
        logits, cache = prefill_step(params, cfg, cache, ids3, lens, start)
        float(logits[0, 0])
    rows = per_op_table(d, top=100000)
    total = sum(r["self_us"] for r in rows)
    print(f"\ntotal device self-time: {total/1e3:.1f} ms")
    by_cat = collections.Counter()
    for r in rows:
        by_cat[r["category"]] += r["self_us"]
    print("\nby HLO category (ms):")
    for cat, us in by_cat.most_common(20):
        print(f"  {us/1e3:>9.2f}ms {100*us/total:5.1f}%  {cat}")
    by_op = collections.Counter()
    n_by_op = collections.Counter()
    for r in rows:
        op = re.sub(r"\d+", "#", r["op"])
        by_op[(r["category"], op)] += r["self_us"]
        n_by_op[(r["category"], op)] += r["occurrences"]
    print("\nby op (ms, layer-aggregated):")
    for (cat, op), us in by_op.most_common(args.top):
        print(f"  {us/1e3:>9.2f}ms {100*us/total:5.1f}% "
              f"x{n_by_op[(cat, op)]:<6} {cat:<18} {op[:90]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--prompt", type=int, default=1900)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--kv", default="int8", choices=["bf16", "int8"])
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--phase", default="decode", choices=["decode",
                                                          "prefill"],
                    help="prefill: per-op table of one prefill_step "
                         "(TTFT decomposition; steps is ignored)")
    args = ap.parse_args()

    import dataclasses

    from neural_speed_tpu.ops import kv_cache as kvc
    from neural_speed_tpu.ops.qtypes import QSpec, QType
    from neural_speed_tpu.runtime.engine import decode_n_steps, prefill_step
    from neural_speed_tpu.utils.profiler import op_profile
    from neural_speed_tpu.utils.synthetic import llama2_7b_arch, synth_params

    cfg = llama2_7b_arch()
    if args.layers != 32:
        cfg = dataclasses.replace(cfg, n_layers=args.layers)
    spec = QSpec(QType.INT, 4, 128, True)
    print(f"backend={jax.default_backend()}", file=sys.stderr)
    params = synth_params(cfg, spec)
    from neural_speed_tpu.models.transformer import fuse_params

    params = fuse_params(params, cfg)
    jax.block_until_ready(params)

    b = args.batch
    cache = kvc.init_cache(cfg.n_layers, b, args.ctx, cfg.n_kv_heads,
                           cfg.head_dim, jnp.bfloat16,
                           quantized=args.kv == "int8")
    ids = jnp.zeros((b, args.prompt), jnp.int32)
    lens = jnp.full((b,), args.prompt, jnp.int32)
    start = jnp.zeros((b,), jnp.int32)
    logits, cache = prefill_step(params, cfg, cache, ids, lens, start)
    if args.phase == "prefill":
        _profile_prefill(args, params, cfg, cache, ids, lens, start)
        return
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    if tok.ndim > 1:
        tok = tok[:, 0]
    active = jnp.ones((b,), bool)

    # compile + warm outside the trace
    toks, cache = decode_n_steps(params, cfg, cache, tok, active, args.steps)
    int(toks[0, -1])
    import time
    tic = time.time()
    toks, cache = decode_n_steps(params, cfg, cache, toks[:, -1], active,
                                 args.steps)
    int(toks[0, -1])
    wall = time.time() - tic
    print(f"warm decode {args.steps} steps: {wall*1e3:.1f} ms "
          f"({wall/args.steps*1e3:.2f} ms/step)", file=sys.stderr)

    import collections
    import tempfile

    from neural_speed_tpu.utils.profiler import per_op_table

    d = tempfile.mkdtemp(prefix="nst_decode_prof_")
    with jax.profiler.trace(d):
        toks, cache = decode_n_steps(params, cfg, cache, toks[:, -1], active,
                                     args.steps)
        int(toks[0, -1])
    rows = per_op_table(d, top=100000)
    total = sum(r["self_us"] for r in rows)
    print(f"\ntotal device self-time: {total/1e3:.1f} ms "
          f"({total/args.steps/1e3:.3f} ms/step over {args.steps} steps)")
    by_cat = collections.Counter()
    for r in rows:
        by_cat[r["category"]] += r["self_us"]
    print("\nby HLO category (us/step):")
    for cat, us in by_cat.most_common(20):
        print(f"  {us/args.steps:>9.1f}us {100*us/total:5.1f}%  {cat}")
    # aggregate identical framework ops across layers (strip layer index)
    import re

    by_op = collections.Counter()
    n_by_op = collections.Counter()
    for r in rows:
        op = re.sub(r"\d+", "#", r["op"])
        by_op[(r["category"], op)] += r["self_us"]
        n_by_op[(r["category"], op)] += r["occurrences"]
    print("\nby op (us/step, layer-aggregated):")
    for (cat, op), us in by_op.most_common(args.top):
        print(f"  {us/args.steps:>9.1f}us {100*us/total:5.1f}% "
              f"x{n_by_op[(cat, op)]:<6} {cat:<18} {op[:90]}")
    print("done", file=sys.stderr)


if __name__ == "__main__":
    main()
