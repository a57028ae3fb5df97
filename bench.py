"""Benchmark: Llama-2-7B-shaped int4-g128 decode on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's best published decode rate — 24.2 tok/s on a
56-core SPR socket (docs/fused_attention.md:111, BASELINE.md).

Extra context (prefill TTFT, memory) goes to stderr.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_DECODE_TOKS = 24.2  # docs/fused_attention.md:111 (41.27 ms/tok)

METRIC = "llama2-7b int4-g128 decode tok/s (1 chip, batch 1, {kv} KV)"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(obj):
    print(json.dumps(obj), flush=True)


def probe_backend(timeout_s=None):
    if timeout_s is None:
        timeout_s = int(os.environ.get("NST_BENCH_PROBE_TIMEOUT", "150"))
    """True iff jax backend init answers in a subprocess within timeout.

    The axon tunnel's failure mode is an indefinite hang inside
    jax.devices(), so the probe must run out-of-process with a hard
    timeout — an in-process try/except would never return.
    """
    code = "import jax; jax.devices(); print('backend-ok')"
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True, text=True)
        ok = r.returncode == 0 and "backend-ok" in r.stdout
        if not ok:
            log(f"backend probe rc={r.returncode}: "
                f"{(r.stderr or '').strip().splitlines()[-1:]!r}")
        return ok
    except subprocess.TimeoutExpired:
        log(f"backend probe timed out after {timeout_s}s")
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--prompt", type=int, default=1975)  # reference's prompt
    ap.add_argument("--ctx", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--kv", default="int8", choices=["bf16", "int8"],
                    help="KV cache dtype (int8 engages the quantized-KV "
                         "flash kernel)")
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes for a smoke run (compile-path check only; "
                         "the reported rate is meaningless on cached tunnels)")
    args = ap.parse_args()

    # ---- backend availability gate (VERDICT r1 §missing-1) ----
    # One driver-side outage must not erase the round's perf record: probe
    # the backend out-of-process, retry once, and on double failure run a
    # degraded CPU compile-check so the JSON line still lands.
    degraded_error = None
    if os.environ.get("JAX_PLATFORMS", "") != "cpu":
        if not probe_backend():
            retry_s = int(os.environ.get("NST_BENCH_RETRY_WAIT", "20"))
            log(f"backend unavailable; retrying once in {retry_s}s ...")
            time.sleep(retry_s)
            if not probe_backend():
                degraded_error = ("TPU backend unavailable (2 probe "
                                  "attempts); degraded CPU compile-check")
                jax.config.update("jax_platforms", "cpu")
                args.small = True
                args.prompt = min(args.prompt, 64)
                args.ctx = min(args.ctx, 128)
                args.steps = min(args.steps, 4)
    args.degraded_error = degraded_error

    from neural_speed_tpu.models.arch import ArchConfig
    from neural_speed_tpu.ops import kv_cache as kvc
    from neural_speed_tpu.ops.qtypes import QSpec, QType
    from neural_speed_tpu.runtime.engine import decode_n_steps, prefill_step
    from neural_speed_tpu.utils.synthetic import llama2_7b_arch, synth_params

    if args.small:
        cfg = ArchConfig(
            name="llama", vocab_size=1024, hidden_size=512, n_layers=4,
            n_heads=8, n_kv_heads=8, intermediate_size=1024,
            max_position_embeddings=args.ctx,
        )
    else:
        cfg = llama2_7b_arch()
        if args.layers != 32:
            import dataclasses

            cfg = dataclasses.replace(cfg, n_layers=args.layers)
    # bf16 group scales: halves the scale stream (f32 scales add 6.25%
    # to the int4 weight traffic on this HBM-bound path) — measured
    # 153.3 vs 149.2 tok/s B=1 (BENCH_NOTES 2026-08-19).  Matches the
    # comparable llama.cpp/ggml config even closer: GGUF Q4_0 stores
    # f16 scales (the reference's ggml path, core/data_types.h).
    spec = QSpec(QType.INT, 4, 128, True, scale_dtype="bfloat16")

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    t0 = time.time()
    params = synth_params(cfg, spec)
    # fused QKV / gate-up, exactly like the serving Engine (4 fused-GEMM
    # launches per layer instead of 7; wider N runs closer to HBM peak)
    from neural_speed_tpu.models.transformer import fuse_params

    params = fuse_params(params, cfg)
    jax.block_until_ready(params)
    log(f"params materialized in {time.time()-t0:.1f}s")

    b = args.batch
    kv_q = args.kv == "int8"
    # pre-flight HBM budget (round 5): refuse/flag over-budget configs at
    # startup instead of an opaque mid-bench TPU Internal error
    from neural_speed_tpu.utils.memory import preflight

    est = preflight(params, cfg, b, args.ctx, jnp.bfloat16, kv_q,
                    (args.prompt,), what="bench")
    if est is not None:
        log(est.describe())
    cache = kvc.init_cache(cfg.n_layers, b, args.ctx, cfg.n_kv_heads,
                           cfg.head_dim, jnp.bfloat16, quantized=kv_q)

    # ---- prefill (TTFT) ----
    t = args.prompt
    ids = jnp.zeros((b, t), jnp.int32)
    lens = jnp.full((b,), t, jnp.int32)
    start = jnp.zeros((b,), jnp.int32)
    tic = time.time()
    logits, cache = prefill_step(params, cfg, cache, ids, lens, start)
    float(logits[0, 0])  # drain the lazy queue (params synth + this run)
    log(f"prefill compile+run {time.time()-tic:.1f}s")
    cache = kvc.set_lengths(cache, jnp.zeros((b,), jnp.int32))
    # distinct input + scalar host fetch: the tunnel dedups repeat
    # dispatches and treats block_until_ready as a no-op for queued work,
    # so identical re-runs time at ~0 (BENCH_NOTES.md measurement notes)
    ids2 = ids.at[:, 0].set(7)
    tic = time.time()
    logits, cache2 = prefill_step(params, cfg, cache, ids2, lens, start)
    float(logits[0, 0])
    ttft = time.time() - tic
    log(f"prefill ({t} tokens) = {ttft*1e3:.1f} ms "
        f"(reference fused-attn: 1475.6 ms)")

    # ---- decode ----
    tok = jnp.argmax(logits, -1).astype(jnp.int32)
    if tok.ndim > 1:
        tok = tok[:, 0]
    active = jnp.ones((b,), bool)
    # Two step counts; the marginal rate removes the fixed per-dispatch
    # overhead of the remote-tunnel execution path.
    s1, s2 = args.steps, args.steps * 4

    seq = [0]

    def timed(n, t0k):
        # perturb the input token per call and fetch a scalar result:
        # distinct dispatches + forced materialization (the tunnel dedups
        # identical dispatches and lazily skips un-fetched chains)
        seq[0] += 1
        t0k = (t0k + seq[0]) % cfg.vocab_size
        tic = time.time()
        toks, c = decode_n_steps(params, cfg, cache2, t0k, active, n)
        int(toks[0, -1])
        return time.time() - tic, toks, c

    _, toks, cache2 = timed(s1, tok)          # compile s1
    _, toks, cache2 = timed(s2, toks[:, -1])  # compile s2
    _, toks, cache2 = timed(s1, toks[:, -1])  # warm (first post-compile
    #                                           run can still be slow)
    t1, toks, cache2 = timed(s1, toks[:, -1])
    t2, toks, cache2 = timed(s2, toks[:, -1])
    dt = max(t2 - t1, 1e-6)
    tok_s = (s2 - s1) * b / dt
    if dt < 1e-3:  # tiny-model smoke runs: marginal rate degenerates
        tok_s = s2 * b / t2
    log(f"decode: {s1} steps {t1:.3f}s, {s2} steps {t2:.3f}s -> marginal "
        f"{tok_s:.2f} tok/s ({dt/(s2-s1)*1e3:.2f} ms/tok); raw@{s2}: "
        f"{s2*b/t2:.2f} tok/s")

    if args.degraded_error:
        emit({
            "metric": METRIC.format(kv=args.kv),
            "value": 0.0,
            "unit": "tokens/s",
            "vs_baseline": 0.0,
            "error": args.degraded_error,
            "cpu_compile_check": "pass",
        })
    else:
        emit({
            "metric": METRIC.format(kv=args.kv),
            "value": round(tok_s, 2),
            "unit": "tokens/s",
            "vs_baseline": round(tok_s / BASELINE_DECODE_TOKS, 3),
        })


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — always land the JSON line
        import traceback

        traceback.print_exc(file=sys.stderr)
        emit({
            "metric": METRIC.format(kv="int8"),
            "value": 0.0,
            "unit": "tokens/s",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}",
        })
        sys.exit(0)
