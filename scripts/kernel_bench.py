"""Fused dequant-GEMM kernel microbenchmark (GEMV decode focus).

Tunnel-safe methodology (BENCH_NOTES.md): chain the op N times on device
via lax.scan with a data dependence through x, and report the *marginal*
time between two chain lengths — identical-dispatch caching and the
~2 ms fixed dispatch overhead both cancel.

Usage:
  python scripts/kernel_bench.py [--m 1] [--k 4096] [--n 22016]
        [--bits 4] [--group 128] [--short 4] [--long 20] [--reps 3]
Env:
  NST_BKW_TARGET  sweep externally, e.g.
  for t in 131072 262144 524288 1048576 0; do NST_BKW_TARGET=$t python ...
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from neural_speed_tpu.ops.qtypes import QSpec
from neural_speed_tpu.ops.quantize import quantize
from neural_speed_tpu.ops.matmul import qmatmul


def chain(fn, n):
    @jax.jit
    def run(x, qt):
        def body(carry, _):
            y = fn(carry, qt)  # [m, n]
            # feed a K-sized projection of y back so every iteration's
            # input differs (defeats dispatch caching) with negligible cost
            nxt = carry + y[:, : carry.shape[1]].astype(carry.dtype) * 1e-6
            return nxt, ()

        out, _ = jax.lax.scan(body, x, None, length=n)
        return out

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--n", type=int, default=22016)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--group", type=int, default=128)
    # chain lengths sized so the marginal signal (~(long-short)*op_us)
    # clears the tunnel's per-fetch RTT noise (+-5 ms on bad days)
    ap.add_argument("--short", type=int, default=32)
    ap.add_argument("--long", type=int, default=160)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sym", action="store_true", default=True)
    args = ap.parse_args()

    spec = QSpec(bits=args.bits, group_size=args.group, symmetric=True)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((args.k, args.n), dtype=np.float32))
    qt = quantize(w, spec)
    qt = jax.tree.map(
        lambda a: jax.device_put(a) if isinstance(a, jax.Array) else a, qt
    )
    x = jnp.asarray(
        rng.standard_normal((args.m, args.k), dtype=np.float32)
    ).astype(jnp.bfloat16)

    f_short = chain(qmatmul, args.short)
    f_long = chain(qmatmul, args.long)

    def run(f, x):
        # scalar host fetch forces real execution through the lazy tunnel
        return float(np.asarray(jnp.sum(f(x, qt)[0, :8])))

    # compile + warm both (distinct inputs each call — the tunnel caches
    # identical (executable, args) dispatches)
    xs = [x + i * jnp.float32(1e-3).astype(x.dtype) for i in range(20)]
    print("compiling short...", flush=True)
    run(f_short, xs[0])
    print("compiling long...", flush=True)
    run(f_long, xs[1])
    print("warming...", flush=True)
    run(f_short, xs[2]); run(f_long, xs[3])
    print("timing...", flush=True)

    margins = []
    for r in range(args.reps):
        t0 = time.perf_counter()
        run(f_short, xs[4 + 2 * r])
        t1 = time.perf_counter()
        run(f_long, xs[5 + 2 * r])
        t2 = time.perf_counter()
        per_call = ((t2 - t1) - (t1 - t0)) / (args.long - args.short)
        print(f"  rep {r}: short {(t1 - t0) * 1e3:.1f} ms  "
              f"long {(t2 - t1) * 1e3:.1f} ms  -> {per_call * 1e6:.1f} us/call",
              flush=True)
        margins.append(per_call)
    margins.sort()
    best = margins[len(margins) // 2]  # median — per-fetch noise is heavy-tailed

    qbytes = sum(a.size * a.dtype.itemsize for a in qt.data)
    sbytes = qt.scales.size * qt.scales.dtype.itemsize
    gbs = (qbytes + sbytes) / best / 1e9
    print(
        f"m={args.m} k={args.k} n={args.n} bits={args.bits} g={args.group}: "
        f"{best * 1e6:.1f} us/call  {gbs:.0f} GB/s effective "
        f"(weights {qbytes / 1e6:.1f} MB + scales {sbytes / 1e6:.1f} MB)"
    )


if __name__ == "__main__":
    main()
