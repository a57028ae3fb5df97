"""On-chip measurement checklist — run the moment the TPU tunnel answers.

Round-2 backlog of landed-but-unbenched changes (BENCH_NOTES.md), each leg
isolated in a subprocess with its own timeout so one hang doesn't eat the
session.  Results append to BENCH_NOTES-ready lines in the report file.

Usage:
  python scripts/onchip_checklist.py [--report /tmp/onchip_report.txt]
        [--legs leg1,leg2,...]   (default: all)

Legs:
  probe       backend answers + device list
  smoke       bench.py --small (compile-path check)
  kernel      GEMV marginal GB/s at m=1 (int4 g128 7B shapes)
  planar      planar-kernel GB/s for int3/int5/fp8 vs int4 (VERDICT item 3)
  flash80     head_dim 80 flash kernel Mosaic-compiles + matches XLA
  bench       full bench.py (decode tok/s B=1 — the driver metric)
  bench16     bench.py --batch 16 --ctx 1024 int8 vs bf16 KV (VERDICT 6)
  paged32     paged vs contiguous decode at B=32 (VERDICT item 5)
  serving     served-path tok/s B=1 via scheduler (VERDICT item 2)
  gemvbn      GEMV N-block sweep: per-shape us/call at NST_GEMV_BN_BYTES
              in {0 (old 512 blocks), 12MB (default), 24MB} (round 3).
              CAVEAT: weights <~25MB get promoted to VMEM as scan loop
              invariants (impossible >1.5 TB/s "effective" rates) — only
              the large shapes are meaningful; bench.py is ground truth
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_leg(name: str, code: str, timeout: int, report: str) -> None:
    print(f"=== {name} ===", flush=True)
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                           capture_output=True, text=True, cwd=REPO)
        out = (r.stdout or "") + (r.stderr or "")[-2000:]
        status = "ok" if r.returncode == 0 else f"rc={r.returncode}"
    except subprocess.TimeoutExpired as e:
        out = ((e.stdout or b"").decode(errors="replace")
               if isinstance(e.stdout, bytes) else (e.stdout or ""))
        status = f"TIMEOUT {timeout}s"
    dt = time.time() - t0
    with open(report, "a") as f:
        f.write(f"\n### {name} [{status}, {dt:.0f}s]\n{out}\n")
    print(out[-3000:])
    print(f"--- {name}: {status} ({dt:.0f}s)", flush=True)


PROBE = "import jax; print('devices:', jax.devices())"

KERNEL = r"""
import subprocess, sys, os
os.chdir(os.environ.get('REPO', '.'))
sys.argv = ['kernel_bench.py']
exec(open('scripts/kernel_bench.py').read())
"""

PLANAR = r"""
import time, jax, jax.numpy as jnp, numpy as np
from neural_speed_tpu.ops.qtypes import QSpec, QType, named_qspec
from neural_speed_tpu.ops.quantize import quantize
from neural_speed_tpu.ops.matmul import qmatmul, _planar_supported, \
    _pallas_supported
K, N = 4096, 11008
rng = np.random.default_rng(0)
w = jnp.asarray(rng.standard_normal((K, N), np.float32) * 0.05)
x = jnp.asarray(rng.standard_normal((1, K), np.float32))
SHORT, LONG, REPS = 32, 160, 5
def chain_fn(qt, n):
    @jax.jit
    def run(x):
        def body(c, _):
            y = qmatmul(c, qt)
            return c + y[:, :K].astype(c.dtype) * 1e-6, ()
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out
    return run
for name, spec in [("int4", QSpec(QType.INT, 4, 128, True)),
                   ("int3", QSpec(QType.INT, 3, 128, True)),
                   ("int5", QSpec(QType.INT, 5, 128, True)),
                   ("int7", QSpec(QType.INT, 7, 128, True)),
                   ("fp8", named_qspec("fp8_e4m3", group_size=128))]:
    qt = quantize(w, spec)
    kind = ("pallas" if _pallas_supported(qt)
            else "planar" if _planar_supported(qt) else "XLA")
    fs, fl = chain_fn(qt, SHORT), chain_fn(qt, LONG)
    # distinct input per call + scalar fetch: the tunnel dedups identical
    # dispatches and lazily skips un-fetched chains (BENCH_NOTES.md)
    seq = [0]
    def t(f):
        seq[0] += 1
        xi = x + seq[0] * 1e-3
        t0 = time.time(); float(jnp.sum(f(xi)[0, :8])); return time.time() - t0
    t(fs); t(fl); t(fs); t(fl)          # compile + warm
    ms = sorted(((t(fl) - t(fs)) / (LONG - SHORT)) for _ in range(REPS))
    dt = ms[REPS // 2]
    gb = qt.nbytes() / dt / 1e9
    print(f"{name:5s} [{kind}] marginal {dt*1e6:.0f} us/op, "
          f"{gb:.0f} GB/s effective", flush=True)
"""

FLASH80 = r"""
import os
os.environ['NST_FLASH'] = 'on'
import jax, jax.numpy as jnp, numpy as np
from neural_speed_tpu.ops import flash
from neural_speed_tpu.ops.attention import attention_ref
b, t, h, hkv, d, s = 2, 8, 8, 2, 80, 256
rng = np.random.default_rng(1)
q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), jnp.float32)
pos = jnp.broadcast_to(jnp.arange(t)[None], (b, t)).astype(jnp.int32)
lens = jnp.array([t, t], jnp.int32)
out = flash.mha(q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
                None, None, pos, lens, scale=d ** -0.5)
assert out is not None, 'fell back'
ref = attention_ref(q, k, v, pos, lens, scale=d ** -0.5)
err = float(jnp.max(jnp.abs(out - ref)))
print('head_dim-80 flash max err vs XLA:', err)
assert err < 3e-2
# decode shape (head-blocked kernel)
qd = q[:, :1]
out2 = flash.mha(qd, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
                 None, None, pos[:, :1], lens, scale=d ** -0.5)
print('decode-shape ok', out2.shape)
"""

PAGED32 = r"""
import time, numpy as np, jax, jax.numpy as jnp
from neural_speed_tpu.models.arch import ArchConfig
from neural_speed_tpu.ops.qtypes import QSpec, QType
from neural_speed_tpu.utils.synthetic import synth_params, llama2_7b_arch
from neural_speed_tpu.runtime.engine import Engine, PagedEngine
import dataclasses
cfg = dataclasses.replace(llama2_7b_arch(), n_layers=8)
params = synth_params(cfg, QSpec(QType.INT, 4, 128, True))
B, CTX, STEPS = 32, 1024, 48
for name, cls, kw in [("contig", Engine, {}),
                      ("paged", PagedEngine, {"page_size": 128})]:
    eng = cls(params, cfg, max_batch=B, max_len=CTX, kv_quantized=True, **kw)
    prompts = [[1] * 64 for _ in range(B)]
    eng.prefill(prompts)
    import neural_speed_tpu.ops.kv_cache as kvc
    toks = jnp.ones((B,), jnp.int32)
    act = jnp.ones((B,), bool)
    def run(n):
        t0 = time.time()
        for i in range(n):
            lg = eng.decode(toks, act)
        lg.block_until_ready()
        return time.time() - t0
    run(4)
    t1, t2 = run(8), run(24)
    dt = (t2 - t1) / 16
    print(f"{name}: {dt*1e3:.2f} ms/step at B={B} -> "
          f"{B/dt:.0f} tok/s")
"""

PREFIX = r"""
import time, numpy as np, jax.numpy as jnp
from neural_speed_tpu.ops.qtypes import QSpec, QType
from neural_speed_tpu.ops.sampling import SamplingParams
from neural_speed_tpu.runtime.engine import PagedEngine
from neural_speed_tpu.runtime.scheduler import ContinuousBatchingScheduler
from neural_speed_tpu.utils.synthetic import synth_params, llama2_7b_arch
cfg = llama2_7b_arch()
params = synth_params(cfg, QSpec(QType.INT, 4, 128, True,
                                 scale_dtype="bfloat16"))
eng = PagedEngine(params, cfg, max_batch=1, max_len=2048, page_size=128,
                  kv_quantized=True, prefix_cache=True, n_pages=48)
sp = SamplingParams(do_sample=False)
PROMPT = list(np.random.default_rng(0).integers(5, 30000, size=1975))
def ttft(prompt):
    sched = ContinuousBatchingScheduler(eng, sp, chunk_size=16)
    first = []
    sched.add_request(prompt, 2, streamer=lambda t: first.append(
        (t, time.time())))
    t0 = time.time()
    while not first and sched.has_work:
        sched.step()
    dt = time.time() - t0
    sched.run_to_completion()  # release the slot (frees its pages)
    return dt
ttft(PROMPT)  # compile the full-prompt (2048) bucket + register pages
ttft(PROMPT)  # compile the suffix (64) bucket the hit path prefills with
cold = ttft(list(np.random.default_rng(1).integers(5, 30000, size=1975)))
warm = ttft(PROMPT)  # full-page prefix hit (15 of 15.4 pages cached)
print(f"TTFT 1975-token prompt: cold {cold*1e3:.0f} ms, "
      f"prefix-hit {warm*1e3:.0f} ms ({cold/warm:.1f}x) "
      f"[hits={eng.prefix.hits}]", flush=True)
"""

GEMVBN = r"""
import os, subprocess, sys
inner = '''
import time, jax, jax.numpy as jnp, numpy as np
from neural_speed_tpu.ops.qtypes import QSpec, QType
from neural_speed_tpu.ops.quantize import quantize
from neural_speed_tpu.ops.matmul import qmatmul
rng = np.random.default_rng(0)
SHORT, LONG, REPS = 24, 120, 5
for K, N in ((4096, 12288), (4096, 22016), (11008, 4096), (4096, 32000)):
    w = jnp.asarray(rng.standard_normal((K, N), np.float32) * 0.05)
    qt = quantize(w, QSpec(QType.INT, 4, 128, True))
    x = jnp.asarray(rng.standard_normal((1, K), np.float32))
    def chain(n):
        @jax.jit
        def run(xi):
            def body(c, _):
                y = qmatmul(c, qt)
                # scalar data dependence: shape-agnostic (K != N ok)
                return c + jnp.sum(y) * 1e-9, ()
            return jax.lax.scan(body, xi, None, length=n)[0]
        return run
    fs, fl = chain(SHORT), chain(LONG)
    seq = [0]
    def t(f):
        seq[0] += 1
        xi = x + seq[0] * 1e-3
        t0 = time.time(); float(jnp.sum(f(xi)[0, :8])); return time.time() - t0
    t(fs); t(fl); t(fs); t(fl)
    ms = sorted(((t(fl) - t(fs)) / (LONG - SHORT)) for _ in range(REPS))
    dt = ms[REPS // 2]
    gb = qt.nbytes() / dt / 1e9
    print(f"  {K}x{N}: {dt*1e6:.1f} us/call, {gb:.0f} GB/s", flush=True)
'''
for label, val in (("off(512-blk)", "0"), ("12MB", str(12 << 20)),
                   ("24MB", str(24 << 20))):
    print(f"--- NST_GEMV_BN_BYTES={label}", flush=True)
    env = {**os.environ, "NST_GEMV_BN_BYTES": val}
    subprocess.call([sys.executable, "-c", inner], env=env)
"""

SERVING = r"""
import time, numpy as np, jax.numpy as jnp, dataclasses
from neural_speed_tpu.ops.qtypes import QSpec, QType
from neural_speed_tpu.ops.sampling import SamplingParams
from neural_speed_tpu.runtime.engine import Engine
from neural_speed_tpu.runtime.scheduler import ContinuousBatchingScheduler
from neural_speed_tpu.utils.synthetic import synth_params, llama2_7b_arch
cfg = llama2_7b_arch()
params = synth_params(cfg, QSpec(QType.INT, 4, 128, True))
eng = Engine(params, cfg, max_batch=1, max_len=2048, kv_quantized=True)
NT = 256
def serve(label, **kw):
    sched = ContinuousBatchingScheduler(
        eng, SamplingParams(do_sample=False), chunk_size=16, **kw)
    # compile the decode program(s) AND the 128-token prefill bucket
    sched.warmup(prompt_len=128)
    sched.add_request([1] * 128, NT)
    t0 = time.time()
    sched.run_to_completion()
    dt = time.time() - t0
    print(f"served B=1 {label}: {NT/dt:.1f} tok/s "
          f"({dt/NT*1e3:.2f} ms/tok incl prefill)", flush=True)
serve("window=64 (default)")
serve("window=256", window=256)
serve("chunk ladder (window off)", window=1)
serve("window=256 unpipelined", window=256, pipeline_decode=False)
"""


LEGS = {
    "probe": (PROBE, 240),
    "smoke": ("import subprocess,sys; sys.exit(subprocess.call("
              "[sys.executable,'bench.py','--small']))", 600),
    "kernel": (KERNEL, 600),
    "planar": (PLANAR, 900),
    "flash80": (FLASH80, 600),
    "bench": ("import subprocess,sys; sys.exit(subprocess.call("
              "[sys.executable,'bench.py']))", 900),
    "bench16": ("import os, subprocess, sys\n"
                "base = [sys.executable, 'bench.py', '--batch', '16',"
                " '--ctx', '1024', '--prompt', '512']\n"
                "for label, env, extra in ("
                "('int8kv', {}, []),"
                "('bf16kv', {}, ['--kv', 'bf16'])):\n"
                "    print('---', label, flush=True)\n"
                "    subprocess.call(base + extra,"
                " env={**os.environ, **env})", 2700),
    "paged32": (PAGED32, 1200),
    "serving": (SERVING, 1500),
    "gemvbn": (GEMVBN, 1800),
    "prefixcache": (PREFIX, 1500),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--report", default="/tmp/onchip_report.txt")
    ap.add_argument("--legs", default=",".join(LEGS))
    args = ap.parse_args()
    os.environ["REPO"] = REPO
    with open(args.report, "a") as f:
        f.write(f"\n==== onchip checklist {time.ctime()} ====\n")
    for leg in args.legs.split(","):
        code, tmo = LEGS[leg.strip()]
        run_leg(leg.strip(), code, tmo, args.report)
    print(f"report: {args.report}")


if __name__ == "__main__":
    main()
