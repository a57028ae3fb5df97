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
  kernelspot  ON-CHIP numerical spot-check: flash (incl. deferred +
              fused-append aliasing, bit-identical cache) and qmatmul at
              7B shapes vs the XLA reference under real Mosaic — run once
              per round (VERDICT r3 item 5)
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
    act = jnp.ones((B,), bool)
    seq = [0]
    def run(n):
        # DATA-DEPENDENT token chain (argmax feedback + per-call seed):
        # identical dispatches get deduped by the tunnel — the round-3/4
        # leg runs with a fixed token printed impossible rates
        seq[0] += 1
        toks = jnp.full((B,), seq[0] % 1000 + 1, jnp.int32)
        t0 = time.time()
        for i in range(n):
            lg = eng.decode(toks, act)
            toks = jnp.argmax(lg, -1).astype(jnp.int32)
        int(toks[0])
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

KERNELSPOT = r"""
# On-chip numerical spot-check (VERDICT r3 item 5): the Pallas kernels vs
# the XLA reference at 7B shapes, run with REAL Mosaic compilation — so
# interpret-mode-only correctness can never again mask a Mosaic/aliasing
# behavior difference (the round-3 fused-append default shipped with
# interpret-mode tests only and regressed 10x on chip).  Parity anchor:
# the reference tests fused MHA on the real ISA (mha_dense_tests.cpp).
import os
os.environ['NST_FLASH'] = 'on'
import numpy as np, jax, jax.numpy as jnp
from neural_speed_tpu.ops import flash, kv_cache as kvc
from neural_speed_tpu.ops.attention import attention_ref
from neural_speed_tpu.ops.qtypes import QSpec, QType
from neural_speed_tpu.ops.quantize import quantize, dequantize
from neural_speed_tpu.ops.matmul import qmatmul, qmatmul_xla

fails = []

# --- qmatmul at llama2-7B shapes (GEMV m=1 decode + m=128 prefill) ---
rng = np.random.default_rng(0)
for K, N in ((4096, 12288), (4096, 22016), (11008, 4096), (4096, 32000)):
    w = jnp.asarray(rng.standard_normal((K, N), np.float32) * 0.05)
    for sdt in ("float32", "bfloat16"):
        qt = quantize(w, QSpec(QType.INT, 4, 128, True, scale_dtype=sdt))
        for m in (1, 128):
            x = jnp.asarray(rng.standard_normal((m, K), np.float32) * 0.3)
            got = np.asarray(qmatmul(x, qt), np.float32)
            ref = np.asarray(qmatmul_xla(x, qt), np.float32)
            rel = (np.linalg.norm(got - ref)
                   / max(np.linalg.norm(ref), 1e-9))
            tag = f"qmatmul {K}x{N} m={m} {sdt}"
            print(f"{tag}: rel {rel:.2e}", flush=True)
            if rel > 2e-2:
                fails.append(tag)

# --- flash decode over the quantized stacked cache at 7B shape ---
L, b, h, hkv, d, s = 2, 1, 32, 32, 128, 2048
kf = jnp.asarray(rng.standard_normal((L, b, hkv, s, d)), jnp.float32)
vf = jnp.asarray(rng.standard_normal((L, b, hkv, s, d)), jnp.float32)
q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32) * 0.3
kc, ks = kvc.quantize_kv(kf); vc, vs = kvc.quantize_kv(vf)
ks4, vs4 = ks[..., 0], vs[..., 0]
kv_lens = jnp.array([1500], jnp.int32)
pos = jnp.array([[1499]], jnp.int32)
layer = 1
out = flash.mha(q, kc, vc, ks4, vs4, pos, kv_lens, scale=d ** -0.5,
                layer=layer)
ref = attention_ref(
    q, (kc.astype(jnp.float32) * ks)[layer].transpose(0, 2, 1, 3),
    (vc.astype(jnp.float32) * vs)[layer].transpose(0, 2, 1, 3),
    pos, kv_lens)
err = float(jnp.max(jnp.abs(out - ref)))
print(f"flash decode 7B-shape max err vs XLA: {err:.2e}", flush=True)
if err > 3e-2:
    fails.append("flash decode")

# --- deferred-append extra-kv column (kernel seeds softmax from operands)
k_new = jnp.asarray(rng.standard_normal((b, 1, hkv, d)), jnp.float32)
v_new = jnp.asarray(rng.standard_normal((b, 1, hkv, d)), jnp.float32)
kv_lens2 = kv_lens + 1
pos2 = jnp.array([[1500]], jnp.int32)
out2 = flash.mha(q, kc, vc, ks4, vs4, pos2, kv_lens2, scale=d ** -0.5,
                 layer=layer, extra_kv=(k_new, v_new))
kdq = np.asarray(kc.astype(jnp.float32) * ks)[layer].copy()
vdq = np.asarray(vc.astype(jnp.float32) * vs)[layer].copy()
kdq[0, :, 1500] = np.asarray(k_new)[0, 0]; vdq[0, :, 1500] = np.asarray(v_new)[0, 0]
ref2 = attention_ref(q, jnp.asarray(kdq).transpose(0, 2, 1, 3),
                     jnp.asarray(vdq).transpose(0, 2, 1, 3), pos2, kv_lens2)
err2 = float(jnp.max(jnp.abs(out2 - ref2)))
print(f"flash deferred-append max err vs XLA: {err2:.2e}", flush=True)
if err2 > 3e-2:
    fails.append("flash deferred append")

# --- fused in-kernel append: REAL Mosaic input_output_aliases semantics —
# the returned cache must equal the host quantize bit-for-bit and all
# other rows must be untouched
res = flash.mha(q, kc, vc, ks4, vs4, pos2, kv_lens2, scale=d ** -0.5,
                layer=layer, extra_kv=(k_new, v_new), fused_append=True)
if res is None:
    fails.append("fused append: kernel did not engage")
else:
    out3, (k2, v2, ks2, vs2) = res
    kq, ksq = kvc.quantize_kv(k_new.transpose(0, 2, 1, 3))
    vq, vsq = kvc.quantize_kv(v_new.transpose(0, 2, 1, 3))
    exp_k = np.asarray(kc).copy(); exp_v = np.asarray(vc).copy()
    exp_ks = np.asarray(ks4).copy(); exp_vs = np.asarray(vs4).copy()
    exp_k[layer, 0, :, 1500] = np.asarray(kq)[0, :, 0]
    exp_v[layer, 0, :, 1500] = np.asarray(vq)[0, :, 0]
    exp_ks[layer, 0, :, 1500] = np.asarray(ksq)[0, :, 0, 0]
    exp_vs[layer, 0, :, 1500] = np.asarray(vsq)[0, :, 0, 0]
    for name, got_a, exp_a in (("k", k2, exp_k), ("v", v2, exp_v),
                               ("ks", ks2, exp_ks), ("vs", vs2, exp_vs)):
        neq = int(np.sum(np.asarray(got_a) != exp_a))
        print(f"fused append {name}: {neq} mismatched elements", flush=True)
        if neq:
            fails.append(f"fused append cache {name}")
    err3 = float(jnp.max(jnp.abs(out3 - ref2)))
    print(f"fused append attn max err vs XLA: {err3:.2e}", flush=True)
    if err3 > 3e-2:
        fails.append("fused append attention")

# --- fused append, MULTI-SLOT (B=4, mixed active/inactive): per-slot
# window out-blocks at different rows + spectator preservation under the
# real Mosaic revisited-out-block flush semantics
b4 = 4
kf4 = jnp.asarray(rng.standard_normal((L, b4, hkv, 512, d)), jnp.float32)
vf4 = jnp.asarray(rng.standard_normal((L, b4, hkv, 512, d)), jnp.float32)
q4b = jnp.asarray(rng.standard_normal((b4, 1, h, d)), jnp.float32) * 0.3
kn4 = jnp.asarray(rng.standard_normal((b4, 1, hkv, d)), jnp.float32)
vn4 = jnp.asarray(rng.standard_normal((b4, 1, hkv, d)), jnp.float32)
kc4, ks_ = kvc.quantize_kv(kf4); vc4, vs_ = kvc.quantize_kv(vf4)
ks44, vs44 = ks_[..., 0], vs_[..., 0]
# slots 0,2 active at different rows; 1,3 spectators (query parked)
kv4 = jnp.array([100, 300, 257, 40], jnp.int32)
pos4 = jnp.array([[99], [511], [256], [511]], jnp.int32)
res4 = flash.mha(q4b, kc4, vc4, ks44, vs44, pos4, kv4, scale=d ** -0.5,
                 layer=0, extra_kv=(kn4, vn4), fused_append=True)
if res4 is None:
    fails.append("fused append B=4: kernel did not engage")
else:
    _, (k24, v24, ks24, vs24) = res4
    kq4, ksq4 = kvc.quantize_kv(kn4.transpose(0, 2, 1, 3))
    vq4, vsq4 = kvc.quantize_kv(vn4.transpose(0, 2, 1, 3))
    exp_k = np.asarray(kc4).copy(); exp_v = np.asarray(vc4).copy()
    exp_ks = np.asarray(ks44).copy(); exp_vs = np.asarray(vs44).copy()
    for slot, row in ((0, 99), (2, 256)):   # active: pos == kv_len-1
        exp_k[0, slot, :, row] = np.asarray(kq4)[slot, :, 0]
        exp_v[0, slot, :, row] = np.asarray(vq4)[slot, :, 0]
        exp_ks[0, slot, :, row] = np.asarray(ksq4)[slot, :, 0, 0]
        exp_vs[0, slot, :, row] = np.asarray(vsq4)[slot, :, 0, 0]
    neq = sum(int(np.sum(np.asarray(g) != e)) for g, e in
              ((k24, exp_k), (v24, exp_v), (ks24, exp_ks), (vs24, exp_vs)))
    print(f"fused append B=4 mixed: {neq} mismatched elements", flush=True)
    if neq:
        fails.append("fused append B=4 cache")

# --- PAGED fused append (round 4): table-resolved aliased windows under
# real Mosaic — mixed active/spectator slots, shuffled pages, pool must
# match pkv.append_decode on every live page
from neural_speed_tpu.ops import paged_kv as pkv
Lp, bp, ps, npg, nblk = 2, 3, 128, 8, 2
kfp = jnp.asarray(rng.standard_normal((Lp, hkv, npg, ps, d)), jnp.float32)
vfp = jnp.asarray(rng.standard_normal((Lp, hkv, npg, ps, d)), jnp.float32)
kcp, ksp = kvc.quantize_kv(kfp); vcp, vsp = kvc.quantize_kv(vfp)
tables = jnp.asarray([[0, 1], [2, 3], [4, 5]], jnp.int32)  # 7 = trash
pcache = pkv.PagedKVCache(kcp, vcp, ksp.transpose(0, 1, 2, 4, 3),
                          vsp.transpose(0, 1, 2, 4, 3), tables,
                          jnp.zeros((bp,), jnp.int32))
qp = jnp.asarray(rng.standard_normal((bp, 1, h, d)), jnp.float32) * 0.3
knp = jnp.asarray(rng.standard_normal((bp, 1, hkv, d)), jnp.float32)
vnp = jnp.asarray(rng.standard_normal((bp, 1, hkv, d)), jnp.float32)
kvl = jnp.array([101, 120, ps + 7], jnp.int32)
posp = jnp.array([[100], [2 * ps - 1], [ps + 6]], jnp.int32)
resp = flash.mha_paged(qp, pcache, 1, posp, kvl, scale=d ** -0.5,
                       extra_kv=(knp, vnp), fused_append=True)
if resp is None:
    fails.append("paged fused append: kernel did not engage")
else:
    _, (k2p, v2p, ks2p, vs2p) = resp
    expp = pkv.append_decode(pcache, 1, knp, vnp,
                             jnp.maximum(kvl - 1, 0)[:, None],
                             active=jnp.array([True, False, True]))
    live = list(range(npg - 1))
    neqp = sum(int(np.sum(np.asarray(g)[:, :, live] != np.asarray(e)[
        :, :, live])) for g, e in ((k2p, expp.k_pages), (v2p, expp.v_pages)))
    srel = max(float(np.max(np.abs(
        np.asarray(g, np.float32)[:, :, live]
        - np.asarray(e, np.float32)[:, :, live]))) for g, e in
        ((ks2p, expp.k_scale), (vs2p, expp.v_scale)))
    print(f"paged fused append: {neqp} code mismatches, scale maxdiff "
          f"{srel:.2e}", flush=True)
    if neqp or srel > 1e-6:
        fails.append("paged fused append pool")

print("KERNELSPOT:", "FAIL " + ", ".join(fails) if fails else "ALL OK",
      flush=True)
assert not fails
"""

SERVING = r"""
import time, numpy as np, jax.numpy as jnp, dataclasses
from neural_speed_tpu.ops.qtypes import QSpec, QType
from neural_speed_tpu.ops.sampling import SamplingParams
from neural_speed_tpu.runtime.engine import Engine
from neural_speed_tpu.runtime.scheduler import ContinuousBatchingScheduler
from neural_speed_tpu.utils.synthetic import synth_params, llama2_7b_arch
cfg = llama2_7b_arch()
params = synth_params(cfg, QSpec(QType.INT, 4, 128, True,
                                 scale_dtype="bfloat16"))
eng = Engine(params, cfg, max_batch=1, max_len=2048, kv_quantized=True)
NT, REPS = 256, 3
def serve(label, **kw):
    # >=3 repeats per arm: single-shot serving numbers drift +-8% with
    # tunnel conditions (BENCH_NOTES round-3) — report median + spread
    sched = ContinuousBatchingScheduler(
        eng, SamplingParams(do_sample=False), chunk_size=16, **kw)
    sched.warmup(prompt_len=128)
    rates, drates = [], []
    for _ in range(REPS):
        first = []
        sched.add_request([1] * 128, NT,
                          streamer=lambda t: first.append(time.time())
                          if not first else None)
        t0 = time.time()
        sched.run_to_completion()
        dt = time.time() - t0
        rates.append(NT / dt)
        # decode-only rate (like-for-like vs the offline anchor and the
        # reference's 4th-token metric): exclude time-to-first-token
        if first:
            drates.append((NT - 1) / (t0 + dt - first[0]))
    rates.sort(); drates.sort()
    med = rates[len(rates) // 2]
    dmed = drates[len(drates) // 2] if drates else float("nan")
    print(f"served B=1 {label}: median {med:.1f} tok/s incl prefill "
          f"(spread {rates[0]:.1f}-{rates[-1]:.1f}, n={REPS}); "
          f"decode-only {dmed:.1f} tok/s", flush=True)
    return med, dmed
# offline anchor measured IN THE SAME SESSION (the only valid
# denominator for the served/offline ratio — cross-session drift is
# bigger than the gap being measured)
import neural_speed_tpu.runtime.engine as E
toks = jnp.ones((1,), jnp.int32); act = jnp.ones((1,), bool)
eng.prefill([[1] * 128])
def offline(n):
    t0 = time.time()
    o, eng.cache = E.decode_n_steps(eng.params, eng.cfg, eng.cache, toks,
                                    act, n)
    o.block_until_ready(); return time.time() - t0
offline(16); offline(64)  # compile
rates = []
for _ in range(REPS):
    t1, t2 = offline(64), offline(256)
    rates.append((256 - 64) / (t2 - t1))
rates.sort()
off = rates[len(rates) // 2]
print(f"offline anchor (same session): {off:.1f} tok/s "
      f"(spread {rates[0]:.1f}-{rates[-1]:.1f})", flush=True)
for label, kw in (("window=64 (default)", {}),
                  ("window=256", dict(window=256)),
                  ("window=128", dict(window=128))):
    med, dmed = serve(label, **kw)
    print(f"  -> {med/off:.3f}x of offline incl prefill; "
          f"{dmed/off:.3f}x decode-only", flush=True)
"""


MULTISERVE = r"""
# Multi-request serving record (VERDICT r4 item 3): 8 concurrent requests
# with MIXED prompt lengths through the CB scheduler — aggregate tok/s +
# p50/p90 TTFT, contiguous AND paged (the reference's continuous batching
# exists for concurrency; scheduler.cpp step semantics + the percentile
# reporting of tests/model-test/calculate_percentiles.py).
import time, numpy as np, jax.numpy as jnp
from neural_speed_tpu.ops.qtypes import QSpec, QType
from neural_speed_tpu.ops.sampling import SamplingParams
from neural_speed_tpu.runtime.engine import Engine, PagedEngine
from neural_speed_tpu.runtime.scheduler import ContinuousBatchingScheduler
from neural_speed_tpu.utils.synthetic import synth_params, llama2_7b_arch
cfg = llama2_7b_arch()
params = synth_params(cfg, QSpec(QType.INT, 4, 128, True,
                                 scale_dtype="bfloat16"))
B, CTX, NNEW, REPS = 8, 1024, 128, 3
PLENS = [128, 192, 256, 320, 384, 448, 512, 576]
rng = np.random.default_rng(0)
PROMPTS = [list(rng.integers(5, 30000, size=n)) for n in PLENS]
for label, cls, kw in (("contiguous", Engine, {}),
                       ("paged", PagedEngine,
                        {"page_size": 128, "n_pages": B * CTX // 128 + 8})):
    eng = cls(params, cfg, max_batch=B, max_len=CTX, kv_quantized=True,
              **kw)
    sched = ContinuousBatchingScheduler(
        eng, SamplingParams(do_sample=False), chunk_size=16)
    sched.warmup(prompt_len=max(PLENS))
    aggs, ttfts = [], []
    for rep in range(REPS + 1):
        first = {}
        t0 = time.time()
        for i, p in enumerate(PROMPTS):
            rid = sched.add_request(
                list(p), NNEW,
                streamer=(lambda t, i=i: first.setdefault(
                    i, time.time())))
            del rid
        done = sched.run_to_completion()
        dt = time.time() - t0
        assert len(done) == B and all(
            len(s.generated) == NNEW for s in done)
        if rep == 0:
            continue  # rep 0 pays the jit compiles; stats from warm reps
        aggs.append(B * NNEW / dt)
        ttfts.extend(v - t0 for v in first.values())
    aggs.sort(); ttfts.sort()
    p50 = ttfts[len(ttfts) // 2]
    p90 = ttfts[int(len(ttfts) * 0.9)]
    print(f"{label}: aggregate {aggs[len(aggs)//2]:.0f} tok/s "
          f"(spread {aggs[0]:.0f}-{aggs[-1]:.0f}, {B} reqs x {NNEW} new, "
          f"prompts {PLENS[0]}-{PLENS[-1]}); "
          f"TTFT p50 {p50*1e3:.0f} ms p90 {p90*1e3:.0f} ms", flush=True)
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
    "kernelspot": (KERNELSPOT, 1200),
    "paged32": (PAGED32, 1200),
    "serving": (SERVING, 1500),
    "multiserve": (MULTISERVE, 2400),
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
