"""EOS-aware device-side decode windows (runtime/engine.decode_window +
scheduler._window_step).

The window path must deliver exactly the chunk ladder's streams (greedy)
while dispatching fewer, longer device programs with per-slot EOS/budget
deactivation inside the loop.  Reference comparison point: the cpp server
steps per token in-process (main_pybind.cpp:609-660) — both of our paths
replace that with device-chained steps; these tests pin their equivalence.
"""

import numpy as np
import pytest
import torch
from transformers import LlamaConfig, LlamaForCausalLM

import jax.numpy as jnp

from neural_speed_tpu.api import Model
from neural_speed_tpu.convert.hf import params_from_state_dict
from neural_speed_tpu.models.configs import arch_from_hf_config
from neural_speed_tpu.ops.sampling import SamplingParams
from neural_speed_tpu.runtime.scheduler import ContinuousBatchingScheduler

CFG = LlamaConfig(
    vocab_size=256, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
    max_position_embeddings=256,
)
PROMPTS = [[1, 17, 9, 33], [2, 5, 8, 13, 21, 34], [7, 7, 7], [9, 4]]


@pytest.fixture(scope="module")
def our_model():
    torch.manual_seed(0)
    with torch.no_grad():
        hf = LlamaForCausalLM(CFG)
    hf.eval()
    cfg = arch_from_hf_config(CFG.to_dict())
    params = params_from_state_dict(
        dict(hf.state_dict()), cfg, qspec=None, dtype=jnp.float32
    )
    m = Model()
    m.cfg = cfg
    m._make_engine(params, max_batch=4, ctx_size=128, kv_quantized=False)
    m._raw_params = params  # unfused (TP column splits need separate q/k/v)
    return m


def _run(m, sp, eos=None, window=None, chunk=4, pipeline=True,
         max_new=(12, 7, 9, 5), use_window=True):
    kw = dict(chunk_size=chunk, pipeline_decode=pipeline)
    if window is not None:
        kw["window"] = window
    sched = ContinuousBatchingScheduler(m.engine, sp, eos_id=eos, **kw)
    if not use_window:
        sched.window_cap = 1  # forces the chunk-ladder path
    rids = [sched.add_request(p, n) for p, n in zip(PROMPTS, max_new)]
    done = {s.request_id: s.generated for s in sched.run_to_completion()}
    return [done[r] for r in rids], sched


def test_window_matches_chunk_ladder(our_model):
    sp = SamplingParams(do_sample=False, repetition_penalty=1.1)
    ref, s_ref = _run(our_model, sp, use_window=False)
    got, s_win = _run(our_model, sp, use_window=True)
    assert got == ref
    assert not s_ref._use_window() and s_win._use_window()


def test_window_eos_stops_on_device(our_model):
    """Pick an eos from a mid-stream token, then re-run: the stream must
    cut at the eos (inclusive) with the device loop stopping there."""
    sp = SamplingParams(do_sample=False, repetition_penalty=1.0)
    full, _ = _run(our_model, sp, max_new=(16, 16, 16, 16))
    eos = full[0][5]
    got, sched = _run(our_model, sp, eos=eos, max_new=(16, 16, 16, 16))
    for f, g in zip(full, got):
        cut = f.index(eos) + 1 if eos in f else len(f)
        assert g == f[:cut]
    # device stop means the slot's KV length equals prompt + emitted, not
    # a chunk-boundary overshoot
    assert all(v == 0 for v in sched._slot_len)  # all finished/zeroed


def test_window_slot_len_exact_after_early_stop(our_model):
    sp = SamplingParams(do_sample=False)
    sched = ContinuousBatchingScheduler(our_model.engine, sp,
                                        chunk_size=4, window=16)
    rid = sched.add_request(PROMPTS[0], 5)  # finishes mid-window
    sched.step()   # prefill (+ first token)
    sched.step()   # window dispatch
    while sched.has_work:
        sched.step()
    seq = sched.pop_finished()[0]
    assert seq.request_id == rid and len(seq.generated) == 5
    lens = np.asarray(sched.engine.cache.lengths)
    # prompt + (max_new - 1) input tokens appended; the final sampled
    # token is never fed back — and crucially no chunk-boundary overshoot
    assert lens[seq.slot] == len(PROMPTS[0]) + 5 - 1


def test_window_pipelining_identical(our_model):
    sp = SamplingParams(do_sample=False, repetition_penalty=1.15)
    a, _ = _run(our_model, sp, pipeline=True)
    b, _ = _run(our_model, sp, pipeline=False)
    assert a == b


def test_window_param_and_sizes(our_model):
    sp = SamplingParams(do_sample=False)
    for window in (2, 8, 64):
        got, sched = _run(our_model, sp, window=window)
        assert sched.window_cap == window
        ref, _ = _run(our_model, sp, use_window=False)
        assert got == ref


def test_window_sampled_properties(our_model):
    sp = SamplingParams(do_sample=True, temperature=0.9, top_k=8,
                        top_p=0.9)
    got, _ = _run(our_model, sp)
    for toks, n in zip(got, (12, 7, 9, 5)):
        assert len(toks) == n
        assert all(0 <= t < CFG.vocab_size for t in toks)


def test_window_streamer_order(our_model):
    sp = SamplingParams(do_sample=False)
    sched = ContinuousBatchingScheduler(our_model.engine, sp,
                                        chunk_size=4, window=16)
    seen = []
    sched.add_request(PROMPTS[0], 9, streamer=seen.append)
    out = sched.run_to_completion()
    assert seen == out[0].generated and len(seen) == 9


def test_window_checkpoint_mid_generation(our_model, tmp_path):
    """save_state flushes the in-flight window; resume completes the
    stream identically."""
    sp = SamplingParams(do_sample=False, repetition_penalty=1.1)
    ref, _ = _run(our_model, sp, max_new=(20, 20, 20, 20))

    sched = ContinuousBatchingScheduler(our_model.engine, sp,
                                        chunk_size=4, window=8)
    rids = [sched.add_request(p, 20) for p in PROMPTS]
    for _ in range(4):
        sched.step()
    path = str(tmp_path / "win_ckpt")
    sched.save_state(path)
    pre = {s.request_id: s.generated for s in sched.pop_finished()}
    res = ContinuousBatchingScheduler.load_state(our_model.engine, path)
    assert res.window_cap == 8
    post = {s.request_id: s.generated for s in res.run_to_completion()}
    for rid, full in zip(rids, ref):
        # running sequences carry their prefix inside the checkpoint
        if rid in post:
            assert post[rid] == full
        else:
            assert pre[rid] == full


def test_window_paged_matches_contiguous(our_model):
    """Windowed decode on the page pool: pessimistic window reservation +
    commit_lens rollback; streams equal the contiguous engine's."""
    import os

    from neural_speed_tpu.runtime.engine import PagedEngine

    os.environ.setdefault("NST_FLASH", "off")  # exact cross-engine compare
    sp = SamplingParams(do_sample=False, repetition_penalty=1.1)
    ref, _ = _run(our_model, sp)
    peng = PagedEngine(our_model.engine.params, our_model.engine.cfg,
                       max_batch=4, max_len=128, page_size=16)
    assert peng.supports_window
    sched = ContinuousBatchingScheduler(peng, sp, chunk_size=4, window=16)
    rids = [sched.add_request(p, n)
            for p, n in zip(PROMPTS, (12, 7, 9, 5))]
    done = {s.request_id: s.generated for s in sched.run_to_completion()}
    assert [done[r] for r in rids] == ref
    # every page freed once all requests finished (no leaks from the
    # pessimistic window reservations)
    assert not sched.running and not peng._alloc.refs
    assert sorted(peng._alloc.free) == list(range(peng.n_pages - 1))


def test_window_paged_staggered_finish_no_leak(our_model):
    """Regression (round-3 review): a slot finishing by EOS mid-serving
    while another slot keeps decoding for several more pipelined windows
    must not ride along in the stale dispatch mask — that advanced the
    freed slot's _slot_len and claimed pages for it every window with no
    commit undoing either (permanent pool leak once the slot was
    reused)."""
    import os

    from neural_speed_tpu.runtime.engine import PagedEngine

    os.environ.setdefault("NST_FLASH", "off")
    sp = SamplingParams(do_sample=False)
    # find a token that the greedy stream emits early for prompt 0
    probe, _ = _run(our_model, sp, max_new=(24, 24, 24, 24))
    eos = probe[0][2]
    peng = PagedEngine(our_model.engine.params, our_model.engine.cfg,
                       max_batch=4, max_len=128, page_size=16)
    sched = ContinuousBatchingScheduler(peng, sp, eos_id=eos,
                                        chunk_size=2, window=4)
    rids = [sched.add_request(p, 40) for p in PROMPTS]
    done = {s.request_id: s.generated for s in sched.run_to_completion()}
    # at least one early (eos) finisher and one long runner
    lens = sorted(len(v) for v in done.values())
    assert lens[0] < 40 <= lens[-1] or lens[0] < lens[-1]
    # freed slots must not hold page references or nonzero length mirrors
    assert not sched.running
    assert all(v == 0 for v in sched._slot_len)
    assert not peng._alloc.refs, peng._alloc.refs
    assert sorted(peng._alloc.free) == list(range(peng.n_pages - 1))
    # and the streams equal the contiguous engine's under the same eos
    ref, _ = _run(our_model, sp, eos=eos, max_new=(40, 40, 40, 40))
    assert [done[r] for r in rids] == ref


def test_window_smaller_than_chunk(our_model):
    """window < chunk_size must clamp the dispatch to the buffer cap
    (review: w=chunk_size with cap=window dropped tokens silently)."""
    sp = SamplingParams(do_sample=False)
    ref, _ = _run(our_model, sp, use_window=False)
    got, sched = _run(our_model, sp, window=2, chunk=16)
    assert sched.window_cap == 2 and sched._use_window()
    assert got == ref


def test_window_tp_matches_single_device(our_model):
    """Windowed decode over a tp=2 CPU mesh (shard_map'ed while_loop)
    equals the single-device window stream."""
    from neural_speed_tpu.parallel import tp as tpmod
    from neural_speed_tpu.parallel.tp import TPEngine

    mesh = tpmod.make_mesh(tp=2, dp=1)
    sp = SamplingParams(do_sample=False, repetition_penalty=1.1)
    ref, _ = _run(our_model, sp, window=16)
    teng = TPEngine(our_model._raw_params, our_model.engine.cfg, mesh,
                    max_batch=4, max_len=128)
    assert teng.supports_window
    sched = ContinuousBatchingScheduler(teng, sp, chunk_size=4, window=16)
    rids = [sched.add_request(p, n) for p, n in zip(PROMPTS, (12, 7, 9, 5))]
    done = {s.request_id: s.generated for s in sched.run_to_completion()}
    assert [done[r] for r in rids] == ref


def test_window_eviction_streaming(our_model):
    """Near the context limit the window shrinks to the base chunk so
    StreamingLLM eviction fires at the fixed-chunk schedule's points."""
    sp = SamplingParams(do_sample=False)
    eng = our_model.engine
    eng.n_keep, eng.n_discard = 4, 32

    def run(use_window):
        sched = ContinuousBatchingScheduler(eng, sp, chunk_size=4,
                                            window=16)
        if not use_window:
            sched.window_cap = 1
        sched.add_request(PROMPTS[1], 160)  # overflows ctx 128 -> evicts
        return sched.run_to_completion()[0].generated

    ref = run(False)
    got = run(True)
    assert got == ref and len(got) == 160
