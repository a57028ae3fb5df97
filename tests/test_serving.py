"""Serving-layer tests: Model API, beam search, continuous batching,
ModelServer, session/params serialization.

Mirrors the reference's tests/test_model_server.py (callback-collected
results vs loop generation) and test_python_api.py beam-vs-HF checks.
"""

import os
import tempfile
import threading

import jax.numpy as jnp
import numpy as np
import pytest
import torch
from transformers import LlamaConfig, LlamaForCausalLM

from neural_speed_tpu.api import Model, ModelServer
from neural_speed_tpu.models.configs import arch_from_hf_config
from neural_speed_tpu.convert.hf import params_from_state_dict
from neural_speed_tpu.ops.sampling import SamplingParams
from neural_speed_tpu.runtime.beam import BeamConfig, beam_search
from neural_speed_tpu.runtime.engine import Engine
from neural_speed_tpu.runtime.scheduler import ContinuousBatchingScheduler
from neural_speed_tpu.runtime import serialization

CFG = LlamaConfig(
    vocab_size=256, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
    max_position_embeddings=256,
)


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    with torch.no_grad():
        m = LlamaForCausalLM(CFG)
    m.eval()
    return m


@pytest.fixture(scope="module")
def our_model(hf_model):
    cfg = arch_from_hf_config(CFG.to_dict())
    params = params_from_state_dict(
        dict(hf_model.state_dict()), cfg, qspec=None, dtype=jnp.float32
    )
    m = Model()
    m.cfg = cfg
    m._make_engine(params, max_batch=8, ctx_size=128, kv_quantized=False)
    return m


def _hf_greedy(hf_model, ids, n):
    with torch.no_grad():
        out = hf_model.generate(
            torch.tensor([ids]), max_new_tokens=n, do_sample=False,
            num_beams=1, pad_token_id=0,
        )
    return out[0].tolist()[len(ids):]


def _hf_beam(hf_model, ids, n, k):
    with torch.no_grad():
        out = hf_model.generate(
            torch.tensor([ids]), max_new_tokens=n, do_sample=False,
            num_beams=k, early_stopping=False, pad_token_id=0,
            length_penalty=1.0,
        )
    return out[0].tolist()[len(ids):]


PROMPTS = [[1, 17, 9, 33], [2, 5, 8, 13, 21, 34], [7, 7, 7]]


def test_model_generate_matches_hf(hf_model, our_model):
    for p in PROMPTS:
        ref = _hf_greedy(hf_model, p, 8)
        got = our_model.generate([p], max_new_tokens=8, ignore_prompt=True,
                                 repetition_penalty=1.0)[0]
        assert got == ref, (got, ref)


def test_batched_generate_matches_single(our_model):
    singles = [
        our_model.generate([p], max_new_tokens=6, ignore_prompt=True,
                           repetition_penalty=1.0)[0]
        for p in PROMPTS
    ]
    batched = our_model.generate(PROMPTS, max_new_tokens=6,
                                 ignore_prompt=True,
                                 repetition_penalty=1.0)
    assert batched == singles


def test_beam_search_matches_hf(hf_model, our_model):
    for p in PROMPTS[:2]:
        ref = _hf_beam(hf_model, p, 6, 2)
        got = beam_search(
            our_model.engine, [p],
            BeamConfig(num_beams=2, max_new_tokens=6),
        )[0]
        assert got == ref, (got, ref)


def test_beam_search_batched(hf_model, our_model):
    refs = [_hf_beam(hf_model, p, 5, 2) for p in PROMPTS[:2]]
    got = beam_search(
        our_model.engine, PROMPTS[:2],
        BeamConfig(num_beams=2, max_new_tokens=5),
    )
    assert got == refs


def test_continuous_batching_mixed_admission(our_model):
    """Requests arriving mid-flight must not corrupt running sequences."""
    eng = our_model.engine
    ref = [
        our_model.generate([p], max_new_tokens=6, ignore_prompt=True,
                           repetition_penalty=1.0)[0]
        for p in PROMPTS
    ]
    sched = ContinuousBatchingScheduler(
        eng, SamplingParams(do_sample=False, repetition_penalty=1.0)
    )
    r0 = sched.add_request(PROMPTS[0], 6)
    sched.step()  # prefill req0
    sched.step()  # decode 1
    r1 = sched.add_request(PROMPTS[1], 6)
    sched.step()  # prefill req1 (req0 keeps its kv)
    sched.step()
    r2 = sched.add_request(PROMPTS[2], 6)
    out = {}
    while sched.has_work:
        sched.step()
        for s in sched.pop_finished():
            out[s.request_id] = s.generated
    assert [out[r0], out[r1], out[r2]] == ref


def test_model_server_callback(our_model):
    ref = [
        our_model.generate([p], max_new_tokens=5, ignore_prompt=True,
                           repetition_penalty=1.0)[0]
        for p in PROMPTS
    ]
    results = {}
    lock = threading.Lock()

    def cb(rid, toks):
        with lock:
            results[rid] = toks

    with ModelServer(
        our_model, cb,
        sampling=SamplingParams(do_sample=False, repetition_penalty=1.0),
        max_new_tokens=5,
    ) as srv:
        for p in PROMPTS:
            srv.issue_query(p)
        srv.join()
    assert [results[i] for i in sorted(results)] == ref


def test_streamer_and_stopping(our_model):
    seen = []
    out = our_model.generate(
        [PROMPTS[0]], max_new_tokens=6, ignore_prompt=True,
        repetition_penalty=1.0, streamer=seen.append,
        stopping_criteria=lambda ids: len(ids) >= len(PROMPTS[0]) + 3,
    )[0]
    assert len(out) <= 4 and seen[: len(out)] == out


def test_params_serialization_roundtrip(our_model, tmp_path):
    from neural_speed_tpu.ops.qtypes import QSpec, QType
    from neural_speed_tpu.ops.quantize import quantize
    import jax

    p = str(tmp_path / "model.npz")
    params = our_model.engine.params
    # include a quantized leaf to exercise QTensor encoding
    qt = quantize(jnp.asarray(np.random.randn(64, 32), jnp.float32),
                  QSpec(QType.INT, 4, 32, False))
    mixed = {**params, "extra": {"w": qt}}
    serialization.save_params(p, mixed)
    loaded = serialization.load_params(p)
    flat1 = jax.tree_util.tree_leaves(mixed)
    flat2 = jax.tree_util.tree_leaves(loaded)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_session_roundtrip(our_model, tmp_path):
    eng = our_model.engine
    our_model.generate([PROMPTS[0]], max_new_tokens=2)
    path = str(tmp_path / "sess.npz")
    serialization.save_session(path, eng.cache)
    restored = serialization.load_session(path, eng.cache)
    np.testing.assert_array_equal(
        np.asarray(restored.lengths), np.asarray(eng.cache.lengths)
    )
    np.testing.assert_array_equal(
        np.asarray(restored.k, np.float32), np.asarray(eng.cache.k,
                                                       np.float32)
    )


def test_call_returns_padded_logits(our_model):
    out = our_model(PROMPTS[:2])
    assert out.shape[0] == 2
    assert np.isneginf(out[1, len(PROMPTS[1]):]).all() or out.shape[1] == len(
        PROMPTS[1]
    )
    assert np.isneginf(out[0, len(PROMPTS[0]):]).all()


def test_prompt_session_cache(our_model, tmp_path):
    """Prompt-session files (parity: 'ggsn' save/load + prompt cache):
    a second generate with the same prompt restores the KV and prefills
    only the suffix, producing identical greedy output."""
    sess = str(tmp_path / "sess.npz")
    prompt = PROMPTS[0]
    ref = our_model.generate([prompt], max_new_tokens=6,
                             repetition_penalty=1.0)[0]
    out1 = our_model.generate([prompt], max_new_tokens=6,
                              repetition_penalty=1.0,
                              session_path=sess)[0]
    assert out1 == ref
    # extended prompt: cached prefix + 2 new tokens
    longer = prompt + ref[len(prompt): len(prompt) + 2]
    from neural_speed_tpu.runtime.scheduler import ContinuousBatchingScheduler

    out2 = our_model.generate([longer], max_new_tokens=4,
                              repetition_penalty=1.0,
                              session_path=sess)[0]
    ref2 = our_model.generate([longer], max_new_tokens=4,
                              repetition_penalty=1.0)[0]
    assert out2 == ref2


def test_batched_speculative_generate(our_model):
    """generate(speculative=True) with multiple prompts routes through the
    scheduler's batched verify step and must equal plain batched greedy."""
    prompts = [[1, 17, 9, 33] * 5, [2, 5, 8, 13, 21, 34], [7, 7, 7] * 6]
    ref = our_model.generate(prompts, max_new_tokens=10, ignore_prompt=True,
                             repetition_penalty=1.0)
    got = our_model.generate(prompts, max_new_tokens=10, ignore_prompt=True,
                             repetition_penalty=1.0, speculative=True)
    assert got == ref
    # and with the default repetition penalty (penalized verify path)
    ref_p = our_model.generate(prompts, max_new_tokens=10,
                               ignore_prompt=True)
    got_p = our_model.generate(prompts, max_new_tokens=10,
                               ignore_prompt=True, speculative=True)
    assert got_p == ref_p


def test_staggered_admission_does_not_pollute_penalties(our_model):
    """Regression: admitting request B while A is decoding must not change
    A's output.  The prefill batch samples a full-batch logit block; before
    the fix, spectator (decoding) slots observed the junk tokens sampled
    for their rows into their penalty ring/counts, corrupting subsequent
    penalized steps."""
    from neural_speed_tpu.runtime.scheduler import ContinuousBatchingScheduler

    sp = SamplingParams(do_sample=False, repetition_penalty=1.3,
                        frequency_penalty=0.1, presence_penalty=0.05)
    pa, pb = [3, 1, 4, 1, 5, 9, 2, 6], [17, 23, 42, 8]

    s1 = ContinuousBatchingScheduler(our_model.engine, sp, chunk_size=1)
    s1.add_request(list(pa), 16)
    ref = s1.run_to_completion()[0].generated

    s2 = ContinuousBatchingScheduler(our_model.engine, sp, chunk_size=1)
    ra = s2.add_request(list(pa), 16)
    for _ in range(4):
        s2.step()               # prefill A + 3 decode steps
    s2.add_request(list(pb), 4)  # B admitted mid-decode
    done = {s.request_id: s.generated for s in s2.run_to_completion()}
    assert done[ra] == ref


def test_server_sampled_speculative(our_model):
    """ModelServer(speculative=True) with sampled params: per-slot
    rejection sampling against prompt-lookup drafts — every query must
    complete with exactly max_new_tokens valid ids."""
    results = {}
    lock = threading.Lock()

    def cb(rid, toks):
        with lock:
            results[rid] = toks

    vocab = our_model.engine.cfg.vocab_size
    with ModelServer(
        our_model, cb,
        sampling=SamplingParams(do_sample=True, temperature=0.9, top_k=8,
                                top_p=0.9, repetition_penalty=1.1),
        max_new_tokens=6, speculative=True, spec_k=4,
    ) as srv:
        for p in PROMPTS:
            srv.issue_query(p)
        srv.join()
    assert sorted(results) == list(range(len(PROMPTS)))
    for toks in results.values():
        assert len(toks) == 6
        assert all(0 <= t < vocab for t in toks)


def _run_staggered(our_model, sp, mixed, chunk=32, speculative=False):
    """Admit A, decode a bit, admit B (long prompt), then C — returns the
    three generated streams.  With mixed=True, B/C prefill in chunks
    piggybacked on A's decode steps (combined forwards)."""
    pa = [3, 1, 4, 1, 5, 9, 2, 6] * 3
    pb = list(range(40, 80))             # 40 tokens: >1 chunk at chunk<=32
    pc = [17, 23, 42]
    s = ContinuousBatchingScheduler(
        our_model.engine, sp, chunk_size=2, mixed_prefill=mixed,
        mixed_chunk=chunk, speculative=speculative, spec_k=4,
    )
    ra = s.add_request(list(pa), 12)
    s.step()                  # prefill A
    s.step()                  # decode
    rb = s.add_request(list(pb), 8)
    s.step()                  # mixed prefill-chunk+decode (or plain prefill)
    rc = s.add_request(list(pc), 8)
    done = {q.request_id: q.generated for q in s.run_to_completion()}
    return [done[ra], done[rb], done[rc]], s


def test_mixed_prefill_exact_greedy(our_model):
    """mixed_prefill=True (combined ORCA-style prefill+decode forwards,
    chunked prompts) must produce the same per-request penalized-greedy
    output as the plain alternating scheduler — incl. a prompt that spans
    several chunks and a request admitted mid-stream."""
    sp = SamplingParams(do_sample=False, repetition_penalty=1.1,
                        frequency_penalty=0.05)
    ref, _ = _run_staggered(our_model, sp, mixed=False)
    for chunk in (32, 8):
        out, s = _run_staggered(our_model, sp, mixed=True, chunk=chunk)
        assert out == ref, chunk
        assert "mixed" in s.timings.events() if hasattr(
            s.timings, "events") else True


def test_mixed_prefill_unpenalized_and_spec(our_model):
    sp = SamplingParams(do_sample=False, repetition_penalty=1.0)
    ref, _ = _run_staggered(our_model, sp, mixed=False)
    out, _ = _run_staggered(our_model, sp, mixed=True, chunk=8)
    assert out == ref
    # speculation composes: decode rows carry drafts inside mixed steps
    out_s, _ = _run_staggered(our_model, sp, mixed=True, chunk=8,
                              speculative=True)
    assert out_s == ref
    ref_p, _ = _run_staggered(
        our_model, SamplingParams(do_sample=False, repetition_penalty=1.1),
        mixed=False)
    out_sp, _ = _run_staggered(
        our_model, SamplingParams(do_sample=False, repetition_penalty=1.1),
        mixed=True, chunk=32, speculative=True)
    assert out_sp == ref_p


def test_mixed_prefill_sampled_support(our_model):
    """Sampled mixed mode: every emitted token must lie in the support of
    the exact target distribution (teacher-forced replay), for all three
    staggered requests."""
    from neural_speed_tpu.runtime.speculative import _target_dist

    sp = SamplingParams(do_sample=True, temperature=0.9, top_k=8,
                        top_p=0.9, repetition_penalty=1.1)
    out, _ = _run_staggered(our_model, sp, mixed=True, chunk=8)
    prompts = [[3, 1, 4, 1, 5, 9, 2, 6] * 3, list(range(40, 80)),
               [17, 23, 42]]
    eng = our_model.engine
    for p, o in zip(prompts, out):
        assert o
        obs = list(p[-sp.penalty_window:])
        logits = eng.prefill([p])
        row = np.asarray(logits[0], np.float32)
        for i, tok in enumerate(o):
            dist = _target_dist(row, sp, obs)
            assert dist[tok] > 0.0, (i, tok)
            obs.append(tok)
            if i + 1 < len(o):
                active = jnp.zeros((eng.max_batch,), bool).at[0].set(True)
                logits = eng.decode(jnp.full((eng.max_batch,), tok,
                                             jnp.int32), active)
                row = np.asarray(logits[0], np.float32)


def test_mixed_prefill_rejects_unsupported(our_model):
    with pytest.raises(ValueError):
        ContinuousBatchingScheduler(
            our_model.engine, SamplingParams(do_sample=True, mirostat=2),
            mixed_prefill=True)


def test_beam_continuous_queueing_matches_isolated(our_model):
    """More beam requests than slots: the CB beam scheduler queues and
    must produce exactly the isolated per-request results (parity:
    beam_search_flow::step under Cont_batch_gen_scheduler)."""
    from neural_speed_tpu.runtime.beam import BeamContinuousScheduler

    eng = our_model.engine  # max_batch=8 -> k=2 serves 4 requests at once
    prompts = [[1, 17, 9, 33], [2, 5, 8, 13, 21, 34], [7, 7, 7],
               [11, 3], [4, 9, 16, 25, 36], [8, 1, 8, 1, 8]]
    bc = BeamConfig(num_beams=2, max_new_tokens=6)
    isolated = [beam_search(eng, [p], bc)[0] for p in prompts]

    sched = BeamContinuousScheduler(eng, bc)
    rids = [sched.add_request(p) for p in prompts]
    done = {r.rid: r for r in sched.run_to_completion()}
    got = [done[rid].result.tokens for rid in rids]
    assert got == isolated


def test_beam_continuous_staggered_admission(our_model):
    """Requests added while others are mid-decode join seamlessly and
    don't perturb running requests."""
    from neural_speed_tpu.runtime.beam import BeamContinuousScheduler

    eng = our_model.engine
    bc = BeamConfig(num_beams=2, max_new_tokens=6)
    a, b, c = [1, 17, 9, 33], [2, 5, 8, 13, 21, 34], [7, 7, 7]
    isolated = [beam_search(eng, [p], bc)[0] for p in (a, b, c)]

    sched = BeamContinuousScheduler(eng, bc)
    r0 = sched.add_request(a)
    sched.step()  # prefill a
    sched.step()  # decode a
    r1 = sched.add_request(b)
    sched.step()  # prefill b (a is a spectator)
    sched.step()  # joint decode
    r2 = sched.add_request(c)
    done = {r.rid: r for r in sched.run_to_completion()}
    got = [done[r].result.tokens for r in (r0, r1, r2)]
    assert got == isolated


def test_beam_continuous_mixed_widths(our_model):
    """Per-request BeamConfig: different num_beams coexist in one pool."""
    from neural_speed_tpu.runtime.beam import BeamContinuousScheduler

    eng = our_model.engine
    a, b = [1, 17, 9, 33], [7, 7, 7]
    bc2 = BeamConfig(num_beams=2, max_new_tokens=5)
    bc4 = BeamConfig(num_beams=4, max_new_tokens=5)
    iso = [beam_search(eng, [a], bc2)[0], beam_search(eng, [b], bc4)[0]]

    sched = BeamContinuousScheduler(eng)
    r0 = sched.add_request(a, bc2)
    r1 = sched.add_request(b, bc4)
    done = {r.rid: r for r in sched.run_to_completion()}
    assert [done[r0].result.tokens, done[r1].result.tokens] == iso


def test_model_server_beam(our_model):
    """Beam requests through ModelServer (parity: the reference server e2e
    runs 12 prompts through greedy AND beam, tests/test_model_server.py)."""
    bc_ref = BeamConfig(num_beams=2, max_new_tokens=5)
    ref = [beam_search(our_model.engine, [p], bc_ref)[0] for p in PROMPTS]
    results = {}
    lock = threading.Lock()

    def cb(rid, toks):
        with lock:
            results[rid] = toks

    with ModelServer(our_model, cb, num_beams=2, max_new_tokens=5) as srv:
        for p in PROMPTS:
            srv.issue_query(p)
        srv.join()
    assert [results[i] for i in sorted(results)] == ref


def test_model_server_beam_config_length_respected(our_model):
    """A user beam_config's max_new_tokens must not be clobbered by the
    server default when issue_query has no per-query override."""
    bc = BeamConfig(num_beams=2, max_new_tokens=3)
    ref = beam_search(our_model.engine, [PROMPTS[0]], bc)[0]
    results = {}

    def cb(rid, toks):
        results[rid] = toks

    with ModelServer(our_model, cb, beam_config=bc) as srv:
        srv.issue_query(PROMPTS[0])
        srv.join()
    assert results[0] == ref and len(results[0]) <= 3


def test_scheduler_fuzz_mixed_and_spec_equal_plain(our_model):
    """Randomized admission fuzz: arbitrary prompts, budgets, and
    admission times must yield BIT-IDENTICAL greedy streams across the
    plain, speculative, mixed, and mixed+speculative schedulers (each
    request's output is a pure function of the model + its prompt; no
    scheduling decision may leak into results)."""
    import numpy as np

    rng = np.random.default_rng(42)
    sp = SamplingParams(do_sample=False, repetition_penalty=1.1)

    def make_workload():
        reqs = []
        for r in range(7):
            n = int(rng.integers(2, 40))
            # mix repetitive (draft-friendly) and random prompts
            if r % 2 == 0:
                unit = rng.integers(1, 250, size=rng.integers(2, 5)).tolist()
                prompt = (unit * 20)[:n]
            else:
                prompt = rng.integers(1, 250, size=n).tolist()
            reqs.append((prompt, int(rng.integers(3, 15)),
                         int(rng.integers(0, 6))))  # (prompt, budget, delay)
        return reqs

    def run(reqs, **kw):
        sched = ContinuousBatchingScheduler(our_model.engine, sp,
                                            chunk_size=3, **kw)
        pending = list(reqs)
        rids, out = [], {}
        step = 0
        while pending or sched.has_work:
            admitted = [r for r in pending if r[2] <= step]
            for prompt, budget, _ in admitted:
                rids.append(sched.add_request(list(prompt), budget))
            pending = [r for r in pending if r[2] > step]
            if sched.has_work:
                sched.step()
            for s in sched.pop_finished():
                out[s.request_id] = s.generated
            step += 1
        return [out[r] for r in rids]

    reqs = make_workload()
    ref = run(reqs)
    assert run(reqs, speculative=True, spec_k=5) == ref
    assert run(reqs, mixed_prefill=True, mixed_chunk=8) == ref
    assert run(reqs, mixed_prefill=True, mixed_chunk=8,
               speculative=True, spec_k=5) == ref

    # the same workload over a paged engine, all modes
    from neural_speed_tpu.runtime.engine import PagedEngine

    def run_paged(reqs, **kw):
        eng = PagedEngine(our_model.engine.params, our_model.cfg,
                          max_batch=8, max_len=128, page_size=16,
                          fuse=False)
        sched = ContinuousBatchingScheduler(eng, sp, chunk_size=3, **kw)
        pending = list(reqs)
        rids, out = [], {}
        step = 0
        while pending or sched.has_work:
            for prompt, budget, _ in [r for r in pending if r[2] <= step]:
                rids.append(sched.add_request(list(prompt), budget))
            pending = [r for r in pending if r[2] > step]
            if sched.has_work:
                sched.step()
            for q in sched.pop_finished():
                out[q.request_id] = q.generated
            step += 1
        return [out[r] for r in rids]

    assert run_paged(reqs) == ref
    assert run_paged(reqs, speculative=True, spec_k=5) == ref
    assert run_paged(reqs, mixed_prefill=True, mixed_chunk=8,
                     speculative=True, spec_k=5) == ref

    # decode-window variants (round 3): explicit window sizes and the
    # chunk-ladder path must all match under randomized admission
    assert run(reqs, window=16) == ref
    assert run(reqs, window=1) == ref          # chunk ladder
    assert run(reqs, pipeline_decode=False) == ref

    # prefix cache: the same workload twice through ONE paged engine —
    # the second pass is largely prefix-hits; both must equal ref
    from neural_speed_tpu.runtime.engine import PagedEngine as _PE

    eng = _PE(our_model.engine.params, our_model.cfg, max_batch=8,
              max_len=128, page_size=16, fuse=False, prefix_cache=True)

    def run_on(eng, reqs):
        sched = ContinuousBatchingScheduler(eng, sp, chunk_size=3)
        pending = list(reqs)
        rids, out = [], {}
        step = 0
        while pending or sched.has_work:
            for prompt, budget, _ in [r for r in pending if r[2] <= step]:
                rids.append(sched.add_request(list(prompt), budget))
            pending = [r for r in pending if r[2] > step]
            if sched.has_work:
                sched.step()
            for q in sched.pop_finished():
                out[q.request_id] = q.generated
            step += 1
        return [out[r] for r in rids]

    assert run_on(eng, reqs) == ref
    assert run_on(eng, reqs) == ref
    assert eng.prefix.hits >= 1  # second pass aliased cached pages


# ---------------------------------------------------------------------------
# review-fix regressions
# ---------------------------------------------------------------------------


def test_first_token_finish_status_and_paged_release(our_model):
    """Requests finishing on their very first sampled token must come back
    FINISHED (the prefill loop used to flip them back to 'decoding') and,
    on the paged engine, release their pages (the finish path used to skip
    release_slot, leaking the pool)."""
    from neural_speed_tpu.runtime.scheduler import SeqStatus

    sched = ContinuousBatchingScheduler(
        our_model.engine, SamplingParams(do_sample=False))
    sched.add_request([1, 17, 9], max_new_tokens=1)
    done = sched.run_to_completion()
    assert done[0].status == SeqStatus.FINISHED
    assert len(done[0].generated) == 1

    # paged pool: sustained 1-token requests must not exhaust pages
    from neural_speed_tpu.runtime.engine import PagedEngine

    eng = PagedEngine(our_model.engine.params, our_model.cfg, max_batch=2,
                      max_len=64, page_size=16, n_pages=8)
    sched = ContinuousBatchingScheduler(eng, SamplingParams(do_sample=False))
    for _ in range(12):  # far more than the pool could leak
        sched.add_request([1, 17, 9, 4, 8], max_new_tokens=1)
    done = sched.run_to_completion()
    assert len(done) == 12
    assert all(len(s.generated) == 1 for s in done)


def test_sampled_spec_temperature_zero_is_greedy(our_model):
    """do_sample=True + temperature<=0 is GREEDY on the device sampler;
    the host replica must match (it used to substitute temperature=1)."""
    prompts = [[1, 17, 9, 33] * 3, [2, 5, 8, 13, 21, 34]]
    ref = our_model.generate(prompts, max_new_tokens=10, ignore_prompt=True,
                             repetition_penalty=1.1)  # penalized greedy
    got = our_model.generate(prompts, max_new_tokens=10, ignore_prompt=True,
                             do_sample=True, temperature=0.0, top_k=0,
                             top_p=1.0, repetition_penalty=1.1,
                             speculative=True)
    # strip prompts (speculative path honors ignore_prompt)
    got = [g[len(p):] if g[: len(p)] == p else g
           for g, p in zip(got, prompts)]
    assert got == ref


def test_mixed_prefill_rejects_chatglm1():
    from neural_speed_tpu.models.arch import ArchConfig
    from neural_speed_tpu.ops.qtypes import named_qspec
    from neural_speed_tpu.utils.synthetic import synth_params

    cfg = ArchConfig(name="chatglm", vocab_size=64, hidden_size=64,
                     n_layers=1, n_heads=4, n_kv_heads=4,
                     intermediate_size=64, max_position_embeddings=64,
                     norm="ln", rope_style="chatglm", act="gelu",
                     gated_ffn=False, deepnorm_alpha=1.0)
    eng = Engine(synth_params(cfg, named_qspec("int4", group_size=32)),
                 cfg, max_batch=1, max_len=64)
    with pytest.raises(NotImplementedError):
        ContinuousBatchingScheduler(eng, SamplingParams(do_sample=False),
                                    mixed_prefill=True)


def test_server_beam_rejects_mixed_prefill(our_model):
    with pytest.raises(ValueError):
        ModelServer(our_model, lambda r, t: None, num_beams=2,
                    mixed_prefill=True)


@pytest.mark.parametrize("mode", ["greedy", "spec", "mixed", "sampled",
                                  "paged_spec"])
def test_scheduler_checkpoint_resume(our_model, tmp_path, mode):
    """Serving checkpoint/resume (parity+extension of the reference's
    rng/logits/KV state blob, model_utils.cpp:1529-1773): save mid-run,
    rebuild on a FRESH engine, and the resumed run must emit exactly what
    the uninterrupted run emits — across greedy/penalized, speculative,
    mixed-prefill, sampled (device+host RNG state), and paged engines
    (page tables + allocator reconstruction)."""
    from neural_speed_tpu.runtime.engine import PagedEngine

    params = our_model.engine.params
    cfg = our_model.cfg

    def fresh_engine():
        if mode == "paged_spec":
            return PagedEngine(params, cfg, max_batch=4, max_len=128,
                               page_size=16, fuse=False)
        return Engine(params, cfg, max_batch=4, max_len=128, fuse=False)

    kw = dict(chunk_size=3)
    sp = SamplingParams(do_sample=False, repetition_penalty=1.1)
    if mode in ("spec", "paged_spec"):
        kw.update(speculative=True, spec_k=4)
    elif mode == "mixed":
        kw.update(mixed_prefill=True, mixed_chunk=8)
    elif mode == "sampled":
        sp = SamplingParams(do_sample=True, temperature=0.9, top_k=8,
                            top_p=0.9, repetition_penalty=1.1)
        kw.update(speculative=True, spec_k=4)

    prompts = [[1, 17, 9, 33] * 4, [2, 5, 8, 13, 21, 34],
               list(range(40, 70)), [7, 7, 7] * 4, [9, 4]]

    def seed_requests(s):
        return [s.add_request(list(p), 14) for p in prompts]

    # uninterrupted reference
    s_ref = ContinuousBatchingScheduler(fresh_engine(), sp, seed=5, **kw)
    rids = seed_requests(s_ref)
    ref = {q.request_id: q.generated for q in s_ref.run_to_completion()}

    # interrupted at several points: save -> fresh engine -> resume
    for cut in (1, 3, 6):
        s1 = ContinuousBatchingScheduler(fresh_engine(), sp, seed=5, **kw)
        seed_requests(s1)
        done = {}
        for _ in range(cut):
            if not s1.has_work:
                break
            s1.step()
            for q in s1.pop_finished():
                done[q.request_id] = q.generated
        path = str(tmp_path / f"{mode}_{cut}.npz")
        s1.save_state(path)

        s2 = ContinuousBatchingScheduler.load_state(fresh_engine(), path)
        while s2.has_work:
            s2.step()
            for q in s2.pop_finished():
                done[q.request_id] = q.generated
        assert {r: done[r] for r in rids} == ref, (mode, cut)


def test_model_server_live_checkpoint(our_model, tmp_path):
    """Checkpoint a RUNNING server mid-generation and resume on a fresh
    engine: the union of tokens delivered before the cut and after resume
    must equal the uninterrupted run's outputs."""
    from neural_speed_tpu.runtime.server import ModelServer as _MS

    params = our_model.engine.params
    cfg = our_model.cfg
    sp = SamplingParams(do_sample=False, repetition_penalty=1.1)

    def fresh():
        return Engine(params, cfg, max_batch=4, max_len=128, fuse=False)

    prompts = [[1, 17, 9, 33] * 3, [2, 5, 8, 13, 21], [7, 7, 7] * 3,
               list(range(40, 60)), [9, 4, 2]]

    ref = {}
    with _MS(fresh(), lambda r, t: ref.__setitem__(r, t), sampling=sp,
             max_new_tokens=12) as srv:
        for p in prompts:
            srv.issue_query(p)
        srv.join()

    got = {}
    path = str(tmp_path / "live.npz")
    with _MS(fresh(), lambda r, t: got.__setitem__(r, t), sampling=sp,
             max_new_tokens=12) as srv:
        for p in prompts:
            srv.issue_query(p)
        import time as _t

        _t.sleep(0.4)            # some progress, some work outstanding
        srv.save_state(path)
        srv.shutdown()           # simulated crash after the checkpoint

    from neural_speed_tpu.runtime.scheduler import ContinuousBatchingScheduler

    sched = ContinuousBatchingScheduler.load_state(fresh(), path)
    while sched.has_work:
        sched.step()
        for q in sched.pop_finished():
            got[q.request_id] = q.generated
    assert got == ref


def test_adaptive_pipeline_identical_deliveries():
    """Neither the adaptive chunk ladder nor one-chunk decode pipelining
    (nor their combination) may change ANY delivered token — greedy w/
    penalties and sampled, staggered admission, early EOS — vs the plain
    fixed-chunk sequential schedule."""
    from neural_speed_tpu.models.arch import ArchConfig
    from neural_speed_tpu.ops.qtypes import QSpec, QType
    from neural_speed_tpu.utils.synthetic import synth_params

    cfg = ArchConfig(name="llama", vocab_size=128, hidden_size=64,
                     n_layers=2, n_heads=4, n_kv_heads=4,
                     intermediate_size=128, max_position_embeddings=128)
    params = synth_params(cfg, QSpec(QType.INT, 4, 32, True))
    for sp in (SamplingParams(do_sample=False, repetition_penalty=1.1),
               SamplingParams(do_sample=True, temperature=0.8,
                              top_k=20)):
        # sampled streams share one device PRNG whose order depends on
        # global call count, so admission TIMING shifts them (true of the
        # baseline too); stagger only the deterministic greedy case
        stagger = not sp.do_sample
        outs = []
        for adaptive, pipeline in ((False, False), (True, False),
                                   (False, True), (True, True)):
            eng = Engine(params, cfg, max_batch=2, max_len=128)
            sched = ContinuousBatchingScheduler(
                eng, sp, chunk_size=4, adaptive_chunk=adaptive,
                pipeline_decode=pipeline, eos_id=3)
            rids = [sched.add_request([1, 17, 9, 33], 40),
                    sched.add_request([2, 5, 8], 25)]
            rid3 = None if stagger else sched.add_request([7, 7, 9, 2], 30)
            done = {}
            steps = 0
            while sched.has_work:
                sched.step()
                steps += 1
                if stagger and steps == 3 and rid3 is None:
                    # mid-decode admission (forces a pending flush)
                    rid3 = sched.add_request([7, 7, 9, 2], 30)
                for s in sched.pop_finished():
                    done[s.request_id] = s.generated
            outs.append([done[r] for r in rids + [rid3]])
        assert outs[0] == outs[1] == outs[2] == outs[3]


def test_model_api_paged(tmp_path, our_model, hf_model):
    """`Model.init(..., paged=True)` serves through PagedEngine with
    identical greedy output (and beam via num_beams) to the default
    contiguous engine."""
    sd = dict(hf_model.state_dict())
    cfg = CFG
    ref = our_model.generate([PROMPTS[0]], max_new_tokens=8,
                             do_sample=False, repetition_penalty=1.0,
                             ignore_prompt=True)[0]

    paged = Model()
    paged.cfg = arch_from_hf_config(cfg.to_dict())
    params = params_from_state_dict(sd, paged.cfg, None)
    paged._make_engine(params, max_batch=2, ctx_size=128,
                       kv_quantized=False, paged=True, page_size=128)
    assert hasattr(paged.engine, "page_size")
    got = paged.generate([PROMPTS[0]], max_new_tokens=8, do_sample=False,
                         repetition_penalty=1.0, ignore_prompt=True)[0]
    assert got == ref

    beam_ref = our_model.generate([PROMPTS[0]], max_new_tokens=6,
                                  num_beams=2, ignore_prompt=True)[0]
    beam_got = paged.generate([PROMPTS[0]], max_new_tokens=6, num_beams=2,
                              ignore_prompt=True)[0]
    assert beam_got == beam_ref


def test_warmup_leaves_deliveries_identical(our_model):
    """scheduler.warmup() precompiles the chunk-ladder variants via a
    throwaway request and must reset ALL scheduler state: greedy AND
    sampled runs after a warmup deliver exactly what a cold scheduler
    delivers (the on-chip serving leg showed a 7B chunk=64 compile
    landing inside the first request's latency without it —
    BENCH_NOTES 2026-08-19)."""
    eng = our_model.engine
    for sp in (SamplingParams(do_sample=False, repetition_penalty=1.1),
               SamplingParams(do_sample=True, temperature=0.9, top_k=20)):
        outs = []
        for warm in (False, True):
            sched = ContinuousBatchingScheduler(eng, sp, seed=3)
            if warm:
                sched.warmup()
            rids = [sched.add_request(p, 7) for p in PROMPTS]
            got = {}
            while sched.has_work:
                sched.step()
                for s in sched.pop_finished():
                    got[s.request_id] = s.generated
            outs.append([got[r] for r in rids])
        assert outs[0] == outs[1], f"warmup changed deliveries for {sp}"


def test_warmup_speculative_and_mixed(our_model):
    """warmup() must also cover the speculative / mixed-prefill joint-step
    variants and leave those schedulers' deliveries unchanged."""
    eng = our_model.engine
    for kw in ({"speculative": True, "spec_k": 3},
               {"mixed_prefill": True, "mixed_chunk": 4}):
        outs = []
        for warm in (False, True):
            sched = ContinuousBatchingScheduler(
                eng, SamplingParams(do_sample=False), seed=5, **kw)
            if warm:
                sched.warmup()
            rids = [sched.add_request(p, 7) for p in PROMPTS]
            got = {}
            while sched.has_work:
                sched.step()
                for s in sched.pop_finished():
                    got[s.request_id] = s.generated
            outs.append([got[r] for r in rids])
        assert outs[0] == outs[1], f"warmup changed deliveries for {kw}"
