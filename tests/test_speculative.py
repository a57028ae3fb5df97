"""Prompt-lookup speculative decoding: the output must EXACTLY equal plain
greedy decoding (the spec-decoding correctness guarantee), across repetitive
and non-repetitive prompts, eos stopping, and budget truncation."""

import jax.numpy as jnp
import pytest

from neural_speed_tpu.models.arch import ArchConfig
from neural_speed_tpu.ops.qtypes import named_qspec
from neural_speed_tpu.runtime.engine import Engine, PagedEngine
from neural_speed_tpu.runtime.speculative import (
    generate_greedy_speculative, propose_ngram)
from neural_speed_tpu.utils.synthetic import synth_params


def _cfg():
    return ArchConfig(name="llama", vocab_size=128, hidden_size=128,
                      n_layers=2, n_heads=2, n_kv_heads=2,
                      intermediate_size=256, max_position_embeddings=256)


def _engine(cfg, **kw):
    params = synth_params(cfg, named_qspec("int4", group_size=32))
    return Engine(params, cfg, max_batch=2, max_len=256, **kw)


def test_propose_ngram():
    # longest-suffix match wins; continuation after the match is returned
    ctx = [5, 6, 7, 8, 5, 6, 7]
    assert propose_ngram(ctx, 3) == [8, 5, 6]
    # no match -> None
    assert propose_ngram([1, 2, 3, 4], 3) is None
    # 1-gram fallback
    assert propose_ngram([1, 9, 2, 9], 2, max_ngram=3) == [2, 9]
    assert propose_ngram([1], 2) is None


@pytest.mark.parametrize("prompt", [
    list(range(1, 9)) * 4,              # highly repetitive: drafts accepted
    [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5],  # some 1-gram matches
    [17, 23, 42],                       # short, few matches
])
def test_exact_greedy_equivalence(prompt):
    cfg = _cfg()
    eng = _engine(cfg)
    ref = eng.generate_greedy(prompt, 40)
    eng2 = _engine(cfg)  # synth_params is seed-deterministic -> same model
    spec = generate_greedy_speculative(eng2, prompt, 40, k=5)
    assert spec == ref


def test_eos_and_budget():
    cfg = _cfg()
    eng = _engine(cfg)
    ref = eng.generate_greedy(list(range(1, 17)) * 2, 12)
    # eos at some token of the greedy output: both must stop there
    eos = ref[6]
    eng_a = _engine(cfg)
    ref_eos = eng_a.generate_greedy(list(range(1, 17)) * 2, 12, eos_id=eos)
    eng_b = _engine(cfg)
    spec_eos = generate_greedy_speculative(
        eng_b, list(range(1, 17)) * 2, 12, eos_id=eos, k=5)
    assert spec_eos == ref_eos
    assert spec_eos[-1] == eos
    # budget: exactly max_new_tokens, never more
    eng_c = _engine(cfg)
    spec3 = generate_greedy_speculative(eng_c, list(range(1, 17)) * 2, 7, k=5)
    assert spec3 == ref[:7]


def test_quantized_kv_equivalence():
    cfg = _cfg()
    params = synth_params(cfg, named_qspec("int4", group_size=32))
    eng = Engine(params, cfg, max_batch=2, max_len=256, kv_quantized=True)
    prompt = list(range(1, 9)) * 4
    ref = eng.generate_greedy(prompt, 24)
    eng2 = Engine(params, cfg, max_batch=2, max_len=256, kv_quantized=True)
    spec = generate_greedy_speculative(eng2, prompt, 24, k=5)
    assert spec == ref


def test_penalized_greedy_matches_scheduler():
    """The API surface runs greedy WITH repetition penalty through the
    scheduler; speculative + SamplingParams must reproduce it exactly."""
    from neural_speed_tpu.ops.sampling import SamplingParams
    from neural_speed_tpu.runtime.scheduler import (
        ContinuousBatchingScheduler)

    cfg = _cfg()
    prompt = list(range(1, 9)) * 4
    sp = SamplingParams(do_sample=False, repetition_penalty=1.1)

    eng = _engine(cfg)
    sched = ContinuousBatchingScheduler(eng, sp, chunk_size=8)
    sched.add_request(prompt, 32)
    ref = sched.run_to_completion()[0].generated

    eng2 = _engine(cfg)
    spec = generate_greedy_speculative(eng2, prompt, 32, k=5, sp=sp)
    assert spec == ref


def test_paged_engine_rejected():
    cfg = _cfg()
    params = synth_params(cfg, named_qspec("int4", group_size=32))
    eng = PagedEngine(params, cfg, max_batch=1, max_len=256, page_size=64)
    with pytest.raises(NotImplementedError):
        generate_greedy_speculative(eng, [1, 2, 3], 4)


def test_propose_ngram_np_matches_list():
    """The vectorized long-context proposer must return exactly what the
    reference list scan returns (most-recent longest-suffix match)."""
    import numpy as np

    from neural_speed_tpu.runtime.speculative import (_propose_ngram_list,
                                                      _propose_ngram_np)

    rng = np.random.default_rng(0)
    for _ in range(60):
        n = int(rng.integers(2, 220))
        vocab = int(rng.integers(2, 7))  # tiny vocab -> frequent matches
        ctx = rng.integers(0, vocab, size=n).tolist()
        for k in (1, 3, 6):
            a = _propose_ngram_list(ctx, k, 3, 1)
            b = _propose_ngram_np(np.asarray(ctx, np.int32), k, 3, 1)
            assert a == b, (ctx, k, a, b)


def _run_sched(engine, prompts, sp, mx=32, **kw):
    from neural_speed_tpu.runtime.scheduler import (
        ContinuousBatchingScheduler)

    sched = ContinuousBatchingScheduler(engine, sp, **kw)
    rids = [sched.add_request(p, max_new_tokens=mx) for p in prompts]
    done = {s.request_id: s.generated for s in sched.run_to_completion()}
    return [done[r] for r in rids], sched


def test_scheduler_speculative_exact():
    """Batched spec scheduling == plain scheduling, token for token, across
    repetitive/random prompts, queueing (more requests than slots), and
    slot reuse."""
    from neural_speed_tpu.ops.sampling import SamplingParams

    cfg = _cfg()
    prompts = [
        list(range(1, 9)) * 4,               # repetitive: drafts accepted
        [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5],   # sparse matches
        [17, 23, 42],                        # short
        list(range(40, 48)) * 3,             # repetitive again (slot reuse)
    ]
    sp = SamplingParams(do_sample=False)
    ref, _ = _run_sched(_engine(cfg), prompts, sp)
    out, sched = _run_sched(_engine(cfg), prompts, sp, speculative=True,
                            spec_k=5)
    assert out == ref
    assert not sched._dev_lens_dirty or not sched.running


def test_scheduler_speculative_penalized():
    from neural_speed_tpu.ops.sampling import SamplingParams

    cfg = _cfg()
    prompts = [list(range(1, 9)) * 4, [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]]
    sp = SamplingParams(do_sample=False, repetition_penalty=1.1,
                        frequency_penalty=0.05, presence_penalty=0.02)
    ref, _ = _run_sched(_engine(cfg), prompts, sp)
    out, _ = _run_sched(_engine(cfg), prompts, sp, speculative=True,
                        spec_k=5)
    assert out == ref


def test_scheduler_speculative_backoff_and_eos():
    """Acceptance collapse must trigger chunked-decode backoff (and the
    sampler resync for the penalized path), and eos must stop slots exactly
    where the plain scheduler stops them."""
    from neural_speed_tpu.ops.sampling import SamplingParams

    cfg = _cfg()
    sp = SamplingParams(do_sample=False, repetition_penalty=1.05)
    prompts = [[17, 23, 42, 7], [91, 13, 5]]   # non-repetitive: low gain
    ref, _ = _run_sched(_engine(cfg), prompts, sp, mx=48)
    eng = _engine(cfg)
    from neural_speed_tpu.runtime.scheduler import (
        ContinuousBatchingScheduler)

    sched = ContinuousBatchingScheduler(eng, sp, speculative=True, spec_k=5,
                                        chunk_size=4)
    saw_backoff = False
    rids = [sched.add_request(p, max_new_tokens=48) for p in prompts]
    while sched.has_work:
        sched.step()
        saw_backoff = saw_backoff or sched._spec_backoff > 0
    done = {s.request_id: s.generated for s in sched.pop_finished()}
    assert [done[r] for r in rids] == ref
    assert saw_backoff  # random text must push the gain EMA under 0.35

    # eos stopping: pick an eos from the reference stream of prompt 0
    eos = ref[0][10]
    ref_eos, _ = _run_sched(_engine(cfg), prompts, sp, mx=48, eos_id=eos)
    out_eos, _ = _run_sched(_engine(cfg), prompts, sp, mx=48, eos_id=eos,
                            speculative=True, spec_k=5)
    assert out_eos == ref_eos


def test_scheduler_speculative_rejects_sampling():
    import pytest as _pytest

    from neural_speed_tpu.ops.sampling import SamplingParams
    from neural_speed_tpu.runtime.scheduler import (
        ContinuousBatchingScheduler)

    cfg = _cfg()
    with _pytest.raises(ValueError):
        ContinuousBatchingScheduler(
            _engine(cfg), SamplingParams(do_sample=True, temperature=0.8),
            speculative=True)


def test_scheduler_speculative_quantized_kv():
    from neural_speed_tpu.ops.sampling import SamplingParams

    cfg = _cfg()
    params = synth_params(cfg, named_qspec("int4", group_size=32))

    def eng():
        return Engine(params, cfg, max_batch=2, max_len=256,
                      kv_quantized=True)

    prompts = [list(range(1, 9)) * 4, list(range(40, 48)) * 3]
    sp = SamplingParams(do_sample=False)
    ref, _ = _run_sched(eng(), prompts, sp, mx=24)
    out, _ = _run_sched(eng(), prompts, sp, mx=24, speculative=True,
                        spec_k=5)
    assert out == ref
