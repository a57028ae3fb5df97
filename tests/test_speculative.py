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
