"""StreamingLLM infinite inference through the scheduler (parity:
docs/infinite_inference.md — discard-and-re-eval and shift-RoPE ring)."""

import numpy as np
import jax.numpy as jnp
import pytest

from neural_speed_tpu.models.arch import ArchConfig
from neural_speed_tpu.ops.qtypes import named_qspec
from neural_speed_tpu.runtime.engine import Engine
from neural_speed_tpu.ops.sampling import SamplingParams
from neural_speed_tpu.runtime.scheduler import ContinuousBatchingScheduler
from neural_speed_tpu.utils.synthetic import synth_params

CTX = 64


def _engine(shift: bool) -> Engine:
    cfg = ArchConfig(name="llama", vocab_size=128, hidden_size=128,
                     n_layers=2, n_heads=2, n_kv_heads=2,
                     intermediate_size=256, max_position_embeddings=CTX)
    params = synth_params(cfg, named_qspec("int4", group_size=32))
    eng = Engine(params, cfg, max_batch=2, max_len=CTX)
    eng.shift_roped_k = shift
    eng.n_keep = 4
    eng.n_discard = 16
    return eng


def _generate_past_ctx(eng: Engine, n_new: int):
    sched = ContinuousBatchingScheduler(eng, SamplingParams(do_sample=False))
    rid = sched.add_request(list(range(1, 40)), n_new)
    done = sched.run_to_completion()
    assert len(done) == 1 and done[0].request_id == rid
    assert len(done[0].generated) == n_new
    # cache never overflows
    assert int(np.asarray(eng.cache.lengths).max()) < CTX
    return done[0].generated


def test_reeval_eviction_generates_past_ctx():
    gen = _generate_past_ctx(_engine(shift=False), n_new=CTX)
    assert all(0 <= t < 128 for t in gen)


def test_shift_rope_eviction_generates_past_ctx():
    gen = _generate_past_ctx(_engine(shift=True), n_new=CTX)
    assert all(0 <= t < 128 for t in gen)


def test_shift_rope_requires_rotary():
    eng = _engine(shift=True)
    import dataclasses

    eng.cfg = dataclasses.replace(eng.cfg, rope_style="none")
    sched = ContinuousBatchingScheduler(eng, SamplingParams(do_sample=False))
    sched.add_request(list(range(1, 40)), CTX)
    import pytest

    with pytest.raises(ValueError):
        sched.run_to_completion()

def _paged_engine(n_keep: int = 4, prefix_cache: bool = False):
    from neural_speed_tpu.runtime.engine import PagedEngine

    cfg = ArchConfig(name="llama", vocab_size=128, hidden_size=128,
                     n_layers=2, n_heads=2, n_kv_heads=2,
                     intermediate_size=256, max_position_embeddings=CTX)
    params = synth_params(cfg, named_qspec("int4", group_size=32))
    eng = PagedEngine(params, cfg, max_batch=2, max_len=CTX, page_size=16,
                      n_pages=12, prefix_cache=prefix_cache)
    eng.n_keep = n_keep
    eng.n_discard = 16
    return eng


def test_paged_reeval_eviction_generates_past_ctx():
    """Discard-and-re-eval on the PAGED cache: pages past the sink are
    released and the suffix re-prefills into fresh pages (parity:
    main_pybind.cpp:573-587 on the page pool)."""
    eng = _paged_engine()
    gen = _generate_past_ctx(eng, n_new=CTX)
    assert all(0 <= t < 128 for t in gen)
    # no page leaked: the one running slot was released at completion
    assert not eng._alloc.refs, eng._alloc.refs


def test_paged_eviction_matches_contiguous():
    """Eviction semantics are cache-layout independent: the paged
    discard-and-re-eval must emit EXACTLY the contiguous path's greedy
    tokens (same model, same n_keep/n_discard, same eviction points)."""
    cont = _generate_past_ctx(_engine(shift=False), n_new=CTX)
    paged = _generate_past_ctx(_paged_engine(), n_new=CTX)
    assert cont == paged


def test_paged_eviction_partial_sink_page_cow():
    """n_keep not a page multiple + the sink page aliased by the prefix
    cache: eviction must copy the partial sink page out before the
    re-prefill writes into it, and the cached prefix must stay intact."""
    eng = _paged_engine(n_keep=4, prefix_cache=True)
    prompt = list(range(1, 40))
    sched = ContinuousBatchingScheduler(eng, SamplingParams(do_sample=False))
    sched.add_request(list(prompt), CTX)
    done = sched.run_to_completion()
    assert len(done[0].generated) == CTX
    # the prefix cache still owns its indexed pages (refcount >= 1)
    pages = list(eng.prefix.index.values())
    assert pages and all(eng._alloc.refs.get(p, 0) >= 1 for p in pages)
    # a repeated prompt still hits the intact cached prefix
    n_cached, hit_pages = eng.prefix_lookup(prompt)
    assert n_cached == (len(prompt) // eng.page_size) * eng.page_size


@pytest.mark.parametrize("mode", ["speculative", "mixed"])
def test_paged_eviction_other_sched_modes(mode):
    """_maybe_evict's other call sites (speculative verify reservation,
    mixed prefill+decode) must also handle the paged pool, releasing
    every page at completion."""
    kw = (dict(speculative=True) if mode == "speculative"
          else dict(mixed_prefill=True, mixed_chunk=16))
    eng = _paged_engine()
    sched = ContinuousBatchingScheduler(
        eng, SamplingParams(do_sample=False), **kw)
    sched.add_request(list(range(1, 40)), CTX)
    done = sched.run_to_completion()
    assert len(done[0].generated) == CTX
    assert not eng._alloc.refs, eng._alloc.refs


def test_paged_shift_rope_raises():
    eng = _paged_engine()
    eng.shift_roped_k = True
    sched = ContinuousBatchingScheduler(eng, SamplingParams(do_sample=False))
    sched.add_request(list(range(1, 40)), CTX)
    import pytest

    with pytest.raises(NotImplementedError):
        sched.run_to_completion()


def test_scheduler_stress_mixed_requests():
    """Many queued requests through few slots with chunked decode and
    evictions: every request must complete with exactly its budget."""
    import jax
    from neural_speed_tpu.runtime.scheduler import ContinuousBatchingScheduler

    cfg = ArchConfig(name="llama", vocab_size=96, hidden_size=64,
                     n_layers=1, n_heads=2, n_kv_heads=2,
                     intermediate_size=128, max_position_embeddings=CTX)
    eng = Engine(synth_params(cfg, named_qspec("int4", group_size=32)),
                 cfg, max_batch=3, max_len=CTX)
    eng.n_keep = 2
    eng.n_discard = 24
    sched = ContinuousBatchingScheduler(
        eng, SamplingParams(do_sample=True, temperature=1.0, top_k=8),
        chunk_size=8,
    )
    rng = np.random.default_rng(0)
    want = {}
    for i in range(9):
        plen = int(rng.integers(3, 40))
        n_new = int(rng.integers(5, CTX + 20))  # some exceed ctx -> evict
        rid = sched.add_request(list(rng.integers(1, 96, plen)), n_new)
        want[rid] = n_new
    done = sched.run_to_completion()
    assert sorted(s.request_id for s in done) == sorted(want)
    for s in done:
        assert len(s.generated) == want[s.request_id]
        assert all(0 <= t < 96 for t in s.generated)
