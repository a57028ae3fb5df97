"""StreamingLLM infinite inference through the scheduler (parity:
docs/infinite_inference.md — discard-and-re-eval and shift-RoPE ring)."""

import numpy as np
import jax.numpy as jnp

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
