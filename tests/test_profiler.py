"""Timings report + per-op profile (parity: model_print_timings +
ne_graph_profiling, SURVEY.md §5)."""

import io

from neural_speed_tpu.utils.profiler import Timings, verbose_level


def test_timings_report(monkeypatch):
    t = Timings()
    with t.timer("load"):
        pass
    with t.timer("prefill", 10):
        pass
    for _ in range(3):
        with t.timer("decode", 1):
            pass
        with t.timer("sample", 1):
            pass
    buf = io.StringIO()
    t.print_timings(file=buf)
    rep = buf.getvalue()
    assert "prefill time" in rep and "/ 10 tokens" in rep
    assert "decode time" in rep and "/ 3 tokens" in rep
    assert len(t.eval_times) == 8

    monkeypatch.setenv("NEURAL_SPEED_VERBOSE", "2")
    assert verbose_level() == 2
    monkeypatch.delenv("NEURAL_SPEED_VERBOSE")
    assert verbose_level() == -1


def test_scheduler_records_timings():
    import jax.numpy as jnp
    from neural_speed_tpu.models.arch import ArchConfig
    from neural_speed_tpu.ops.qtypes import named_qspec
    from neural_speed_tpu.ops.sampling import SamplingParams
    from neural_speed_tpu.runtime.engine import Engine
    from neural_speed_tpu.runtime.scheduler import ContinuousBatchingScheduler
    from neural_speed_tpu.utils.synthetic import synth_params

    cfg = ArchConfig(name="llama", vocab_size=64, hidden_size=64,
                     n_layers=1, n_heads=2, n_kv_heads=2,
                     intermediate_size=128, max_position_embeddings=64)
    eng = Engine(synth_params(cfg, named_qspec("int4", group_size=32)),
                 cfg, max_batch=1, max_len=64)
    sched = ContinuousBatchingScheduler(eng, SamplingParams(do_sample=False))
    sched.add_request([1, 2, 3], 4)
    sched.run_to_completion()
    assert sched.timings.prefill_tokens == 3
    # device-side decode counts whole chunks (incl. overshoot past EOS)
    assert sched.timings.decode_tokens >= 3
    assert sched.timings.decode_s > 0
