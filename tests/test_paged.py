"""Paged KV cache + paged flash attention (extension beyond the reference):
physical page pool, page-table indirection in the kernel's BlockSpec,
contiguous-run prefill writes, per-token decode scatter, allocator."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_speed_tpu.ops import paged_kv as pkv
from neural_speed_tpu.ops.attention import attention_ref
from neural_speed_tpu.ops import flash

PS = 128


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("NST_FLASH", "interpret")


def _shuffled_setup(b=2, hkv=2, d=128, n_blocks=2, n_pages=8, layers=1,
                    quantized=False, seed=0):
    rng = np.random.default_rng(seed)
    cache = pkv.init_paged_cache(layers, b, n_blocks * PS, hkv, d, n_pages,
                                 PS, dtype=jnp.float32, quantized=quantized)
    # assign each slot a SHUFFLED set of physical pages
    pages = rng.permutation(n_pages)[: b * n_blocks].reshape(b, n_blocks)
    cache = cache.tree_unflatten(None, (
        cache.k_pages, cache.v_pages, cache.k_scale, cache.v_scale,
        jnp.asarray(pages, jnp.int32), cache.lengths,
    ))
    return cache, rng


def test_prefill_decode_roundtrip_and_attention():
    b, hkv, d, n_blocks = 2, 2, 128, 2
    h = 4  # GQA
    cache, rng = _shuffled_setup(b, hkv, d, n_blocks)
    s = n_blocks * PS

    # prefill: contiguous page runs for the prompt chunk
    t0 = 100
    k0 = jnp.asarray(rng.standard_normal((b, t0, hkv, d)), jnp.float32)
    v0 = jnp.asarray(rng.standard_normal((b, t0, hkv, d)), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(t0)[None], (b, t0)).astype(jnp.int32)
    # give each slot a contiguous physical run and matching table
    first = jnp.asarray([0, 2], jnp.int32)
    tables = jnp.asarray([[0, 1], [2, 3]], jnp.int32)
    cache = pkv.PagedKVCache(cache.k_pages, cache.v_pages, None, None,
                             tables, cache.lengths)
    cache = pkv.append_prefill(cache, 0, k0, v0, pos, first)
    lens = jnp.full((b,), t0, jnp.int32)

    # decode appends for a few tokens (through the table)
    steps = 6
    k_extra, v_extra = [], []
    for i in range(steps):
        kn = jnp.asarray(rng.standard_normal((b, 1, hkv, d)), jnp.float32)
        vn = jnp.asarray(rng.standard_normal((b, 1, hkv, d)), jnp.float32)
        cache = pkv.append_decode(cache, 0, kn, vn,
                                  jnp.full((b, 1), t0 + i, jnp.int32))
        k_extra.append(kn)
        v_extra.append(vn)
    lens = lens + steps

    # logical K/V for the reference
    k_log = jnp.concatenate([k0] + k_extra, axis=1)
    v_log = jnp.concatenate([v0] + v_extra, axis=1)
    kg, vg = pkv.gathered_layer(cache, 0, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(kg[:, :, : t0 + steps].transpose(0, 2, 1, 3)),
        np.asarray(k_log), atol=1e-6)  # f32 pool: exact round-trip

    # paged flash attention == reference over the logical sequence
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    qpos = (lens - 1)[:, None]
    out = flash.mha_paged(q, cache, 0, qpos, lens, scale=d ** -0.5)
    ref = attention_ref(q, k_log, v_log, qpos, lens, scale=d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2,
                               rtol=2e-2)


def test_paged_attention_quantized_shuffled_pages():
    b, hkv, h, d, n_blocks = 2, 2, 4, 128, 2
    cache, rng = _shuffled_setup(b, hkv, d, n_blocks, quantized=True, seed=3)
    t0 = 2 * PS  # fill both blocks exactly via prefill
    k0 = jnp.asarray(rng.standard_normal((b, t0, hkv, d)), jnp.float32)
    v0 = jnp.asarray(rng.standard_normal((b, t0, hkv, d)), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(t0)[None], (b, t0)).astype(jnp.int32)
    tables = jnp.asarray([[4, 5], [6, 7]], jnp.int32)
    cache = pkv.PagedKVCache(cache.k_pages, cache.v_pages, cache.k_scale,
                             cache.v_scale, tables, cache.lengths)
    cache = pkv.append_prefill(cache, 0, k0, v0, pos,
                               jnp.asarray([4, 6], jnp.int32))
    lens = jnp.full((b,), t0, jnp.int32)

    kg, vg = pkv.gathered_layer(cache, 0, jnp.float32)
    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32)
    qpos = (lens - 1)[:, None]
    out = flash.mha_paged(q, cache, 0, qpos, lens, scale=d ** -0.5)
    ref = attention_ref(q, kg.transpose(0, 2, 1, 3), vg.transpose(0, 2, 1, 3),
                        qpos, lens, scale=d ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-2,
                               rtol=3e-2)


def test_allocator():
    a = pkv.PageAllocator(10)
    first = a.alloc_run(4)
    assert first == 0 and a.available == 6
    p = a.alloc_page()
    assert p not in range(first, first + 4)
    a.free_pages([0, 1])
    assert a.alloc_run(2) == 0
    assert a.alloc_run(7) is None  # not enough contiguous
    a2 = pkv.PageAllocator(4)
    a2.free = [3, 1, 0]  # fragmented: no run of 3
    assert a2.alloc_run(3) is None
    assert a2.alloc_run(2) == 0


@pytest.mark.parametrize("quantized", [False, True], ids=["bf16", "int8"])
def test_paged_engine_matches_contiguous(quantized, monkeypatch):
    """End-to-end greedy generation: PagedEngine (shared page pool,
    fragmented growth) == contiguous Engine, token for token.  Both on the
    XLA attention path so the comparison is kernel-for-kernel fair (the
    flash-vs-XLA numeric equivalence is covered by the attention tests)."""
    monkeypatch.setenv("NST_FLASH", "off")
    import jax
    jax.clear_caches()
    from neural_speed_tpu.models.arch import ArchConfig
    from neural_speed_tpu.ops.qtypes import named_qspec
    from neural_speed_tpu.runtime.engine import Engine, PagedEngine
    from neural_speed_tpu.utils.synthetic import synth_params

    cfg = ArchConfig(name="llama", vocab_size=128, hidden_size=128,
                     n_layers=2, n_heads=2, n_kv_heads=2,
                     intermediate_size=256, max_position_embeddings=256)
    params = synth_params(cfg, named_qspec("int4", group_size=32))
    prompt = list(range(3, 40))

    eng = Engine(params, cfg, max_batch=1, max_len=256,
                 kv_dtype=jnp.float32, kv_quantized=quantized)
    ref = eng.generate_greedy(prompt, 20)

    peng = PagedEngine(params, cfg, max_batch=1, max_len=256,
                       kv_dtype=jnp.float32, kv_quantized=quantized,
                       page_size=128, n_pages=4)
    out = peng.generate_greedy(prompt, 20)
    assert out == ref
    # growth actually crossed a page boundary (37 + 20 > 1 page > 128? no:
    # 57 < 128 — force another: continue decoding past the boundary)
    eng2 = Engine(params, cfg, max_batch=1, max_len=256,
                  kv_dtype=jnp.float32, kv_quantized=quantized)
    ref2 = eng2.generate_greedy(list(range(1, 120)), 30)
    peng2 = PagedEngine(params, cfg, max_batch=1, max_len=256,
                        kv_dtype=jnp.float32, kv_quantized=quantized,
                        page_size=128, n_pages=4)
    out2 = peng2.generate_greedy(list(range(1, 120)), 30)
    assert out2 == ref2  # crosses the 128-token page boundary mid-decode


def test_paged_scheduler_serving(monkeypatch):
    """CB scheduler over the PagedEngine: queued requests share the page
    pool, pages free on finish and get reused."""
    monkeypatch.setenv("NST_FLASH", "off")
    import jax
    jax.clear_caches()
    from neural_speed_tpu.models.arch import ArchConfig
    from neural_speed_tpu.ops.qtypes import named_qspec
    from neural_speed_tpu.ops.sampling import SamplingParams
    from neural_speed_tpu.runtime.engine import PagedEngine
    from neural_speed_tpu.runtime.scheduler import ContinuousBatchingScheduler
    from neural_speed_tpu.utils.synthetic import synth_params

    cfg = ArchConfig(name="llama", vocab_size=96, hidden_size=64,
                     n_layers=1, n_heads=2, n_kv_heads=2,
                     intermediate_size=128, max_position_embeddings=256)
    params = synth_params(cfg, named_qspec("int4", group_size=32))
    # pool smaller than requests x max_len: only reuse makes this fit
    eng = PagedEngine(params, cfg, max_batch=2, max_len=256,
                      page_size=128, n_pages=5)
    sched = ContinuousBatchingScheduler(
        eng, SamplingParams(do_sample=True, temperature=1.0, top_k=8),
        chunk_size=8,
    )
    rng = np.random.default_rng(1)
    want = {}
    for i in range(6):
        plen = int(rng.integers(3, 120))
        n_new = int(rng.integers(5, 60))
        rid = sched.add_request(list(rng.integers(1, 96, plen)), n_new)
        want[rid] = n_new
    done = sched.run_to_completion()
    assert sorted(s.request_id for s in done) == sorted(want)
    for s in done:
        assert len(s.generated) == want[s.request_id]
    # all pages returned to the pool
    assert eng._alloc.available == 5


def test_inactive_slot_never_corrupts_neighbors(monkeypatch):
    """An inactive slot's parked decode writes must not touch pages
    belonging to live sequences (regression: the trash row used to land on
    the last *allocated* page)."""
    monkeypatch.setenv("NST_FLASH", "off")
    import jax
    jax.clear_caches()
    from neural_speed_tpu.models.arch import ArchConfig
    from neural_speed_tpu.ops.qtypes import named_qspec
    from neural_speed_tpu.runtime.engine import Engine, PagedEngine
    from neural_speed_tpu.utils.synthetic import synth_params

    cfg = ArchConfig(name="llama", vocab_size=96, hidden_size=64,
                     n_layers=1, n_heads=2, n_kv_heads=2,
                     intermediate_size=128, max_position_embeddings=256)
    params = synth_params(cfg, named_qspec("int4", group_size=32))
    # tight pool: slot 1's pages INCLUDE the highest allocatable page
    peng = PagedEngine(params, cfg, max_batch=2, max_len=256,
                       page_size=128, n_pages=4)
    prompts = [list(range(3, 20)), list(range(5, 40))]
    logits = peng.prefill(prompts)
    tok1 = int(jnp.argmax(logits[1]))  # slot 1's pending token
    toks = jnp.argmax(logits, -1).astype(jnp.int32)
    # only slot 0 decodes; slot 1 is an inactive spectator
    active = jnp.asarray([True, False])
    for _ in range(6):
        lg = peng.decode(toks, active)
        toks = jnp.argmax(lg, -1).astype(jnp.int32)
    # now decode slot 1: its results must match a fresh engine that never
    # had slot 0 decoding next to it
    eng = Engine(params, cfg, max_batch=2, max_len=256)
    l2 = eng.prefill(prompts)
    out_ref, out_paged = [], []
    a1 = jnp.asarray([False, True])
    tp_ = jnp.asarray([0, tok1], jnp.int32)
    tr_ = jnp.asarray([0, tok1], jnp.int32)
    for _ in range(5):
        lp = peng.decode(tp_, a1)
        lr = eng.decode(tr_, a1)
        tp_ = jnp.argmax(lp, -1).astype(jnp.int32)
        tr_ = jnp.argmax(lr, -1).astype(jnp.int32)
        out_paged.append(int(tp_[1]))
        out_ref.append(int(tr_[1]))
    assert out_paged == out_ref


def test_paged_speculative_and_mixed_match_contiguous(monkeypatch):
    """Speculative + mixed scheduling over the PAGED cache: greedy streams
    must be bit-identical to the contiguous-cache scheduler (append_span
    resolves verify rows through the page table; prepare_rows/commit_lens
    make the provisional page growth roll back exactly), and the page pool
    must fully recover — overshoot pages from rejected drafts are reused,
    not leaked."""
    monkeypatch.setenv("NST_FLASH", "off")
    import jax
    jax.clear_caches()
    from neural_speed_tpu.models.arch import ArchConfig
    from neural_speed_tpu.ops.qtypes import named_qspec
    from neural_speed_tpu.ops.sampling import SamplingParams
    from neural_speed_tpu.runtime.engine import Engine, PagedEngine
    from neural_speed_tpu.runtime.scheduler import ContinuousBatchingScheduler
    from neural_speed_tpu.utils.synthetic import synth_params

    cfg = ArchConfig(name="llama", vocab_size=96, hidden_size=64,
                     n_layers=1, n_heads=2, n_kv_heads=2,
                     intermediate_size=128, max_position_embeddings=256)
    params = synth_params(cfg, named_qspec("int4", group_size=32))
    prompts = [
        list(range(1, 9)) * 5,               # repetitive: drafts accepted
        [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5],   # sparse matches
        [17, 23, 42],                        # queued (2 slots)
    ]
    sp = SamplingParams(do_sample=False, repetition_penalty=1.1)

    def run(make_engine, **kw):
        eng = make_engine()
        sched = ContinuousBatchingScheduler(eng, sp, chunk_size=4, **kw)
        rids = [sched.add_request(list(p), 24) for p in prompts]
        done = {s.request_id: s.generated
                for s in sched.run_to_completion()}
        return [done[r] for r in rids], eng

    cont = lambda: Engine(params, cfg, max_batch=2, max_len=256)
    # page_size 16 << draft bucket: verify rows routinely cross pages
    paged = lambda: PagedEngine(params, cfg, max_batch=2, max_len=256,
                                page_size=16, n_pages=20)

    ref, _ = run(cont)
    for kw in (dict(speculative=True, spec_k=5),
               dict(mixed_prefill=True, mixed_chunk=8),
               dict(mixed_prefill=True, mixed_chunk=8, speculative=True,
                    spec_k=5)):
        out_c, _ = run(cont, **kw)
        out_p, eng = run(paged, **kw)
        assert out_c == ref, kw
        assert out_p == ref, kw
        assert eng._alloc.available == eng.n_pages - 1, kw  # pool restored
        assert (eng._mapped == 0).all(), kw


def test_paged_speculative_sampled_support(monkeypatch):
    monkeypatch.setenv("NST_FLASH", "off")
    import jax
    jax.clear_caches()
    from neural_speed_tpu.models.arch import ArchConfig
    from neural_speed_tpu.ops.qtypes import named_qspec
    from neural_speed_tpu.ops.sampling import SamplingParams
    from neural_speed_tpu.runtime.engine import PagedEngine
    from neural_speed_tpu.runtime.scheduler import ContinuousBatchingScheduler
    from neural_speed_tpu.utils.synthetic import synth_params

    cfg = ArchConfig(name="llama", vocab_size=96, hidden_size=64,
                     n_layers=1, n_heads=2, n_kv_heads=2,
                     intermediate_size=128, max_position_embeddings=256)
    params = synth_params(cfg, named_qspec("int4", group_size=32))
    eng = PagedEngine(params, cfg, max_batch=2, max_len=256,
                      page_size=16, n_pages=20)
    sp = SamplingParams(do_sample=True, temperature=0.9, top_k=8,
                        top_p=0.9, repetition_penalty=1.1)
    sched = ContinuousBatchingScheduler(eng, sp, speculative=True, spec_k=4)
    rids = [sched.add_request(list(range(1, 9)) * 4, 12),
            sched.add_request([17, 23, 42], 12)]
    done = {s.request_id: s.generated for s in sched.run_to_completion()}
    for r in rids:
        assert len(done[r]) == 12
        assert all(0 <= t < 96 for t in done[r])
    assert eng._alloc.available == eng.n_pages - 1


def test_paged_span_clamps_to_page_size(monkeypatch):
    """Regression: joint-step rows longer than page_size would route to
    append_prefill, whose contiguous-run write corrupts across
    one-at-a-time growth pages — the scheduler must clamp mixed_chunk and
    draft lengths so every padded window fits in a page, and outputs must
    still match the contiguous cache."""
    monkeypatch.setenv("NST_FLASH", "off")
    import jax
    jax.clear_caches()
    from neural_speed_tpu.models.arch import ArchConfig
    from neural_speed_tpu.ops.qtypes import named_qspec
    from neural_speed_tpu.ops.sampling import SamplingParams
    from neural_speed_tpu.runtime.engine import Engine, PagedEngine
    from neural_speed_tpu.runtime.scheduler import ContinuousBatchingScheduler
    from neural_speed_tpu.utils.synthetic import synth_params

    cfg = ArchConfig(name="llama", vocab_size=96, hidden_size=64,
                     n_layers=1, n_heads=2, n_kv_heads=2,
                     intermediate_size=128, max_position_embeddings=256)
    params = synth_params(cfg, named_qspec("int4", group_size=32))
    prompts = [list(range(1, 9)) * 6, [3, 1, 4, 1, 5, 9, 2, 6]]
    sp = SamplingParams(do_sample=False)

    def run(eng, **kw):
        s = ContinuousBatchingScheduler(eng, sp, **kw)
        rids = [s.add_request(list(p), 16) for p in prompts]
        done = {q.request_id: q.generated for q in s.run_to_completion()}
        return [done[r] for r in rids], s

    ref, _ = run(Engine(params, cfg, max_batch=2, max_len=256))
    # mixed_chunk 32 > page_size 16 and spec_k 31 > page_size-1: both must
    # clamp instead of corrupting
    eng = PagedEngine(params, cfg, max_batch=2, max_len=256,
                      page_size=16, n_pages=40)
    out, s = run(eng, mixed_prefill=True, mixed_chunk=32,
                 speculative=True, spec_k=31)
    assert s.mixed_chunk == 16 and s.spec_k == 15
    assert out == ref
    assert eng._alloc.available == eng.n_pages - 1


def test_paged_prefill_bucket_padding_does_not_trample(monkeypatch):
    """Regression (found by soak-fuzzing): prefill pads prompts to a
    power-of-two bucket LARGER than the pages allocated for the true
    length; the old contiguous-window write (append_prefill) then wrote
    the padded tail straight through the following physical pages —
    silently corrupting other slots' KV.  Every multi-token paged write
    now resolves per-row through the page table.  The distilled trigger:
    admit new prompts (bucket 64, runs of 1-3 16-row pages) while another
    slot holds content in the physically adjacent pages."""
    monkeypatch.setenv("NST_FLASH", "off")
    import jax
    jax.clear_caches()
    from neural_speed_tpu.models.arch import ArchConfig
    from neural_speed_tpu.ops.qtypes import named_qspec
    from neural_speed_tpu.ops.sampling import SamplingParams
    from neural_speed_tpu.runtime.engine import Engine, PagedEngine
    from neural_speed_tpu.runtime.scheduler import ContinuousBatchingScheduler
    from neural_speed_tpu.utils.synthetic import synth_params

    cfg = ArchConfig(name="llama", vocab_size=96, hidden_size=64,
                     n_layers=1, n_heads=2, n_kv_heads=2,
                     intermediate_size=128, max_position_embeddings=256)
    params = synth_params(cfg, named_qspec("int4", group_size=32))
    sp = SamplingParams(do_sample=False, repetition_penalty=1.1)
    # (prompt, budget, admission-step): staggered so new runs land next
    # to a live slot's pages (the seed-7 soak schedule, distilled)
    rng = np.random.default_rng(7)
    reqs = []
    for r in range(8):
        n = int(rng.integers(2, 50))
        if r % 2 == 0:
            unit = rng.integers(1, 90, size=rng.integers(2, 5)).tolist()
            prompt = (unit * 25)[:n]
        else:
            prompt = rng.integers(1, 90, size=n).tolist()
        reqs.append((prompt, int(rng.integers(1, 16)),
                     int(rng.integers(0, 8))))

    def run(eng):
        sched = ContinuousBatchingScheduler(eng, sp, chunk_size=3)
        pending = list(reqs)
        rids, out, step = [], {}, 0
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

    ref = run(Engine(params, cfg, max_batch=4, max_len=128, fuse=False))
    got = run(PagedEngine(params, cfg, max_batch=4, max_len=128,
                          page_size=16, fuse=False))
    assert got == ref


def test_beam_search_paged_matches_contiguous(monkeypatch):
    """Beam search over the paged cache (copy-on-write page-table fork:
    full blocks refcount-shared across beams, only tail pages copied)
    must produce exactly the contiguous engine's hypotheses, and the
    allocator must be fully drained after the requests retire."""
    monkeypatch.setenv("NST_FLASH", "off")  # identical reduction order on
    # both engines (the flash kernels tile by page vs context block)
    from neural_speed_tpu.models.arch import ArchConfig
    from neural_speed_tpu.ops.qtypes import QSpec, QType
    from neural_speed_tpu.runtime.beam import BeamConfig, beam_search
    from neural_speed_tpu.runtime.engine import Engine, PagedEngine
    from neural_speed_tpu.utils.synthetic import synth_params

    cfg = ArchConfig(name="llama", vocab_size=128, hidden_size=64,
                     n_layers=2, n_heads=4, n_kv_heads=4,
                     intermediate_size=128, max_position_embeddings=512)
    params = synth_params(cfg, QSpec(QType.INT, 4, 32, True))
    prompts = [[1, 17, 9, 33], [2, 5, 8, 13, 21, 34], [7, 7, 7]]
    bc = BeamConfig(num_beams=2, max_new_tokens=8)

    ref_eng = Engine(params, cfg, max_batch=4, max_len=256)
    ref = beam_search(ref_eng, prompts, bc)

    # page_size 128 < prompt+gen: beams share the prompt block via
    # refcounts once a sequence crosses a page boundary
    for page_size in (128, 256):
        eng = PagedEngine(params, cfg, max_batch=4, max_len=256,
                          fuse=True, page_size=page_size)
        got = beam_search(eng, prompts, bc)
        assert got == ref, (page_size, got, ref)
        assert eng._alloc.available == eng.n_pages - 1  # all pages freed
        assert not eng._alloc.refs


def test_beam_paged_long_crosses_pages(monkeypatch):
    """Long generation crossing several page boundaries under beam fork:
    shared full pages stay immutable, growth pages allocate privately."""
    monkeypatch.setenv("NST_FLASH", "off")
    from neural_speed_tpu.models.arch import ArchConfig
    from neural_speed_tpu.ops.qtypes import QSpec, QType
    from neural_speed_tpu.runtime.beam import BeamConfig, beam_search
    from neural_speed_tpu.runtime.engine import Engine, PagedEngine
    from neural_speed_tpu.utils.synthetic import synth_params

    cfg = ArchConfig(name="llama", vocab_size=64, hidden_size=64,
                     n_layers=2, n_heads=4, n_kv_heads=2,
                     intermediate_size=128, max_position_embeddings=2048)
    params = synth_params(cfg, QSpec(QType.INT, 4, 32, True), seed=3)
    prompts = [[1, 2, 3, 4, 5, 6, 7, 8] * 20]   # 160-token prompt
    bc = BeamConfig(num_beams=3, max_new_tokens=280)  # crosses 2+ pages

    ref = beam_search(Engine(params, cfg, max_batch=3, max_len=512),
                      prompts, bc)
    eng = PagedEngine(params, cfg, max_batch=3, max_len=512, fuse=True,
                      page_size=128)
    got = beam_search(eng, prompts, bc)
    assert got == ref
    assert eng._alloc.available == eng.n_pages - 1
    assert not eng._alloc.refs


def test_paged_fused_append_kernel(monkeypatch):
    """Paged FUSED in-kernel append (interpret mode): the returned pool
    equals pkv.append_decode bit-for-bit on active slots (shuffled
    pages), a spectator slot's pages are untouched, and the attention
    output matches the exact-new-token reference."""
    monkeypatch.setenv("NST_FLASH", "interpret")
    from neural_speed_tpu.ops import flash
    from neural_speed_tpu.ops.attention import attention_ref

    b, hkv, d, n_blocks, n_pages = 3, 4, 128, 2, 8
    h = 8
    cache, rng = _shuffled_setup(b, hkv, d, n_blocks, n_pages, layers=2,
                                 quantized=True, seed=3)
    # the LAST physical page is the reserved trash page (PagedEngine
    # convention): spectator slots' fused windows park there, so tables
    # must not hand it to a live slot
    tables = jnp.asarray([[0, 1], [2, 3], [4, 5]], jnp.int32)
    cache = pkv.PagedKVCache(cache.k_pages, cache.v_pages, cache.k_scale,
                             cache.v_scale, tables, cache.lengths)
    s = n_blocks * PS
    # fill the pools with quantized noise so "untouched" is meaningful
    kf = rng.standard_normal(cache.k_pages.shape).astype(np.float32)
    vf = rng.standard_normal(cache.v_pages.shape).astype(np.float32)
    from neural_speed_tpu.ops.kv_cache import quantize_kv

    kc, ks = quantize_kv(jnp.asarray(kf))
    vc, vs = quantize_kv(jnp.asarray(vf))
    cache = pkv.PagedKVCache(kc, vc,
                             ks.transpose(0, 1, 2, 4, 3),
                             vs.transpose(0, 1, 2, 4, 3),
                             cache.page_tables, cache.lengths)

    q = jnp.asarray(rng.standard_normal((b, 1, h, d)), jnp.float32) * 0.3
    kn = jnp.asarray(rng.standard_normal((b, 1, hkv, d)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((b, 1, hkv, d)), jnp.float32)
    # slots 0,2 active at different rows (0 mid-page-0, 2 in page 1);
    # slot 1 spectator parked on the trash position
    kv_lens = jnp.array([101, 120, PS + 7], jnp.int32)
    pos = jnp.array([[100], [s - 1], [PS + 6]], jnp.int32)
    layer = 1
    res = flash.mha_paged(q, cache, layer, pos, kv_lens,
                          scale=d ** -0.5, extra_kv=(kn, vn),
                          fused_append=True)
    assert res is not None
    out, (k2, v2, ks2, vs2) = res
    new_cache = pkv.PagedKVCache(k2, v2, ks2, vs2, cache.page_tables,
                                 cache.lengths)

    # expected pool: append_decode of the same rows for active slots
    active = jnp.array([True, False, True])
    exp = pkv.append_decode(cache, layer, kn, vn,
                            jnp.maximum(kv_lens - 1, 0)[:, None],
                            active=active)
    # compare every page EXCEPT the trash page (spectator windows park
    # garbage there by design; append_decode parks spectators there too
    # but writes nothing under its blend)
    live = list(range(n_pages - 1))
    for got_a, exp_a in ((k2, exp.k_pages), (v2, exp.v_pages)):
        np.testing.assert_array_equal(np.asarray(got_a)[:, :, live],
                                      np.asarray(exp_a)[:, :, live])
    # scales: in-kernel max-reduce order differs from the host layout by
    # one f32 ULP on this synthetic f32-scale pool (the engine default
    # stores bf16 scales, which absorb it — the engine-level test below
    # asserts exact equality); codes above are bit-identical
    for got_a, exp_a in ((ks2, exp.k_scale), (vs2, exp.v_scale)):
        np.testing.assert_allclose(np.asarray(got_a)[:, :, live],
                                   np.asarray(exp_a)[:, :, live],
                                   rtol=2e-7, atol=0)

    # attention vs gathered reference with the exact new rows merged
    kg, vg = pkv.gathered_layer(new_cache, layer, jnp.float32)
    # active slots' newest position uses the UNQUANTIZED operands
    kg = np.asarray(kg).copy()
    vg = np.asarray(vg).copy()
    # gathered_layer returns the cache-native [B, H, S, D] layout
    for bi, row in ((0, 100), (2, PS + 6)):
        kg[bi, :, row] = np.asarray(kn)[bi, 0]
        vg[bi, :, row] = np.asarray(vn)[bi, 0]
    ref = attention_ref(q, jnp.asarray(kg).transpose(0, 2, 1, 3),
                        jnp.asarray(vg).transpose(0, 2, 1, 3), pos,
                        kv_lens)
    mask = np.zeros((b, 1, h, d), bool)
    mask[0] = mask[2] = True  # spectator rows attend over stale lens; skip
    got = np.asarray(out)
    refn = np.asarray(ref)
    np.testing.assert_allclose(got[[0, 2]], refn[[0, 2]], atol=3e-2,
                               rtol=3e-2)


def test_paged_engine_fused_matches_plain(monkeypatch):
    """Engine-level: PagedEngine decode with NST_KV_APPEND=fused equals
    the plain path within self-column quantization noise, and the pool
    ends bit-identical at layer 0."""
    import dataclasses as _dc

    from neural_speed_tpu.models.arch import ArchConfig
    from neural_speed_tpu.ops.qtypes import QSpec, QType
    from neural_speed_tpu.runtime.engine import PagedEngine
    from neural_speed_tpu.utils.synthetic import synth_params

    monkeypatch.setenv("NST_FLASH", "interpret")
    cfg = ArchConfig(
        name="llama", vocab_size=256, hidden_size=256, n_layers=2,
        n_heads=8, n_kv_heads=4, intermediate_size=512,
        max_position_embeddings=256,
    )
    params = synth_params(cfg, QSpec(QType.INT, 4, 64, True))
    prompts = [[5, 9, 2, 44, 17, 3], [7, 21, 3]]
    toks = [11, 80, 200, 4]

    def run(mode):
        monkeypatch.setenv("NST_KV_APPEND", mode)
        eng = PagedEngine(params, cfg, max_batch=2, max_len=256,
                          kv_quantized=True, page_size=128)
        eng.prefill(prompts)
        import jax.numpy as jnp

        active = jnp.ones((2,), bool)
        outs = []
        for t_ in toks:
            lg = eng.decode(jnp.full((2,), t_, jnp.int32), active)
            outs.append(np.asarray(lg, np.float32))
        return outs, eng.cache

    ref_outs, ref_cache = run("plain")
    got_outs, got_cache = run("fused")
    for a, b_ in zip(ref_outs, got_outs):
        np.testing.assert_allclose(a, b_, atol=6e-2, rtol=6e-2)
    assert any(np.any(a != b_) for a, b_ in zip(ref_outs, got_outs)), \
        "identical logits: fused paged path did not engage"
    np.testing.assert_array_equal(np.asarray(ref_cache.k_pages[0]),
                                  np.asarray(got_cache.k_pages[0]))
    np.testing.assert_array_equal(np.asarray(ref_cache.k_scale[0]),
                                  np.asarray(got_cache.k_scale[0]))


def test_paged_fused_append_cow_fork_isolation(monkeypatch):
    """After a copy-on-write beam fork, a FUSED decode on one beam must
    not disturb the sibling that shares its full prompt pages (the fork
    copies only the tail page; fused writes always land on private
    pages, spectators park on the trash page)."""
    monkeypatch.setenv("NST_FLASH", "interpret")
    monkeypatch.setenv("NST_KV_APPEND", "fused")
    import jax.numpy as jnp

    from neural_speed_tpu.models.arch import ArchConfig
    from neural_speed_tpu.ops.qtypes import QSpec, QType
    from neural_speed_tpu.runtime.engine import PagedEngine
    from neural_speed_tpu.utils.synthetic import synth_params

    cfg = ArchConfig(name="llama", vocab_size=128, hidden_size=64,
                     n_layers=2, n_heads=4, n_kv_heads=4,
                     intermediate_size=128, max_position_embeddings=512)
    params = synth_params(cfg, QSpec(QType.INT, 4, 32, True))
    eng = PagedEngine(params, cfg, max_batch=2, max_len=384,
                      kv_quantized=True, page_size=128)
    # 150-token prompt: one full shared page + a 22-token tail
    prompt = list(np.random.default_rng(0).integers(1, 100, size=150))
    eng.prefill([prompt])
    eng.reorder_slots([0, 0])  # fork slot 0 -> slot 1 (COW)
    assert eng._tables[0, 0] == eng._tables[1, 0]      # shared full page
    assert eng._tables[0, 1] != eng._tables[1, 1]      # private tails
    sib_k, sib_v = pkv.gathered_layer(eng.cache, 0, jnp.float32)
    sib_k = np.asarray(sib_k[1, :, :150]).copy()

    # decode 3 tokens on slot 0 ONLY (slot 1 spectator)
    active = jnp.array([True, False])
    eng.prepare_decode(np.array([True, False]), 3)
    for t_ in (5, 9, 2):
        eng.decode(jnp.full((2,), t_, jnp.int32), active)

    k_after, _ = pkv.gathered_layer(eng.cache, 0, jnp.float32)
    np.testing.assert_array_equal(np.asarray(k_after[1, :, :150]), sib_k)
