"""Automatic prompt-prefix caching over the paged pool
(ops/paged_kv.PrefixPageCache + PagedEngine prefix hooks).

EXTENSION beyond the reference: its nearest analogue is the manual
prompt-session file (model_load_session_file, model_utils.cpp:1775-1830);
here full prompt pages are indexed by token-chain digest and later
requests alias them copy-on-write, prefilling only the suffix.
"""

import os

import numpy as np
import pytest
import torch
from transformers import LlamaConfig, LlamaForCausalLM

import jax.numpy as jnp

from neural_speed_tpu.api import Model
from neural_speed_tpu.convert.hf import params_from_state_dict
from neural_speed_tpu.models.configs import arch_from_hf_config
from neural_speed_tpu.ops.sampling import SamplingParams
from neural_speed_tpu.runtime.engine import PagedEngine
from neural_speed_tpu.runtime.scheduler import ContinuousBatchingScheduler

CFG = LlamaConfig(
    vocab_size=256, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
    max_position_embeddings=256,
)
PS = 8  # page size: small so short prompts span several full pages


@pytest.fixture(scope="module")
def our_model():
    os.environ.setdefault("NST_FLASH", "off")  # exact cross-engine compare
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
    return m


def _paged(m, prefix=True, n_pages=None, **kw):
    return PagedEngine(m.engine.params, m.engine.cfg, max_batch=4,
                       max_len=128, page_size=PS, prefix_cache=prefix,
                       n_pages=n_pages, **kw)


def _serve(eng, prompts, n=12, sp=None, **kw):
    sched = ContinuousBatchingScheduler(
        eng, sp or SamplingParams(do_sample=False), chunk_size=4, **kw)
    rids = [sched.add_request(list(p), n) for p in prompts]
    done = {s.request_id: s.generated for s in sched.run_to_completion()}
    return [done[r] for r in rids], sched


LONG = list(range(40, 40 + 21))          # 21 tokens -> 2 full pages of 8


def test_prefix_hit_exact_and_refcounts(our_model):
    eng = _paged(our_model)
    ref, _ = _serve(_paged(our_model, prefix=False), [LONG])
    out1, _ = _serve(eng, [LONG])
    assert eng.prefix.misses >= 1 and eng.prefix.hits == 0
    assert len(eng.prefix.index) == 2            # two full pages indexed
    out2, _ = _serve(eng, [LONG])                # identical prompt again
    assert eng.prefix.hits == 1
    assert out1 == out2 == ref
    # only the cache's own references remain after both runs finish
    cached = set(eng.prefix.index.values())
    assert set(eng._alloc.refs) == cached
    assert all(rc == 1 for rc in eng._alloc.refs.values())


def test_prefix_partial_match(our_model):
    eng = _paged(our_model)
    _serve(eng, [LONG])
    # same first page (8 tokens), divergent afterwards
    other = LONG[:8] + [9, 9, 9, 9, 9, 9, 9, 9, 9, 9]
    ref, _ = _serve(_paged(our_model, prefix=False), [other])
    out, _ = _serve(eng, [other])
    assert out == ref
    assert eng.prefix.hits >= 1


def test_prefix_never_caches_whole_prompt(our_model):
    """A prompt of exactly N full pages must still prefill >= 1 token."""
    eng = _paged(our_model)
    p16 = LONG[:16]                               # exactly 2 pages
    _serve(eng, [p16])
    ref, _ = _serve(_paged(our_model, prefix=False), [p16])
    out, sched = _serve(eng, [p16])
    assert out == ref
    # lookup must have matched at most one page (8 tokens)
    assert all(v == 0 for v in sched._slot_len)


def test_prefix_cache_eviction_under_pressure(our_model):
    """A tiny pool forces LRU eviction of cached pages; serving keeps
    working and streams stay exact."""
    # pool: 4 slots x 2 pages in flight needs ~8; give 10 (+trash)
    eng = _paged(our_model, n_pages=10)
    ref, _ = _serve(_paged(our_model, prefix=False), [LONG])
    for i in range(4):  # distinct prompts churn the index
        p = [100 + i] * 20
        _serve(eng, [p], n=4)
    out, _ = _serve(eng, [LONG])
    assert out == ref
    # allocator stays consistent: every ref belongs to the index
    assert set(eng._alloc.refs) == set(eng.prefix.index.values())


def test_prefix_concurrent_batch_and_streams(our_model):
    """Batch with shared-prefix prompts admitted together: first
    admission prefills + registers, later identical prompts hit."""
    eng = _paged(our_model)
    prompts = [LONG, LONG[:8] + [7] * 10, LONG, [5, 4, 3]]
    ref, _ = _serve(_paged(our_model, prefix=False), prompts)
    out, sched = _serve(eng, prompts)
    assert out == ref
    assert not sched.running


def test_prefix_mixed_admission(our_model):
    eng = _paged(our_model)
    _serve(eng, [LONG])
    ref, _ = _serve(_paged(our_model, prefix=False), [LONG],
                    mixed_prefill=True, mixed_chunk=4)
    out, _ = _serve(eng, [LONG], mixed_prefill=True, mixed_chunk=4)
    assert out == ref
    assert eng.prefix.hits >= 1


def test_prefix_int8_kv(our_model):
    """int8-quantized KV pages are deterministic per token chain — prefix
    hits must reproduce the no-cache stream exactly."""
    eng = _paged(our_model, kv_quantized=True)
    ref, _ = _serve(_paged(our_model, prefix=False, kv_quantized=True),
                    [LONG])
    _serve(eng, [LONG])
    out, _ = _serve(eng, [LONG])
    assert eng.prefix.hits >= 1
    assert out == ref


def test_prefix_speculative(our_model):
    """Prefix hits compose with batched speculative serving (adoption
    happens at admission; verify steps run on the aliased pages)."""
    eng = _paged(our_model)
    rep = (LONG[:8] + [3, 4, 5]) * 2       # repetitive: drafts accepted
    ref, _ = _serve(_paged(our_model, prefix=False), [rep],
                    speculative=True, spec_k=3)
    _serve(eng, [rep], speculative=True, spec_k=3)
    out, _ = _serve(eng, [rep], speculative=True, spec_k=3)
    assert eng.prefix.hits >= 1
    assert out == ref


def test_prefix_model_api(our_model, tmp_path):
    """Model.init(paged=True, prefix_cache=True) end-to-end."""
    from neural_speed_tpu.runtime import serialization

    path = str(tmp_path / "m.npz")
    serialization.save_params(path, our_model.engine.params)
    m = Model().init_from_bin(our_model.cfg, path, ctx_size=128,
                              max_batch=2, paged=True, page_size=PS,
                              prefix_cache=True)
    a = m.generate([LONG], max_new_tokens=6, do_sample=False,
                   ignore_prompt=True)[0]
    b = m.generate([LONG], max_new_tokens=6, do_sample=False,
                   ignore_prompt=True)[0]
    assert a == b and m.engine.prefix.hits >= 1


def test_prefix_eviction_skips_live_lru_head(our_model):
    """Regression (round-3 review): _alloc_page must KEEP evicting past
    an LRU head that is still aliased by a live slot (its eviction drops
    a ref without freeing a page) until a page actually frees."""
    from neural_speed_tpu.ops.paged_kv import PageAllocator, \
        PrefixPageCache

    alloc = PageAllocator(3)
    cache = PrefixPageCache(alloc, page_size=4)
    pa = alloc.alloc_page()
    pb = alloc.alloc_page()
    pc = alloc.alloc_page()
    # index A (LRU head) and B; A is ALSO aliased by a "slot" (extra ref)
    cache.index[b"A"] = pa
    cache.index[b"B"] = pb
    alloc.share_pages([pa, pb])      # cache's refs
    alloc.share_pages([pa])          # live-slot alias of A
    alloc.free_pages([pa, pb, pc])   # slots drop their original refs
    assert alloc.available == 1      # only C freed

    class _E:
        prefix = cache
        _alloc = alloc
    from neural_speed_tpu.runtime.engine import PagedEngine

    got = [PagedEngine._alloc_page(_E()) for _ in range(2)]
    # C, then B (evicting A alone frees nothing — the loop must go on)
    assert None not in got and pb in got
    assert not cache.index  # both entries evicted along the way


def test_prefix_overlong_prompt_skips_adoption(our_model):
    """Regression (round-3 review): a prompt longer than the context
    must NOT adopt a cached prefix — the adopted prefix + unclamped
    suffix overran the page table (numpy broadcast ValueError / pool
    exhaustion).  On the paged engine an over-long prompt ends in the
    documented StreamingLLM NotImplementedError either way; the point
    is that WITH a cached shorter prefix present the behavior is
    IDENTICAL to the uncached engine, not a table-overrun crash."""
    eng = _paged(our_model)
    _serve(eng, [LONG])  # register LONG's pages
    over = LONG + list(range(500, 500 + 130))  # 151 tokens > max_len 128
    hits_before = eng.prefix.hits

    def outcome(e):
        try:
            return ("ok", _serve(e, [over])[0])
        except NotImplementedError as exc:
            return ("streaming-llm", str(exc)[:40])

    ref = outcome(_paged(our_model, prefix=False))
    got = outcome(eng)
    assert got == ref
    assert eng.prefix.hits == hits_before  # adoption was skipped


def test_prefix_rejects_chatglm(our_model):
    import dataclasses

    cfg = dataclasses.replace(our_model.cfg, rope_style="chatglm")
    with pytest.raises(NotImplementedError):
        PagedEngine(our_model.engine.params, cfg, max_batch=2,
                    max_len=64, page_size=PS, prefix_cache=True)
