"""User-facing Model / ModelServer API.

Parity: neural_speed/__init__.py `Model` (:123-556) and `ModelServer`
(:534-554) — same workflow: point at an HF model (or a pre-quantized bin),
pick weight_dtype/group_size/etc., then `generate()` with HF-style kwargs,
streamer and stopping criteria, or `__call__` for logits.

The quantized-model cache file is an .npz of the packed pytree
(`runtime_outs/nst_<arch>_q_<desc>.npz`, naming parity: __init__.py:166-225).
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .models.arch import ArchConfig
from .models.configs import arch_from_hf_config
from .ops.qtypes import QSpec, named_qspec
from .ops.sampling import SamplingParams
from .runtime.engine import Engine
from .runtime import serialization


def _is_ggjt(path: str) -> bool:
    """Sniff the NE 'ggjt' (or legacy 'ne') magic (model_types.h:53-56)."""
    try:
        with open(path, "rb") as f:
            magic = f.read(4)
    except OSError:
        return False
    return magic in (b"tjgg", b"lmgg")


class Model:
    def __init__(self):
        self.engine: Optional[Engine] = None
        self.cfg: Optional[ArchConfig] = None
        self.tokenizer = None
        self.eos_id: Optional[int] = None
        self._generate_round = 0

    # ------------------------------------------------------------------
    def init(
        self,
        model_name: str,
        use_quant: bool = True,
        weight_dtype: str = "int4",
        group_size: int = 128,
        scale_dtype: str = "fp32",
        alg: str = "sym",
        use_cache: bool = False,
        max_batch: int = 1,
        ctx_size: int = 2048,
        kv_quantized: bool = False,
        model_file: Optional[str] = None,
        lora_path: Optional[str] = None,
        lora_scale: Optional[float] = None,
        tp: int = 1,
        paged: bool = False,
        page_size: int = 128,
        n_pages: Optional[int] = None,
        prefix_cache: bool = False,
        memory_dtype: str = "auto",
    ):
        """Convert + quantize an HF checkpoint (parity: Model.init,
        __init__.py:142-225).  `use_cache` reuses the packed .npz;
        `lora_path` merges a PEFT adapter at load time (parity:
        model_apply_lora_from_file_internal)."""
        from transformers import AutoConfig, AutoTokenizer

        hf_cfg = AutoConfig.from_pretrained(
            model_name, trust_remote_code=True
        ).to_dict()
        self.cfg = arch_from_hf_config(hf_cfg)
        try:
            self.tokenizer = AutoTokenizer.from_pretrained(
                model_name, trust_remote_code=True
            )
            self.eos_id = self.tokenizer.eos_token_id
        except Exception:
            self.tokenizer = None

        qspec = None
        if use_quant:
            qspec = named_qspec(
                weight_dtype, group_size=group_size,
                symmetric=(alg == "sym"),
                scale_dtype={"fp32": "float32", "bf16": "bfloat16"}.get(
                    scale_dtype, "float32"
                ),
            )

        cache_path = None
        if use_cache:
            desc = (f"{weight_dtype}_g{group_size}_{alg}"
                    if use_quant else "fp")
            os.makedirs("runtime_outs", exist_ok=True)
            cache_path = f"runtime_outs/nst_{self.cfg.name}_q_{desc}.npz"
        if cache_path and os.path.exists(cache_path):
            params = serialization.load_params(cache_path)
        else:
            params = self._convert(model_name, qspec)
            if cache_path:
                serialization.save_params(cache_path, params)
        if lora_path is not None:
            from .convert import lora as lora_mod

            lsd, lcfg = lora_mod.load_lora(lora_path)
            if lora_scale is not None:
                lcfg = dict(lcfg, lora_alpha=lora_scale * lcfg.get("r", 1.0))
            params = lora_mod.apply_lora_to_params(params, self.cfg, lsd,
                                                   lcfg)
        self._make_engine(params, max_batch, ctx_size, kv_quantized, tp=tp,
                          paged=paged, page_size=page_size, n_pages=n_pages,
                          prefix_cache=prefix_cache,
                          memory_dtype=memory_dtype)
        return self

    def _convert(self, model_name: str, qspec: Optional[QSpec]):
        from .convert.hf import params_from_state_dict
        from .convert import loaders

        sd = loaders.load_state_dict(model_name)
        return params_from_state_dict(sd, self.cfg, qspec)

    def init_from_bin(self, arch_cfg: ArchConfig, bin_path: str,
                      max_batch: int = 1, ctx_size: int = 2048,
                      kv_quantized: bool = False, tokenizer=None,
                      tp: int = 1, paged: bool = False,
                      page_size: int = 128, n_pages: Optional[int] = None,
                      prefix_cache: bool = False,
                      memory_dtype: str = "auto"):
        """Load a previously saved packed model (parity: init_from_bin).
        A reference-toolchain 'ggjt' .bin (model_files.h:246+) is detected
        by magic and routed through convert.ne_bin — arch_cfg/tokenizer
        come from the file itself in that case (pass None)."""
        if _is_ggjt(bin_path):
            return self.init_from_ne_bin(
                bin_path, max_batch=max_batch, ctx_size=ctx_size,
                kv_quantized=kv_quantized, tp=tp, paged=paged,
                page_size=page_size, n_pages=n_pages,
                prefix_cache=prefix_cache, memory_dtype=memory_dtype)
        self.cfg = arch_cfg
        self.tokenizer = tokenizer
        params = serialization.load_params(bin_path)
        self._make_engine(params, max_batch, ctx_size, kv_quantized, tp=tp,
                          paged=paged, page_size=page_size, n_pages=n_pages,
                          prefix_cache=prefix_cache,
                          memory_dtype=memory_dtype)
        return self

    def init_from_ne_bin(self, bin_path: str, max_batch: int = 1,
                         ctx_size: int = 2048, kv_quantized: bool = False,
                         tp: int = 1, paged: bool = False,
                         page_size: int = 128,
                         n_pages: Optional[int] = None,
                         prefix_cache: bool = False,
                         memory_dtype: str = "auto",
                         param_dtype: str = "bf16"):
        """Load a reference-produced NE 'ggjt' v1-v3 .bin (the reference's
        native checkpoint format, written by its convert_llama.py).
        `param_dtype` "f32" keeps FP tensors at file precision (strict
        reference-parity runs); "bf16" is the TPU serving default."""
        import jax.numpy as jnp
        from .convert import ne_bin

        params, cfg, tok = ne_bin.load_ne_bin(
            bin_path,
            param_dtype=jnp.float32 if param_dtype == "f32"
            else jnp.bfloat16)
        self.cfg = cfg
        self.tokenizer = tok
        if tok is not None:
            self.eos_id = tok.eos_token_id
        self._make_engine(params, max_batch, ctx_size, kv_quantized, tp=tp,
                          paged=paged, page_size=page_size, n_pages=n_pages,
                          prefix_cache=prefix_cache,
                          memory_dtype=memory_dtype)
        return self

    def init_from_gguf(self, gguf_path: str, max_batch: int = 1,
                       ctx_size: int = 2048, kv_quantized: bool = False,
                       tp: int = 1, paged: bool = False,
                       page_size: int = 128, n_pages: Optional[int] = None,
                       prefix_cache: bool = False,
                       memory_dtype: str = "auto"):
        from .convert import gguf as gguf_mod

        params, cfg, tok = gguf_mod.load_gguf_model(gguf_path)
        self.cfg = cfg
        self.tokenizer = tok
        if tok is not None:
            self.eos_id = tok.eos_token_id
        self._make_engine(params, max_batch, ctx_size, kv_quantized, tp=tp,
                          paged=paged, page_size=page_size, n_pages=n_pages,
                          prefix_cache=prefix_cache,
                          memory_dtype=memory_dtype)
        return self

    def _make_engine(self, params, max_batch, ctx_size, kv_quantized,
                     tp: int = 1, paged: bool = False, page_size: int = 128,
                     n_pages: Optional[int] = None,
                     prefix_cache: bool = False,
                     memory_dtype: str = "auto"):
        # KV memory dtype selection (parity: KV_MEM_TYPE_AUTO/F16/F32
        # probing in model_init_from_file, model_utils.cpp:997-1141).
        # auto = bf16 (the TPU-native half type; int8 via kv_quantized),
        # f16 = bf16 alias, f32 = exact cache for strict-parity runs,
        # int8 = the quantized cache (the reference's BTLA layout analog)
        import jax.numpy as jnp

        if memory_dtype in ("auto", "f16", "bf16"):
            kv_dtype = jnp.bfloat16
        elif memory_dtype == "f32":
            kv_dtype = jnp.float32
        elif memory_dtype == "int8":
            kv_dtype, kv_quantized = jnp.bfloat16, True
        else:
            raise ValueError(f"unknown memory_dtype {memory_dtype!r}")
        if tp > 1:
            # multi-chip serving: shard per the Megatron split table and
            # drive the whole mesh from this process (parallel/tp.TPEngine)
            from .parallel.tp import PagedTPEngine, TPEngine, make_mesh

            if paged:
                self.engine = PagedTPEngine(
                    params, self.cfg, make_mesh(tp=tp),
                    max_batch=max_batch, max_len=ctx_size,
                    kv_quantized=kv_quantized, page_size=page_size,
                    n_pages=n_pages, prefix_cache=prefix_cache,
                    kv_dtype=kv_dtype,
                )
                return
            self.engine = TPEngine(
                params, self.cfg, make_mesh(tp=tp), max_batch=max_batch,
                max_len=ctx_size, kv_quantized=kv_quantized,
                kv_dtype=kv_dtype,
            )
            return
        if paged:
            from .runtime.engine import PagedEngine

            self.engine = PagedEngine(
                params, self.cfg, max_batch=max_batch, max_len=ctx_size,
                kv_quantized=kv_quantized, page_size=page_size,
                n_pages=n_pages, prefix_cache=prefix_cache,
                kv_dtype=kv_dtype,
            )
            return
        self.engine = Engine(
            params, self.cfg, max_batch=max_batch, max_len=ctx_size,
            kv_quantized=kv_quantized, kv_dtype=kv_dtype,
        )

    # ------------------------------------------------------------------
    def generate(
        self,
        input_ids,
        max_new_tokens: int = 128,
        do_sample: bool = False,
        temperature: float = 0.8,
        top_k: int = 40,
        top_p: float = 0.95,
        repetition_penalty: float = 1.1,
        num_beams: int = 1,
        early_stopping: bool = False,
        length_penalty: float = 1.0,
        seed: int = 0,
        streamer: Optional[Callable[[int], None]] = None,
        stopping_criteria: Optional[Callable[[List[int]], bool]] = None,
        ignore_prompt: bool = False,
        session_path: Optional[str] = None,
        speculative: bool = False,
        speculative_k: int = 7,
        **kwargs,
    ):
        """HF-style generate (parity: __init__.py:337-411 incl. streamer +
        StoppingCriteria callback, docs/customized_stop.md).

        `session_path`: prompt-session file (parity: 'ggsn' session files +
        --prompt_cache_all, model_utils.cpp:1775-1856).  If the file exists
        and its stored token prefix matches the (single) prompt, the cached
        KV is restored and only the remainder is prefilled; the session is
        re-saved after generation.  Single-prompt, non-beam only."""
        if kwargs:
            # kwargs allowlist parity (__init__.py valid_args:324-329)
            import warnings

            warnings.warn("ignoring unsupported generate() kwargs: "
                          f"{sorted(kwargs)}", stacklevel=2)
        from .utils.profiler import verbose_level

        if verbose_level() >= 1:
            # generation-config echo (parity: main_pybind.cpp:143-147)
            import sys

            print(f"generation config: max_new_tokens={max_new_tokens} "
                  f"do_sample={do_sample} temperature={temperature} "
                  f"top_k={top_k} top_p={top_p} "
                  f"repetition_penalty={repetition_penalty} "
                  f"num_beams={num_beams} seed={seed}", file=sys.stderr)
        ids = self._to_list_batch(input_ids)
        cached = 0
        if session_path is not None:
            if len(ids) != 1 or num_beams > 1:
                raise ValueError("session_path needs a single prompt, "
                                 "num_beams=1")
            cached = self._load_session_prefix(session_path, ids[0])
        if speculative:
            # prompt-lookup speculative decoding (EXTENSION —
            # runtime/speculative.py): greedy output is exactly the greedy
            # sequence; sampled output is exactly target-distributed
            # (rejection sampling against the point-mass draft)
            if (num_beams > 1 or stopping_criteria is not None or cached):
                raise ValueError("speculative=True needs num_beams=1, no "
                                 "stopping_criteria/session")
            # the single-sequence fast paths own slot 0 of a CONTIGUOUS
            # cache; paged engines take the scheduler (page-table growth)
            paged = hasattr(self.engine, "page_size")
            if do_sample:
                sp = SamplingParams(
                    do_sample=True, temperature=temperature, top_k=top_k,
                    top_p=top_p, repetition_penalty=repetition_penalty,
                )
                if len(ids) == 1 and not paged:
                    from .runtime.speculative import (
                        generate_sampled_speculative)

                    o = generate_sampled_speculative(
                        self.engine, ids[0], max_new_tokens, sp,
                        eos_id=self.eos_id, k=speculative_k, seed=seed,
                    )
                    if streamer is not None:
                        for t in o:
                            streamer(t)
                    return [(ids[0] if not ignore_prompt else []) + o]
                # batched: fall through to the scheduler (one multi-token
                # verify forward over ALL slots per step, per-slot
                # rejection sampling — runtime/scheduler.py)
            else:
                sp = SamplingParams(do_sample=False,
                                    repetition_penalty=repetition_penalty)
                if len(ids) == 1 and not paged:
                    from .runtime.speculative import (
                        generate_greedy_speculative)

                    out = generate_greedy_speculative(
                        self.engine, ids[0], max_new_tokens,
                        eos_id=self.eos_id, k=speculative_k, sp=sp,
                    )
                    if streamer is not None:
                        for t in out:
                            streamer(t)
                    return [(ids[0] if not ignore_prompt else []) + out]
            # batched prompts: the continuous-batching scheduler runs one
            # multi-token verify forward over ALL slots per step
            # (runtime/scheduler.py _spec_decode_step)
            from .runtime.scheduler import ContinuousBatchingScheduler

            sched = ContinuousBatchingScheduler(
                self.engine, sp, eos_id=self.eos_id, seed=seed,
                speculative=True, spec_k=speculative_k,
            )
            rids = [sched.add_request(p, max_new_tokens, streamer=streamer)
                    for p in ids]
            done = {s.request_id: s.generated
                    for s in sched.run_to_completion()}
            return [
                (p if not ignore_prompt else []) + done[r]
                for p, r in zip(ids, rids)
            ]
        if num_beams > 1:
            from .runtime.beam import BeamConfig, beam_search

            bc = BeamConfig(
                num_beams=num_beams, length_penalty=length_penalty,
                early_stopping=early_stopping,
                max_new_tokens=max_new_tokens, eos_id=self.eos_id,
            )
            outs = beam_search(self.engine, ids, bc)
            return [
                (p if not ignore_prompt else []) + o
                for p, o in zip(ids, outs)
            ]

        from .runtime.scheduler import ContinuousBatchingScheduler

        sp = SamplingParams(
            do_sample=do_sample, temperature=temperature, top_k=top_k,
            top_p=top_p, repetition_penalty=repetition_penalty,
        )
        # a stopping_criteria must run between tokens -> per-token steps;
        # a streamer wants small flush granularity; otherwise large chunks
        # amortize the per-dispatch cost
        chunk = (1 if stopping_criteria is not None
                 else 8 if streamer is not None else 16)
        sched = ContinuousBatchingScheduler(
            self.engine, sp, eos_id=self.eos_id, seed=seed, chunk_size=chunk,
            # the ladder would widen the granularity these callbacks rely on
            adaptive_chunk=stopping_criteria is None and streamer is None,
        )
        seqs = {}
        for p in ids:
            rid = sched.add_request(p, max_new_tokens, streamer=streamer,
                                    cached=cached)
            seqs[rid] = p
        done = {}
        while sched.has_work:
            sched.step()
            for s in sched.pop_finished():
                done[s.request_id] = s.generated
            if stopping_criteria is not None:
                for slot, s in list(sched.running.items()):
                    if stopping_criteria(seqs[s.request_id] + s.generated):
                        s.max_new_tokens = len(s.generated)  # stop now
        from .utils.profiler import verbose_level

        if verbose_level() >= 0:
            sched.timings.print_timings()
        if session_path is not None:
            # store everything evaluated so far (prompt + generated minus
            # the trailing token whose KV isn't written yet)
            rid0 = sorted(done)[0]
            stored = seqs[rid0] + done[rid0][:-1]
            serialization.save_session(session_path, self.engine.cache,
                                       extra={"tokens": stored})
        return [
            (seqs[rid] if not ignore_prompt else []) + done[rid]
            for rid in sorted(done)
        ]

    def _load_session_prefix(self, path: str, prompt: List[int]) -> int:
        """Restore a session file when its token prefix matches `prompt`;
        returns the usable cached-prefix length (0 = no match)."""
        if not os.path.exists(path):
            return 0
        cache, extra = serialization.load_session(
            path, self.engine.cache, with_extra=True
        )
        saved = list(extra.get("tokens", []))
        n = 0
        for a, b in zip(saved, prompt):
            if a != b:
                break
            n += 1
        n = min(n, len(prompt) - 1, int(np.asarray(cache.lengths)[0]))
        if n <= 0:
            return 0
        from .ops import kv_cache as kvc

        lengths = np.zeros((cache.batch,), np.int32)
        lengths[0] = n
        self.engine.cache = kvc.set_lengths(cache, jnp.asarray(lengths))
        return n

    def __call__(self, input_ids, **kw):
        """Return logits for a batch (parity: __init__.py:439-481; rows are
        right-padded with -inf like the reference pads shorter prompts)."""
        ids = self._to_list_batch(input_ids)
        b = len(ids)
        maxlen = max(len(p) for p in ids)
        from .models.transformer import forward
        from .ops import kv_cache as kvc

        eng = self.engine
        cache = kvc.init_cache(
            self.cfg.n_layers, b, max(maxlen + 1, 16), self.cfg.n_kv_heads,
            self.cfg.head_dim, eng.kv_dtype, eng.kv_quantized,
        )
        arr = np.zeros((b, maxlen), np.int32)
        lens = np.zeros((b,), np.int32)
        for i, p in enumerate(ids):
            arr[i, : len(p)] = p
            lens[i] = len(p)
        pos = jnp.arange(maxlen)[None, :].repeat(b, 0)
        glm = (jnp.asarray(lens) if self.cfg.rope_style == "chatglm"
               else None)
        logits, _ = forward(
            eng.params, self.cfg, jnp.asarray(arr), pos, cache,
            jnp.asarray(lens), glm_lens=glm,
        )
        out = np.array(logits)
        for i, p in enumerate(ids):  # -inf padding rows (parity :439-481)
            out[i, len(p):] = -np.inf
        return out

    @staticmethod
    def _to_list_batch(input_ids) -> List[List[int]]:
        if hasattr(input_ids, "tolist"):
            input_ids = input_ids.tolist()
        if input_ids and isinstance(input_ids[0], int):
            input_ids = [input_ids]
        return [list(p) for p in input_ids]

    # tokenizer conveniences ------------------------------------------
    def tokenize(self, text: str) -> List[int]:
        return self.tokenizer(text)["input_ids"]

    def detokenize(self, ids: Sequence[int]) -> str:
        return self.tokenizer.decode(list(ids))

    def quant_model(self, out_path: str) -> None:
        serialization.save_params(out_path, self.engine.params)

    def save_state(self, path: str) -> None:
        serialization.save_session(path, self.engine.cache)

    def load_state(self, path: str) -> None:
        self.engine.cache = serialization.load_session(
            path, self.engine.cache
        )


def ModelServer(engine_or_model, response_fn, **kw):
    """Parity wrapper (reference __init__.py:534-554)."""
    from .runtime.server import ModelServer as _MS

    eng = (engine_or_model.engine
           if isinstance(engine_or_model, Model) else engine_or_model)
    return _MS(eng, response_fn, **kw)


class AudioModel:
    """Whisper transcription API (parity: whisper_pybind Model —
    init_model + inference(wav), whisper_pybind.cpp:78,328)."""

    def __init__(self):
        self.model = None
        self.tokenizer = None

    def init(self, model_name: str, use_quant: bool = False,
             weight_dtype: str = "int8", group_size: int = 128):
        from transformers import AutoConfig

        from .convert import loaders
        from .models import whisper as W

        hf_cfg = AutoConfig.from_pretrained(
            model_name, trust_remote_code=True
        ).to_dict()
        sd = loaders.load_state_dict(model_name)
        qspec = None
        if use_quant:
            qspec = named_qspec(weight_dtype, group_size=group_size)
        params, cfg = W.convert_whisper(sd, hf_cfg, qspec)
        self.model = W.WhisperModel(params, cfg)
        try:
            from transformers import WhisperTokenizer

            self.tokenizer = WhisperTokenizer.from_pretrained(model_name)
        except Exception:
            self.tokenizer = None
        return self

    # whisper's language codes (whisper.cpp g_lang map order; "yue" is
    # the 100th language added with large-v3 tokenizers — probing a
    # token the tokenizer lacks is harmless, _lang_token_ids filters)
    LANGUAGES = (
        "en zh de es ru ko fr ja pt tr pl ca nl ar sv it id hi fi vi he "
        "uk el ms cs ro da hu ta no th ur hr bg lt la mi ml cy sk te fa "
        "lv bn sr az sl kn et mk br eu is hy ne mn bs kk sq sw gl mr pa "
        "si km sn yo so af oc ka be tg sd gu am yi lo uz fo ht ps tk nn "
        "mt sa lb my bo tl mg as tt haw ln ha ba jw su yue"
    ).split()

    def forced_ids(self, language: str = "en", task: str = "transcribe"):
        if self.tokenizer is None:
            return []
        ids = self.tokenizer.convert_tokens_to_ids(
            [f"<|{language}|>", f"<|{task}|>", "<|notimestamps|>"]
        )
        return [i for i in ids if i is not None and i >= 0]

    def _lang_token_ids(self):
        """(codes, vocab ids) for the language tokens present in the
        tokenizer (tiny test tokenizers may carry a subset)."""
        if self.tokenizer is None:
            return [], []
        codes, ids = [], []
        unk = getattr(self.tokenizer, "unk_token_id", None)
        for code in self.LANGUAGES:
            i = self.tokenizer.convert_tokens_to_ids(f"<|{code}|>")
            if i is not None and i >= 0 and i != unk:
                codes.append(code)
                ids.append(i)
        return codes, ids

    def detect_language(self, audio):
        """Language auto-detect (parity: whisper_lang_auto_detect /
        `params.language = nullptr`, reference whisper.cpp; option surface
        whisper.h:204-230).  Returns (best_code, {code: prob})."""
        if isinstance(audio, str):
            audio = load_wav(audio)
        codes, ids = self._lang_token_ids()
        if not ids:
            raise ValueError("tokenizer has no language tokens")
        states, enc_lens = self.model.encode_audio(audio)
        probs = self.model.detect_language(states, enc_lens, ids)
        dist = dict(zip(codes, probs.tolist()))
        return max(dist, key=dist.get), dist

    @staticmethod
    def _compression_ratio(data: bytes) -> float:
        """zlib compression ratio of the decoded text — whisper.cpp's
        repetition detector (highly repetitive loops compress absurdly
        well)."""
        import zlib

        if not data:
            return 0.0
        return len(data) / max(len(zlib.compress(data)), 1)

    def transcribe(self, audio, language: str = "en",
                   task: str = "transcribe", max_new_tokens: int = 224,
                   timestamps: bool = False,
                   temperature=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
                   compression_ratio_threshold: float = 2.4,
                   logprob_threshold: float = -1.0):
        """audio: float PCM @16kHz (numpy) or a .wav path.  With
        `timestamps=True` returns [(start_s, end_s, text)] segments.
        `language="auto"` runs language detection first (whisper.cpp
        auto-detect semantics).

        Temperature fallback (parity: whisper.cpp whisper_full's
        `temperature`/`temperature_inc` ladder with the
        compression-ratio and avg-logprob quality gates,
        whisper.h:204-230): decode greedily first; if the output is
        degenerate (compression ratio > threshold: repetition loop) or
        low-confidence (avg logprob < threshold), retry at the next
        temperature.  Pass a single float (or (t,)) to disable."""
        if isinstance(audio, str):
            audio = load_wav(audio)
        if isinstance(temperature, (int, float)):
            temperature = (float(temperature),)
        states = enc_lens = None
        if language == "auto":
            # encode ONCE and reuse the states for both detection and
            # transcription (whisper.cpp reuses the encoder output too)
            codes, ids_ = self._lang_token_ids()
            if not ids_:
                raise ValueError("tokenizer has no language tokens")
            states, enc_lens = self.model.encode_audio(audio)
            probs = self.model.detect_language(states, enc_lens, ids_)
            language = codes[int(np.argmax(probs))]
        forced = self.forced_ids(language, task)
        ts_begin = None
        if timestamps:
            forced = [t for t in forced
                      if self.tokenizer is None
                      or t != self.tokenizer.convert_tokens_to_ids(
                          "<|notimestamps|>")]
            ts_begin = (self.tokenizer.convert_tokens_to_ids("<|0.00|>")
                        if self.tokenizer is not None else 50364)
        if states is None:
            states, enc_lens = self.model.encode_audio(audio)
        ids = None
        for ti, temp in enumerate(temperature):
            ids = self.model.generate(states, enc_lens, forced,
                                      max_new_tokens,
                                      timestamp_begin=ts_begin,
                                      temperature=temp, seed=ti)
            if ti == len(temperature) - 1:
                break
            # quality gates (whisper.cpp decoder_should_retry semantics)
            if self.model.last_avg_logprob < logprob_threshold:
                continue
            if self.tokenizer is not None:
                text = self.tokenizer.decode(ids, skip_special_tokens=True)
                if self._compression_ratio(
                        text.encode()) > compression_ratio_threshold:
                    continue
            break
        if timestamps:
            segs = self.model.segments(ids, ts_begin)
            if self.tokenizer is None:
                return segs
            return [(t0, t1, self.tokenizer.decode(toks))
                    for t0, t1, toks in segs]
        if self.tokenizer is None:
            return ids
        return self.tokenizer.decode(ids, skip_special_tokens=True)


def load_wav(path: str) -> np.ndarray:
    """Minimal 16-bit PCM WAV reader @16kHz (parity: the reference bundles
    dr_wav.h for this; stdlib `wave` suffices)."""
    import wave

    with wave.open(path, "rb") as w:
        assert w.getsampwidth() == 2, "expect 16-bit PCM"
        rate = w.getframerate()
        data = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        if w.getnchannels() > 1:
            data = data.reshape(-1, w.getnchannels()).mean(axis=1)
    audio = data.astype(np.float32) / 32768.0
    if rate != 16000:  # naive linear resample
        n = int(len(audio) * 16000 / rate)
        audio = np.interp(
            np.linspace(0, len(audio) - 1, n),
            np.arange(len(audio)), audio,
        ).astype(np.float32)
    return audio
