"""Whisper encoder-decoder (parity: the reference's whisper family —
neural_speed/models/whisper/whisper.cpp: conv1d x2 front-end, sinusoid-free
learned positions, cross-attention decoder, greedy/beam transcription; mel
front-end lives in ops/mel.py).

TPU-native design: the encoder is one jitted function (full bidirectional
attention, static 1500-frame source length); the decoder reuses the shared
KV cache (ops/kv_cache.py) for self-attention, while cross-attention K/V
are projected once per utterance from the encoder states.  All linears go
through transformer.linear, so they quantize like the text models.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import kv_cache as kvc
from ..ops.attention import attention, attention_cache
from ..ops.norms import layer_norm
from .transformer import linear

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int = 51865
    d_model: int = 384
    n_heads: int = 6
    encoder_layers: int = 4
    decoder_layers: int = 4
    ffn_dim: int = 1536
    num_mel_bins: int = 80
    max_source_positions: int = 1500
    max_target_positions: int = 448
    decoder_start_token_id: int = 50258
    eos_token_id: int = 50257
    norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


def whisper_config_from_hf(hf: Dict[str, Any]) -> WhisperConfig:
    return WhisperConfig(
        vocab_size=hf["vocab_size"],
        d_model=hf["d_model"],
        n_heads=hf["encoder_attention_heads"],
        encoder_layers=hf["encoder_layers"],
        decoder_layers=hf["decoder_layers"],
        ffn_dim=hf["encoder_ffn_dim"],
        num_mel_bins=hf["num_mel_bins"],
        max_source_positions=hf["max_source_positions"],
        max_target_positions=hf["max_target_positions"],
        decoder_start_token_id=hf.get("decoder_start_token_id", 50258),
        eos_token_id=hf.get("eos_token_id", 50257),
    )


def _norm(x, p, eps):
    return layer_norm(x, p["weight"], p.get("bias"), eps)


def _mha(x_q, x_kv, p, cfg: WhisperConfig, positions, kv_lens, causal):
    """Projection + attention for encoder/cross blocks (no cache)."""
    b, t, _ = x_q.shape
    s = x_kv.shape[1]
    h, d = cfg.n_heads, cfg.head_dim
    q = linear(x_q, p["q"]).reshape(b, t, h, d)
    k = linear(x_kv, p["k"]).reshape(b, s, h, d)
    v = linear(x_kv, p["v"]).reshape(b, s, h, d)
    out = attention(q, k, v, positions, kv_lens,
                    scale=1.0 / math.sqrt(d), causal=causal)
    return linear(out.reshape(b, t, h * d), p["o"])


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode(params: Params, cfg: WhisperConfig, mel: jax.Array) -> jax.Array:
    """mel [B, n_mels, frames] -> encoder states [B, frames//2, D].

    Parity: whisper.cpp encoder — conv1d(k3,p1)+gelu, conv1d(k3,s2,p1)+gelu,
    +learned positions, pre-LN self-attention blocks, final LN."""
    enc = params["encoder"]
    x = mel.astype(jnp.float32)

    def conv1d(x, p, stride):
        # x [B, C_in, T]; w [C_out, C_in, 3]
        w = p["w"].astype(jnp.float32)
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=(stride,), padding=((1, 1),),
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        return out + p["b"].astype(jnp.float32)[None, :, None]

    x = jax.nn.gelu(conv1d(x, enc["conv1"], 1), approximate=False)
    x = jax.nn.gelu(conv1d(x, enc["conv2"], 2), approximate=False)
    x = x.transpose(0, 2, 1)  # [B, T, D]
    t = x.shape[1]
    x = x + enc["pos"][:t][None].astype(x.dtype)

    b = x.shape[0]
    positions = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
    kv_lens = jnp.full((b,), t, jnp.int32)
    for lp in enc["layers"]:
        h = _norm(x, lp["attn_norm"], cfg.norm_eps)
        x = x + _mha(h, h, lp["attn"], cfg, positions, kv_lens, causal=False)
        h = _norm(x, lp["ffn_norm"], cfg.norm_eps)
        h = jax.nn.gelu(linear(h, lp["fc1"]), approximate=False)
        x = x + linear(h, lp["fc2"])
    return _norm(x, enc["final_norm"], cfg.norm_eps)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def cross_kv(params: Params, cfg: WhisperConfig,
             enc_states: jax.Array) -> List[Tuple[jax.Array, jax.Array]]:
    """Project per-layer cross-attention K/V once per utterance (parity:
    whisper.cpp caches cross K/V after encode)."""
    b, s, _ = enc_states.shape
    h, d = cfg.n_heads, cfg.head_dim
    out = []
    for lp in params["decoder"]["layers"]:
        k = linear(enc_states, lp["cross"]["k"]).reshape(b, s, h, d)
        v = linear(enc_states, lp["cross"]["v"]).reshape(b, s, h, d)
        out.append((k, v))
    return out


@functools.partial(jax.jit, static_argnames=("cfg",),
                   donate_argnames=("cache",))
def decoder_forward(
    params: Params,
    cfg: WhisperConfig,
    tokens: jax.Array,            # [B, T]
    positions: jax.Array,         # [B, T]
    cache: kvc.KVCache,           # self-attn cache (decoder_layers deep)
    kv_lens: jax.Array,           # [B] self-attn lengths AFTER this step
    cross: Tuple,                 # per-layer (k, v) from cross_kv
    enc_lens: jax.Array,          # [B] encoder frame counts
) -> Tuple[jax.Array, kvc.KVCache]:
    dec = params["decoder"]
    b, t = tokens.shape
    h, d = cfg.n_heads, cfg.head_dim
    x = jnp.take(dec["embed"], tokens, axis=0).astype(jnp.float32)
    pos_emb = jnp.take(dec["pos"],
                       jnp.clip(positions, 0, cfg.max_target_positions - 1),
                       axis=0)
    x = x + pos_emb.astype(x.dtype)

    for i, lp in enumerate(dec["layers"]):
        # causal self-attention over the cache
        hh = _norm(x, lp["attn_norm"], cfg.norm_eps)
        q = linear(hh, lp["attn"]["q"]).reshape(b, t, h, d)
        k = linear(hh, lp["attn"]["k"]).reshape(b, t, h, d)
        v = linear(hh, lp["attn"]["v"]).reshape(b, t, h, d)
        cache = kvc.append_layer(cache, i, k, v, positions)
        a = attention_cache(q, cache, i, positions, kv_lens,
                            scale=1.0 / math.sqrt(d), causal=True,
                            out_dtype=x.dtype)
        x = x + linear(a.reshape(b, t, h * d), lp["attn"]["o"])

        # cross-attention over encoder states
        hh = _norm(x, lp["cross_norm"], cfg.norm_eps)
        qc = linear(hh, lp["cross"]["q"]).reshape(b, t, h, d)
        ck, cv = cross[i]
        a = attention(qc, ck, cv, positions, enc_lens,
                      scale=1.0 / math.sqrt(d), causal=False,
                      out_dtype=x.dtype)
        x = x + linear(a.reshape(b, t, h * d), lp["cross"]["o"])

        hh = _norm(x, lp["ffn_norm"], cfg.norm_eps)
        hh = jax.nn.gelu(linear(hh, lp["fc1"]), approximate=False)
        x = x + linear(hh, lp["fc2"])

    x = _norm(x, dec["final_norm"], cfg.norm_eps)
    logits = linear(x, params["proj_out"])
    return logits, cache


# ---------------------------------------------------------------------------
# generation
# ---------------------------------------------------------------------------


class WhisperModel:
    """User-facing transcription model (parity: whisper_pybind Model +
    audio_run flows)."""

    def __init__(self, params: Params, cfg: WhisperConfig):
        self.params = params
        self.cfg = cfg

    # -- audio -> encoder states --------------------------------------
    def encode_audio(self, audio: np.ndarray) -> Tuple[jax.Array, jax.Array]:
        from ..ops.mel import log_mel_spectrogram

        mel = log_mel_spectrogram(np.asarray(audio))
        mel = jnp.asarray(mel)[None]
        states = encode(self.params, self.cfg, mel)
        enc_lens = jnp.full((1,), states.shape[1], jnp.int32)
        return states, enc_lens

    def generate(self, enc_states, enc_lens, forced_ids: List[int],
                 max_new_tokens: int = 128,
                 timestamp_begin: Optional[int] = None,
                 temperature: float = 0.0,
                 seed: int = 0) -> List[int]:
        """Decode given the forced decoder prefix
        (<|startoftranscript|> [lang] [task] ...) — greedy at
        temperature 0, softmax sampling above (the whisper.cpp
        temperature-fallback ladder's sampled rungs; whisper.h:204-230
        `temperature` / `temperature_inc`).

        `timestamp_begin`: vocab id of <|0.00|> enables timestamp decoding
        with the whisper rules (parity: the reference's timestamp decoding,
        whisper.cpp): timestamps are emitted in non-decreasing pairs, and a
        timestamp is forced whenever the total timestamp probability
        exceeds the best text token.  Tracks per-token logprobs of the
        chosen ids in `self.last_avg_logprob` (fallback quality gate)."""
        self._rng = np.random.default_rng(seed)
        self._logprobs: List[float] = []
        cfg = self.cfg
        b = enc_states.shape[0]
        cache = kvc.init_cache(cfg.decoder_layers, b,
                               cfg.max_target_positions, cfg.n_heads,
                               cfg.head_dim, jnp.float32)
        cross = tuple(cross_kv(self.params, cfg, enc_states))

        prefix = [cfg.decoder_start_token_id] + list(forced_ids)
        toks = jnp.asarray([prefix] * b, jnp.int32)
        pos = jnp.broadcast_to(jnp.arange(len(prefix))[None],
                               (b, len(prefix)))
        kv_lens = jnp.full((b,), len(prefix), jnp.int32)
        logits, cache = decoder_forward(
            self.params, cfg, toks, pos, cache, kv_lens, cross, enc_lens
        )
        cache = kvc.set_lengths(cache, kv_lens)
        out = list(prefix)
        tok = self._pick(logits[0, -1], out, timestamp_begin, temperature)
        for _ in range(max_new_tokens):
            out.append(tok)
            if tok == cfg.eos_token_id:
                break
            n = cache.lengths
            pos = n[:, None]
            kv_lens = n + 1
            logits, cache = decoder_forward(
                self.params, cfg, jnp.full((b, 1), tok, jnp.int32), pos,
                cache, kv_lens, cross, enc_lens
            )
            cache = kvc.set_lengths(cache, kv_lens)
            tok = self._pick(logits[0, -1], out, timestamp_begin,
                             temperature)
        # average ONLY the kept tokens' logprobs: when the loop exhausts
        # max_new_tokens the trailing _pick's token is discarded, and its
        # (already-recorded) logprob must not sway the fallback gate
        kept = len(out) - len(prefix)
        self.last_avg_logprob = (float(np.mean(self._logprobs[:kept]))
                                 if kept > 0 else 0.0)
        return out

    def _finish(self, lg: np.ndarray, temperature: float) -> int:
        """Pick from rule-masked logits (greedy or sampled) and record
        the chosen token's logprob under the UNTEMPERED distribution
        (whisper.cpp's avg-logprob quality gate)."""
        x = lg - lg.max()
        logz = np.log(np.exp(x[np.isfinite(x)]).sum())
        if temperature <= 0.0:
            tok = int(np.argmax(lg))
        else:
            xt = (lg - lg.max()) / temperature
            p = np.where(np.isfinite(xt), np.exp(xt), 0.0)
            p = p / p.sum()
            tok = int(self._rng.choice(len(p), p=p))
        self._logprobs.append(float(x[tok] - logz))
        return tok

    def _pick(self, logits, generated: List[int],
              ts_begin: Optional[int], temperature: float = 0.0) -> int:
        """Greedy argmax (or sampled at temperature > 0), with the whisper
        timestamp rules applied when timestamp decoding is on."""
        if ts_begin is None:
            return self._finish(np.asarray(logits, np.float32).copy(),
                                temperature)
        lg = np.asarray(logits, np.float32).copy()
        last_was_ts = bool(generated) and generated[-1] >= ts_begin
        penul_was_ts = len(generated) > 1 and generated[-2] >= ts_begin
        if last_was_ts and not penul_was_ts:
            # second of a pair: must be a timestamp (same or later)
            lg[: generated[-1]] = -np.inf
            return self._finish(lg, temperature)
        if last_was_ts and penul_was_ts:
            # a closed pair: next must be text or EOS
            lg[ts_begin:] = -np.inf
            return self._finish(lg, temperature)
        # monotonicity: never go back before the latest timestamp
        latest = max((t for t in generated if t >= ts_begin),
                     default=ts_begin)
        lg[ts_begin:latest] = -np.inf
        # force a timestamp when the timestamp mass beats the best text tok
        x = lg - lg.max()
        probs = np.exp(x) / np.exp(x).sum()
        if probs[ts_begin:].sum() > probs[: ts_begin].max():
            lg[: ts_begin] = -np.inf
        return self._finish(lg, temperature)

    def segments(self, ids: List[int], timestamp_begin: int,
                 time_precision: float = 0.02):
        """Split timestamped output into (start_s, end_s, token_ids)
        segments."""
        segs = []
        start = None
        buf: List[int] = []
        for t in ids:
            if t >= timestamp_begin:
                ts = (t - timestamp_begin) * time_precision
                if start is None:
                    start = ts
                else:
                    segs.append((start, ts, buf))
                    start, buf = None, []
            elif start is not None:
                buf.append(t)
        return segs

    def transcribe_ids(self, audio: np.ndarray, forced_ids: List[int],
                       max_new_tokens: int = 224) -> List[int]:
        states, enc_lens = self.encode_audio(audio)
        return self.generate(states, enc_lens, forced_ids, max_new_tokens)

    def detect_language(self, enc_states, enc_lens,
                        lang_ids: List[int]) -> np.ndarray:
        """Language auto-detect (parity: whisper.cpp
        whisper_lang_auto_detect / whisper_full with params.language ==
        nullptr, whisper.h:204-230): one decoder step from
        <|startoftranscript|>, softmax restricted to the language tokens.
        Returns probabilities aligned with `lang_ids`."""
        cfg = self.cfg
        b = enc_states.shape[0]
        cache = kvc.init_cache(cfg.decoder_layers, b,
                               cfg.max_target_positions, cfg.n_heads,
                               cfg.head_dim, jnp.float32)
        cross = tuple(cross_kv(self.params, cfg, enc_states))
        toks = jnp.full((b, 1), cfg.decoder_start_token_id, jnp.int32)
        pos = jnp.zeros((b, 1), jnp.int32)
        kv_lens = jnp.ones((b,), jnp.int32)
        logits, _ = decoder_forward(
            self.params, cfg, toks, pos, cache, kv_lens, cross, enc_lens
        )
        lg = np.asarray(logits[0, 0], np.float32)[np.asarray(lang_ids)]
        x = lg - lg.max()
        p = np.exp(x)
        return p / p.sum()


# ---------------------------------------------------------------------------
# HF converter
# ---------------------------------------------------------------------------


def convert_whisper(sd: Dict[str, Any], hf_cfg: Dict[str, Any],
                    qspec=None) -> Tuple[Params, WhisperConfig]:
    """HF WhisperForConditionalGeneration state dict -> params (parity:
    convert pipeline for the whisper family)."""
    cfg = whisper_config_from_hf(hf_cfg)

    def np_(t):
        import torch

        if isinstance(t, torch.Tensor):
            return t.detach().to(torch.float32).numpy()
        return np.asarray(t, np.float32)

    def lin(prefix, has_bias=True):
        w = np_(sd[prefix + ".weight"]).T  # [in, out]
        b = (jnp.asarray(np_(sd[prefix + ".bias"]))
             if has_bias and prefix + ".bias" in sd else None)
        if qspec is not None and min(w.shape) >= qspec.effective_group(
                w.shape[0]):
            from ..ops.quantize import quantize

            p = {"w": quantize(jnp.asarray(w), qspec)}
        else:
            p = {"w": jnp.asarray(w, jnp.float32)}
        if b is not None:
            p["b"] = b
        return p

    def nrm(prefix):
        return {"weight": jnp.asarray(np_(sd[prefix + ".weight"])),
                "bias": jnp.asarray(np_(sd[prefix + ".bias"]))}

    enc_layers = []
    for i in range(cfg.encoder_layers):
        p = f"model.encoder.layers.{i}"
        enc_layers.append({
            "attn_norm": nrm(p + ".self_attn_layer_norm"),
            "attn": {
                "q": lin(p + ".self_attn.q_proj"),
                "k": lin(p + ".self_attn.k_proj", has_bias=False),
                "v": lin(p + ".self_attn.v_proj"),
                "o": lin(p + ".self_attn.out_proj"),
            },
            "ffn_norm": nrm(p + ".final_layer_norm"),
            "fc1": lin(p + ".fc1"),
            "fc2": lin(p + ".fc2"),
        })
    dec_layers = []
    for i in range(cfg.decoder_layers):
        p = f"model.decoder.layers.{i}"
        dec_layers.append({
            "attn_norm": nrm(p + ".self_attn_layer_norm"),
            "attn": {
                "q": lin(p + ".self_attn.q_proj"),
                "k": lin(p + ".self_attn.k_proj", has_bias=False),
                "v": lin(p + ".self_attn.v_proj"),
                "o": lin(p + ".self_attn.out_proj"),
            },
            "cross_norm": nrm(p + ".encoder_attn_layer_norm"),
            "cross": {
                "q": lin(p + ".encoder_attn.q_proj"),
                "k": lin(p + ".encoder_attn.k_proj", has_bias=False),
                "v": lin(p + ".encoder_attn.v_proj"),
                "o": lin(p + ".encoder_attn.out_proj"),
            },
            "ffn_norm": nrm(p + ".final_layer_norm"),
            "fc1": lin(p + ".fc1"),
            "fc2": lin(p + ".fc2"),
        })

    embed = jnp.asarray(np_(sd["model.decoder.embed_tokens.weight"]))
    params: Params = {
        "encoder": {
            "conv1": {"w": jnp.asarray(np_(sd["model.encoder.conv1.weight"])),
                      "b": jnp.asarray(np_(sd["model.encoder.conv1.bias"]))},
            "conv2": {"w": jnp.asarray(np_(sd["model.encoder.conv2.weight"])),
                      "b": jnp.asarray(np_(sd["model.encoder.conv2.bias"]))},
            "pos": jnp.asarray(
                np_(sd["model.encoder.embed_positions.weight"])),
            "layers": enc_layers,
            "final_norm": nrm("model.encoder.layer_norm"),
        },
        "decoder": {
            "embed": embed,
            "pos": jnp.asarray(
                np_(sd["model.decoder.embed_positions.weight"])),
            "layers": dec_layers,
            "final_norm": nrm("model.decoder.layer_norm"),
        },
        # proj_out is tied to the token embedding in whisper
        "proj_out": {"w": embed.T},
    }
    return params, cfg


def _log_softmax(x):
    x = x - jnp.max(x, axis=-1, keepdims=True)
    return x - jnp.log(jnp.sum(jnp.exp(x), axis=-1, keepdims=True))


class _WhisperBeam:
    pass  # namespace marker (kept minimal; see WhisperModel.generate_beam)


def _beam_generate(model: "WhisperModel", enc_states, enc_lens,
                   forced_ids, num_beams: int, max_new_tokens: int,
                   length_penalty: float = 1.0):
    """Beam search for whisper (parity: whisper.cpp beam decoding strategy).

    The encoder states are shared across beams; the decoder self-KV cache
    runs with batch=num_beams and beams reorder via the gather-based
    kv_cache.reorder (no copies)."""
    cfg = model.cfg
    eos = cfg.eos_token_id
    prefix = [cfg.decoder_start_token_id] + list(forced_ids)

    states = jnp.repeat(enc_states, num_beams, axis=0)
    lens = jnp.repeat(enc_lens, num_beams, axis=0)
    cross = tuple(cross_kv(model.params, cfg, states))
    cache = kvc.init_cache(cfg.decoder_layers, num_beams,
                           cfg.max_target_positions, cfg.n_heads,
                           cfg.head_dim, jnp.float32)

    toks = jnp.asarray([prefix] * num_beams, jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(len(prefix))[None],
                           (num_beams, len(prefix)))
    kv_lens = jnp.full((num_beams,), len(prefix), jnp.int32)
    logits, cache = decoder_forward(model.params, cfg, toks, pos, cache,
                                    kv_lens, cross, lens)
    cache = kvc.set_lengths(cache, kv_lens)

    logp = np.asarray(_log_softmax(logits[:, -1].astype(jnp.float32)))
    beams = [list(prefix) for _ in range(num_beams)]
    # first expansion: top beams from beam 0 only (all identical so far)
    top = np.argsort(-logp[0])[:num_beams]
    scores = logp[0][top].astype(np.float64)
    nxt = [int(t) for t in top]
    finished: list = []

    for _ in range(max_new_tokens):
        for i in range(num_beams):
            beams[i] = beams[i] + [nxt[i]]
        live = [i for i in range(num_beams) if nxt[i] != eos]
        for i in range(num_beams):
            if nxt[i] == eos:
                lp = scores[i] / (len(beams[i]) - len(prefix)) ** (
                    length_penalty)
                finished.append((lp, beams[i]))
        if not live or len(finished) >= num_beams:
            break

        n = cache.lengths
        pos1 = n[:, None]
        new_len = n + 1  # computed BEFORE the call: `cache` is donated
        logits, cache = decoder_forward(
            model.params, cfg, jnp.asarray(nxt, jnp.int32)[:, None],
            pos1, cache, new_len, cross, lens,
        )
        cache = kvc.set_lengths(cache, new_len)
        logp = np.asarray(_log_softmax(logits[:, 0].astype(jnp.float32)))

        cand = []
        for i in live:
            top = np.argsort(-logp[i])[: 2 * num_beams]
            for t in top:
                cand.append((scores[i] + float(logp[i][t]), i, int(t)))
        cand.sort(key=lambda c: -c[0])
        cand = cand[:num_beams]
        src = np.asarray([c[1] for c in cand], np.int32)
        # pad the beam set if fewer live candidates than beams
        while len(cand) < num_beams:
            cand.append(cand[-1])
            src = np.append(src, src[-1])
        cache = kvc.reorder(cache, jnp.asarray(src))
        beams = [list(beams[c[1]]) for c in cand]
        scores = np.asarray([c[0] for c in cand])
        nxt = [c[2] for c in cand]

    if not finished:
        for i in range(num_beams):
            lp = scores[i] / max(len(beams[i]) - len(prefix), 1) ** (
                length_penalty)
            finished.append((lp, beams[i]))
    finished.sort(key=lambda f: -f[0])
    return finished[0][1]


WhisperModel.generate_beam = (
    lambda self, enc_states, enc_lens, forced_ids, num_beams=4,
    max_new_tokens=128, length_penalty=1.0: _beam_generate(
        self, enc_states, enc_lens, forced_ids, num_beams, max_new_tokens,
        length_penalty)
)
