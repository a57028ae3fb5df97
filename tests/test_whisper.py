"""Whisper golden tests vs HF transformers (parity: reference whisper.cpp
pipeline — mel front-end, encoder, cross-attention decoder, greedy ids)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from neural_speed_tpu.models import whisper as W
from neural_speed_tpu.ops import kv_cache as kvc
from neural_speed_tpu.ops.mel import log_mel_spectrogram


@pytest.fixture(scope="module")
def hf_whisper():
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    torch.manual_seed(0)
    cfg = WhisperConfig(
        d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        decoder_ffn_dim=128, encoder_ffn_dim=128, num_mel_bins=80,
        max_source_positions=1500, max_target_positions=448,
        vocab_size=51865,
    )
    m = WhisperForConditionalGeneration(cfg).eval()
    params, our_cfg = W.convert_whisper(m.state_dict(), cfg.to_dict())
    return m, params, our_cfg


@pytest.fixture(scope="module")
def features():
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    return log_mel_spectrogram(audio)


def test_mel_matches_hf(features):
    from transformers import WhisperFeatureExtractor

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    ref = WhisperFeatureExtractor()(audio, sampling_rate=16000,
                                    return_tensors="np")["input_features"][0]
    np.testing.assert_allclose(features, ref, atol=1e-4)


def test_encoder_matches_hf(hf_whisper, features):
    m, params, cfg = hf_whisper
    mel_t = torch.tensor(features)[None]
    with torch.no_grad():
        ref = m.model.encoder(mel_t).last_hidden_state.numpy()
    ours = np.asarray(W.encode(params, cfg, jnp.asarray(features)[None]))
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-3)


def test_decoder_logits_and_greedy_match_hf(hf_whisper, features):
    m, params, cfg = hf_whisper
    mel_t = torch.tensor(features)[None]
    dec_in = [cfg.decoder_start_token_id, 50259, 50359, 50363]

    with torch.no_grad():
        ref_logits = m(input_features=mel_t,
                       decoder_input_ids=torch.tensor([dec_in])
                       ).logits[0].numpy()

    states = W.encode(params, cfg, jnp.asarray(features)[None])
    enc_lens = jnp.full((1,), states.shape[1], jnp.int32)
    cross = tuple(W.cross_kv(params, cfg, states))
    cache = kvc.init_cache(cfg.decoder_layers, 1, 64, cfg.n_heads,
                           cfg.head_dim, jnp.float32)
    toks = jnp.asarray([dec_in], jnp.int32)
    pos = jnp.arange(len(dec_in))[None]
    logits, _ = W.decoder_forward(params, cfg, toks, pos, cache,
                                  jnp.full((1,), len(dec_in), jnp.int32),
                                  cross, enc_lens)
    np.testing.assert_allclose(np.asarray(logits[0]), ref_logits,
                               atol=5e-3, rtol=5e-3)

    # greedy continuation must match a raw HF greedy loop exactly
    # (m.generate injects whisper-specific suppress-token processors)
    n_new = 8
    hf_ids = list(dec_in)
    with torch.no_grad():
        for _ in range(n_new):
            lg = m(input_features=mel_t,
                   decoder_input_ids=torch.tensor([hf_ids])).logits
            hf_ids.append(int(lg[0, -1].argmax()))

    wm = W.WhisperModel(params, cfg)
    ours = wm.generate(states, enc_lens, dec_in[1:], max_new_tokens=n_new)
    assert ours == hf_ids[: len(ours)]


def test_audio_model_api(tmp_path, hf_whisper):
    """AudioModel end-to-end: wav file -> token ids (no tokenizer)."""
    import wave

    m, _, _ = hf_whisper
    ckpt = tmp_path / "tiny_whisper"
    m.save_pretrained(ckpt)

    rng = np.random.default_rng(1)
    pcm = (rng.standard_normal(16000) * 3000).astype(np.int16)
    wav_path = str(tmp_path / "t.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())

    from neural_speed_tpu.api import AudioModel

    am = AudioModel().init(str(ckpt))
    out = am.transcribe(wav_path, max_new_tokens=4)
    assert isinstance(out, (list, str))
    if isinstance(out, list):
        assert len(out) >= 5  # prefix + some tokens


def test_detect_language_matches_hf(hf_whisper, features):
    """Language auto-detect (whisper.cpp whisper_lang_auto_detect parity):
    the lang-token softmax from one SOT decoder step must match HF's
    logits for the same step."""
    m, params, cfg = hf_whisper
    wm = W.WhisperModel(params, cfg)
    states, enc_lens = jnp.asarray(features)[None], None
    enc = W.encode(params, cfg, states)
    enc_lens = jnp.full((1,), enc.shape[1], jnp.int32)
    lang_ids = list(range(50259, 50259 + 99))  # <|en|>..<|su|>
    probs = wm.detect_language(enc, enc_lens, lang_ids)
    assert probs.shape == (99,) and abs(probs.sum() - 1.0) < 1e-5

    with torch.no_grad():
        out = m(input_features=torch.tensor(features)[None],
                decoder_input_ids=torch.tensor(
                    [[cfg.decoder_start_token_id]]))
    ref = out.logits[0, 0].numpy()[np.asarray(lang_ids)]
    ref = np.exp(ref - ref.max())
    ref = ref / ref.sum()
    np.testing.assert_allclose(probs, ref, atol=2e-3)
    assert int(np.argmax(probs)) == int(np.argmax(ref))


def test_temperature_sampling_and_logprob(hf_whisper, features):
    """Temperature > 0 samples (whisper.cpp fallback-ladder rungs);
    temperature 0 stays greedy and records avg logprob of chosen ids."""
    m, params, cfg = hf_whisper
    wm = W.WhisperModel(params, cfg)
    enc = W.encode(params, cfg, jnp.asarray(features)[None])
    enc_lens = jnp.full((1,), enc.shape[1], jnp.int32)
    dec_in = [50259, 50359, 50363]
    g0 = wm.generate(enc, enc_lens, dec_in, 8, temperature=0.0)
    g0b = wm.generate(enc, enc_lens, dec_in, 8, temperature=0.0)
    assert g0 == g0b                       # greedy is deterministic
    assert wm.last_avg_logprob <= 0.0      # a real logprob
    s1 = wm.generate(enc, enc_lens, dec_in, 8, temperature=1.0, seed=1)
    s2 = wm.generate(enc, enc_lens, dec_in, 8, temperature=1.0, seed=2)
    # near-uniform random-model logits: different seeds should diverge
    assert s1 != s2 or s1 != g0


def test_transcribe_temperature_fallback(hf_whisper, tmp_path):
    """AudioModel.transcribe retries at higher temperature when the
    avg-logprob gate fails (logprob_threshold=0.0 always fails: every
    rung runs; a permissive threshold accepts the greedy rung)."""
    import neural_speed_tpu.api as api

    m, params, cfg = hf_whisper
    am = api.AudioModel()
    am.model = W.WhisperModel(params, cfg)
    am.tokenizer = None
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    greedy = am.transcribe(audio, language="en", max_new_tokens=6,
                           temperature=0.0)
    accepted = am.transcribe(audio, language="en", max_new_tokens=6,
                             temperature=(0.0, 0.5),
                             logprob_threshold=-1e9)
    assert accepted == greedy              # gate passes -> greedy kept
    forced_retry = am.transcribe(audio, language="en", max_new_tokens=6,
                                 temperature=(0.0, 1.0),
                                 logprob_threshold=0.0)
    assert isinstance(forced_retry, list)  # ladder exhausted -> last rung
    # compression-ratio helper: repetitive text compresses well
    assert api.AudioModel._compression_ratio(b"ab" * 200) > 2.4
    assert api.AudioModel._compression_ratio(
        np.random.default_rng(0).bytes(400)) < 1.2


def test_timestamp_rules(hf_whisper, features):
    """Timestamp decoding obeys the whisper rules: pairs, monotone, text
    between pairs; segments() splits them."""
    m, params, cfg = hf_whisper
    wm = W.WhisperModel(params, cfg)
    ts_begin = 50364  # <|0.00|> in the standard whisper vocab
    states, enc_lens = wm.encode_audio(
        np.random.default_rng(0).standard_normal(16000).astype(np.float32)
        * 0.1
    )
    ids = wm.generate(states, enc_lens, [50259, 50359],
                      max_new_tokens=24, timestamp_begin=ts_begin)
    gen = ids[3:]  # skip prefix
    # rule check: a timestamp opening a pair is followed by a >= timestamp
    # eventually, and timestamps never decrease
    ts = [t for t in gen if t >= ts_begin and t != cfg.eos_token_id]
    assert ts == sorted(ts)
    segs = wm.segments(gen, ts_begin)
    for (t0, t1, toks) in segs:
        assert t1 >= t0
        assert all(tok < ts_begin for tok in toks)


def test_whisper_beam(hf_whisper, features):
    """Beam search: beam=1 == greedy; beam=3 returns a hypothesis whose
    total logprob is >= the greedy path's."""
    m, params, cfg = hf_whisper
    wm = W.WhisperModel(params, cfg)
    states, enc_lens = wm.encode_audio(
        np.random.default_rng(2).standard_normal(16000).astype(np.float32)
        * 0.1
    )
    forced = [50259, 50359, 50363]
    greedy = wm.generate(states, enc_lens, forced, max_new_tokens=10)
    b1 = wm.generate_beam(states, enc_lens, forced, num_beams=1,
                          max_new_tokens=10)
    assert b1 == greedy

    def score(ids):
        import torch
        with torch.no_grad():
            lg = m(input_features=torch.tensor(np.asarray(
                       features))[None],
                   decoder_input_ids=torch.tensor([ids[:-1]])).logits[0]
        lp = torch.log_softmax(lg.float(), -1)
        start = len(forced)  # skip scoring the forced prefix
        return sum(float(lp[i, ids[i + 1]]) for i in range(start, len(ids) - 1))

    b3 = wm.generate_beam(states, enc_lens, forced, num_beams=3,
                          max_new_tokens=10)
    assert score(b3) >= score(greedy) - 1e-4


def test_quantized_whisper_matches_fp(hf_whisper, features):
    """use_quant whisper (audio_run --use_quant / AudioModel.init(
    use_quant=True) path): int8-quantized encoder+decoder greedy ids
    match the fp pipeline's first tokens on a random-init model (parity:
    whisper_model_quantize, quant_utils.cpp:79)."""
    from neural_speed_tpu.ops.qtypes import named_qspec

    m, params, cfg = hf_whisper
    qparams, qcfg = W.convert_whisper(
        m.state_dict(), m.config.to_dict(),
        named_qspec("int8", group_size=128),
    )
    states = W.encode(params, cfg, jnp.asarray(features)[None])
    qstates = W.encode(qparams, qcfg, jnp.asarray(features)[None])
    enc_lens = jnp.full((1,), states.shape[1], jnp.int32)
    fp_ids = W.WhisperModel(params, cfg).generate(
        states, enc_lens, [], max_new_tokens=6)
    q_ids = W.WhisperModel(qparams, qcfg).generate(
        qstates, enc_lens, [], max_new_tokens=6)
    # int8 g128 on random-init weights: the leading tokens must agree
    assert fp_ids[:3] == q_ids[:3], (fp_ids, q_ids)
