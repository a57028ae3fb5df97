"""CLI smoke tests: the scripts/ entry points must run end-to-end
(parity: the reference's scripts/ are its primary user surface —
run.py / inference.py / quantize.py; SURVEY §2.6).

Each test shells out with a clean PYTHONPATH (no axon sitecustomize) and
JAX_PLATFORMS=cpu so the subprocess uses the CPU backend."""

import os
import subprocess
import sys

import pytest
import torch
from transformers import LlamaConfig, LlamaForCausalLM

import neural_speed_tpu.convert.gguf as G

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts")


@pytest.fixture(scope="module")
def tiny_gguf(tmp_path_factory):
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, max_position_embeddings=128,
    )
    torch.manual_seed(0)
    with torch.no_grad():
        m = LlamaForCausalLM(cfg)
    path = str(tmp_path_factory.mktemp("gguf") / "tiny.gguf")
    tokens = ["<unk>", "<s>", "</s>"] + [f"▁t{i}" for i in range(253)]
    G.write_hf_to_gguf(dict(m.state_dict()), cfg.to_dict(), path,
                       ggml_type=G.GGML_Q8_0, tokens=tokens)
    return path


def _run(script, *args, timeout=420):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO          # drop the axon sitecustomize path
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("NEURAL_SPEED_VERBOSE", None)
    r = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, script), *args],
        capture_output=True, text=True, timeout=timeout, env=env,
    )
    assert r.returncode == 0, (script, r.stdout[-2000:], r.stderr[-2000:])
    return r.stdout


def test_run_py_gguf_greedy(tiny_gguf):
    out = _run("run.py", tiny_gguf, "--prompt_ids", "1,5,9,17",
               "-n", "4", "--ctx_size", "64")
    assert out.strip()  # generated text emitted


def test_inference_py_speculative_and_sampling(tiny_gguf):
    out = _run("inference.py", "-m", tiny_gguf, "--prompt_ids", "1,5,9,17",
               "-n", "6", "--ctx_size", "64", "--speculative")
    assert out.strip()
    out = _run("inference.py", "-m", tiny_gguf, "--prompt_ids", "1,5,9,17",
               "-n", "4", "--ctx_size", "64", "--do_sample",
               "--memory_dtype", "int8", "--seed", "3")
    assert out.strip()


@pytest.fixture(scope="module")
def tiny_hf_dir(tmp_path_factory):
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, max_position_embeddings=128,
    )
    torch.manual_seed(1)
    with torch.no_grad():
        m = LlamaForCausalLM(cfg)
    d = str(tmp_path_factory.mktemp("hf") / "tiny_llama")
    m.save_pretrained(d)
    return d


def test_convert_py_npz_roundtrip(tiny_hf_dir, tmp_path):
    """convert.py → packed npz → Model.init_from_bin greedy runs."""
    out = str(tmp_path / "tiny_int4.npz")
    _run("convert.py", tiny_hf_dir, "--outfile", out, "--quantize",
         "--weight_dtype", "int4", "--group_size", "32")
    assert os.path.exists(out)
    from transformers import AutoConfig

    from neural_speed_tpu.api import Model
    from neural_speed_tpu.models.configs import arch_from_hf_config

    cfg = arch_from_hf_config(
        AutoConfig.from_pretrained(tiny_hf_dir).to_dict())
    m = Model().init_from_bin(cfg, out, ctx_size=64)
    toks = m.generate([[1, 5, 9]], max_new_tokens=4, do_sample=False,
                      ignore_prompt=True)[0]
    assert len(toks) == 4


def test_convert_py_gguf(tiny_hf_dir, tmp_path):
    """convert.py --format gguf writes a loadable GGUF."""
    out = str(tmp_path / "tiny.gguf")
    _run("convert.py", tiny_hf_dir, "--outfile", out, "--format", "gguf",
         "--gguf_type", "q8_0")
    from neural_speed_tpu.api import Model

    m = Model().init_from_gguf(out, ctx_size=64)
    toks = m.generate([[1, 5, 9]], max_new_tokens=4, do_sample=False,
                      ignore_prompt=True)[0]
    assert len(toks) == 4


def test_example_scripts_importable():
    """The example/helper scripts parse + fail with usage (not crash)
    when run without a model — their import path must be clean."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    for script in ("python_api_example_for_gguf.py",
                   "python_api_example_for_gptq.py",
                   "python_api_example_for_model_server.py",
                   "whisper_example.py", "huggingface.py"):
        r = subprocess.run(
            [sys.executable, os.path.join(SCRIPTS, script)],
            capture_output=True, text=True, timeout=120, env=env,
        )
        # usage exit (SystemExit string/argparse) — anything else is a bug
        assert r.returncode in (1, 2), (script, r.stderr[-500:])
        assert "Traceback" not in r.stderr, (script, r.stderr[-800:])


def test_latency_harness_small():
    import json

    out = _run("latency_harness.py", "--small", "--ctx", "64",
               "--in_lens", "8", "--out_len", "4", "--iters", "2")
    lines = [ln for ln in out.splitlines() if ln.strip().startswith("{")]
    assert lines
    recs = [json.loads(ln) for ln in lines]
    assert any("p50" in json.dumps(r) for r in recs), recs
