"""Checkpoint loaders: HF safetensors / torch bins -> state dict.

Parity: the lazy tensor loading layer of the reference converters
(convert/convert_llama.py lazy tensor lib + convert/common.py
load_hf_model).  Zero-egress friendly: local paths only (hub downloads are
delegated to `transformers` if the environment allows them).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict

import numpy as np


def load_state_dict(model_name_or_path: str) -> Dict[str, Any]:
    path = model_name_or_path
    if os.path.isdir(path):
        st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
        if st_files:
            return _load_safetensors(st_files)
        pt_files = sorted(glob.glob(os.path.join(path, "pytorch_model*.bin")))
        if pt_files:
            return _load_torch_bins(pt_files)
        raise FileNotFoundError(f"no checkpoint files under {path}")
    # fall back to transformers (may hit the hub cache)
    import torch
    from transformers import AutoModelForCausalLM

    m = AutoModelForCausalLM.from_pretrained(
        model_name_or_path, torch_dtype=torch.float32,
        trust_remote_code=True, low_cpu_mem_usage=True,
    )
    return dict(m.state_dict())


def _load_safetensors(files) -> Dict[str, Any]:
    from safetensors import safe_open

    out: Dict[str, Any] = {}
    for f in files:
        with safe_open(f, framework="np") as sf:
            for key in sf.keys():
                t = sf.get_tensor(key)
                if t.dtype == np.dtype("void") or str(t.dtype) == "bfloat16":
                    t = t.astype(np.float32)
                out[key] = t
    return out


def _load_torch_bins(files) -> Dict[str, Any]:
    import torch

    out: Dict[str, Any] = {}
    for f in files:
        sd = torch.load(f, map_location="cpu", weights_only=True)
        out.update(sd)
    return out
