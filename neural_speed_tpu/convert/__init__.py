"""Model conversion entry points.

Parity: neural_speed/convert/__init__.py:32-56 `convert_model` — dispatch by
source format (HF fp checkpoint, pre-quantized GPTQ/AWQ/AutoRound HF
checkpoint, or GGUF file) into our packed-QTensor params pytree.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

from ..models.arch import ArchConfig
from ..models.configs import arch_from_hf_config
from ..ops.qtypes import QSpec


def convert_model(model_path: str, qspec: Optional[QSpec] = None,
                  use_quantized_model: bool = False):
    """Convert `model_path` (HF dir/name or .gguf file) -> (params, cfg).

    `use_quantized_model` mirrors the reference flag: ingest GPTQ/AWQ/
    AutoRound quantized HF checkpoints instead of quantizing fp weights
    (reference: convert_quantized_*.py path).
    """
    if model_path.endswith(".gguf"):
        from .gguf import load_gguf_model

        params, cfg, _tok = load_gguf_model(model_path)
        return params, cfg

    from transformers import AutoConfig

    hf_cfg = AutoConfig.from_pretrained(
        model_path, trust_remote_code=True
    ).to_dict()
    cfg = arch_from_hf_config(hf_cfg)
    from . import loaders

    sd = loaders.load_state_dict(model_path)
    if use_quantized_model:
        from .gptq import params_from_quantized_state_dict

        return params_from_quantized_state_dict(sd, cfg, hf_cfg), cfg
    from .hf import params_from_state_dict

    return params_from_state_dict(sd, cfg, qspec), cfg
