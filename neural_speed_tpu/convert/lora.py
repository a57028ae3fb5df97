"""LoRA adapter merge (parity: model_apply_lora_from_file_internal,
model_utils.cpp:1145-1393 — per-tensor W += scaling * (B @ A), where
scaling = lora_alpha / r, applied at load time; optionally onto an
already-quantized model by dequantize -> add -> requantize, the analogue of
the reference's fp16 base-model overlay path).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def _np(t) -> np.ndarray:
    try:
        import torch

        if isinstance(t, torch.Tensor):
            return t.detach().to(torch.float32).numpy()
    except ImportError:
        pass
    return np.asarray(t, np.float32)


def load_lora(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """Read a PEFT adapter dir (adapter_config.json +
    adapter_model.{safetensors,bin})."""
    cfg_path = os.path.join(path, "adapter_config.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    st = os.path.join(path, "adapter_model.safetensors")
    if os.path.exists(st):
        from safetensors.numpy import load_file

        sd = {k: np.asarray(v, np.float32) for k, v in load_file(st).items()}
    else:
        import torch

        sd = {
            k: _np(v)
            for k, v in torch.load(
                os.path.join(path, "adapter_model.bin"), map_location="cpu",
                weights_only=True,
            ).items()
        }
    return sd, cfg


def lora_scaling(cfg: Dict[str, Any]) -> float:
    return float(cfg.get("lora_alpha", 1.0)) / float(cfg.get("r", 1.0))


_KEY_RE = re.compile(
    r"(?:base_model\.model\.)?(?P<base>.+?)\.lora_(?P<ab>[AB])\.(?:default\.)?weight$"
)


def merge_into_state_dict(sd: Dict[str, Any], lora_sd: Dict[str, np.ndarray],
                          scaling: float) -> Dict[str, Any]:
    """Merge adapter deltas into an fp HF state dict (pre-quantization
    path): sd["<base>.weight"] += scaling * B @ A."""
    pairs: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in lora_sd.items():
        m = _KEY_RE.match(k)
        if not m:
            continue
        pairs.setdefault(m.group("base"), {})[m.group("ab")] = _np(v)
    out = dict(sd)
    for base, ab in pairs.items():
        if "A" not in ab or "B" not in ab:
            continue
        key = base + ".weight"
        if key not in out:
            continue
        delta = scaling * (ab["B"] @ ab["A"])  # [out, in]
        out[key] = _np(out[key]) + delta
    return out


def apply_lora_to_params(params: Dict[str, Any], cfg, lora_sd, lora_cfg,
                         ) -> Dict[str, Any]:
    """Merge an adapter onto converted (possibly quantized) params:
    dequantize -> += scaling*BA -> requantize with the same spec.

    Maps PEFT module names (model.layers.N.self_attn.q_proj etc.) onto our
    params tree keys."""
    from ..ops.quantize import QTensor, dequantize, quantize

    scaling = lora_scaling(lora_cfg)
    pairs: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in lora_sd.items():
        m = _KEY_RE.match(k)
        if m:
            pairs.setdefault(m.group("base"), {})[m.group("ab")] = _np(v)

    proj_map = {
        "q_proj": "q", "k_proj": "k", "v_proj": "v", "o_proj": "o",
        "gate_proj": ("ffn", "gate"), "up_proj": ("ffn", "up"),
        "down_proj": ("ffn", "down"),
    }
    layer_re = re.compile(r"model\.layers\.(\d+)\.(?:self_attn|mlp)\.(\w+)$")

    out = dict(params)
    out["layers"] = [dict(lp) for lp in params["layers"]]
    for base, ab in pairs.items():
        if "A" not in ab or "B" not in ab:
            continue
        m = layer_re.match(base)
        if not m:
            continue
        li, proj = int(m.group(1)), m.group(2)
        tgt = proj_map.get(proj)
        if tgt is None or li >= len(out["layers"]):
            continue
        lp = out["layers"][li]
        if isinstance(tgt, tuple):
            holder = dict(lp.get(tgt[0], {}))
            if tgt[1] not in holder:
                continue
            entry = dict(holder[tgt[1]])
        else:
            if tgt not in lp:
                continue
            entry = dict(lp[tgt])
        w = entry["w"]
        delta = (scaling * (ab["B"] @ ab["A"])).T  # ours is [in, out]
        if isinstance(w, QTensor):
            dense = np.asarray(dequantize(w, jnp.float32))[: delta.shape[0]]
            merged = jnp.asarray(dense + delta)
            entry["w"] = quantize(merged, w.spec, w.k_shards)
        else:
            entry["w"] = w + jnp.asarray(delta, w.dtype)
        if isinstance(tgt, tuple):
            holder[tgt[1]] = entry
            lp[tgt[0]] = holder
        else:
            lp[tgt] = entry
    return out
