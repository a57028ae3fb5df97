"""Pre-quantized checkpoint ingestion: GPTQ / AWQ / AutoRound.

Parity: the reference's quantized converters —
  * unpack_weight / unpack_gptq & awq layouts (convert/common.py:333-448)
  * act-order g_idx re-shuffle (convert/common.py + bestla shuffle indices,
    bestla_prologue_b.h:337 setShuffleIndices)
  * repack into engine storage (`bestla_qpack`, quant_utils.cpp:226-268) —
    here: direct lossless repack into planar QTensors; act-order becomes an
    explicit K-permutation applied to activations before the matmul
    (`{"perm": ...}` in the linear params, models/transformer.linear).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.arch import ArchConfig
from ..ops.qtypes import QSpec, QType
from ..ops.quantize import QTensor, pack_codes

AWQ_ORDER = np.array([0, 4, 1, 5, 2, 6, 3, 7])


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        import torch

        t = t.detach().cpu()
        if t.dtype in (torch.bfloat16, torch.float16):
            t = t.float()
        return t.numpy()
    return np.asarray(t)


def unpack_rows(packed: np.ndarray, bits: int) -> np.ndarray:
    """GPTQ qweight layout: int32 `[K*bits/32, N]`, codes packed along K
    (little-endian within the word).  -> uint8 `[K, N]`."""
    per = 32 // bits
    mask = (1 << bits) - 1
    p = packed.astype(np.uint32)
    out = np.empty((p.shape[0] * per, p.shape[1]), np.uint8)
    for i in range(per):
        out[i::per] = (p >> (bits * i)) & mask
    return out


def unpack_cols(packed: np.ndarray, bits: int,
                awq: bool = False) -> np.ndarray:
    """qzeros / AWQ layout: int32 `[R, N*bits/32]`, codes packed along N.
    AWQ interleaves nibbles in order [0,4,1,5,2,6,3,7]."""
    per = 32 // bits
    mask = (1 << bits) - 1
    p = packed.astype(np.uint32)
    out = np.empty((p.shape[0], p.shape[1] * per), np.uint8)
    for i in range(per):
        out[:, i::per] = (p >> (bits * i)) & mask
    if awq and bits == 4:
        # undo the AWQ interleave within each group of 8
        r, c = out.shape
        out = out.reshape(r, c // 8, 8)[:, :, np.argsort(AWQ_ORDER)]
        out = out.reshape(r, c)
    return out


def gptq_to_qtensor(
    qweight, qzeros, scales, g_idx=None, bits: int = 4,
    awq: bool = False, zero_plus_one: bool = True,
    scale_dtype: str = "float32",
) -> Tuple[QTensor, Optional[jnp.ndarray]]:
    """-> (QTensor `[K, N]`, perm or None).

    zero_plus_one: GPTQ-v1 stores `zp - 1` in qzeros (the classic AutoGPTQ
    off-by-one); v2 and AWQ store zp directly.
    """
    qweight = _np(qweight)
    qzeros = _np(qzeros)
    scales = _np(scales).astype(np.float32)

    if awq:
        codes = unpack_cols(qweight, bits, awq=True)       # [K, N]
    else:
        codes = unpack_rows(qweight, bits)                 # [K, N]
    zeros = unpack_cols(qzeros, bits, awq=awq).astype(np.int32)  # [G, N]
    if zero_plus_one:
        zeros = zeros + 1
    k, n = codes.shape
    groups = zeros.shape[0]
    g = k // groups

    perm = None
    if g_idx is not None:
        g_idx = _np(g_idx).astype(np.int64)
        contiguous = np.repeat(np.arange(groups), g)
        if not np.array_equal(g_idx, contiguous[: len(g_idx)]):
            # act-order: permute K rows so groups are contiguous; the
            # runtime applies the same permutation to activations
            perm = np.argsort(g_idx, kind="stable")
            codes = codes[perm]

    maxcode = (1 << bits) - 1
    zeros = np.clip(zeros, 0, maxcode).astype(np.uint8)
    spec = QSpec(QType.INT, bits, g, symmetric=False,
                 scale_dtype=scale_dtype)
    data = pack_codes(jnp.asarray(codes), bits)
    sc = jnp.asarray(scales)
    if scale_dtype == "bfloat16":
        sc = sc.astype(jnp.bfloat16)
    qt = QTensor(data, sc, jnp.asarray(zeros), None, spec, (k, n))
    return qt, (jnp.asarray(perm, jnp.int32) if perm is not None else None)


def is_quantized_state_dict(sd: Dict[str, Any]) -> bool:
    return any(k.endswith(".qweight") for k in sd)


def detect_quant_method(hf_cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Read quantization_config (parity: convert __init__.py dispatch on
    quantized model configs)."""
    qc = hf_cfg.get("quantization_config", {}) or {}
    method = (qc.get("quant_method") or "gptq").lower()
    return {
        "bits": qc.get("bits", 4),
        "awq": method == "awq",
        # GPTQ v1 checkpoints store zp-1; v2 ("gptq_v2") and AWQ store zp
        "zero_plus_one": (
            method == "gptq"
            and qc.get("checkpoint_format", "gptq") != "gptq_v2"
        ),
        "desc_act": qc.get("desc_act", False),
    }


def quantized_linear(sd: Dict[str, Any], prefix: str,
                     qinfo: Dict[str, Any]) -> Dict[str, Any]:
    """Build a linear param dict from `<prefix>.{qweight,qzeros,scales,
    g_idx,bias}` entries."""
    qt, perm = gptq_to_qtensor(
        sd[prefix + ".qweight"], sd[prefix + ".qzeros"],
        sd[prefix + ".scales"], sd.get(prefix + ".g_idx"),
        bits=qinfo["bits"], awq=qinfo["awq"],
        zero_plus_one=qinfo["zero_plus_one"],
    )
    out: Dict[str, Any] = {"w": qt}
    if perm is not None:
        out["perm"] = perm
    b = sd.get(prefix + ".bias")
    if b is not None:
        out["b"] = jnp.asarray(_np(b), jnp.float32)
    return out


def params_from_quantized_state_dict(
    sd: Dict[str, Any], cfg: ArchConfig, hf_cfg: Dict[str, Any],
    dtype=jnp.bfloat16,
) -> Dict[str, Any]:
    """llama-family GPTQ/AWQ checkpoint -> params (parity:
    convert_quantized_llama.py)."""
    qinfo = detect_quant_method(hf_cfg)
    p: Dict[str, Any] = {
        "embed": {
            "weight": jnp.asarray(_np(sd["model.embed_tokens.weight"]),
                                  dtype)
        },
        "layers": [],
        "final_norm": {
            "weight": jnp.asarray(_np(sd["model.norm.weight"]), jnp.float32)
        },
    }
    if "lm_head.weight" in sd:
        w = np.ascontiguousarray(_np(sd["lm_head.weight"]).T)
        p["lm_head"] = {"w": jnp.asarray(w, dtype)}

    def lin(prefix):
        return quantized_linear(sd, prefix, qinfo)

    for i in range(cfg.n_layers):
        pre = f"model.layers.{i}."
        lp = {
            "attn_norm": {
                "weight": jnp.asarray(
                    _np(sd[pre + "input_layernorm.weight"]), jnp.float32
                )
            },
            "ffn_norm": {
                "weight": jnp.asarray(
                    _np(sd[pre + "post_attention_layernorm.weight"]),
                    jnp.float32,
                )
            },
            "q": lin(pre + "self_attn.q_proj"),
            "k": lin(pre + "self_attn.k_proj"),
            "v": lin(pre + "self_attn.v_proj"),
            "o": lin(pre + "self_attn.o_proj"),
            "ffn": {
                "gate": lin(pre + "mlp.gate_proj"),
                "up": lin(pre + "mlp.up_proj"),
                "down": lin(pre + "mlp.down_proj"),
            },
        }
        p["layers"].append(lp)
    return p


# ---------------------------------------------------------------------------
# synthetic GPTQ packers (tests + docs; inverse of the unpackers)
# ---------------------------------------------------------------------------


def pack_rows(codes: np.ndarray, bits: int) -> np.ndarray:
    per = 32 // bits
    k, n = codes.shape
    out = np.zeros((k // per, n), np.uint32)
    for i in range(per):
        out |= codes[i::per].astype(np.uint32) << (bits * i)
    return out.view(np.int32)


def pack_cols(codes: np.ndarray, bits: int, awq: bool = False) -> np.ndarray:
    per = 32 // bits
    r, c = codes.shape
    if awq and bits == 4:
        codes = codes.reshape(r, c // 8, 8)[:, :, AWQ_ORDER].reshape(r, c)
    out = np.zeros((r, c // per), np.uint32)
    for i in range(per):
        out |= codes[:, i::per].astype(np.uint32) << (bits * i)
    return out.view(np.int32)
