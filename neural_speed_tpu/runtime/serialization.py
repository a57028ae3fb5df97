"""Model + session serialization.

Parity:
  * packed-model files (the reference's quantized NE bin written by
    quant_utils.cpp; ours is an .npz of the packed pytree + JSON manifest)
  * session/state save-restore: `model_get/copy/set_state_data` and 'ggsn'
    prompt-session files (model_utils.cpp:1529-1857) -> KV cache snapshots.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import kv_cache as kvc
from ..ops.qtypes import QSpec, QType
from ..ops.quantize import QTensor

MAGIC = "nst1"  # format version (parity: 'ggjt'/'ggsn' magics)


def _spec_to_json(spec: QSpec) -> Dict[str, Any]:
    return {
        "qtype": spec.qtype.value, "bits": spec.bits,
        "group_size": spec.group_size, "symmetric": spec.symmetric,
        "scale_dtype": spec.scale_dtype, "double_quant": spec.double_quant,
    }


def _spec_from_json(d: Dict[str, Any]) -> QSpec:
    return QSpec(QType(d["qtype"]), d["bits"], d["group_size"],
                 d["symmetric"], d["scale_dtype"], d["double_quant"])


def _encode(node, arrays: Dict[str, np.ndarray], ctr: List[int]):
    if isinstance(node, dict):
        return {"t": "d", "i": {k: _encode(v, arrays, ctr)
                                for k, v in node.items()}}
    if isinstance(node, (list, tuple)):
        return {"t": "l", "i": [_encode(v, arrays, ctr) for v in node]}
    if isinstance(node, QTensor):
        return {
            "t": "q",
            "spec": _spec_to_json(node.spec),
            "shape": list(node.shape),
            "k_shards": node.k_shards,
            "data": [_encode(a, arrays, ctr) for a in node.data],
            "scales": _encode(node.scales, arrays, ctr),
            "zeros": _encode(node.zeros, arrays, ctr),
            "sscale": _encode(node.sscale, arrays, ctr),
        }
    if node is None:
        return {"t": "n"}
    # array leaf
    key = f"a{ctr[0]}"
    ctr[0] += 1
    a = np.asarray(node)
    if a.dtype == jnp.bfloat16:
        arrays[key] = a.view(np.uint16)
        return {"t": "a", "k": key, "dt": "bfloat16"}
    arrays[key] = a
    return {"t": "a", "k": key, "dt": str(a.dtype)}


def _decode(m, arrays) -> Any:
    t = m["t"]
    if t == "d":
        return {k: _decode(v, arrays) for k, v in m["i"].items()}
    if t == "l":
        return [_decode(v, arrays) for v in m["i"]]
    if t == "n":
        return None
    if t == "a":
        a = arrays[m["k"]]
        if m["dt"] == "bfloat16":
            return jnp.asarray(a.view(np.uint16)).view(jnp.bfloat16)
        return jnp.asarray(a)
    if t == "q":
        return QTensor(
            tuple(_decode(x, arrays) for x in m["data"]),
            _decode(m["scales"], arrays),
            _decode(m["zeros"], arrays),
            _decode(m["sscale"], arrays),
            _spec_from_json(m["spec"]),
            tuple(m["shape"]),
            m.get("k_shards", 1),
        )
    raise ValueError(t)


def save_params(path: str, params: Dict[str, Any]) -> None:
    arrays: Dict[str, np.ndarray] = {}
    manifest = _encode(params, arrays, [0])
    np.savez(path if path.endswith(".npz") else path + ".npz",
             __manifest__=json.dumps({"magic": MAGIC, "tree": manifest}),
             **arrays)


def load_params(path: str) -> Dict[str, Any]:
    z = np.load(path if path.endswith(".npz") else path + ".npz",
                allow_pickle=False)
    meta = json.loads(str(z["__manifest__"]))
    assert meta["magic"] == MAGIC, meta.get("magic")
    return _decode(meta["tree"], z)


# ---------------------------------------------------------------------------
# session (KV) snapshots
# ---------------------------------------------------------------------------


def save_session(path: str, cache: kvc.KVCache,
                 extra: Dict[str, Any] | None = None) -> None:
    arrays = {
        "k": np.asarray(cache.k).view(np.uint16)
        if cache.k.dtype == jnp.bfloat16 else np.asarray(cache.k),
        "v": np.asarray(cache.v).view(np.uint16)
        if cache.v.dtype == jnp.bfloat16 else np.asarray(cache.v),
        "lengths": np.asarray(cache.lengths),
    }
    meta = {"magic": MAGIC, "kdt": str(cache.k.dtype),
            "quant": cache.quantized, "extra": extra or {}}
    if cache.quantized:
        arrays["k_scale"] = np.asarray(cache.k_scale)
        arrays["v_scale"] = np.asarray(cache.v_scale)
    np.savez(path, __manifest__=json.dumps(meta), **arrays)


def load_session(path: str, like: kvc.KVCache, with_extra: bool = False):
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["__manifest__"]))
    assert meta["magic"] == MAGIC

    def arr(key, dtype):
        a = z[key]
        if dtype == jnp.bfloat16:
            return jnp.asarray(a).view(jnp.bfloat16)
        return jnp.asarray(a, dtype)

    kdt = like.k.dtype
    cache = kvc.KVCache(
        arr("k", kdt), arr("v", kdt),
        jnp.asarray(z["k_scale"]) if meta["quant"] else None,
        jnp.asarray(z["v_scale"]) if meta["quant"] else None,
        jnp.asarray(z["lengths"], jnp.int32),
    )
    if with_extra:
        return cache, meta.get("extra", {})
    return cache
