"""NE 'ggjt' v1-v3 .bin reader/writer — interop with the reference's
native model format.

Parity:
  * reader — `model_file_loader` (reference models/model_utils/
    model_files.h:985-1233): 'ggjt' magic + version, the 26-field hparams
    blob (load_ne_hparams, model_files.h:1080-1146), vocab with scores
    (load_ne_vocab:1147-1176), and the 32-byte-aligned tensor directory
    (read_tensor_metadata:1177-1233).  Tensor payloads use the ggml block
    formats (NE_TYPE_F32/F16/Q4_0/Q4_1/Q5_0/Q5_1/Q8_0 — identical structs
    to GGUF, decoded by convert/gguf.py's codecs).
  * writer — `OutputFile` (reference convert/convert_llama.py:1072-1143:
    write_file_header / write_tensor_header / write_vocab), so files we
    emit load in the reference toolchain.
  * llama tensor names + rope row permute — convert_llama.py:341-345
    `permute` interleaves the HF half-split rope rows into the gptj pair
    layout the reference graph expects; ingest UNpermutes wq/wk back to
    the HF/neox convention our decoder uses.

`NE_TYPE_BTLA` (opaque serialized BesTLA storage) tensors carry their
total byte size as the first u64 of the payload (model_files.h:1212-1216);
the reader skips past them structurally and raises only if the model
needs them — re-quantize from the fp checkpoint or GGUF instead.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.arch import ArchConfig
from . import gguf as G

MAGIC_GGJT = 0x67676A74  # 'ggjt' (model_types.h:53)
MAGIC_NE = 0x67676D6C    # legacy un-versioned (model_types.h:56)

# ne_type enum (reference core/data_types.h:32-55) -> our GGML codec ids
NE_TYPE_F32, NE_TYPE_F16 = 0, 1
NE_TYPE_Q4_0, NE_TYPE_Q4_1 = 2, 3
NE_TYPE_Q5_0, NE_TYPE_Q5_1 = 6, 7
NE_TYPE_Q8_0, NE_TYPE_Q8_1 = 8, 9
NE_TYPE_Q6_K, NE_TYPE_Q8_K = 14, 15
NE_TYPE_BTLA = 19

_NE_TO_GGML = {
    NE_TYPE_F32: G.GGML_F32, NE_TYPE_F16: G.GGML_F16,
    NE_TYPE_Q4_0: G.GGML_Q4_0, NE_TYPE_Q4_1: G.GGML_Q4_1,
    NE_TYPE_Q5_0: G.GGML_Q5_0, NE_TYPE_Q5_1: G.GGML_Q5_1,
    NE_TYPE_Q8_0: G.GGML_Q8_0, NE_TYPE_Q6_K: G.GGML_Q6_K,
}
_GGML_TO_NE = {v: k for k, v in _NE_TO_GGML.items()}


class NETensorInfo:
    __slots__ = ("name", "shape", "ne_type", "offset", "nbytes")

    def __init__(self, name, shape, ne_type, offset, nbytes):
        self.name = name
        self.shape = shape          # ggml ne order: (row_len, rows, ...)
        self.ne_type = ne_type
        self.offset = offset
        self.nbytes = nbytes


class NEHParams:
    """The 26-field hparams blob + 4 vocab ids (load_ne_hparams order)."""

    FIELDS = [
        ("n_vocab", "I"), ("n_embd", "I"), ("n_mult", "I"), ("n_head", "I"),
        ("n_head_kv", "I"), ("n_layer", "I"), ("n_rot", "I"), ("ftype", "I"),
        ("max_seq_len", "I"), ("alibi_bias_max", "f"), ("clip_qkv", "f"),
        ("par_res", "I"), ("word_embed_proj_dim", "I"),
        ("do_layer_norm_before", "I"), ("multi_query_group_num", "I"),
        ("ffn_hidden_size", "I"), ("inner_hidden_size", "I"),
        ("n_experts", "I"), ("n_experts_used", "I"), ("n_embd_head_k", "I"),
        ("norm_eps", "f"), ("freq_base", "f"), ("freq_scale", "f"),
        ("rope_scaling_factor", "f"),
        ("original_max_position_embeddings", "I"), ("use_yarn", "I"),
    ]

    def __init__(self, **kw):
        for name, _ in self.FIELDS:
            setattr(self, name, kw.get(name, 0))
        self.bos_token_id = kw.get("bos_token_id", 1)
        self.eos_token_id = kw.get("eos_token_id", 2)
        self.pad_token_id = kw.get("pad_token_id", -1)
        self.sep_token_id = kw.get("sep_token_id", -1)


class NEBinReader:
    """Parse header + vocab + tensor directory; tensor data stays mmapped."""

    def __init__(self, path: str):
        self.path = path
        # mmap: a 7B q4 file is ~4 GB — materializing it up front would
        # double peak load memory (reference model_mmap parity)
        self._buf = np.memmap(path, np.uint8, mode="r")
        data = memoryview(self._buf)
        off = 0

        def u32():
            nonlocal off
            v = struct.unpack_from("<I", data, off)[0]
            off += 4
            return v

        def i32():
            nonlocal off
            v = struct.unpack_from("<i", data, off)[0]
            off += 4
            return v

        def f32():
            nonlocal off
            v = struct.unpack_from("<f", data, off)[0]
            off += 4
            return v

        magic = u32()
        if magic == MAGIC_NE:
            self.version = 0
        elif magic == MAGIC_GGJT:
            self.version = u32()
            if self.version not in (1, 2, 3):
                raise ValueError(f"unsupported ggjt version {self.version}")
        else:
            raise ValueError(f"not an NE .bin (magic {magic:#x})")

        hp = NEHParams()
        for name, fmt in NEHParams.FIELDS:
            setattr(hp, name, f32() if fmt == "f" else u32())
        hp.bos_token_id = i32()
        hp.eos_token_id = i32()
        hp.pad_token_id = i32()
        hp.sep_token_id = i32()
        self.hparams = hp

        # vocab: n_vocab x (len u32, bytes[, score f32]) — the score was
        # added in GGMF v1; legacy un-versioned 'ne' files carry none
        # (reference load_ne_vocab gates on file_version, model_files.h:
        # 1166-1170: version 0 reads no score)
        self.tokens: List[str] = []
        self.scores: List[float] = []
        for _ in range(hp.n_vocab):
            ln = u32()
            word = data[off:off + ln]
            off += ln
            self.tokens.append(bytes(word).decode("utf-8",
                                                  errors="replace"))
            self.scores.append(f32() if self.version >= 1 else 0.0)

        # tensor directory (read_tensor_metadata): entries to EOF
        self.tensors: Dict[str, NETensorInfo] = {}
        total = len(data)
        while off < total:
            n_dims = u32()
            name_len = u32()
            ttype = u32()
            ne = [u32() for _ in range(n_dims)]
            name = bytes(data[off:off + name_len]).decode("utf-8")
            off += name_len
            if self.version >= 1:
                off = (off + 31) & ~31  # 32-byte data alignment
            if ttype == NE_TYPE_BTLA:
                nbytes = struct.unpack_from("<Q", data, off)[0]
            elif ttype in _NE_TO_GGML:
                nbytes = G.ggml_nbytes(tuple(ne), _NE_TO_GGML[ttype])
            else:
                raise ValueError(f"unrecognized ne_type {ttype} for {name}")
            self.tensors[name] = NETensorInfo(name, tuple(ne), ttype, off,
                                              nbytes)
            off += nbytes

    def tensor_bytes(self, info: NETensorInfo) -> np.ndarray:
        return self._buf[info.offset:info.offset + info.nbytes]


def _unpermute_rows(n_head: int, rows: int):
    """Inverse of convert_llama.py:341 `permute`: the reference stores
    wq/wk rows pair-interleaved (gptj rope layout); our decoder applies
    neox rope on the HF half-split layout.  Returns the row index map."""
    d = rows // n_head
    idx = np.arange(rows).reshape(n_head, d // 2, 2).swapaxes(1, 2)
    return idx.reshape(rows)


def _read_linear(r: NEBinReader, name: str, unpermute_heads: int = 0,
                 fp_dtype=jnp.bfloat16):
    info = r.tensors[name]
    if info.ne_type == NE_TYPE_BTLA:
        # serialized BesTLA storage (the reference's quantized q4_j-style
        # tensors) — parsed bit-exactly by convert/btla.py; rope-row
        # unpermute applies on the out-feature axis (the reference
        # quantizes after the permute)
        from .btla import btla_to_qtensor

        perm = (None if not unpermute_heads
                else _unpermute_rows(unpermute_heads, info.shape[1]))
        return {"w": btla_to_qtensor(r.tensor_bytes(info), n_perm=perm)}
    ttype = _NE_TO_GGML[info.ne_type]
    raw = r.tensor_bytes(info)
    row_len, rows = info.shape[0], info.shape[1]
    if info.ne_type in (NE_TYPE_F32, NE_TYPE_F16):
        a = (raw.view(np.float32) if info.ne_type == NE_TYPE_F32
             else raw.view(np.float16).astype(np.float32))
        a = a.reshape(rows, row_len)
        if unpermute_heads:
            a = a[_unpermute_rows(unpermute_heads, rows)]
        return {"w": jnp.asarray(a.T, fp_dtype)}
    dec, bits, group, offset = G.DECODERS[ttype]
    codes, scales, m = G._decode(ttype, raw, rows, row_len)
    if unpermute_heads:
        perm = _unpermute_rows(unpermute_heads, rows)
        codes, scales = codes[perm], scales[perm]
        if m is not None:
            m = m[perm]
    from ..ops.qtypes import QSpec, QType
    from ..ops.quantize import QTensor, pack_codes

    spec = QSpec(QType.INT, bits, group, symmetric=(m is None))
    data = pack_codes(jnp.asarray(np.ascontiguousarray(codes.T)), bits)
    zeros = (None if m is None
             else jnp.asarray(np.ascontiguousarray(m.T), jnp.float32))
    return {"w": QTensor(data, jnp.asarray(np.ascontiguousarray(scales.T),
                                           jnp.float32),
                         zeros, None, spec, (row_len, rows))}


def _read_array(r: NEBinReader, name: str, dtype=jnp.float32):
    info = r.tensors[name]
    raw = r.tensor_bytes(info)
    if info.ne_type == NE_TYPE_F32:
        a = raw.view(np.float32)
    elif info.ne_type == NE_TYPE_F16:
        a = raw.view(np.float16).astype(np.float32)
    else:
        raise ValueError(f"{name}: expected fp tensor, got {info.ne_type}")
    return jnp.asarray(a.reshape(info.shape[::-1]), dtype)


def load_ne_bin(path: str, param_dtype=jnp.bfloat16):
    """Load a reference-toolchain 'ggjt' .bin (llama-family tensor names,
    convert_llama.py:120-140) -> (params, ArchConfig, GGUFTokenizer).

    `param_dtype` sets the storage dtype of FP tensors (embeddings, norms,
    fp linears): bf16 is the TPU-native serving default; f32 keeps the
    file's exact values for strict-parity runs (scripts/ref_crosscheck.py
    vs the compiled reference, whose comp_fp32 path is f32 end-to-end)."""
    r = NEBinReader(path)
    hp = r.hparams
    head_dim = (hp.n_embd_head_k or hp.n_embd // hp.n_head)
    ffn = hp.ffn_hidden_size
    if not ffn:
        # pre-ffn_hidden_size files derive it from n_mult (llama v1 rule)
        ffn = r.tensors["layers.0.feed_forward.w1.weight"].shape[1]
    cfg = ArchConfig(
        name="llama",
        vocab_size=hp.n_vocab,
        hidden_size=hp.n_embd,
        n_layers=hp.n_layer,
        n_heads=hp.n_head,
        n_kv_heads=hp.n_head_kv or hp.n_head,
        intermediate_size=ffn,
        max_position_embeddings=hp.max_seq_len or 2048,
        head_dim=head_dim,
        norm_eps=hp.norm_eps or 1e-5,
        rope_base=hp.freq_base or 10000.0,
    )
    params: Dict[str, Any] = {
        "embed": {"weight": _read_array(r, "tok_embeddings.weight",
                                        param_dtype)
                  if r.tensors["tok_embeddings.weight"].ne_type
                  in (NE_TYPE_F32, NE_TYPE_F16)
                  else _embed_from_quant(r, "tok_embeddings.weight",
                                         param_dtype)},
        "final_norm": {"weight": _read_array(r, "norm.weight")},
        "lm_head": _read_linear(r, "output.weight", fp_dtype=param_dtype),
        "layers": [],
    }
    for i in range(cfg.n_layers):
        b = f"layers.{i}."
        lp = {
            "attn_norm": {"weight": _read_array(r, b + "attention_norm.weight")},
            "ffn_norm": {"weight": _read_array(r, b + "ffn_norm.weight")},
            "q": _read_linear(r, b + "attention.wq.weight",
                              unpermute_heads=cfg.n_heads,
                              fp_dtype=param_dtype),
            "k": _read_linear(r, b + "attention.wk.weight",
                              unpermute_heads=cfg.n_kv_heads,
                              fp_dtype=param_dtype),
            "v": _read_linear(r, b + "attention.wv.weight",
                              fp_dtype=param_dtype),
            "o": _read_linear(r, b + "attention.wo.weight",
                              fp_dtype=param_dtype),
            "ffn": {
                "gate": _read_linear(r, b + "feed_forward.w1.weight",
                                     fp_dtype=param_dtype),
                "down": _read_linear(r, b + "feed_forward.w2.weight",
                                     fp_dtype=param_dtype),
                "up": _read_linear(r, b + "feed_forward.w3.weight",
                                   fp_dtype=param_dtype),
            },
        }
        params["layers"].append(lp)
    tok = G.GGUFTokenizer(r.tokens, r.scores,
                          bos_id=hp.bos_token_id, eos_id=hp.eos_token_id)
    return params, cfg, tok


def _embed_from_quant(r: NEBinReader, name: str, fp_dtype=jnp.bfloat16):
    """Embedding stored quantized (e.g. q4_0 ftype files): materialize to
    bf16 — gathers need a dense table."""
    info = r.tensors[name]
    if info.ne_type == NE_TYPE_BTLA:
        from .btla import BTLAStorage

        st = BTLAStorage(np.asarray(r.tensor_bytes(info), np.uint8))
        # BTLA stores [K=row_len, N=rows]; embedding table is [vocab, embd]
        return jnp.asarray(st.dequant().T, fp_dtype)
    ttype = _NE_TO_GGML[info.ne_type]
    raw = r.tensor_bytes(info)
    row_len, rows = info.shape[0], info.shape[1]
    dec, bits, group, offset = G.DECODERS[ttype]
    codes, scales, m = G._decode(ttype, raw, rows, row_len)
    sf = np.repeat(scales, group, axis=1)
    if m is None:
        a = (codes.astype(np.float32) - offset) * sf
    else:
        a = codes.astype(np.float32) * sf + np.repeat(m, group, axis=1)
    return jnp.asarray(a, fp_dtype)


# ---------------------------------------------------------------------------
# writer (OutputFile parity — files we emit load in the reference binary)
# ---------------------------------------------------------------------------


class NEBinWriter:
    """ggjt v3 writer following convert_llama.py OutputFile byte-for-byte:
    header (write_file_header field order), vocab (len/bytes/score), then
    32-byte-aligned tensor records."""

    def __init__(self, path: str, hp: NEHParams):
        self.f = open(path, "wb")
        self.f.write(struct.pack("<II", MAGIC_GGJT, 3))
        for name, fmt in NEHParams.FIELDS:
            self.f.write(struct.pack("<" + ("f" if fmt == "f" else "I"),
                                     getattr(hp, name)))
        self.f.write(struct.pack("<iiii", hp.bos_token_id, hp.eos_token_id,
                                 hp.pad_token_id, hp.sep_token_id))

    def write_vocab(self, tokens: List[str], scores: List[float]):
        for t, s in zip(tokens, scores):
            bs = t.encode("utf-8")
            self.f.write(struct.pack("<I", len(bs)))
            self.f.write(bs)
            self.f.write(struct.pack("<f", s))

    def add_raw_tensor(self, name: str, shape, ne_type: int,
                       payload: bytes):
        """Write a pre-encoded tensor record (e.g. a serialized BTLA
        storage blob, whose first u64 is its own size — the loader's
        NE_TYPE_BTLA convention, model_files.h:1212-1216).  `shape` in
        numpy row-major orientation [rows, row_len]."""
        sname = name.encode("utf-8")
        shape_rev = tuple(shape)[::-1]
        self.f.write(struct.pack("<III", len(shape), len(sname), ne_type))
        self.f.write(struct.pack("<" + "I" * len(shape_rev), *shape_rev))
        self.f.write(sname)
        pos = self.f.tell()
        self.f.write(b"\0" * (((pos + 31) & ~31) - pos))
        self.f.write(payload)

    def add_tensor(self, name: str, a: np.ndarray, ne_type: int):
        """`a` in numpy row-major [rows, row_len] (HF orientation)."""
        ggml = _NE_TO_GGML[ne_type]
        raw = G.encode_ggml(a, ggml)
        sname = name.encode("utf-8")
        shape_rev = a.shape[::-1]  # ne order: innermost first
        self.f.write(struct.pack("<III", len(a.shape), len(sname), ne_type))
        self.f.write(struct.pack("<" + "I" * len(shape_rev), *shape_rev))
        self.f.write(sname)
        pos = self.f.tell()
        self.f.write(b"\0" * (((pos + 31) & ~31) - pos))
        self.f.write(raw)

    def close(self):
        self.f.close()


def write_llama_ne_bin(path: str, state_dict, hf_cfg: dict,
                       tokens: List[str],
                       scores: Optional[List[float]] = None,
                       ne_type: int = NE_TYPE_Q4_0):
    """HF llama state_dict -> reference-format ggjt v3 .bin (the writer
    side of convert_llama.py: names, rope-row permute, hparams blob)."""
    def np_(t):
        return t.detach().cpu().float().numpy() if hasattr(t, "detach") \
            else np.asarray(t, np.float32)

    n_head = hf_cfg["num_attention_heads"]
    n_kv = hf_cfg.get("num_key_value_heads", n_head)
    hp = NEHParams(
        n_vocab=hf_cfg["vocab_size"], n_embd=hf_cfg["hidden_size"],
        n_mult=256, n_head=n_head, n_head_kv=n_kv,
        n_layer=hf_cfg["num_hidden_layers"],
        n_rot=hf_cfg["hidden_size"] // n_head, ftype=2,
        max_seq_len=hf_cfg.get("max_position_embeddings", 2048),
        ffn_hidden_size=hf_cfg["intermediate_size"],
        norm_eps=hf_cfg.get("rms_norm_eps", 1e-5),
        freq_base=hf_cfg.get("rope_theta", 10000.0), freq_scale=1.0,
        bos_token_id=hf_cfg.get("bos_token_id", 1),
        eos_token_id=hf_cfg.get("eos_token_id", 2),
        pad_token_id=(-1 if hf_cfg.get("pad_token_id") is None
                      else hf_cfg["pad_token_id"]),
    )
    w = NEBinWriter(path, hp)
    w.write_vocab(tokens, scores or [0.0] * len(tokens))

    def permute(a, heads):
        # convert_llama.py:341: HF half-split -> gptj pair-interleave
        return (a.reshape(heads, 2, a.shape[0] // heads // 2, *a.shape[1:])
                .swapaxes(1, 2).reshape(a.shape))

    fp = NE_TYPE_F32
    w.add_tensor("tok_embeddings.weight",
                 np_(state_dict["model.embed_tokens.weight"]), fp)
    w.add_tensor("norm.weight", np_(state_dict["model.norm.weight"]), fp)
    w.add_tensor("output.weight", np_(state_dict["lm_head.weight"]), ne_type)
    for i in range(hp.n_layer):
        hfb = f"model.layers.{i}."
        neb = f"layers.{i}."
        w.add_tensor(neb + "attention.wq.weight",
                     permute(np_(state_dict[hfb + "self_attn.q_proj.weight"]),
                             n_head), ne_type)
        w.add_tensor(neb + "attention.wk.weight",
                     permute(np_(state_dict[hfb + "self_attn.k_proj.weight"]),
                             n_kv), ne_type)
        w.add_tensor(neb + "attention.wv.weight",
                     np_(state_dict[hfb + "self_attn.v_proj.weight"]), ne_type)
        w.add_tensor(neb + "attention.wo.weight",
                     np_(state_dict[hfb + "self_attn.o_proj.weight"]), ne_type)
        w.add_tensor(neb + "attention_norm.weight",
                     np_(state_dict[hfb + "input_layernorm.weight"]), fp)
        w.add_tensor(neb + "feed_forward.w1.weight",
                     np_(state_dict[hfb + "mlp.gate_proj.weight"]), ne_type)
        w.add_tensor(neb + "feed_forward.w2.weight",
                     np_(state_dict[hfb + "mlp.down_proj.weight"]), ne_type)
        w.add_tensor(neb + "feed_forward.w3.weight",
                     np_(state_dict[hfb + "mlp.up_proj.weight"]), ne_type)
        w.add_tensor(neb + "ffn_norm.weight",
                     np_(state_dict[hfb + "post_attention_layernorm.weight"]),
                     fp)
    w.close()
