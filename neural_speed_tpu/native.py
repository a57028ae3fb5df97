"""ctypes bindings for the native (C++) data-loader library.

Parity: the reference's loaders/codecs are C++ (model_files.h gguf_loader,
ggml quantize_fns, BesTLA compressWeight); here the same host-side hot
loops live in native/nst_native.cpp, built to _nst_native.so.  Every entry
point has a Python/numpy fallback (convert/gguf.py, ops/quantize.py) — the
native path is selected automatically when the library is present and is
bit-identical (tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SO = os.path.join(os.path.dirname(__file__), "_nst_native.so")
_SRC_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _SRC_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO)
    except Exception:
        return False


def lib() -> Optional[ctypes.CDLL]:
    """Load (building on demand) the native library, or None."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("NST_NATIVE", "1") == "0":
        return None
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        _LIB = ctypes.CDLL(_SO)
    except OSError:
        return None
    return _LIB


def available() -> bool:
    return lib() is not None


def _p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


# ---- ggml block codecs -----------------------------------------------------

_DEC = {
    "q4_0": ("nst_decode_q4_0", 18, 32, False),
    "q4_1": ("nst_decode_q4_1", 20, 32, True),
    "q5_0": ("nst_decode_q5_0", 22, 32, False),
    "q5_1": ("nst_decode_q5_1", 24, 32, True),
    "q8_0": ("nst_decode_q8_0", 34, 32, False),
}


def decode_blocks(kind: str, raw: np.ndarray, rows: int, row_len: int):
    """Native ggml block decode -> (codes[rows,row_len] u8,
    d[rows,groups] f32, m or None).  Returns None if native unavailable."""
    L = lib()
    if L is None:
        return None
    if kind == "q6_k":
        nb = rows * row_len // 256
        codes = np.empty((nb, 256), np.uint8)
        scales = np.empty((nb, 16), np.float32)
        raw = np.ascontiguousarray(raw[: nb * 210])
        L.nst_decode_q6_k(_p(raw), ctypes.c_int64(nb), _p(codes), _p(scales))
        return (codes.reshape(rows, row_len),
                scales.reshape(rows, row_len // 16), None)
    name, bsz, blen, has_m = _DEC[kind]
    nb = rows * row_len // blen
    codes = np.empty((nb, blen), np.uint8)
    d = np.empty((nb,), np.float32)
    raw = np.ascontiguousarray(raw[: nb * bsz])
    if has_m:
        m = np.empty((nb,), np.float32)
        getattr(L, name)(_p(raw), ctypes.c_int64(nb), _p(codes), _p(d), _p(m))
        return (codes.reshape(rows, row_len), d.reshape(rows, -1),
                m.reshape(rows, -1))
    getattr(L, name)(_p(raw), ctypes.c_int64(nb), _p(codes), _p(d))
    return codes.reshape(rows, row_len), d.reshape(rows, -1), None


# ---- planar pack/unpack -----------------------------------------------------


def pack_planar(codes: np.ndarray, width: int) -> Optional[np.ndarray]:
    L = lib()
    if L is None:
        return None
    k, n = codes.shape
    e = 32 // width
    out = np.empty((k // e, n), np.uint32)
    codes = np.ascontiguousarray(codes, np.uint8)
    L.nst_pack_planar(_p(codes), ctypes.c_int64(k), ctypes.c_int64(n),
                      ctypes.c_int(width), _p(out))
    return out


def unpack_planar(words: np.ndarray, width: int) -> Optional[np.ndarray]:
    L = lib()
    if L is None:
        return None
    kw, n = words.shape
    e = 32 // width
    out = np.empty((kw * e, n), np.uint8)
    words = np.ascontiguousarray(words, np.uint32)
    L.nst_unpack_planar(_p(words), ctypes.c_int64(kw), ctypes.c_int64(n),
                        ctypes.c_int(width), _p(out))
    return out


# ---- SPM tokenizer ----------------------------------------------------------


def spm_new(tokens, scores) -> Optional[int]:
    """Build a native SPM vocab; returns a handle or None."""
    L = lib()
    if L is None:
        return None
    blobs = [t.encode("utf-8") for t in tokens]
    offsets = np.zeros(len(blobs) + 1, np.int64)
    np.cumsum([len(b) for b in blobs], out=offsets[1:])
    data = np.frombuffer(b"".join(blobs), np.uint8) if blobs else np.zeros(
        0, np.uint8)
    sc = np.ascontiguousarray(scores, np.float32)
    L.nst_spm_new.restype = ctypes.c_int64
    h = L.nst_spm_new(_p(data), _p(offsets), ctypes.c_int32(len(blobs)),
                      _p(sc))
    return int(h) if h > 0 else None


def spm_free(handle: int) -> None:
    """Release a native SPM vocab (GGUFTokenizer.__del__)."""
    L = lib()
    if L is not None:
        L.nst_spm_free(ctypes.c_int64(handle))


def spm_encode(handle: int, text: str, byte_ids: np.ndarray,
               unk_id: int) -> Optional[list]:
    """Encode normalized text with a native SPM handle; None if native
    unavailable.  `byte_ids` is an int32[256] table (-1 = absent)."""
    L = lib()
    if L is None:
        return None
    raw = np.frombuffer(text.encode("utf-8"), np.uint8)
    out = np.empty(raw.size + 8, np.int32)
    L.nst_spm_encode.restype = ctypes.c_int64
    n = L.nst_spm_encode(ctypes.c_int64(handle), _p(raw),
                         ctypes.c_int64(raw.size), _p(byte_ids),
                         ctypes.c_int32(unk_id), _p(out),
                         ctypes.c_int64(out.size))
    if n < 0:
        return None
    return out[:n].tolist()


def rtn_quantize_sym(w: np.ndarray, group: int, bits: int
                     ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    L = lib()
    if L is None:
        return None
    k, n = w.shape
    codes = np.empty((k, n), np.uint8)
    scales = np.empty((k // group, n), np.float32)
    w = np.ascontiguousarray(w, np.float32)
    L.nst_rtn_quantize_sym(_p(w), ctypes.c_int64(k), ctypes.c_int64(n),
                           ctypes.c_int64(group), ctypes.c_int(bits),
                           _p(codes), _p(scales))
    return codes, scales
