"""Pre-flight HBM budgeting (round 5).

The reference sizes its scratch arenas up front from context-length
heuristics (__init__.py:254-322 scratch_size_ratio; per-model
model_scratch tables, e.g. llama.h:30-83) so a config that cannot fit
fails at INIT, not mid-generation.  Our XLA path allocates lazily, so an
over-budget config used to be discovered as an opaque "TPU backend error
(Internal)" mid-bench (round 4: the B=16 bf16-KV OOM and the f32-scale
4.2 GB blowup).  This module gives the same early signal: an exact
weights+KV estimate plus a transient model, checked against the device's
HBM at engine construction.

Set NST_HBM=strict to turn the warning into a hard error; NST_HBM=off
disables the check (e.g. CPU test meshes where HBM is irrelevant).
"""

from __future__ import annotations

import dataclasses
import os
import warnings
from typing import Any, Optional

GiB = 1 << 30


@dataclasses.dataclass
class HBMEstimate:
    weight_bytes: int
    kv_bytes: int
    transient_bytes: int
    hbm_bytes: int

    @property
    def total_bytes(self) -> int:
        return self.weight_bytes + self.kv_bytes + self.transient_bytes

    @property
    def fits(self) -> bool:
        return self.total_bytes <= self.hbm_bytes

    def describe(self) -> str:
        return (f"HBM estimate: {self.weight_bytes / GiB:.2f} GiB weights"
                f" + {self.kv_bytes / GiB:.2f} GiB KV"
                f" + {self.transient_bytes / GiB:.2f} GiB transients"
                f" = {self.total_bytes / GiB:.2f} GiB"
                f" vs {self.hbm_bytes / GiB:.2f} GiB HBM"
                f" [{'fits' if self.fits else 'OVER BUDGET'}]")


def param_nbytes(params: Any) -> int:
    """Exact packed size of a params pytree (sums every array leaf)."""
    import jax

    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        if hasattr(leaf, "nbytes"):
            total += int(leaf.nbytes)
        elif hasattr(leaf, "size") and hasattr(leaf, "dtype"):
            total += int(leaf.size) * leaf.dtype.itemsize
    return total


def kv_cache_nbytes(n_layers: int, batch: int, max_len: int, kv_heads: int,
                    head_dim: int, kv_dtype, quantized: bool,
                    scale_dtype=None) -> int:
    """Cache pool bytes (contiguous and paged pools are the same total:
    the paged pool adds one trash page, negligible)."""
    import jax.numpy as jnp

    elts = 2 * n_layers * batch * kv_heads * max_len * head_dim
    if quantized:
        per = 1  # int8 codes
        sdt = jnp.dtype(scale_dtype or jnp.bfloat16)
        scale = 2 * n_layers * batch * kv_heads * max_len * sdt.itemsize
        return elts * per + scale
    return elts * jnp.dtype(kv_dtype).itemsize


def transient_nbytes(cfg, batch: int, bucket: int) -> int:
    """Largest-transient model for one prefill step at the biggest bucket
    (the lazy-allocation peak that OOMed round 4):

      * hidden-stream activations: a handful of [B, T, H] bf16 buffers
        alive at once through a layer (x, norm, attn-out, ffn mid)
      * rope/attention f32 temps: q and k at [B, T, heads, head_dim] f32
        (the exact pair of 128 MB temps behind the B=16 crash before the
        promotion-based rope rewrite — kept in the model as headroom)
      * logits: [B, T, vocab] f32 may materialize pre-gather in the
        prefill program; XLA usually fuses the gather, so charge the
        fused [B, vocab] row plus one [B, T, H]-scale buffer instead
    """
    h = cfg.hidden_size
    inter = cfg.intermediate_size
    heads = cfg.n_heads * cfg.head_dim
    act = 6 * batch * bucket * max(h, inter // 2) * 2
    rope = 2 * batch * bucket * heads * 4
    logits = 4 * batch * cfg.vocab_size + 2 * batch * bucket * h
    return act + rope + logits


def device_hbm_bytes(default_gb: float = 15.75) -> int:
    """Per-chip HBM.  memory_stats is unavailable through some tunnels;
    fall back to the v5e figure (16 GB minus runtime reserve)."""
    try:
        import jax

        d = jax.devices()[0]
        if d.platform == "cpu":
            return 1 << 62  # no budget on CPU test meshes
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return int(default_gb * GiB)


def preflight(params: Any, cfg, batch: int, max_len: int, kv_dtype,
              kv_quantized: bool, buckets, scale_dtype=None,
              what: str = "engine",
              kv_total_rows: Optional[int] = None,
              shards: int = 1) -> Optional[HBMEstimate]:
    """Estimate and warn/raise before XLA discovers the OOM the hard way.

    `kv_total_rows` overrides batch*max_len for the KV pool (paged
    engines budget n_pages * page_size physical rows).  `shards` divides
    weights+KV for mesh-sharded engines (the budget is per chip; jax
    reports GLOBAL nbytes for sharded arrays).
    Returns the estimate (None when NST_HBM=off)."""
    mode = os.environ.get("NST_HBM", "warn").lower()
    if mode == "off":
        return None
    rows = kv_total_rows if kv_total_rows is not None else batch * max_len
    est = HBMEstimate(
        weight_bytes=param_nbytes(params) // max(shards, 1),
        kv_bytes=kv_cache_nbytes(cfg.n_layers, 1, rows,
                                 cfg.n_kv_heads, cfg.head_dim, kv_dtype,
                                 kv_quantized, scale_dtype)
        // max(shards, 1),
        transient_bytes=transient_nbytes(cfg, batch,
                                         max(buckets) if buckets
                                         else max_len),
        hbm_bytes=device_hbm_bytes(),
    )
    if not est.fits:
        msg = (f"{what}: configuration is over the HBM budget — "
               + est.describe()
               + ". Reduce batch/ctx, quantize the KV (kv_quantized/"
               "memory_dtype='int8'), or use the paged cache with fewer "
               "pages. Set NST_HBM=off to bypass.")
        if mode == "strict":
            raise MemoryError(msg)
        warnings.warn(msg, stacklevel=3)
    return est
