"""Pallas flash-attention kernels (prefill + decode over quantized KV).

Parity target: core/layers/mha_dense_wrapper.h — two chained GEMMs glued by
an online exp/row-sum epilogue (scale_exp_acc_sum_fp32_t at :104,
scale_write_back_t at :135), consuming the tiled KV cache.

The TPU design (implemented incrementally; `attention()` falls back to the
XLA reference until each case lands):
  * prefill: classic flash — grid (B*H, T/BT); K/V streamed in S-blocks with
    online softmax in VMEM.
  * decode: m=1 per slot — grid over S-blocks with per-block partial
    max/sum; reads int8 KV codes + per-token scales directly from the cache
    (no fp materialization in HBM).
"""

from __future__ import annotations


def flash_attention(*args, **kwargs):  # pragma: no cover - placeholder
    raise NotImplementedError("pallas flash kernels land in the perf stage")
