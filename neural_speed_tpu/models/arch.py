"""Architecture configuration for the shared decoder skeleton.

The reference implements ~18 decoder archs as separate C++ graph builders
(neural_speed/models/<arch>/<arch>.cpp) that share ~90% structure.  Here a
single functional decoder (models/transformer.py) is parameterized by this
config; each knob cites the reference peculiarity it reproduces
(SURVEY.md §2.4 table).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from ..ops.rope import RopeScaling


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    """Mixture-of-experts (mixtral/grok; reference llama.cpp:620-689,
    grok.cpp:208-316 using ne_mul_mat_id / ne_top_k)."""

    num_experts: int
    top_k: int
    # grok applies extra RMSNorms around the MoE block (grok.cpp:208-316)
    pre_norm: bool = False
    post_norm: bool = False
    # mixtral renormalizes the selected experts' weights to sum to 1
    # (softmax over the top-k logits); grok uses the GLOBAL softmax probs
    # of the selected experts unrenormalized (grok.cpp:296-300 — the
    # weights_sum division is commented out in the reference)
    renorm: bool = True


@dataclasses.dataclass(frozen=True)
class ArchConfig:
    name: str
    vocab_size: int
    hidden_size: int
    n_layers: int
    n_heads: int
    n_kv_heads: int
    intermediate_size: int
    max_position_embeddings: int = 4096
    head_dim: Optional[int] = None      # gemma: != hidden/n_heads (gemma.cpp:46)

    # --- norms ---
    norm: str = "rms"                   # "rms" | "ln"
    norm_eps: float = 1e-5
    gemma_norm: bool = False            # (1 + w) convention
    embedding_ln: bool = False          # bloom.cpp:191 learned embedding LN
    final_norm: bool = True
    post_attn_norm: bool = False        # grok attn-output RMSNorm
    post_ffn_norm: bool = False         # grok ffn-output RMSNorm

    # --- attention ---
    qkv_bias: bool = False              # qwen.cpp:58 bias on QKV
    o_bias: bool = False
    clip_qkv: Optional[float] = None    # mpt.cpp clip_qkv
    use_alibi: bool = False             # mpt/bloom/baichuan-13b
    logit_softcap: float = 0.0          # grok 30*tanh(x/30) (IS_TANH30 flag)
    logn_attn: bool = False             # qwen long-ctx logn scaling
    attn_scale: Optional[float] = None  # override 1/sqrt(head_dim)

    # --- rope ---
    rope_style: str = "neox"            # "neox" | "gptj" | "none" | "chatglm"
    rope_base: float = 10000.0
    rot_dim: Optional[int] = None       # partial rotary (phi/stablelm/gptj)
    rope_scaling: Optional[RopeScaling] = None

    # --- positions ---
    learned_pos: bool = False           # opt/starcoder learned absolute
    pos_offset: int = 0                 # opt.cpp:99-110 offset=2

    # --- ffn ---
    act: str = "silu"                   # silu | gelu | gelu_tanh | relu
    gated_ffn: bool = True              # llama-style gate*up; False => fc1/fc2
    mlp_bias: bool = False
    parallel_residual: bool = False     # gptj/gptneox par_res/phi/falcon
    # parallel residual with a single shared input norm (gptj/phi) vs two
    # separate norms (gptneox par_res, falcon-40b ln_attn/ln_mlp)
    shared_parallel_norm: bool = False

    # --- scaling conventions ---
    embed_scale: float = 1.0            # gemma: sqrt(hidden_size)
    logit_scale: float = 1.0            # grok output multiplier
    deepnorm_alpha: Optional[float] = None  # chatglm-1 residual alpha

    # --- moe ---
    moe: Optional[MoEConfig] = None

    # --- head ---
    tie_word_embeddings: bool = False

    # --- runtime: decode KV-append path ---
    # "env" resolves NST_DEFER_APPEND / NST_FUSED_APPEND at Engine
    # construction (transformer.kv_append_mode); explicit values pin the
    # path.  Part of this (static-jit-arg) config so flag changes retrace
    # instead of silently reusing the first-traced program (ADVICE r3:
    # the env kill switch no-op'd after the first trace in a process).
    #   "plain" — append-then-attend (RMW windows before the kernel)
    #   "defer" — attention takes the new k/v as operands, append off
    #             the critical path (round-3 certified default)
    #   "fused" — in-kernel aliased append (zero separate dispatches)
    kv_append: str = "env"

    def __post_init__(self):
        if self.head_dim is None:
            object.__setattr__(
                self, "head_dim", self.hidden_size // self.n_heads
            )

    @property
    def q_dim(self) -> int:
        return self.n_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.n_kv_heads * self.head_dim
