"""neural_speed_tpu — a TPU-native weight-only-quantized LLM inference engine.

Brand-new JAX/XLA/Pallas framework with the capability set of
intel/neural-speed (see SURVEY.md): n-bit weight quantization (int1..int8,
nf4, fp4, fp8), fused dequant+GEMM Pallas kernels, fused attention with a
quantized KV cache, a 15+-arch model zoo on a shared decoder skeleton,
continuous batching, beam search, StreamingLLM/shift-RoPE infinite
inference, and GSPMD tensor parallelism over TPU meshes.
"""

__version__ = "0.1.0"

from .ops import QSpec, QTensor, QType, named_qspec  # noqa: F401

# Heavier user-facing API (Model, ModelServer) is imported lazily to keep
# `import neural_speed_tpu` cheap for kernel-only users.


def __getattr__(name):
    if name in ("Model", "ModelServer", "AudioModel"):
        from . import api

        return getattr(api, name)
    if name == "convert_model":
        from .convert import convert_model

        return convert_model
    raise AttributeError(name)
