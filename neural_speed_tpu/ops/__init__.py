"""TPU-native op library: quantization, dequant-matmul, attention, norms,
rope, sampling — the Pallas/XLA analogue of the reference's BesTLA kernel
library + NE op set (bestla/bestla/, neural_speed/core/ne_layers.c)."""

from .qtypes import QSpec, QType, named_qspec  # noqa: F401
from .quantize import QTensor, dequantize, quantize  # noqa: F401
