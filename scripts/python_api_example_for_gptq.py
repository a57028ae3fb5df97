"""Minimal GPTQ/AWQ example (parity: python_api_example_for_gptq.py):
pre-quantized HF checkpoints are detected from quantization_config and
repacked losslessly into the engine's planar format (convert/gptq.py,
incl. act-order g_idx and AWQ interleave).

    python scripts/python_api_example_for_gptq.py <gptq-model-dir> "prompt"
"""

import sys

from neural_speed_tpu.api import Model

if len(sys.argv) < 2:
    raise SystemExit(__doc__)
model_dir = sys.argv[1]
prompt = sys.argv[2] if len(sys.argv) > 2 else "Once upon a time"

# Model.init routes through the GPTQ repack path automatically when the
# checkpoint carries quantization_config (use_quant re-quantization is
# skipped — the stored int weights are ingested bit-exactly)
model = Model().init(model_dir, use_quant=True)
ids = model.tokenize(prompt)
out = model.generate([ids], max_new_tokens=64, do_sample=False,
                     ignore_prompt=True)[0]
print(model.detokenize(out))
