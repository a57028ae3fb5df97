"""Minimal Python API example (parity: scripts/python_api_example.py)."""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from neural_speed_tpu.api import Model

model_name = sys.argv[1] if len(sys.argv) > 1 else "TinyLlama/TinyLlama-1.1B-Chat-v1.0"
prompt = "Once upon a time, there existed a little girl,"

model = Model()
model.init(model_name, weight_dtype="int4", group_size=128, alg="sym")
ids = model.tokenize(prompt)
outputs = model.generate([ids], max_new_tokens=64, do_sample=True,
                         temperature=0.8, top_k=40, top_p=0.95)
print(model.detokenize(outputs[0]))
