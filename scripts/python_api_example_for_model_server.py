"""ModelServer example (parity: python_api_example_for_model_server.py):
issue queries from any thread; a worker thread runs the continuous-
batching scheduler and fires the callback per finished request.

    python scripts/python_api_example_for_model_server.py <hf-model-dir>
"""

import sys
import threading

from neural_speed_tpu.api import Model, ModelServer
from neural_speed_tpu.ops.sampling import SamplingParams

if len(sys.argv) < 2:
    raise SystemExit(__doc__)
model = Model().init(sys.argv[1], use_quant=True, weight_dtype="int4",
                     group_size=128, max_batch=4)

PROMPTS = [
    "Once upon a time, there existed a little girl,",
    "The capital of France is",
    "An increasing sequence: one, two, three,",
]
done = threading.Event()
results = {}


def callback(rid: int, tokens) -> None:
    results[rid] = tokens
    print(f"[request {rid}] {model.detokenize(tokens)!r}")
    if len(results) == len(PROMPTS):
        done.set()


server = ModelServer(
    model.engine, callback,
    sampling=SamplingParams(do_sample=False, repetition_penalty=1.1),
    eos_id=model.eos_id, max_new_tokens=48, warmup=True,
)
for p in PROMPTS:
    server.issue_query(model.tokenize(p))
done.wait(timeout=600)
server.shutdown()
