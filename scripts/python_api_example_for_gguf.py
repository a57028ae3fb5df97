"""Minimal GGUF example (parity: python_api_example_for_gguf.py).

    python scripts/python_api_example_for_gguf.py model.gguf "prompt"
"""

import sys

from neural_speed_tpu.api import Model

if len(sys.argv) < 2:
    raise SystemExit(__doc__)
gguf_path = sys.argv[1]
prompt = sys.argv[2] if len(sys.argv) > 2 else "Once upon a time"

model = Model().init_from_gguf(gguf_path)
ids = (model.tokenize(prompt) if model.tokenizer is not None
       else [1, 2, 3, 4])


def streamer(tok: int) -> None:
    text = (model.detokenize([tok]) if model.tokenizer is not None
            else str(tok) + " ")
    print(text, end="", flush=True)


model.generate([ids], max_new_tokens=64, do_sample=False,
               streamer=streamer)
print()
