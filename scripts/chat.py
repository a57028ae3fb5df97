"""Interactive console chat (parity: reference application/main_run.cpp —
interactive/instruct console with streaming output and Ctrl-C handling).

    python scripts/chat.py --model <hf-dir-or-gguf> [--instruct]
"""

import argparse
import signal
import sys

from _common import add_gen_args, kv_from_args


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True)
    ap.add_argument("--instruct", action="store_true",
                    help="wrap turns in an instruction template")
    ap.add_argument("--system", default="You are a helpful assistant.")
    add_gen_args(ap)
    args = ap.parse_args()

    from neural_speed_tpu.api import Model

    _, kv_quant = kv_from_args(args)
    model = Model()
    if args.model.endswith(".gguf"):
        model.init_from_gguf(args.model, ctx_size=args.ctx_size,
                             kv_quantized=kv_quant)
    else:
        model.init(args.model, ctx_size=args.ctx_size, kv_quantized=kv_quant)

    history = []

    def on_sigint(signum, frame):
        print("\n[interrupted]")
        raise KeyboardInterrupt

    signal.signal(signal.SIGINT, on_sigint)
    print("== neural-speed-tpu chat; empty line or Ctrl-D to exit ==")
    while True:
        try:
            user = input("\n> ")
        except (EOFError, KeyboardInterrupt):
            break
        if not user.strip():
            break
        if args.instruct and model.tokenizer.chat_template is not None:
            history.append({"role": "user", "content": user})
            msgs = [{"role": "system", "content": args.system}] + history
            ids = model.tokenizer.apply_chat_template(
                msgs, add_generation_prompt=True
            )
        else:
            ids = model.tokenize(user)

        pieces = []

        def stream(tok_id: int):
            pieces.append(tok_id)
            sys.stdout.write(model.detokenize([tok_id]))
            sys.stdout.flush()

        try:
            model.generate([ids], max_new_tokens=args.n_predict,
                           do_sample=args.do_sample,
                           temperature=args.temperature, top_k=args.top_k,
                           top_p=args.top_p,
                           repetition_penalty=args.repetition_penalty,
                           streamer=stream, ignore_prompt=True)
        except KeyboardInterrupt:
            pass
        if args.instruct and model.tokenizer.chat_template is not None:
            history.append({"role": "assistant",
                            "content": model.detokenize(pieces)})
        print()


if __name__ == "__main__":
    main()
