"""Whisper transcription CLI (parity: reference application/audio_run.cpp).

    python scripts/audio_run.py --model openai/whisper-tiny --wav audio.wav
"""

import argparse
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True, help="HF whisper model/dir")
    ap.add_argument("--wav", required=True)
    ap.add_argument("--language", default="en")
    ap.add_argument("--task", default="transcribe",
                    choices=["transcribe", "translate"])
    ap.add_argument("--use_quant", action="store_true")
    ap.add_argument("--weight_dtype", default="int8")
    args = ap.parse_args()

    from neural_speed_tpu.api import AudioModel

    m = AudioModel().init(args.model, use_quant=args.use_quant,
                          weight_dtype=args.weight_dtype)
    out = m.transcribe(args.wav, language=args.language, task=args.task)
    print(out)


if __name__ == "__main__":
    main()
