"""Whisper one-liner (parity: reference scripts/whisper_example.py —
model(audio_file) transcription).

    python scripts/whisper_example.py <whisper-hf-dir> <audio.wav>
"""

import sys

from neural_speed_tpu.api import AudioModel

if len(sys.argv) != 3:
    raise SystemExit("Usage: python whisper_example.py model_path audio_file")
model_name, audio_file = sys.argv[1], sys.argv[2]

model = AudioModel().init(model_name)
print(model.transcribe(audio_file))
