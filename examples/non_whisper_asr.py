"""Use stable_ts_tpu's stabilization with ANY ASR engine.

Counterpart of the reference's examples/non-whisper.ipynb: `transcribe_any`
wraps an arbitrary inference function (local model or cloud API) and applies
the full post-processing stack — silence suppression, regrouping, and
subtitle output — to its result.

The inference function receives (audio, **kwargs) and may return any of:
  - a WhisperResult-style dict: {'segments': [{'words': [...]} or
    {'start','end','text'}], 'language': ...}
  - a list of segment dicts
  - plain text (gets one segment spanning the audio)

Run:  python examples/non_whisper_asr.py path/to/audio.wav
"""
import sys

import stable_ts_tpu as st


def my_asr(audio, **kwargs):
    """Stand-in for any ASR engine. ``audio`` is float32 mono 16 kHz."""
    duration = len(audio) / 16000
    # ... call your engine here ...
    return [
        dict(start=0.0, end=min(2.0, duration), text='hello from'),
        dict(start=min(2.0, duration), end=duration, text='another engine'),
    ]


def main():
    audio = sys.argv[1] if len(sys.argv) > 1 else None
    if audio is None:
        import numpy as np
        audio = (np.random.default_rng(0).standard_normal(16000 * 4) * 0.05
                 ).astype('float32')

    result = st.transcribe_any(
        my_asr,
        audio,
        input_sr=16000,         # required for raw arrays
        vad=False,              # or True / 'silero' / 'energy'
        suppress_silence=True,  # clip word edges to non-silence
        regroup=True,           # default regroup chain
    )
    print(result.to_srt_vtt(word_level=False))


if __name__ == '__main__':
    main()
