#!/usr/bin/env python
"""Validate stable_ts_tpu against the reference on a REAL Whisper checkpoint.

Usage:
    python tools/validate_real.py /path/to/tiny.en.pt [audio.flac]

This is the measurement harness for BASELINE.md's accuracy target
(word-timestamp MAE within ±20 ms of the reference CPU output on jfk.flac,
reference test/test_transcribe.py:13-30 invariants). The environment this
repo is built in has zero egress — no real checkpoint or tokenizer vocab can
be downloaded — so this script cannot run to completion *here*; it exists so
the claim is one file-drop away from verified:

1. Transcribes the audio with stable_ts_tpu on the given checkpoint.
2. Checks the golden invariants: language 'en'; transcript contains
   "my fellow americans"; every word.start < word.end; the word "americans"
   spans t=1.8 s.
3. If `stable_whisper` + `whisper` are importable, transcribes with the
   reference on the same checkpoint and reports per-word start/end MAE.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get('JAX_PLATFORMS'):
    # Honor the env var in-process: the axon sitecustomize pre-imports jax
    # and merges the TPU platform back in, so the env alone doesn't stick —
    # and a CPU-intended run that lands on the single-claim tunnel hangs
    # behind whatever process holds the chip.
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

DEFAULT_AUDIO = '/root/reference/test/jfk.flac'


def check_invariants(result) -> list:
    failures = []
    text = result.text.lower()
    if 'my fellow americans' not in text:
        failures.append(f'transcript missing "my fellow americans": {text[:120]!r}')
    words = [w for seg in result.segments for w in seg.words]
    bad_spans = [(w.word, w.start, w.end) for w in words if not w.start < w.end]
    if bad_spans:
        failures.append(f'{len(bad_spans)} words with start >= end: {bad_spans[:5]}')
    americans = [w for w in words if 'americans' in w.word.lower()]
    if not americans:
        failures.append('word "americans" not found')
    elif not any(w.start <= 1.8 <= w.end for w in americans):
        failures.append('no "americans" span covers t=1.8s: '
                        + str([(w.start, w.end) for w in americans]))
    return failures


def word_mae(ours, theirs):
    """Mean |Δstart| + |Δend| over matched words (None if texts differ)."""
    a = [w for seg in ours.segments for w in seg.words]
    b = [w for seg in theirs.segments for w in seg.words]
    if [w.word.strip().lower() for w in a] != [w.word.strip().lower() for w in b]:
        return None, None
    start_mae = sum(abs(x.start - y.start) for x, y in zip(a, b)) / len(a)
    end_mae = sum(abs(x.end - y.end) for x, y in zip(a, b)) / len(a)
    return start_mae, end_mae


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    checkpoint = sys.argv[1]
    audio = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_AUDIO
    if not os.path.exists(checkpoint):
        sys.exit(f'checkpoint not found: {checkpoint}')
    if not os.path.exists(audio):
        sys.exit(f'audio not found: {audio}')

    import stable_ts_tpu
    print(f'[stable_ts_tpu] loading {checkpoint} ...')
    model = stable_ts_tpu.load_model(checkpoint)
    print(f'[stable_ts_tpu] transcribing {audio} ...')
    ours = model.transcribe(audio, verbose=None)
    print(f'[stable_ts_tpu] language={ours.language} text={ours.text!r}')
    failures = check_invariants(ours)
    for f in failures:
        print(f'[INVARIANT FAIL] {f}')
    if not failures:
        print('[stable_ts_tpu] all golden invariants PASS')

    try:
        import stable_whisper
    except ImportError:
        print('\n[reference] stable_whisper package unavailable — MAE '
              'comparison skipped. Install openai-whisper + stable-ts and '
              'rerun for the ±20 ms check.')
        sys.exit(1 if failures else 0)

    print('[reference] loading + transcribing with stable_whisper ...')
    ref_model = stable_whisper.load_model(checkpoint)
    theirs = ref_model.transcribe(audio, verbose=None)
    start_mae, end_mae = word_mae(ours, theirs)
    if start_mae is None:
        print('[reference] word texts differ; cannot compute MAE directly.')
        print(f'  ours:   {ours.text!r}')
        print(f'  theirs: {theirs.text!r}')
        sys.exit(1)
    print(f'[MAE] start={start_mae * 1000:.1f} ms  end={end_mae * 1000:.1f} ms '
          f'(target: <= 20 ms)')
    ok = not failures and start_mae <= 0.02 and end_mae <= 0.02
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
