"""None-timestamp repair vs the ACTUAL reference implementation.

The reference repairs missing word/segment timestamps inside its HF/MLX
backends (hf_whisper.py:160-227 ``replace_none_ts``; the importable twin
``WhisperMLX._fix_timestamps``, mlx_whisper.py:113 — same algorithm).
Here the repair lives in the result-ingestion path (result/repair.py,
wired into ``transcribe_any``); this suite fuzzes both over the same
None patterns and compares byte-for-byte.
"""
import os
import sys
import types

import numpy as np
import pytest

REFERENCE = '/root/reference'

if not os.path.isdir(os.path.join(REFERENCE, 'stable_whisper')):
    pytest.skip('reference package not available', allow_module_level=True)

if 'torchaudio' not in sys.modules:
    ta = types.ModuleType('torchaudio')
    ta.__version__ = '0.0-stub'
    ta.functional = types.ModuleType('torchaudio.functional')
    ta.transforms = types.ModuleType('torchaudio.transforms')
    sys.modules['torchaudio'] = ta
    sys.modules['torchaudio.functional'] = ta.functional
    sys.modules['torchaudio.transforms'] = ta.transforms

sys.path.insert(0, REFERENCE)

from stable_whisper.whisper_word_level.mlx_whisper import (  # noqa: E402
    WhisperMLX)

from stable_ts_tpu.non_whisper import transcribe_any  # noqa: E402
from stable_ts_tpu.result.repair import replace_none_ts  # noqa: E402


class _StubMLX:
    sampling_rate = 16000
    _fix_timestamps = WhisperMLX._fix_timestamps


def _reference_repair(parts, total_seconds=None):
    audio = (np.zeros(int(total_seconds * 16000), np.float32)
             if total_seconds is not None else None)
    _StubMLX()._fix_timestamps(parts, audio)
    return parts


def _random_parts(rng, n, none_rate=0.35):
    t = 0.0
    parts = []
    for i in range(n):
        dur = float(rng.uniform(0.1, 0.8))
        start, end = round(t, 3), round(t + dur, 3)
        t += dur + float(rng.uniform(0.0, 0.3))
        if rng.random() < none_rate:
            start = None
        if rng.random() < none_rate:
            end = None
        parts.append(dict(word=f' w{i}', start=start, end=end))
    return parts


@pytest.mark.parametrize('seed', range(25))
def test_repair_fuzz_matches_reference(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 12))
    total = float(rng.uniform(5.0, 30.0)) if rng.random() < 0.5 else None
    parts = _random_parts(rng, n)
    ours = [dict(p) for p in parts]
    theirs = [dict(p) for p in parts]
    replace_none_ts(ours, total)
    _reference_repair(theirs, total)
    assert ours == theirs


@pytest.mark.parametrize('pattern', [
    # every boundary case called out in the reference implementation
    [(None, None)],
    [(None, 1.0), (None, None)],
    [(0.0, None), (None, None), (3.0, 4.0)],
    [(None, 0.0), (0.0, None)],               # falsy-zero timestamps
    [(0.5, 1.5), (None, None), (None, None)],
    [(None, None), (None, None), (None, None)],
])
def test_repair_edge_patterns_match_reference(pattern):
    for total in (None, 10.0):
        parts = [dict(word=f' w{i}', start=s, end=e)
                 for i, (s, e) in enumerate(pattern)]
        ours = [dict(p) for p in parts]
        theirs = [dict(p) for p in parts]
        replace_none_ts(ours, total)
        _reference_repair(theirs, total)
        assert ours == theirs


def test_transcribe_any_repairs_none_ts():
    """End-to-end: a backend emitting None timestamps flows through
    transcribe_any with force_order=True (this used to crash) and comes
    out with the reference-repaired values."""
    audio = np.zeros(16000 * 8, np.float32)
    raw_words = [dict(word=' a', start=0.5, end=None),
                 dict(word=' b', start=None, end=None),
                 dict(word=' c', start=3.0, end=3.5)]

    def backend(audio):
        return [dict(start=0.5, end=None,
                     text=' a b c',
                     words=[dict(w) for w in raw_words])]

    result = transcribe_any(backend, audio, input_sr=16000,
                            force_order=True, suppress_silence=False,
                            regroup=False, verbose=None)
    expected = [dict(w) for w in raw_words]
    _reference_repair(expected, 8.0)
    got = [dict(word=w.word, start=w.start, end=w.end)
           for w in result.all_words()]
    assert got == [dict(word=e['word'], start=e['start'], end=e['end'])
                   for e in expected]


def test_transcribe_any_word_lists_repaired():
    """The list-of-word-lists input form repairs across segment
    boundaries (the flat stream is what the reference repairs)."""
    audio = np.zeros(16000 * 6, np.float32)

    def backend(audio):
        return [[dict(word=' a', start=0.2, end=None)],
                [dict(word=' b', start=None, end=2.0),
                 dict(word=' c', start=2.0, end=None)]]

    result = transcribe_any(backend, audio, input_sr=16000,
                            suppress_silence=False, regroup=False,
                            verbose=None)
    words = result.all_words()
    assert all(w.start is not None and w.end is not None for w in words)
    # ' a'.end copies ' b'.start once repaired? No: repair order fills
    # ' a'.end from the NEXT part's (pre-repair) start = None -> extended
    # end capped by ' b''s end (2.0). ' b'.start then copies ' a'.end.
    expected = [dict(word=' a', start=0.2, end=None),
                dict(word=' b', start=None, end=2.0),
                dict(word=' c', start=2.0, end=None)]
    _reference_repair(expected, 6.0)
    got = [dict(word=w.word, start=w.start, end=w.end) for w in words]
    assert got == [dict(word=e['word'], start=e['start'], end=e['end'])
                   for e in expected]
