"""Differential parity: our engine-agnostic Aligner vs the ACTUAL reference
Aligner, both driven by the same deterministic fake inference function.

Every seek/fallback decision — zero-duration trimming, word requeue,
duration clamps, EOF pinning, unaligned-tail handling — must agree for the
final word timestamps to match.

Reference: /root/reference/stable_whisper/non_whisper/alignment.py
"""
import os
import sys
import types
import warnings

import numpy as np
import pytest

REFERENCE = '/root/reference'

if not os.path.isdir(os.path.join(REFERENCE, 'stable_whisper')):
    pytest.skip('reference package not available', allow_module_level=True)

torch = pytest.importorskip('torch')

if 'torchaudio' not in sys.modules:
    ta = types.ModuleType('torchaudio')
    ta.__version__ = '0.0-stub'
    ta.functional = types.ModuleType('torchaudio.functional')
    ta.transforms = types.ModuleType('torchaudio.transforms')
    sys.modules['torchaudio'] = ta
    sys.modules['torchaudio.functional'] = ta.functional
    sys.modules['torchaudio.transforms'] = ta.transforms

sys.path.insert(0, REFERENCE)
with warnings.catch_warnings():
    warnings.simplefilter('ignore')
    from stable_whisper.non_whisper.alignment import (  # noqa: E402
        Aligner as RefAligner)

from stable_ts_tpu.non_whisper.alignment import Aligner  # noqa: E402

SR = 16000


def _encode(text):
    return [ord(c) for c in text]


def _decode(tokens):
    return ''.join(chr(t) for t in tokens)


def _fake_inference(audio_segment, word_tokens):
    """Deterministic word spreader: durations hash from the word text, so
    identical inputs on both sides produce identical raw outputs. Words
    that run past the segment end collapse to zero duration at the edge —
    exactly the shape that exercises requeue/fallback."""
    arr = np.asarray(audio_segment)
    seg_dur = arr.shape[-1] / SR
    out = []
    t = 0.1
    for wt in word_tokens:
        word = wt.word if hasattr(wt, 'word') else str(wt)
        dur = 0.1 + (sum(map(ord, word)) % 7) / 12.0
        start = round(min(t, seg_dur), 3)
        end = round(min(t + dur, seg_dur), 3)
        out.append(dict(word=word, start=start, end=end, probability=0.9))
        t += dur + 0.04
    return out


TEXTS = [
    'Hello world this is a test of the aligner engine.',
    'Short one.',
    'Many many words follow here so the text spills well past the first '
    'segment window and forces at least one requeue of the unaligned tail '
    'with several more words to spread out over time.',
]


def _run(cls, text, audio, **opts):
    aligner = cls(inference_func=_fake_inference, decode=_decode,
                  encode=_encode, sample_rate=SR, **opts)
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        result = aligner.align(audio, text)
    if result is None:
        return None
    return [(w.word, round(w.start, 3), round(w.end, 3))
            for s in result.segments for w in (s.words or [])]


@pytest.mark.parametrize('text_idx', range(len(TEXTS)))
@pytest.mark.parametrize('seconds', [6.0, 14.0])
def test_aligner_matches_reference(text_idx, seconds):
    rng = np.random.default_rng(42)
    audio = (rng.standard_normal(int(SR * seconds)) * 0.2).astype(np.float32)
    got = _run(Aligner, TEXTS[text_idx], audio)
    ref = _run(RefAligner, TEXTS[text_idx], torch.from_numpy(audio))
    assert got == ref


@pytest.mark.parametrize('opts', [
    dict(remove_instant_words=True),
    dict(word_dur_factor=None, max_word_dur=None),
    dict(original_split=True),
    dict(token_step=8),
])
def test_aligner_option_parity(opts):
    rng = np.random.default_rng(7)
    audio = (rng.standard_normal(SR * 10) * 0.2).astype(np.float32)
    text = TEXTS[2]
    got = _run(Aligner, text, audio, **opts)
    ref = _run(RefAligner, text, torch.from_numpy(audio), **opts)
    assert got == ref, opts
