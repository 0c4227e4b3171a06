"""Differential parity: our Refiner vs the ACTUAL reference Refiner.

Both refiners are driven with the same deterministic fake inference
function (a pure function of the muted-audio pattern), so every bisection
decision — accept/reject, interval shrink, final commit rule — must agree
for the final word timestamps to match exactly.

Reference: /root/reference/stable_whisper/non_whisper/refinement.py
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
    from stable_whisper import WhisperResult as RefResult  # noqa: E402
    from stable_whisper.non_whisper.refinement import (  # noqa: E402
        Refiner as RefRefiner)

from stable_ts_tpu.non_whisper.refinement import Refiner  # noqa: E402
from stable_ts_tpu.result import WhisperResult  # noqa: E402

SR = 16000


def make_result_dict():
    """A 2-segment result with tokens and confident words over ~8 s."""
    words = [
        # (word, start, end, tokens)
        (' hello', 0.40, 0.90, [11, 12]),
        (' there', 1.00, 1.45, [13]),
        (' this', 1.80, 2.20, [14]),
        (' is', 2.25, 2.50, [15, 16]),
        (' a', 2.55, 2.70, [17]),
        (' test.', 2.80, 3.40, [18]),
        (' second', 4.10, 4.70, [19, 20]),
        (' segment', 4.80, 5.50, [21]),
        (' words', 5.60, 6.20, [22, 23]),
        (' here.', 6.40, 7.10, [24]),
    ]
    segments, seg_words = [], []
    for i, (w, s, e, toks) in enumerate(words):
        seg_words.append(dict(word=w, start=s, end=e, probability=0.92,
                              tokens=toks))
        if w.endswith('.'):
            segments.append(dict(
                start=seg_words[0]['start'], end=seg_words[-1]['end'],
                text=''.join(x['word'] for x in seg_words),
                words=seg_words))
            seg_words = []
    return dict(text=''.join(w[0] for w in words), language='en',
                segments=segments)


def make_audio(seconds: float = 8.0, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(int(seconds * SR)) * 0.1).astype(np.float32)


def _probs_from_pattern(audio_np: np.ndarray, n_tokens: int, vocab: int):
    """Deterministic (2, n_tokens[, vocab]) probs from the mute pattern.

    Token probability rises with the unmuted fraction of its row, so
    muting more audio fails the drop tests and bisection reverses —
    exercising both branches over multiple rounds.
    """
    audio64 = audio_np.astype(np.float64)
    frac = (np.abs(audio64) > 1e-8).mean(axis=-1)  # (2,)
    k = np.arange(n_tokens, dtype=np.float64)
    base = 0.25 + 0.72 * frac[:, None] * (1.0 - 0.004 * (k % 7))[None, :]
    if vocab == 0:
        return base
    out = np.full((2, n_tokens, vocab), 1e-3, np.float64)
    return out, base


def fake_inference(vocab: int, token_ids):
    """Build paired (torch-flavored, numpy-flavored) inference functions."""
    def core(audio_np, text_tokens):
        n = len(text_tokens)
        if vocab == 0:
            return _probs_from_pattern(audio_np, n, 0)
        out, base = _probs_from_pattern(audio_np, n, vocab)
        for i, t in enumerate(text_tokens):
            out[:, i, t % vocab] = base[:, i]
        return out

    def for_reference(audio_segment, text_tokens):
        return torch.from_numpy(core(audio_segment.numpy(), text_tokens))

    def for_ours(audio_segment, text_tokens):
        return core(np.asarray(audio_segment), text_tokens)

    return for_reference, for_ours


def run_pair(steps='se', word_level=True, vocab=0, audio_seed=7,
             require_motion=True, **kw):
    audio = make_audio(seed=audio_seed)
    data = make_result_dict()
    token_ids = [t for s in data['segments'] for w in s['words']
                 for t in w['tokens']]
    ref_fn, our_fn = fake_inference(vocab, token_ids)

    ref_res = RefResult(data)
    with warnings.catch_warnings():
        warnings.simplefilter('ignore')
        RefRefiner(inference_func=ref_fn, word_level=word_level,
                   **kw).refine(audio, ref_res, steps=steps)

    our_res = WhisperResult(data)
    Refiner(inference_func=our_fn, word_level=word_level,
            **kw).refine(audio, our_res, steps=steps)

    ref_ts = [(w.word, w.start, w.end) for w in ref_res.all_words()]
    our_ts = [(w.word, w.start, w.end) for w in our_res.all_words()]
    assert our_ts == ref_ts
    if require_motion:
        # the refinement must have actually moved something, else the test
        # proves nothing
        orig = [(' ' + w.strip(), s, e)
                for segs in make_result_dict()['segments']
                for w, s, e in ((x['word'], x['start'], x['end'])
                                for x in segs['words'])]
        assert our_ts != orig


class TestRefineParity:
    def test_both_steps_word_level(self):
        run_pair(steps='se', word_level=True)

    def test_start_step_only(self):
        run_pair(steps='s', word_level=True)

    def test_segment_level(self):
        run_pair(steps='se', word_level=False)

    def test_rank_path_vocab_probs(self):
        # 3-dim probs exercise the best-token-rank comparison
        run_pair(steps='se', word_level=True, vocab=32)

    def test_rel_rel_prob_decrease(self):
        run_pair(steps='e', word_level=True, rel_rel_prob_decrease=0.05)

    def test_tighter_precision(self):
        run_pair(steps='se', word_level=True, precision=0.05)


class TestFuzzedRefineParity:
    """Randomized audio content (hence mute-pattern probabilities, hence
    bisection accept/reject paths) and option combinations — the lockstep
    batched refiner must track the reference's sequential machine exactly
    through every branch."""

    @pytest.mark.parametrize('seed', range(12))
    def test_random_audio_parity(self, seed):
        rng = np.random.default_rng(seed)
        run_pair(steps=str(rng.choice(['se', 's', 'e', 'es'])),
                 word_level=bool(rng.integers(2)),
                 vocab=int(rng.choice([0, 32])),
                 audio_seed=100 + seed,
                 require_motion=False,
                 precision=float(rng.choice([0.02, 0.1])))
