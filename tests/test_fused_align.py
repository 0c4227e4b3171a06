"""Fused single-window align pass vs the unfused composition.

The default align mode (legacy aligner + known heads) runs the whole
per-window timing pass as ONE compiled program
(timing._fused_align_window); these tests pin exact equivalence with the
unfused path (mel / encoder / decoder+capture / legacy_head_weights / DTW
as separate dispatches via add_word_timestamps) — timestamps, words, and
tokens byte-for-byte; probabilities to f32-fusion tolerance.
"""
import numpy as np
import pytest

import stable_ts_tpu.alignment as alignment_mod
from stable_ts_tpu.alignment import (_fused_single_window_func,
                                     _whisper_alignment_func)
from stable_ts_tpu.constants import SAMPLE_RATE
from stable_ts_tpu.loaders import load_test_model
from stable_ts_tpu.non_whisper.alignment import WordToken
from stable_ts_tpu.options import AllOptions


def assert_words_equal(a, b):
    """Timestamps/words/tokens byte-for-byte; probabilities to f32-fusion
    tolerance (one program vs many changes the summation order inside the
    softmax — ~1e-7 relative, never the math)."""
    assert len(a) == len(b)
    for wa, wb in zip(a, b):
        assert {k: v for k, v in wa.items() if k != 'probability'} \
            == {k: v for k, v in wb.items() if k != 'probability'}
        np.testing.assert_allclose(wa['probability'], wb['probability'],
                                   rtol=1e-5, atol=1e-9)


@pytest.fixture(scope='module')
def model():
    # every (layer, head) used by the capture table path; two layers
    return load_test_model(alignment_heads=[(0, 1), (1, 0), (1, 1)])


@pytest.fixture(scope='module')
def tokenizer(model):
    return model.get_tokenizer(language='en', task='transcribe')


def _word_tokens(tokenizer, text):
    words = [' ' + w for w in text.split()]
    return [WordToken(w, tokenizer.encode(w)) for w in words]


def _unfused_func(model, tokenizer, monkeypatch_ctx):
    opts = AllOptions({}, vanilla_align=True)
    monkeypatch_ctx.setattr(alignment_mod, '_legacy_known_heads',
                            lambda *a: False)
    try:
        return _whisper_alignment_func(model, tokenizer, opts)
    finally:
        monkeypatch_ctx.undo()


@pytest.mark.parametrize('seconds,text', [
    (3, 'hello world how are you'),
    (1, 'hi'),                      # short window (cropped frame columns)
    (6, 'the quick brown fox jumps over the lazy dog again and again'),
])
def test_fused_matches_unfused(model, tokenizer, monkeypatch, seconds, text):
    rng = np.random.default_rng(seconds)
    audio = (rng.standard_normal(SAMPLE_RATE * seconds) * 0.3
             ).astype(np.float32)
    wts = _word_tokens(tokenizer, text)
    fast = _fused_single_window_func(model, tokenizer)
    slow = _unfused_func(model, tokenizer, monkeypatch)
    out_fast = fast(audio, [WordToken(w.word, list(w.tokens)) for w in wts])
    out_slow = slow(audio, [WordToken(w.word, list(w.tokens)) for w in wts])
    assert_words_equal(out_fast, out_slow)


def test_fused_handles_padding_word_tokens(model, tokenizer, monkeypatch):
    """align() with presplit inserts gap-padding WordTokens mid-stream —
    the fused path must time them like any word (the Aligner drops them
    during verification)."""
    rng = np.random.default_rng(7)
    audio = (rng.standard_normal(SAMPLE_RATE * 4) * 0.3).astype(np.float32)
    wts = _word_tokens(tokenizer, 'alpha beta gamma')
    pad = WordToken(' ...', tokenizer.encode(' ...'), True)
    wts = [wts[0], pad, *wts[1:]]
    fast = _fused_single_window_func(model, tokenizer)
    slow = _unfused_func(model, tokenizer, monkeypatch)
    out_fast = fast(audio, [WordToken(w.word, list(w.tokens), w.is_padding)
                            for w in wts])
    out_slow = slow(audio, [WordToken(w.word, list(w.tokens), w.is_padding)
                            for w in wts])
    assert_words_equal(out_fast, out_slow)


def test_align_end_to_end_uses_fused_path(model):
    """model.align() in the default mode routes through the fused pass and
    still produces a full result."""
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(SAMPLE_RATE * 3) * 0.3).astype(np.float32)
    result = model.align(audio, ' hello world how are you', language='en',
                         verbose=None)
    assert result is not None and result.has_words
    assert result.text == ' hello world how are you'
