"""Tests for the engine-agnostic Aligner/Refiner and whisper glue.

A scripted fake backend gives deterministic timings to test the loop
machinery (chunking, fallback requeueing, EOF handling); the synthetic JAX
model exercises the real glue end-to-end.
"""
import numpy as np
import pytest

from stable_ts_tpu.constants import SAMPLE_RATE
from stable_ts_tpu.loaders import load_test_model
from stable_ts_tpu.non_whisper.alignment import (Aligner, WordToken,
                                                 tokens_to_word_tokens,
                                                 merge_punctuations)
from stable_ts_tpu.non_whisper.refinement import Refiner
from stable_ts_tpu.non_whisper.transcribe import transcribe_any
from stable_ts_tpu.result import WhisperResult


def byte_encode(text: str):
    return list(text.encode('utf-8'))


def byte_decode(tokens):
    return bytes(tokens).decode('utf-8', errors='replace')


def spread_inference_func(words_per_second: float = 2.0):
    """Fake backend: spreads words evenly from t=0 in each segment."""
    def inference_func(audio_segment, word_tokens):
        dur = 1.0 / words_per_second
        out = []
        t = 0.0
        for wt in word_tokens:
            out.append(dict(word=wt.word, start=round(t, 3),
                            end=round(t + dur, 3), probability=0.9))
            t += dur
        return out
    return inference_func


class TestWordTokenHelpers:
    def test_tokens_to_word_tokens(self):
        tokens = byte_encode(' hello world test')
        wts = tokens_to_word_tokens(tokens, byte_decode, True)
        assert [w.word for w in wts] == [' hello', ' world', ' test']
        assert sum((w.tokens for w in wts), []) == tokens

    def test_merge_punctuations(self):
        wts = tokens_to_word_tokens(byte_encode(' " hi there ."'), byte_decode, True)
        # '"' prepended, '."' appended handling via merge
        text = ''.join(w.word for w in wts)
        assert text == ' " hi there ."'

    def test_padding_append_raises(self):
        pad = WordToken(' ...', [1], is_padding=True)
        with pytest.raises(TypeError):
            pad.append(WordToken('x', [2]))


class TestAlignerFakeBackend:
    def _audio(self, seconds=10):
        return np.random.default_rng(0).standard_normal(
            SAMPLE_RATE * seconds).astype(np.float32) * 0.3

    def test_align_basic(self):
        aligner = Aligner(
            inference_func=spread_inference_func(),
            decode=byte_decode,
            encode=byte_encode,
            suppress_silence=False,
        )
        result = aligner.align(self._audio(), ' one two three four five')
        assert result is not None
        assert result.text == ' one two three four five'
        words = result.all_words()
        assert all(w.end > w.start for w in words)
        assert all(a.end <= b.start + 1e-9 for a, b in zip(words[:-1], words[1:]))

    def test_align_token_step_chunks(self):
        # token_step smaller than the text forces multiple passes.
        text = ' ' + ' '.join(f'word{i}' for i in range(30))
        aligner = Aligner(
            inference_func=spread_inference_func(4.0),
            decode=byte_decode,
            encode=byte_encode,
            token_step=40,
            suppress_silence=False,
        )
        result = aligner.align(self._audio(30), text)
        assert result is not None
        assert result.text == text

    def test_align_original_split(self):
        text = 'line one here\nline two there'
        aligner = Aligner(
            inference_func=spread_inference_func(),
            decode=byte_decode,
            encode=byte_encode,
            original_split=True,
            suppress_silence=False,
        )
        result = aligner.align(self._audio(), text)
        assert len(result) == 2
        assert result[0].text.strip() == 'line one here'
        assert result[1].text.strip() == 'line two there'

    def test_align_failure_appends_missing_at_eof(self):
        # Backend that produces zero-duration words -> nothing aligns;
        # leftover words pinned at EOF timestamp.
        def zero_dur(audio_segment, word_tokens):
            return [dict(word=wt.word, start=0.0, end=0.0, probability=0.0)
                    for wt in word_tokens]

        aligner = Aligner(
            inference_func=zero_dur,
            decode=byte_decode,
            encode=byte_encode,
            suppress_silence=False,
        )
        with pytest.warns(UserWarning):
            result = aligner.align(self._audio(2), ' alpha beta')
        assert result is not None
        dur = 2.0
        assert all(w.start == pytest.approx(dur, abs=0.1)
                   for w in result.all_words())

    def test_align_remove_instant_words(self):
        def zero_dur(audio_segment, word_tokens):
            return [dict(word=wt.word, start=0.0, end=0.0, probability=0.0)
                    for wt in word_tokens]

        aligner = Aligner(
            inference_func=zero_dur,
            decode=byte_decode,
            encode=byte_encode,
            remove_instant_words=True,
            suppress_silence=False,
        )
        with pytest.warns(UserWarning):
            result = aligner.align(self._audio(2), ' alpha beta')
        assert result is None or len(result) == 0

    def test_align_words_confined(self):
        aligner = Aligner(
            inference_func=spread_inference_func(),
            decode=byte_decode,
            encode=byte_encode,
            suppress_silence=False,
        )
        source = WhisperResult([
            dict(start=0.0, end=2.0, text=' hello world'),
            dict(start=3.0, end=5.0, text=' more text'),
        ])
        result = aligner.align_words(self._audio(6), source)
        assert result.has_words
        # words confined to their segments' ranges
        assert result[0].start >= 0.0 and result[0].end <= 2.6
        assert result[1].start >= 3.0

    def test_backend_word_mismatch_raises(self):
        def bad_backend(audio_segment, word_tokens):
            return [dict(word='XXX', start=0, end=1, probability=1.0)
                    for _ in word_tokens]

        aligner = Aligner(inference_func=bad_backend, decode=byte_decode,
                          encode=byte_encode, suppress_silence=False)
        with pytest.raises(RuntimeError):
            aligner.align(self._audio(2), ' alpha beta')


class TestAlignerWhisperGlue:
    @pytest.fixture(scope='class')
    def model(self):
        return load_test_model()

    def test_align_runs(self, model):
        audio = np.random.default_rng(0).standard_normal(
            SAMPLE_RATE * 3).astype(np.float32) * 0.3
        result = model.align(audio, ' hello world how are you', language='en',
                             verbose=None)
        assert result is not None
        assert result.text == ' hello world how are you'
        assert result.has_words

    def test_align_words_runs(self, model):
        audio = np.random.default_rng(0).standard_normal(
            SAMPLE_RATE * 4).astype(np.float32) * 0.3
        source = WhisperResult([
            dict(start=0.0, end=2.0, text=' first bit'),
            dict(start=2.0, end=4.0, text=' second bit'),
        ])
        result = model.align_words(audio, source, language='en', verbose=None)
        assert result.has_words
        assert result.text == ' first bit second bit'

    def test_refine_runs(self, model):
        audio = np.random.default_rng(0).standard_normal(
            SAMPLE_RATE * 3).astype(np.float32) * 0.3
        base = model.align(audio, ' hello world', language='en', verbose=None)
        before = [(w.start, w.end) for w in base.all_words()]
        refined = model.refine(audio, base, verbose=None)
        assert refined.has_words
        assert len(refined.all_words()) == len(before)

    def test_refine_tiny_audio_does_not_crash(self, model):
        """A probe span of <= N_FFT//2 + 1 audio samples used to empty the
        reflect-continuation slice in the batched prob function
        (row[t-2:-1:-1] wraps to row[t-2:len-1:-1]) and crash with a
        broadcast error. Audio shorter than the reflect tail forces the
        span below that bound."""
        from stable_ts_tpu.result import WhisperResult
        audio = (np.random.default_rng(7).standard_normal(150) * 0.3
                 ).astype(np.float32)  # 150 samples < N_FFT//2 + 2
        tokenizer = model.get_tokenizer(language='en', task='transcribe')
        words = [dict(word=' a', start=0.001, end=0.005, probability=0.9,
                      tokens=tokenizer.encode(' a')),
                 dict(word=' b', start=0.005, end=0.009, probability=0.9,
                      tokens=tokenizer.encode(' b'))]
        base = WhisperResult(dict(
            text=' a b', language='en',
            segments=[dict(start=0.001, end=0.009, text=' a b',
                           words=words)]))
        refined = model.refine(audio, base, inplace=False, verbose=None,
                               parallel=True)  # force the batched prob fn
        assert refined.has_words

    def test_refine_parallel_matches_sequential(self, model):
        """Lockstep-batched refine must produce identical timestamps."""
        audio = np.random.default_rng(4).standard_normal(
            SAMPLE_RATE * 8).astype(np.float32) * 0.3
        text = ' hello world this is a longer test of refinement'
        base = model.align(audio, text, language='en', verbose=None)
        seq = model.refine(audio, base, inplace=False, parallel=False,
                           verbose=None)
        par = model.refine(audio, base, inplace=False, parallel=True,
                           verbose=None)
        seq_ts = [(w.word, w.start, w.end) for w in seq.all_words()]
        par_ts = [(w.word, w.start, w.end) for w in par.all_words()]
        assert seq_ts == par_ts

    def test_align_words_parallel_matches_sequential(self, model):
        audio = np.random.default_rng(6).standard_normal(
            SAMPLE_RATE * 12).astype(np.float32) * 0.3
        base = model.align(audio, ' hello world this is a longer test of '
                           'alignment here', language='en', verbose=None)
        segs = [dict(start=s.start, end=s.end, text=s.text)
                for s in base.segments]
        seq = model.align_words(audio, [dict(s) for s in segs], language='en',
                                verbose=None, parallel=False)
        par = model.align_words(audio, [dict(s) for s in segs], language='en',
                                verbose=None, parallel=True)
        a = [(w.word, w.start, w.end) for w in seq.all_words()]
        b = [(w.word, w.start, w.end) for w in par.all_words()]
        assert a == b and len(a) > 0

    def test_locate_mode2(self, model):
        audio = np.random.default_rng(0).standard_normal(
            SAMPLE_RATE * 3).astype(np.float32) * 0.3
        matches = model.locate(audio, ' hello', language='en', mode=2,
                               verbose=None)
        assert isinstance(matches, list)
        assert matches and 'target_end' in matches[0]

    def test_locate_selective_capture_matches_full(self, model):
        """With alignment heads set, locate's end estimate rides the
        device-side selective QK capture; selecting ALL heads must
        reproduce the heads-None (full-capture) estimate exactly."""
        audio = np.random.default_rng(3).standard_normal(
            SAMPLE_RATE * 3).astype(np.float32) * 0.3
        full = model.locate(audio, ' hello', language='en', mode=2,
                            verbose=None)
        all_heads = [(l, h) for l in range(model.dims.n_text_layer)
                     for h in range(model.dims.n_text_head)]
        old = model.alignment_heads
        try:
            model.alignment_heads = all_heads
            sel = model.locate(audio, ' hello', language='en', mode=2,
                               verbose=None)
        finally:
            model.alignment_heads = old
        assert [m['target_end'] for m in sel] == \
            [m['target_end'] for m in full]

    def test_locate_speculative_confirm_matches_single_step(self, model,
                                                            monkeypatch):
        """The K-step speculative confirmation decode must reproduce the
        single-step loop exactly: same matches, same tokens, same probs
        (speculation only batches identical computations)."""
        audio = np.random.default_rng(5).standard_normal(
            SAMPLE_RATE * 5).astype(np.float32) * 0.3
        monkeypatch.setenv('STABLE_TS_TPU_SPEC', '0')
        plain = model.locate(audio, ' hello', language='en', mode=1,
                             verbose=None)
        monkeypatch.delenv('STABLE_TS_TPU_SPEC')
        spec = model.locate(audio, ' hello', language='en', mode=1,
                            verbose=None)
        assert [(m.get('start'), m.get('end'), m.get('text')) for m in spec] \
            == [(m.get('start'), m.get('end'), m.get('text')) for m in plain]

    def test_locate_mode1_and_mode0(self, model):
        audio = np.random.default_rng(0).standard_normal(
            SAMPLE_RATE * 3).astype(np.float32) * 0.3
        m1 = model.locate(audio, ' hello', language='en', mode=1, verbose=None)
        assert isinstance(m1, list)
        if m1:  # random-weight model may or may not confirm the tokens
            assert 'start' in m1[0] and 'end' in m1[0]
        m0 = model.locate(audio, ' hello', language='en', mode=0, verbose=None)
        assert isinstance(m0, list)
        for seg in m0:
            assert hasattr(seg, 'words')


class TestRefinerFakeBackend:
    def test_refine_tightens_ts(self):
        # Fake prob model: tokens have high prob iff their word's true span
        # [1.0, 2.0] is unmuted. Start refinement should move start toward 1.0.
        sr = SAMPLE_RATE
        true_start, true_end = 1.0, 2.0

        def inference_func(audio_segment, tokens):
            probs = np.zeros((2, len(tokens)), np.float32)
            for row in range(2):
                seg = audio_segment[row]
                s, e = int(true_start * sr), int(true_end * sr)
                alive = np.abs(seg[s:e]).sum() > 0
                probs[row, :] = 0.9 if alive else 0.05
            return probs

        audio = np.ones(sr * 4, np.float32) * 0.3
        result = WhisperResult([[dict(word=' word', start=0.2, end=2.0,
                                      probability=0.9, tokens=[5])]])
        refiner = Refiner(inference_func=inference_func, word_level=True)
        refined = refiner.refine(audio, result, steps='s')
        w = refined.all_words()[0]
        assert w.start > 0.2  # moved later toward the true start


class TestTranscribeAny:
    def _fake_asr(self, audio, **kwargs):
        n = (len(audio) if isinstance(audio, np.ndarray) else SAMPLE_RATE * 2)
        dur = n / SAMPLE_RATE
        return [dict(start=0.1, end=dur / 2, text=' hello'),
                dict(start=dur / 2, end=dur - 0.1, text=' world')]

    def test_numpy_passthrough(self):
        audio = np.random.default_rng(0).standard_normal(
            SAMPLE_RATE * 2).astype(np.float32) * 0.3
        result = transcribe_any(self._fake_asr, audio, input_sr=SAMPLE_RATE,
                                audio_type='numpy', suppress_silence=False)
        assert isinstance(result, WhisperResult)
        assert result.text == ' hello world'

    def test_wav_file_input(self, tmp_path):
        from stable_ts_tpu.audio.output import save_audio
        audio = np.random.default_rng(0).standard_normal(
            SAMPLE_RATE * 2).astype(np.float32) * 0.3
        path = save_audio(audio, str(tmp_path / 'a.wav'))
        result = transcribe_any(self._fake_asr, path, audio_type='str',
                                suppress_silence=False)
        assert result.text == ' hello world'

    def test_silence_suppression_applied(self):
        t = np.arange(SAMPLE_RATE) / SAMPLE_RATE
        tone = (np.sin(2 * np.pi * 440 * t) * 0.5).astype(np.float32)
        audio = np.concatenate([np.zeros(SAMPLE_RATE, np.float32), tone])

        def asr(audio, **kw):
            return [dict(start=0.0, end=2.0, text=' the tone',
                         words=[dict(word=' the', start=0.0, end=1.2),
                                dict(word=' tone', start=1.2, end=2.0)])]

        result = transcribe_any(asr, audio, input_sr=SAMPLE_RATE,
                                audio_type='numpy')
        # silence in [0, ~1] covers the first word's start: snapped forward
        # (first word keeps its end per use_word_position).
        assert result[0][0].start > 0.5

    def test_resample_to_model_sr(self):
        audio = np.random.default_rng(0).standard_normal(8000).astype(np.float32)
        seen = {}

        def asr(audio, **kw):
            seen['n'] = len(audio)
            return [dict(start=0, end=1, text=' x')]

        transcribe_any(asr, audio, input_sr=8000, model_sr=16000,
                       audio_type='numpy', suppress_silence=False)
        assert seen['n'] == 16000
