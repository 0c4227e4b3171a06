"""End-to-end transcription pipeline tests on the synthetic tiny model.

Random weights mean the transcript is gibberish; these tests assert the
*mechanics* the reference's golden tests check structurally
(test/test_transcribe.py): word timestamps exist and are ordered, silence is
detected and suppressed, options plumb through, outputs serialize.
"""
import numpy as np
import pytest

from stable_ts_tpu.constants import SAMPLE_RATE
from stable_ts_tpu.loaders import load_test_model
from stable_ts_tpu.result import WhisperResult


@pytest.fixture(scope='module')
def model():
    return load_test_model()


@pytest.fixture(scope='module')
def audio():
    t = np.arange(SAMPLE_RATE * 2) / SAMPLE_RATE
    tone = (np.sin(2 * np.pi * 440 * t) * 0.4).astype(np.float32)
    return np.concatenate([tone, np.zeros(SAMPLE_RATE, np.float32), tone * 0.8])


@pytest.fixture(scope='module')
def base_result(model, audio):
    return model.transcribe(audio, verbose=None, temperature=0.0)


class TestTranscribe:
    def test_returns_result_with_words(self, base_result):
        assert isinstance(base_result, WhisperResult)
        assert len(base_result) > 0
        assert base_result.has_words

    def test_words_ordered(self, base_result):
        words = base_result.all_words()
        for w in words:
            assert w.start <= w.end
        for a, b in zip(words[:-1], words[1:]):
            assert a.end <= b.start + 1e-6

    def test_nonspeech_sections_found(self, base_result):
        # The 1-s silence between the tones must appear as a nonspeech section.
        sections = base_result.nonspeech_sections
        assert any(1.8 < s['start'] < 2.6 and 2.6 < s['end'] < 3.4
                   for s in sections), sections

    def test_regroup_history_recorded(self, base_result):
        assert base_result.regroup_history  # default regroup ran

    def test_language_set(self, base_result):
        assert base_result.language == 'en'

    def test_srt_output(self, base_result):
        srt = base_result.to_srt_vtt()
        assert ' --> ' in srt

    def test_word_probabilities(self, base_result):
        for w in base_result.all_words():
            assert w.probability is None or 0 <= w.probability <= 1
            assert w.tokens

    def test_silent_audio_gives_empty_result(self, model):
        with pytest.warns(UserWarning):
            result = model.transcribe(np.zeros(SAMPLE_RATE * 2, np.float32),
                                      verbose=None)
        assert len(result) == 0
        assert result.text == ''

    def test_without_word_timestamps(self, model, audio):
        result = model.transcribe(audio, verbose=None, word_timestamps=False)
        assert not result.has_words or len(result) == 0

    def test_regroup_false(self, model, audio):
        result = model.transcribe(audio, verbose=None, regroup=False)
        assert result.regroup_history == ''

    def test_new_aligner(self, model, audio):
        result = model.transcribe(audio, verbose=None, aligner='new')
        assert result.has_words or len(result) == 0

    def test_suppress_ts_tokens(self, model, audio):
        result = model.transcribe(audio, verbose=None, suppress_ts_tokens=True)
        assert isinstance(result, WhisperResult)

    def test_clip_timestamps(self, model, audio):
        result = model.transcribe(audio, verbose=None, clip_timestamps='0,2')
        # only content from the first 2 s (first tone) can appear
        if len(result):
            assert result[-1].end <= 2.5

    def test_extra_models_identity(self, model, audio):
        """extra_models=[model] duplicates the model's own weights, whose
        head-average (and mean token probs) are IDENTICAL to the
        single-model pass — an exact invariant of the multi-model mixing
        (reference timing.py:177-189)."""
        base = model.transcribe(audio, verbose=None)
        mixed = model.transcribe(audio, verbose=None, extra_models=[model])
        assert mixed.text == base.text
        a = [(w.word, w.start, w.end, round(w.probability, 6))
             for w in base.all_words()]
        b = [(w.word, w.start, w.end, round(w.probability, 6))
             for w in mixed.all_words()]
        assert a == b

    def test_extra_models_rejects_foreign_objects(self, model, audio):
        with pytest.raises(NotImplementedError):
            model.transcribe(audio, verbose=None, extra_models=['not-a-model'])

    def test_deprecated_kwargs_warn(self, model, audio):
        with pytest.warns(UserWarning):
            model.transcribe(audio[:16000 * 5], verbose=None, ts_num=3,
                             suppress_attention=True)

    def test_transcribe_minimal(self, model, audio):
        result = model.transcribe_minimal(audio, verbose=None)
        assert isinstance(result, WhisperResult)

    def test_progress_callback(self, model, audio):
        calls = []
        model.transcribe(audio, verbose=None,
                         progress_callback=lambda cur, total: calls.append((cur, total)))
        assert calls
        assert calls[-1][1] == pytest.approx(5.0, abs=0.1)

    def test_wav_file_input(self, model, audio, tmp_path):
        from stable_ts_tpu.audio.output import save_audio
        path = save_audio(audio, str(tmp_path / 'test.wav'))
        result = model.transcribe(path, verbose=None)
        assert isinstance(result, WhisperResult)

    def test_resume(self, model, audio, base_result, tmp_path):
        path = str(tmp_path / 'partial.json')
        base_result.save_as_json(path)
        resumed = model.transcribe(audio, verbose=None, resume=path)
        assert isinstance(resumed, WhisperResult)
        # resumed result keeps the prior content
        assert resumed.text.startswith(base_result.text[:10])


class TestJsonRoundTripAfterTranscribe:
    def test_save_load_regroup_replay(self, base_result, tmp_path):
        path = str(tmp_path / 'result.json')
        base_result.save_as_json(path)
        restored = WhisperResult(path)
        assert restored.text == base_result.text
        history = restored.regroup_history
        restored.reset()
        restored.regroup(history)
        assert [s.text for s in restored.segments] == \
               [s.text for s in base_result.segments]


class TestBeamSearch:
    def test_beam_decode_mechanics(self, model, audio):
        from stable_ts_tpu.models.whisper.decoding import decode, DecodingOptions
        from stable_ts_tpu.ops import log_mel_spectrogram
        import numpy as np
        tok = model.get_tokenizer(language='en', task='transcribe')
        mel = log_mel_spectrogram(audio[:32000], padding=16000 * 28)[None]
        res = decode(model.params, model.dims, tok, mel,
                     DecodingOptions(beam_size=3, sample_len=16))
        assert len(res) == 1
        r = res[0]
        ts = [t for t in r.tokens if t >= tok.timestamp_begin]
        if r.tokens:
            assert r.tokens[0] >= tok.timestamp_begin
        assert ts == sorted(ts)
        assert np.isfinite(r.avg_logprob)

    def test_transcribe_with_beam(self, model, audio):
        result = model.transcribe(audio, verbose=None, beam_size=2,
                                  temperature=0.0)
        assert result is not None

    def test_beam_batched_windows(self, model, audio):
        from stable_ts_tpu.models.whisper.decoding import decode, DecodingOptions
        from stable_ts_tpu.ops import log_mel_spectrogram
        import numpy as np
        tok = model.get_tokenizer(language='en', task='transcribe')
        mel1 = np.asarray(log_mel_spectrogram(audio[:32000], padding=16000 * 28))
        mel2 = np.asarray(log_mel_spectrogram(audio[16000:48000], padding=16000 * 28))
        res = decode(model.params, model.dims, tok, np.stack([mel1, mel2]),
                     DecodingOptions(beam_size=2, sample_len=12))
        assert len(res) == 2


class TestBatchedTranscribe:
    @pytest.fixture(scope='class')
    def long_audio(self):
        t = np.arange(SAMPLE_RATE * 8) / SAMPLE_RATE
        tone = (np.sin(2 * np.pi * 440 * t) * 0.4).astype(np.float32)
        return np.concatenate(
            [tone, np.zeros(SAMPLE_RATE * 4, np.float32)] * 6)[:SAMPLE_RATE * 70]

    def test_multi_window(self, model, long_audio):
        result = model.transcribe_batched(long_audio, verbose=None)
        assert isinstance(result, WhisperResult)
        assert len(result) > 0
        words = result.all_words()
        assert all(a.end <= b.start + 1e-6 for a, b in zip(words[:-1], words[1:]))
        assert result[-1].end <= 70.5
        # windows beyond the first contributed (offsets applied)
        assert result[-1].start > 30.0

    def test_nonspeech_accumulated_across_windows(self, model, long_audio):
        result = model.transcribe_batched(long_audio, verbose=None)
        assert len(result.nonspeech_sections) >= 3

    def test_silent_audio(self, model):
        with pytest.warns(UserWarning):
            result = model.transcribe_batched(
                np.zeros(SAMPLE_RATE * 40, np.float32), verbose=None)
        assert len(result) == 0

    def test_matches_result_schema(self, model, long_audio, tmp_path):
        result = model.transcribe_batched(long_audio, verbose=None)
        path = str(tmp_path / 'b.json')
        result.save_as_json(path)
        restored = WhisperResult(path)
        assert restored.text == result.text


class TestBeamTopK:
    """The two-stage beam top-k must match the flattened single-stage one."""

    def test_two_stage_topk_equivalence(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        rng = np.random.RandomState(7)
        n_groups, beam, V = 3, 5, 2048
        k = 2 * beam
        for trial in range(5):
            logprobs = jnp.asarray(
                rng.randn(n_groups * beam, V).astype(np.float32))
            cum = jnp.asarray(rng.randn(n_groups * beam).astype(np.float32))
            # single-stage reference: top_k over the flattened (beam*V) row
            cand = (cum[:, None] + logprobs).reshape(n_groups, beam * V)
            ref_scores, ref_idx = jax.lax.top_k(cand, k)
            ref_beam = ref_idx // V
            ref_tok = ref_idx % V
            # two-stage (the product path in _beam_loop)
            row_scores, row_tok = jax.lax.top_k(logprobs, k)
            grp_scores = (cum[:, None] + row_scores).reshape(n_groups,
                                                             beam * k)
            grp_tok = row_tok.reshape(n_groups, beam * k)
            top_scores, sel = jax.lax.top_k(grp_scores, k)
            src_beam = sel // k
            tok = jnp.take_along_axis(grp_tok, sel, axis=1)
            np.testing.assert_allclose(np.asarray(top_scores),
                                       np.asarray(ref_scores), rtol=1e-6)
            np.testing.assert_array_equal(np.asarray(src_beam),
                                          np.asarray(ref_beam))
            np.testing.assert_array_equal(np.asarray(tok),
                                          np.asarray(ref_tok))
