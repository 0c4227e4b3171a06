"""Unit tests for silence detection and suppression math."""
import numpy as np
import pytest

from stable_ts_tpu.stabilization import (NonSpeechPredictor, mask2timing, timing2mask,
                                         filter_timings, wav2mask, audio2timings,
                                         audio2loudness)
from stable_ts_tpu.stabilization.silence import suppress_silence
from stable_ts_tpu.result import WordTiming
from stable_ts_tpu.constants import SAMPLE_RATE


class TestMaskTiming:
    def test_mask2timing_basic(self):
        mask = np.array([False, True, True, False, True, False])
        starts, ends = mask2timing(mask)
        np.testing.assert_allclose(starts, [1 / 50, 4 / 50])
        np.testing.assert_allclose(ends, [3 / 50, 5 / 50])

    def test_mask2timing_empty(self):
        assert mask2timing(np.zeros(10, dtype=bool)) is None
        assert mask2timing(None) is None
        assert mask2timing(np.array([], dtype=bool)) is None

    def test_mask2timing_offsets_and_clip(self):
        mask = np.ones(10, dtype=bool)
        starts, ends = mask2timing(mask, time_offset=1.0, second_per_unit=0.1,
                                   min_start=1.05, max_end=1.5)
        assert starts[0] == 1.05
        assert ends[-1] == 1.5

    def test_timing2mask_roundtrip(self):
        mask = np.zeros(100, dtype=bool)
        mask[10:20] = True
        starts, ends = mask2timing(mask)
        back = timing2mask(starts, ends, 100)
        # end unit is inclusive in timing2mask
        assert back[10:21].all()
        assert not back[:10].any()

    def test_filter_timings(self):
        starts = np.array([0.0, 1.0])
        ends = np.array([0.05, 2.0])
        s, e = filter_timings((starts, ends), 0.5)
        assert len(s) == 1 and s[0] == 1.0


class TestSuppressSilence:
    def test_start_snaps_forward(self):
        w = WordTiming('x', 0.0, 1.0)
        suppress_silence(w, np.array([0.0]), np.array([0.4]), min_word_dur=0.1)
        assert w.start == 0.4

    def test_end_snaps_back_when_keep_end_false(self):
        w = WordTiming('x', 0.0, 1.0)
        suppress_silence(w, np.array([0.6]), np.array([1.2]), min_word_dur=0.1,
                         keep_end=False)
        assert w.end == 0.6

    def test_min_word_dur_respected(self):
        w = WordTiming('x', 0.0, 1.0)
        suppress_silence(w, np.array([0.0]), np.array([0.99]), min_word_dur=0.1)
        assert w.start == pytest.approx(0.9)

    def test_inner_silence_adjustment(self):
        # Silence [0.1, 0.9] inside word [0, 1]: start overhang error =
        # 0.1/0.8 = 0.125 <= 0.3 so with keep_end=True start moves to 0.9.
        w = WordTiming('x', 0.0, 1.0)
        suppress_silence(w, np.array([0.1]), np.array([0.9]), min_word_dur=0.05,
                         nonspeech_error=0.3, keep_end=True)
        assert w.start == 0.9

    def test_inner_silence_too_much_error(self):
        # Overhangs are 0.45/0.1 = 4.5x the silence duration: no adjustment.
        w = WordTiming('x', 0.0, 1.0)
        suppress_silence(w, np.array([0.45]), np.array([0.55]), min_word_dur=0.05,
                         nonspeech_error=0.3, keep_end=True)
        assert w.start == 0.0 and w.end == 1.0

    def test_keep_end_none_picks_lower_error(self):
        # Silence [0.05, 0.8]: start error 0.05/0.75, end error 0.2/0.75.
        # keep_end=None -> start error smaller -> keep end (move start).
        w = WordTiming('x', 0.0, 1.0)
        suppress_silence(w, np.array([0.05]), np.array([0.8]), min_word_dur=0.05,
                         nonspeech_error=0.5, keep_end=None)
        assert w.start == 0.8

    def test_no_silence_noop(self):
        w = WordTiming('x', 0.0, 1.0)
        suppress_silence(w, np.array([]), np.array([]), min_word_dur=0.1)
        assert w.start == 0.0 and w.end == 1.0


class TestNonVad:
    def _tone_with_silence(self):
        """2 s tone, 2 s silence, 2 s tone at 16 kHz."""
        t = np.arange(SAMPLE_RATE * 2) / SAMPLE_RATE
        tone = np.sin(2 * np.pi * 440 * t).astype(np.float32) * 0.5
        return np.concatenate([tone, np.zeros(SAMPLE_RATE * 2, np.float32), tone])

    def test_audio2loudness_shape(self):
        audio = self._tone_with_silence()
        loud = audio2loudness(audio)
        assert loud is not None
        assert loud.shape[0] == round(len(audio) / 320) + 1

    def test_audio2loudness_short_audio(self):
        assert audio2loudness(np.zeros(100, np.float32)) is None

    def test_wav2mask_finds_silence(self):
        audio = self._tone_with_silence()
        mask = wav2mask(audio)
        assert mask is not None
        # Middle third should be mostly silent.
        n = len(mask)
        assert mask[n // 2 - 10:n // 2 + 10].all()
        assert not mask[:n // 6].any()

    def test_wav2mask_all_silent(self):
        audio = np.zeros(SAMPLE_RATE, np.float32)
        mask = wav2mask(audio)
        assert mask is not None and mask.all()

    def test_wav2mask_no_silence(self):
        t = np.arange(SAMPLE_RATE * 2) / SAMPLE_RATE
        audio = (np.sin(2 * np.pi * 200 * t) * 0.8).astype(np.float32)
        assert wav2mask(audio) is None

    def test_audio2timings(self):
        audio = self._tone_with_silence()
        starts, ends = audio2timings(audio)
        # One silent section near [2, 4].
        assert len(starts) >= 1
        idx = np.argmax(ends - starts)
        assert starts[idx] == pytest.approx(2.0, abs=0.2)
        assert ends[idx] == pytest.approx(4.0, abs=0.2)


class TestNonSpeechPredictor:
    def _audio(self):
        t = np.arange(SAMPLE_RATE) / SAMPLE_RATE
        tone = (np.sin(2 * np.pi * 440 * t) * 0.5).astype(np.float32)
        return np.concatenate([tone, np.zeros(SAMPLE_RATE, np.float32), tone])

    def test_nonvad_predictor(self):
        pred = NonSpeechPredictor(vad=False, store_timings=True)
        out = pred.predict(self._audio(), offset=0.0)
        assert out['timings'] is not None
        assert not out['is_silent']
        pred.finalize_timings()
        assert pred.nonspeech_timings is not None

    def test_samples_predictor(self):
        pred = NonSpeechPredictor(vad=None)
        out = pred.predict(np.zeros(SAMPLE_RATE, np.float32), offset=0.0)
        assert out['is_silent']
        out = pred.predict(self._audio(), offset=0.0)
        assert not out['is_silent']

    def test_vad_predictor_with_fake_model(self):
        # Fake Silero-style model: prob = mean(|chunk|) * 40 clipped to [0,1].
        def fake_model(chunk, sr):
            return float(np.clip(np.abs(chunk).mean() * 40, 0, 1))

        pred = NonSpeechPredictor(vad={'model': fake_model}, store_timings=True)
        out = pred.predict(self._audio(), offset=0.0)
        assert out['timings'] is not None
        starts, ends = out['timings']
        idx = np.argmax(ends - starts)
        assert starts[idx] == pytest.approx(1.0, abs=0.15)
        assert ends[idx] == pytest.approx(2.0, abs=0.15)

    def test_silent_window_detection(self):
        pred = NonSpeechPredictor(vad=False)
        out = pred.predict(np.zeros(SAMPLE_RATE, np.float32), offset=0.0)
        assert out['is_silent']

    def test_min_silence_dur_filter(self):
        pred = NonSpeechPredictor(vad=False, min_silence_dur=10.0)
        out = pred.predict(self._audio(), offset=0.0)
        # 1-s silence is filtered out by the 10-s minimum.
        assert out['timings'] is None or len(out['timings'][0]) == 0
