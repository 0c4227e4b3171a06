"""Tests for the spectral-gating denoiser and the built-in energy VAD."""
import numpy as np
import pytest

from stable_ts_tpu.audio.denoiser import (SUPPORTED_DENOISERS, apply_denoiser,
                                          register_denoiser, spectral_gate)
from stable_ts_tpu.constants import SAMPLE_RATE
from stable_ts_tpu.stabilization import NonSpeechPredictor
from stable_ts_tpu.stabilization.energy_vad import EnergyVAD


def tone_plus_noise(seconds=3, noise_level=0.05, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(SAMPLE_RATE * seconds) / SAMPLE_RATE
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32) * 0.5
    # Tone only in the middle third.
    n = len(tone)
    tone[:n // 3] = 0
    tone[2 * n // 3:] = 0
    noise = rng.standard_normal(n).astype(np.float32) * noise_level
    return tone + noise, tone


class TestSpectralGate:
    def test_reduces_noise_keeps_signal(self):
        noisy, clean = tone_plus_noise()
        out = spectral_gate(noisy)
        n = len(noisy)
        # Noise-only region attenuated substantially.
        noise_before = np.abs(noisy[:n // 3]).mean()
        noise_after = np.abs(out[:n // 3]).mean()
        assert noise_after < noise_before * 0.5
        # Signal region mostly preserved.
        sig_before = np.abs(noisy[n // 2 - 8000:n // 2 + 8000]).mean()
        sig_after = np.abs(out[n // 2 - 8000:n // 2 + 8000]).mean()
        assert sig_after > sig_before * 0.6

    def test_short_audio_passthrough(self):
        x = np.ones(100, np.float32)
        np.testing.assert_array_equal(spectral_gate(x), x)

    def test_registry(self):
        assert 'spectral_gate' in SUPPORTED_DENOISERS
        assert 'noisereduce' in SUPPORTED_DENOISERS
        noisy, _ = tone_plus_noise(1)
        out = apply_denoiser('spectral_gate', noisy)
        assert out.shape == noisy.shape

    def test_register_external(self):
        register_denoiser('halver', lambda audio, model=None, **kw: audio * 0.5)
        out = apply_denoiser('halver', np.ones(10, np.float32))
        np.testing.assert_allclose(out, 0.5)
        del SUPPORTED_DENOISERS['halver']

    def test_unknown_raises(self):
        with pytest.raises(NotImplementedError):
            apply_denoiser('nope', np.zeros(10, np.float32))

    def test_denoiser_through_transcribe_option(self):
        from stable_ts_tpu.audio import prep_audio
        noisy, _ = tone_plus_noise(1)
        out = prep_audio(noisy, denoiser='spectral_gate')
        assert out.shape == noisy.shape


class TestEnergyVAD:
    def test_speech_vs_silence_probs(self):
        vad = EnergyVAD()
        rng = np.random.default_rng(0)
        t = np.arange(512) / SAMPLE_RATE
        speech_chunk = (np.sin(2 * np.pi * 300 * t) * 0.4).astype(np.float32)
        silence_chunk = (rng.standard_normal(512) * 0.001).astype(np.float32)
        # feed some silence first to set the noise floor
        for _ in range(10):
            p_silence = vad(silence_chunk, SAMPLE_RATE)
        p_speech = vad(speech_chunk, SAMPLE_RATE)
        assert p_speech > 0.5
        assert p_silence < 0.3

    def test_with_nonspeech_predictor(self):
        t = np.arange(SAMPLE_RATE) / SAMPLE_RATE
        tone = (np.sin(2 * np.pi * 300 * t) * 0.4).astype(np.float32)
        audio = np.concatenate([np.zeros(SAMPLE_RATE, np.float32) + 1e-4, tone])
        pred = NonSpeechPredictor(vad='energy', store_timings=True)
        out = pred.predict(audio, offset=0.0)
        assert out['timings'] is not None
        starts, ends = out['timings']
        # The first second should be (mostly) nonspeech.
        assert starts[0] < 0.2
        assert ends[0] > 0.7

    def test_reset_states(self):
        vad = EnergyVAD()
        vad(np.ones(512, np.float32), SAMPLE_RATE)
        assert vad._noise_floor is not None
        vad.reset_states()
        assert vad._noise_floor is None

    def test_unknown_vad_string_raises(self):
        with pytest.raises(ValueError):
            NonSpeechPredictor(vad='bogus')
