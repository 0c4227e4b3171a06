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


class TestDemucsDfnetAdapters:
    """The optional demucs/dfnet adapters, exercised with fake packages
    injected into sys.modules (the real networks never run offline)."""

    def _install_fake_demucs(self, monkeypatch):
        import sys, types
        import torch

        class FakeDemucs(torch.nn.Module):
            samplerate = 16000
            audio_channels = 2
            segment = 0.5  # seconds per chunk -> forces chunked stitching
            sources = ['drums', 'bass', 'other', 'vocals']

            def forward(self, wav):
                # (1, C, T) -> (1, n_sources, C, T): vocals = half the input
                return wav[:, None].repeat(1, len(self.sources), 1, 1) * 0.5

        pretrained = types.ModuleType('demucs.pretrained')
        pretrained.get_model = lambda name: FakeDemucs()
        pkg = types.ModuleType('demucs')
        pkg.pretrained = pretrained
        for name, mod in [('demucs', pkg), ('demucs.pretrained', pretrained)]:
            monkeypatch.setitem(sys.modules, name, mod)

    def _install_fake_dfnet(self, monkeypatch):
        import sys, types
        import torch

        class FakeState:
            def sr(self):
                return 48000

        df = types.ModuleType('df')
        df.init_df = lambda: ('net', FakeState(), None)
        df.enhance = lambda net, state, wav, **kw: wav * 0.25
        monkeypatch.setitem(sys.modules, 'df', df)

    def _clear_cache(self):
        from stable_ts_tpu.defaults import cached_model_instances
        cached_model_instances.get('denoisers', {}).clear()

    def test_demucs_dispatch(self, monkeypatch):
        self._install_fake_demucs(monkeypatch)
        self._clear_cache()
        from stable_ts_tpu.audio.denoiser import apply_denoiser
        audio = np.ones(16000, np.float32) * 0.8
        out = apply_denoiser('demucs', audio)
        assert out.shape == audio.shape
        np.testing.assert_allclose(out, audio * 0.5, atol=1e-4)
        self._clear_cache()

    def test_demucs_chunked_stitching_exact(self, monkeypatch):
        """The overlap-weighted stitch must be EXACT at chunk boundaries for
        a linear (identity-like) model: triangular weights normalize out
        (reference audio/demucs.py:75-145 behavior)."""
        self._install_fake_demucs(monkeypatch)
        self._clear_cache()
        from stable_ts_tpu.audio.denoiser import apply_denoiser
        # 2.3 s ramp at segment=0.5 s -> 5 chunks incl. a short tail
        audio = (np.linspace(-1, 1, int(16000 * 2.3))
                 .astype(np.float32))
        out = apply_denoiser('demucs', audio, overlap=0.25)
        assert out.shape == audio.shape
        np.testing.assert_allclose(out, audio * 0.5, atol=1e-5)
        self._clear_cache()

    def test_demucs_chunked_bounded_memory(self, monkeypatch):
        """The model must never see more than one segment at a time."""
        self._install_fake_demucs(monkeypatch)
        self._clear_cache()
        import sys
        import torch
        seen = []
        fake_cls = sys.modules['demucs.pretrained'].get_model('x').__class__
        orig_forward = fake_cls.forward

        def spy(self, wav):
            seen.append(wav.shape[-1])
            return orig_forward(self, wav)

        monkeypatch.setattr(fake_cls, 'forward', spy)
        from stable_ts_tpu.audio.denoiser import apply_denoiser
        audio = np.ones(16000 * 4, np.float32)
        apply_denoiser('demucs', audio)
        assert seen and max(seen) <= int(16000 * 0.5)
        self._clear_cache()

    def test_demucs_shifts_deterministic_with_seed(self, monkeypatch):
        self._install_fake_demucs(monkeypatch)
        self._clear_cache()
        from stable_ts_tpu.audio.denoiser import apply_denoiser
        audio = np.sin(np.linspace(0, 60, 16000)).astype(np.float32)
        a = apply_denoiser('demucs', audio, shifts=2, seed=7)
        b = apply_denoiser('demucs', audio, shifts=2, seed=7)
        np.testing.assert_allclose(a, b)
        np.testing.assert_allclose(a, audio * 0.5, atol=1e-5)
        self._clear_cache()

    def test_dfnet_dispatch(self, monkeypatch):
        self._install_fake_dfnet(monkeypatch)
        self._clear_cache()
        from stable_ts_tpu.audio.denoiser import apply_denoiser
        audio = np.ones(16000, np.float32) * 0.8
        out = apply_denoiser('dfnet', audio)
        assert out.shape == audio.shape
        # x0.25 through a 16k->48k->16k resample round trip
        assert abs(float(np.median(out)) - 0.2) < 0.02
        self._clear_cache()

    def test_demucs_missing_package_message(self):
        self._clear_cache()
        from stable_ts_tpu.audio.denoiser import apply_denoiser
        with pytest.raises(ModuleNotFoundError, match='demucs'):
            apply_denoiser('demucs', np.zeros(1600, np.float32))
        self._clear_cache()


class TestConvertDemucsKwargs:
    def test_no_deprecated_args_passthrough(self):
        from stable_ts_tpu.audio.denoiser import convert_demucs_kwargs
        d, opts = convert_demucs_kwargs('spectral_gate', {'a': 1})
        assert d == 'spectral_gate' and opts == {'a': 1}
        d, opts = convert_demucs_kwargs(None, None)
        assert d is None and opts == {}

    def test_demucs_flag_warns_and_maps(self):
        from stable_ts_tpu.audio.denoiser import convert_demucs_kwargs
        with pytest.warns(UserWarning, match='deprecated'):
            d, opts = convert_demucs_kwargs(demucs=True)
        assert d == 'demucs'

    def test_conflicting_denoiser_raises(self):
        from stable_ts_tpu.audio.denoiser import convert_demucs_kwargs
        with pytest.warns(UserWarning):
            with pytest.raises(ValueError, match='Demucs is enabled'):
                convert_demucs_kwargs(denoiser='dfnet', demucs=True)

    def test_demucs_options_and_model_object(self):
        from stable_ts_tpu.audio.denoiser import convert_demucs_kwargs

        class FakeModel:
            pass

        model = FakeModel()
        with pytest.warns(UserWarning):
            d, opts = convert_demucs_kwargs(
                demucs=model, demucs_options={'shifts': 2})
        assert d == 'demucs'
        assert opts['shifts'] == 2 and opts['model'] is model

    def test_preloaded_model_used_by_apply(self, monkeypatch):
        from stable_ts_tpu.audio.denoiser import (apply_denoiser,
                                                  register_denoiser)
        from stable_ts_tpu.defaults import cached_model_instances
        seen = {}

        def run(audio, model=None, **kw):
            seen['model'] = model
            return audio

        register_denoiser('fake_dn', run, load=lambda **kw: 'loaded-default')
        cached_model_instances.get('denoisers', {}).pop('fake_dn', None)
        sentinel = object()
        apply_denoiser('fake_dn', np.zeros(4, np.float32), model=sentinel)
        assert seen['model'] is sentinel
        cached_model_instances.get('denoisers', {}).pop('fake_dn', None)


class TestSileroVadFake:
    """Silero-VAD strategy dispatch with a fake TorchScript-like module
    (reference stabilization/silero_vad.py:36-62 windowing)."""

    class FakeSilero:
        """Callable returning high prob for loud windows, low for quiet."""

        def __init__(self):
            self.reset_calls = 0
            self.windows_seen = []

        def __call__(self, chunk, sr):
            import torch
            arr = chunk.numpy() if hasattr(chunk, 'numpy') else np.asarray(chunk)
            self.windows_seen.append(arr.shape[-1])
            return torch.tensor(0.9 if float(np.abs(arr).mean()) > 0.05 else 0.05)

        def reset_states(self):
            self.reset_calls += 1

    def _audio(self):
        rng = np.random.default_rng(0)
        audio = np.zeros(16000 * 4, np.float32)
        audio[16000:32000] = rng.standard_normal(16000).astype(np.float32) * 0.5
        return audio

    def test_predict_with_vad_windows_and_timings(self):
        from stable_ts_tpu.stabilization import NonSpeechPredictor
        fake = self.FakeSilero()
        pred = NonSpeechPredictor(vad={'model': fake}, verbose=None,
                                  store_timings=True)
        out = pred.predict(self._audio(), offset=0.0)
        # windows are 512 samples at 16 kHz
        assert set(fake.windows_seen) == {512}
        assert len(fake.windows_seen) == 16000 * 4 // 512
        assert fake.reset_calls >= 1  # reset on model load
        starts, ends = out['timings']
        # silence detected around the quiet spans, speech span excluded
        assert any(s <= 0.1 for s in starts)
        assert all(not (1.2 < s < 1.8) for s in starts)
        assert out['is_silent'] is False

    def test_prep_callback_accumulates_probs(self):
        from stable_ts_tpu.stabilization import NonSpeechPredictor
        fake = self.FakeSilero()
        pred = NonSpeechPredictor(vad={'model': fake}, verbose=None,
                                  stream=True)
        cb = pred.get_on_prep_callback()
        audio = self._audio()
        cb(audio[:32000])
        cb(audio[32000:])
        # each block contributes floor(block/512) probs (partial window dropped)
        assert len(pred._default_probs) == 2 * (32000 // 512)
        # chunk 2 s..4 s must slice the accumulated probs, not re-run the model
        calls_before = len(fake.windows_seen)
        out = pred.predict(audio[32000:], offset=2.0)
        assert len(fake.windows_seen) == calls_before
        assert out['timings'] is not None

    def test_get_vad_silence_func_with_fake(self):
        from stable_ts_tpu.stabilization import get_vad_silence_func
        fake = self.FakeSilero()
        detect = get_vad_silence_func(model=fake, verbose=None)
        timings = detect(self._audio(), speech_threshold=0.5)
        assert timings is not None and len(timings[0]) >= 1
