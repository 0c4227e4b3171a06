"""Short-window QK cropping: DTW must stay within real audio columns.

Reference behavior (stable_whisper/timing.py:106-141): attention weights are
cropped to max_qk_len = round(num_samples / N_SAMPLES_PER_TOKEN) BEFORE the
median filter and DTW, so word timestamps can never land past the actual
audio. The legacy/'new' device kernels only see full 30-s windows; short
windows take a host path with the reference's crop order.
"""
import numpy as np
import pytest

from stable_ts_tpu.constants import N_SAMPLES_PER_TOKEN, SAMPLE_RATE
from stable_ts_tpu.loaders import load_test_model
from stable_ts_tpu.models.whisper.timing import (
    legacy_head_weights, new_aligner_matrix, _legacy_head_weights_host,
    _new_aligner_matrix_host, find_alignment)


@pytest.fixture(scope='module')
def model():
    return load_test_model()


def _fake_qks(rng, L=2, H=4, T=12, F=1500):
    return rng.standard_normal((L, H, T, F)).astype(np.float32)


class TestCroppedWeights:
    def test_legacy_short_window_is_cropped(self):
        rng = np.random.default_rng(3)
        qks = _fake_qks(rng)
        sel = qks[[0, 1], [1, 2]]
        max_qk_len = 400
        w = legacy_head_weights(sel, max_qk_len, sot_len=2, qk_scale=1.0,
                                medfilt_width=7)
        assert w.shape[-1] == max_qk_len

    def test_new_short_window_is_cropped(self):
        rng = np.random.default_rng(4)
        qks = _fake_qks(rng)
        m = new_aligner_matrix(qks, 250, sot_len=2, qk_scale=1.0,
                               medfilt_width=7, topk=4, w_colnorm=1.0,
                               w_rownorm=1.0, w_coverage=0.0)
        assert m.shape[-1] == 250

    def test_full_window_host_and_device_agree(self):
        """At full width the device masked-softmax path must equal the host
        crop-first path (they differ only in boundary handling, which is
        absent at full width)."""
        rng = np.random.default_rng(5)
        qks = _fake_qks(rng, F=64)
        sel = qks[[0, 1], [1, 2]]
        dev = legacy_head_weights(sel, 64, sot_len=2, qk_scale=1.0,
                                  medfilt_width=7)
        host = _legacy_head_weights_host(sel, 64, sot_len=2, qk_scale=1.0,
                                         medfilt_width=7)
        np.testing.assert_allclose(dev, host, rtol=2e-4, atol=2e-5)

    def test_new_full_window_host_and_device_agree(self):
        rng = np.random.default_rng(6)
        qks = _fake_qks(rng, F=64)
        dev = new_aligner_matrix(qks, 64, sot_len=2, qk_scale=1.0,
                                 medfilt_width=7, topk=4, w_colnorm=1.0,
                                 w_rownorm=1.0, w_coverage=0.5)
        host = _new_aligner_matrix_host(qks, 64, sot_len=2, qk_scale=1.0,
                                        medfilt_width=7, topk=4, w_colnorm=1.0,
                                        w_rownorm=1.0, w_coverage=0.5)
        np.testing.assert_allclose(dev, host, rtol=2e-4, atol=2e-5)


class TestShortWindowAlignment:
    @pytest.mark.parametrize('aligner', ['legacy', 'new'])
    def test_word_times_within_short_audio(self, model, aligner):
        """A 4-s window must never yield word end times past ~4 s."""
        from stable_ts_tpu.ops.mel import log_mel_spectrogram
        import jax.numpy as jnp
        rng = np.random.default_rng(11)
        seconds = 4.0
        num_samples = int(seconds * SAMPLE_RATE)
        audio = (rng.standard_normal(num_samples) * 0.2).astype(np.float32)
        mel = log_mel_spectrogram(
            np.pad(audio, (0, 30 * SAMPLE_RATE - num_samples)),
            model.dims.n_mels)
        tokenizer = model.get_tokenizer()
        tokens = tokenizer.encode(' hello there world')
        heads = [(0, 1), (1, 0)] if aligner == 'legacy' else None
        timings = find_alignment(
            model.params, model.dims, tokenizer, tokens,
            jnp.asarray(mel), num_samples, alignment_heads=heads,
            aligner=aligner)
        limit = num_samples / N_SAMPLES_PER_TOKEN / 50 + 0.1
        for t in timings:
            assert t.end <= limit, (aligner, t)
