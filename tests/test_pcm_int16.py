"""int16 PCM fast path: exact-PCM input rides int16 to the device upload.

The driver reverses the loader's /32768 at the upload boundary
(batched.py ``pcm_exact``) and the mel kernel scales on device
(ops/mel.py) — both exact in float32, so the int16 and float32 paths
must produce BIT-IDENTICAL results, while moving half the bytes.
The reference consumes the same s16le wire format via ffmpeg
(stable_whisper loads audio as int16 PCM /32768).
"""
import numpy as np
import pytest

from stable_ts_tpu.constants import SAMPLE_RATE
from stable_ts_tpu.loaders import load_test_model
from stable_ts_tpu.ops.mel import log_mel_spectrogram


@pytest.fixture(scope='module')
def model():
    return load_test_model()


@pytest.fixture(scope='module')
def pcm_audio():
    rng = np.random.default_rng(7)
    t = np.arange(SAMPLE_RATE * 40) / SAMPLE_RATE
    sig = np.sin(2 * np.pi * 330 * t) * 0.3
    sig[SAMPLE_RATE * 6:SAMPLE_RATE * 11] = 0.0
    sig += rng.standard_normal(sig.size) * 0.02
    return (np.clip(sig, -1, 1) * 32767.0).round().astype(np.int16)


def test_mel_int16_bit_identical_to_float32(pcm_audio):
    f32 = pcm_audio.astype(np.float32) / 32768.0
    a = np.asarray(log_mel_spectrogram(pcm_audio[:SAMPLE_RATE * 2]))
    b = np.asarray(log_mel_spectrogram(f32[:SAMPLE_RATE * 2]))
    assert a.dtype == np.float32
    np.testing.assert_array_equal(a, b)


def test_mel_int16_batched_and_padded(pcm_audio):
    wins = np.stack([pcm_audio[:SAMPLE_RATE], pcm_audio[SAMPLE_RATE:2 * SAMPLE_RATE]])
    a = np.asarray(log_mel_spectrogram(wins, padding=160))
    b = np.asarray(log_mel_spectrogram(
        wins.astype(np.float32) / 32768.0, padding=160))
    np.testing.assert_array_equal(a, b)


def test_transcribe_batched_int16_matches_float32(model, pcm_audio):
    kw = dict(language='en', verbose=None, batch_size=2)
    r16 = model.transcribe_batched(pcm_audio, **kw)
    r32 = model.transcribe_batched(
        pcm_audio.astype(np.float32) / 32768.0, **kw)
    assert r16.to_dict() == r32.to_dict()


def test_transcribe_batched_int16_with_denoiser_not_fast_pathed(model,
                                                                pcm_audio):
    """A denoiser changes samples — the exact-PCM shortcut must not engage
    (it would quantize non-PCM floats). The built-in spectral-gating
    denoiser runs without optional deps. Guarded by equality with the
    pre-converted float32 path: if the shortcut wrongly engaged it would
    re-quantize the denoised floats and the results would diverge."""
    kw = dict(language='en', verbose=None, batch_size=1,
              denoiser='noisereduce')
    r16 = model.transcribe_batched(pcm_audio[:SAMPLE_RATE * 5], **kw)
    r32 = model.transcribe_batched(
        pcm_audio[:SAMPLE_RATE * 5].astype(np.float32) / 32768.0, **kw)
    assert r16.to_dict() == r32.to_dict()


def test_stereo_int16_not_fast_pathed(model, pcm_audio):
    """2-D (stereo) int16 is downmixed by channel mean — half-integer
    samples the int16 re-cast would truncate. The shortcut must not engage
    (ADVICE r3): the result must equal transcribing the float downmix."""
    stereo = np.stack([pcm_audio[:SAMPLE_RATE * 5],
                       pcm_audio[1:SAMPLE_RATE * 5 + 1]])
    kw = dict(language='en', verbose=None, batch_size=1)
    r16 = model.transcribe_batched(stereo, **kw)
    downmix = (stereo.astype(np.float32) / 32768.0).mean(axis=0)
    r32 = model.transcribe_batched(downmix, **kw)
    assert r16.to_dict() == r32.to_dict()


def test_log_mel_windowed_matches_full_pad(pcm_audio):
    """log_mel_windowed on short bucketed rows must equal the full
    zero-padded-window mel: real frames to 1-ulp (the mel-projection
    matmul's reduction blocking differs with the frame count), the
    reconstructed zero tail and the all-zero-row floor EXACTLY."""
    from stable_ts_tpu.constants import N_FFT
    from stable_ts_tpu.ops.mel import log_mel_windowed
    f32 = pcm_audio.astype(np.float32) / 32768.0
    lens = [SAMPLE_RATE * 2, SAMPLE_RATE * 5 + 123, 1]
    bucket = max(lens) + N_FFT
    rows = np.zeros((len(lens) + 1, bucket), np.float32)  # +1 all-zero row
    for i, n in enumerate(lens):
        rows[i, :n] = f32[:n]
    got = np.asarray(log_mel_windowed(rows, 80, 3000))
    f_b = bucket // 160
    for i, n in enumerate(lens):
        want = np.asarray(log_mel_spectrogram(
            f32[:n], 80, padding=3000 * 160 - n))[..., :3000]
        np.testing.assert_allclose(got[i], want, rtol=0, atol=3e-7,
                                   err_msg=f'row {i}')
        np.testing.assert_array_equal(got[i, :, f_b:], want[:, f_b:],
                                      err_msg=f'row {i} tail')
    want_zero = np.asarray(log_mel_spectrogram(
        np.zeros(3000 * 160, np.float32), 80))[..., :3000]
    np.testing.assert_array_equal(got[-1], want_zero, err_msg='zero row')
