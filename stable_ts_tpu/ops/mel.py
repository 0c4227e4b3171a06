"""Log-mel spectrogram, TPU-first.

Numerically equivalent to Whisper's ``log_mel_spectrogram`` (the reference
calls it at whisper_word_level/original_whisper.py:529 via openai-whisper):
centered STFT (N_FFT=400, hop=160, periodic Hann), power spectrum with the
final frame dropped, slaney-normalized mel filterbank (80 or 128 bands),
log10 clamped at 1e-10, dynamic-range compression to [~-1, ~1].

Design: framing is gather-free (polyphase reshape), the windowed DFT and the
mel projection are two MXU matmuls; the whole pipeline is one
jit-compiled fused program. The filterbank is generated analytically
(librosa-compatible slaney scale) instead of shipping a .npz.
"""
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import HOP_LENGTH, N_FFT, SAMPLE_RATE


def _hz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, logarithmic above."""
    freq = np.asarray(freq, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = freq >= min_log_hz
    mels = np.where(log_region,
                    min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep,
                    mels)
    return mels


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(log_region,
                     min_log_hz * np.exp(logstep * (mels - min_log_mel)),
                     freqs)
    return freqs


@lru_cache(maxsize=4)
def mel_filterbank(n_mels: int = 80, n_fft: int = N_FFT,
                   sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular mel filterbank.

    Matches librosa.filters.mel(sr, n_fft, n_mels, htk=False, norm='slaney'),
    which is what Whisper's precomputed mel_filters.npz contains.
    Returns float32 (n_mels, n_fft//2 + 1).
    """
    fft_freqs = np.linspace(0, sample_rate / 2, n_fft // 2 + 1)
    mel_min = _hz_to_mel_slaney(np.array(0.0))
    mel_max = _hz_to_mel_slaney(np.array(sample_rate / 2.0))
    mel_points = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_points = _mel_to_hz_slaney(mel_points)

    fdiff = np.diff(hz_points)
    ramps = hz_points[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))

    # Slaney normalization: each filter integrates to ~equal area.
    enorm = 2.0 / (hz_points[2:n_mels + 2] - hz_points[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@lru_cache(maxsize=2)
def _hann_window(n_fft: int) -> np.ndarray:
    # Periodic Hann (torch.hann_window default), as used by Whisper's STFT.
    return (0.5 * (1 - np.cos(2 * np.pi * np.arange(n_fft) / n_fft))).astype(np.float32)


@lru_cache(maxsize=2)
def _windowed_dft_basis(n_fft: int) -> np.ndarray:
    """(n_fft, 2*(n_fft//2+1)) f32: the Hann window folded into a real
    rDFT basis — columns [0, K) are cos, [K, 2K) are sin, K = n_fft//2+1.

    ``frames @ basis`` computes the windowed rFFT as ONE MXU matmul.
    XLA lowers jnp.fft on TPU far off the roofline, and at refine's round
    rate (the masked-mel prologue runs inside every serial bisection
    dispatch) the FFT+framing-gather pair measured ~69 ms per 8 rows of
    30 s audio; the matmul form is exact to float rounding (the mel parity
    test vs torch.stft holds at the same atol) and runs at MXU speed.
    """
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)
    n = np.arange(n_fft, dtype=np.float64)
    ang = -2.0 * np.pi * np.outer(n, k) / n_fft
    win = _hann_window(n_fft).astype(np.float64)[:, None]
    return np.concatenate([np.cos(ang) * win, np.sin(ang) * win],
                          axis=1).astype(np.float32)


@partial(jax.jit, static_argnames=('n_mels', 'n_fft', 'hop_length'))
def _log_mel_impl(audio: jnp.ndarray, filters: jnp.ndarray, basis: jnp.ndarray,
                  n_mels: int, n_fft: int, hop_length: int) -> jnp.ndarray:
    if audio.dtype == jnp.int16:
        # int16 PCM uploaded raw (half the host->device bytes of float32);
        # the on-device scale is bit-identical to the host's /32768 in
        # audio/utils.py:44 because every int16 is exact in float32.
        audio = audio.astype(jnp.float32) / 32768.0
    pad = n_fft // 2
    padded = jnp.pad(audio, ((0, 0), (pad, pad)), mode='reflect')
    t = padded.shape[-1]
    n_frames = 1 + (t - n_fft) // hop_length
    # Polyphase framing without a gather: view the signal as hop-length
    # rows, then each frame is `shifts` consecutive rows concatenated —
    # all reshapes/slices, which XLA fuses, instead of an (n_frames, n_fft)
    # gather that serializes on the TPU's vector memory.
    shifts = -(-n_fft // hop_length)
    rows = n_frames + shifts - 1
    need = rows * hop_length
    padded = (jnp.pad(padded, ((0, 0), (0, need - t))) if need > t
              else padded[:, :need])
    y = padded.reshape(padded.shape[0], rows, hop_length)
    frames = jnp.concatenate([y[:, i:i + n_frames] for i in range(shifts)],
                             axis=-1)[..., :n_fft]
    # Windowed rDFT as ONE MXU matmul (window folded into the basis) —
    # jnp.fft.rfft lowers far off the TPU roofline.
    k_bins = n_fft // 2 + 1
    spec = jnp.einsum('bfn,nk->bfk', frames.astype(jnp.float32), basis,
                      preferred_element_type=jnp.float32)
    # Drop the final frame (Whisper convention) and take the power spectrum.
    magnitudes = (spec[..., :k_bins] ** 2
                  + spec[..., k_bins:] ** 2)[:, :-1]  # (b, frames, k_bins)
    # Mel projection on the MXU: (frames, 201) @ (201, n_mels).
    mel_spec = jnp.einsum('bfk,mk->bmf', magnitudes, filters,
                          preferred_element_type=jnp.float32)
    log_spec = jnp.log10(jnp.clip(mel_spec, min=1e-10))
    log_spec = jnp.maximum(log_spec,
                           jnp.max(log_spec, axis=(-2, -1), keepdims=True) - 8.0)
    return (log_spec + 4.0) / 4.0


def log_mel_windowed(audio, n_mels: int = 80,
                     n_frames: int = 3000) -> jnp.ndarray:
    """Batched window mels from SHORT zero-padded rows, equal to padding
    each row to the full window first (real frames to 1-ulp — the mel
    matmul's reduction blocking differs with the frame count; the
    reconstructed tail exactly).

    audio: (B, t_bucket) float32, each row = real samples followed by
    zeros, with t_bucket >= longest row + N_FFT. Returns
    (B, n_mels, n_frames) matching
    ``log_mel_spectrogram(row, padding=n_frames*HOP - len(row))[..., :n_frames]``
    for every row — without uploading or transforming the full 30 s of
    mostly-zero samples per row:

    - frames whose STFT window touches real samples are computed normally
      (the zero tail >= N_FFT reproduces the full-pad boundary exactly);
    - frames past the bucket are pure-zero windows, whose value after the
      log/clamp/compress chain depends only on the row max ``m`` (already
      known): ``max(m - 2, -1.5)`` — all-floor rows clamp at the log floor
      ((-10 + 4) / 4), others at the dynamic-range bound (m - 8 pre-scale).
    """
    audio = jnp.asarray(audio, jnp.float32)
    filters = jnp.asarray(mel_filterbank(n_mels))
    basis = jnp.asarray(_windowed_dft_basis(N_FFT))
    mel = _log_mel_impl(audio, filters, basis, n_mels, N_FFT, HOP_LENGTH)
    f_b = mel.shape[-1]
    if f_b >= n_frames:
        return mel[..., :n_frames]
    rowmax = jnp.max(mel, axis=(-2, -1), keepdims=True)
    tail_val = jnp.maximum(rowmax - 2.0, -1.5)
    tail = jnp.broadcast_to(tail_val,
                            mel.shape[:-1] + (n_frames - f_b,))
    return jnp.concatenate([mel, tail], axis=-1)


def log_mel_spectrogram(audio, n_mels: int = 80, padding: int = 0) -> jnp.ndarray:
    """Compute the Whisper log-mel spectrogram.

    Accepts a 1-D or (batch, samples) waveform (NumPy or JAX array);
    int16 PCM is uploaded as-is and scaled on device (bit-exact with the
    float32 path). Returns (n_mels, frames) or (batch, n_mels, frames)
    float32.
    """
    if getattr(audio, 'dtype', None) == np.int16:
        audio = jnp.asarray(audio)
    else:
        audio = jnp.asarray(audio, dtype=jnp.float32)
    squeeze = audio.ndim == 1
    if squeeze:
        audio = audio[None]
    if padding > 0:
        audio = jnp.pad(audio, ((0, 0), (0, padding)))
    filters = jnp.asarray(mel_filterbank(n_mels))
    basis = jnp.asarray(_windowed_dft_basis(N_FFT))
    out = _log_mel_impl(audio, filters, basis, n_mels, N_FFT, HOP_LENGTH)
    return out[0] if squeeze else out
