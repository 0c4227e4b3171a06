"""Numeric parity tests for the TPU compute ops (run on CPU backend)."""
import numpy as np
import pytest

import jax.numpy as jnp

from stable_ts_tpu.ops import (dtw, dtw_cost_jax, dtw_numpy, log_mel_spectrogram,
                               median_filter, mel_filterbank)
from stable_ts_tpu.constants import N_FFT, HOP_LENGTH, N_FRAMES, SAMPLE_RATE


class TestMelFilterbank:
    def test_shape_and_nonneg(self):
        fb = mel_filterbank(80)
        assert fb.shape == (80, N_FFT // 2 + 1)
        assert (fb >= 0).all()
        fb128 = mel_filterbank(128)
        assert fb128.shape == (128, N_FFT // 2 + 1)

    def test_triangular_single_peak(self):
        fb = mel_filterbank(80)
        for row in fb[:20]:
            nz = np.flatnonzero(row)
            assert len(nz) > 0
            # contiguous support
            assert (np.diff(nz) == 1).all()

    def test_peaks_monotonic(self):
        fb = mel_filterbank(80)
        peaks = fb.argmax(axis=1)
        assert (np.diff(peaks) >= 0).all()

    def test_slaney_normalization(self):
        # With slaney norm, filter areas (sum * df) are approximately equal
        # in the linear region.
        fb = mel_filterbank(80)
        df = (SAMPLE_RATE / 2) / (N_FFT // 2)
        areas = fb.sum(axis=1) * df
        lin = areas[5:25]
        assert np.std(lin) / np.mean(lin) < 0.1


class TestLogMel:
    def _torch_whisper_mel(self, audio, n_mels=80):
        """Whisper's exact torch pipeline, using our analytic filterbank."""
        import torch
        audio_t = torch.from_numpy(audio)
        window = torch.hann_window(N_FFT)
        stft = torch.stft(audio_t, N_FFT, HOP_LENGTH, window=window,
                          return_complex=True)
        magnitudes = stft[..., :-1].abs() ** 2
        filters = torch.from_numpy(mel_filterbank(n_mels))
        mel_spec = filters @ magnitudes
        log_spec = torch.clamp(mel_spec, min=1e-10).log10()
        log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
        return ((log_spec + 4.0) / 4.0).numpy()

    def test_parity_with_torch_stft(self):
        rng = np.random.default_rng(0)
        audio = (rng.standard_normal(SAMPLE_RATE * 2) * 0.1).astype(np.float32)
        ours = np.asarray(log_mel_spectrogram(audio))
        ref = self._torch_whisper_mel(audio)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-3)

    def test_30s_window_shape(self):
        audio = np.zeros(SAMPLE_RATE * 30, np.float32)
        mel = log_mel_spectrogram(audio)
        assert mel.shape == (80, N_FRAMES)

    def test_padding(self):
        audio = np.zeros(SAMPLE_RATE, np.float32)
        mel = log_mel_spectrogram(audio, padding=SAMPLE_RATE * 29)
        assert mel.shape == (80, N_FRAMES)

    def test_batched(self):
        audio = np.zeros((3, SAMPLE_RATE), np.float32)
        mel = log_mel_spectrogram(audio)
        assert mel.shape == (3, 80, 100)

    def test_128_mels(self):
        audio = np.zeros(SAMPLE_RATE, np.float32)
        mel = log_mel_spectrogram(audio, n_mels=128)
        assert mel.shape == (128, 100)


class TestMedianFilter:
    def test_matches_numpy(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((4, 64)).astype(np.float32)
        out = np.asarray(median_filter(jnp.asarray(x), 7))
        pad = 3
        padded = np.pad(x, ((0, 0), (pad, pad)), mode='reflect')
        expected = np.stack([np.median(padded[:, i:i + 7], axis=1)
                             for i in range(x.shape[1])], axis=1)
        np.testing.assert_allclose(out, expected, atol=1e-6)

    def test_short_input_passthrough(self):
        x = jnp.ones((2, 3))
        out = median_filter(x, 7)
        np.testing.assert_allclose(np.asarray(out), np.ones((2, 3)))


class TestDTW:
    def _random_cost(self, n, m, seed):
        rng = np.random.default_rng(seed)
        return rng.standard_normal((n, m)).astype(np.float32)

    def test_identity_diagonal(self):
        # Strongly diagonal cost: path should be the diagonal.
        n = 8
        x = np.ones((n, n), np.float32) * 10
        np.fill_diagonal(x, 0.0)
        ti, fi = dtw_numpy(x)
        assert (ti == fi).all()

    @pytest.mark.parametrize('seed', [0, 1, 2, 3])
    @pytest.mark.parametrize('shape', [(5, 9), (16, 16), (40, 150), (3, 100)])
    def test_jax_matches_numpy(self, seed, shape):
        x = self._random_cost(*shape, seed=seed)
        ref_t, ref_f = dtw_numpy(x)
        dev_t, dev_f = dtw(x, device=True)
        np.testing.assert_array_equal(dev_t, ref_t)
        np.testing.assert_array_equal(dev_f, ref_f)

    def test_cost_matrix_values(self):
        x = self._random_cost(12, 30, seed=5)
        cost = np.asarray(dtw_cost_jax(jnp.asarray(x)))
        # Independent DP for values.
        N, M = x.shape
        ref = np.full((N + 1, M + 1), np.inf)
        ref[0, 0] = 0
        for i in range(1, N + 1):
            for j in range(1, M + 1):
                ref[i, j] = x[i - 1, j - 1] + min(ref[i - 1, j - 1],
                                                  ref[i - 1, j], ref[i, j - 1])
        np.testing.assert_allclose(cost[1:, 1:], ref[1:, 1:], rtol=1e-5, atol=1e-4)

    def test_monotonic_path(self):
        x = self._random_cost(20, 60, seed=9)
        ti, fi = dtw(x)
        assert ti[0] == 0 and fi[0] == 0
        assert ti[-1] == 19 and fi[-1] == 59
        assert (np.diff(ti) >= 0).all() and (np.diff(fi) >= 0).all()
        assert ((np.diff(ti) + np.diff(fi)) > 0).all()

    def test_realistic_attention_shape(self):
        # Whisper-scale: negative attention-weight matrix (tokens x 1500).
        x = -np.abs(self._random_cost(50, 1500, seed=11))
        ti, fi = dtw(x)
        ref_t, ref_f = dtw_numpy(x)
        np.testing.assert_array_equal(ti, ref_t)
        np.testing.assert_array_equal(fi, ref_f)


class TestDTWPallas:
    """Pallas kernel parity (interpret mode on CPU; compiled on real TPU)."""

    @pytest.mark.parametrize('shape', [(5, 7), (20, 33), (48, 150)])
    def test_path_matches_numpy(self, shape):
        from stable_ts_tpu.ops.dtw import (dtw_cost_pallas, dtw_numpy,
                                           _traceback_from_cost)
        rng = np.random.default_rng(11)
        x = rng.standard_normal(shape).astype(np.float32) ** 2
        cost = np.asarray(dtw_cost_pallas(jnp.asarray(x), interpret=True),
                          dtype=np.float64)
        got = _traceback_from_cost(cost)
        want = dtw_numpy(x)
        assert (got[0] == want[0]).all() and (got[1] == want[1]).all()

    def test_batched_matches_single(self):
        from stable_ts_tpu.ops.dtw import dtw_cost_jax, dtw_cost_pallas
        rng = np.random.default_rng(12)
        xb = rng.standard_normal((4, 30, 41)).astype(np.float32) ** 2
        cb = np.asarray(dtw_cost_pallas(jnp.asarray(xb), interpret=True))
        for b in range(4):
            cs = np.asarray(dtw_cost_jax(jnp.asarray(xb[b])))
            finite = np.isfinite(cs)
            assert np.allclose(np.where(finite, cb[b] - cs, 0), 0, atol=1e-3)

    def test_zero_padded_submatrix_exact(self):
        """Padding rows/cols with zeros must not change the sub-DP (the
        batched timing pass relies on this)."""
        from stable_ts_tpu.ops.dtw import dtw_cost_pallas
        rng = np.random.default_rng(13)
        x = rng.standard_normal((12, 19)).astype(np.float32) ** 2
        xp = np.zeros((20, 40), np.float32)
        xp[:12, :19] = x
        c_pad = np.asarray(dtw_cost_pallas(jnp.asarray(xp), interpret=True))
        c = np.asarray(dtw_cost_pallas(jnp.asarray(x), interpret=True))
        finite = np.isfinite(c)
        assert np.allclose(np.where(finite, c_pad[:13, :20] - c, 0), 0,
                           atol=1e-4)

    def test_matrices_to_jumps_batched_matches_loop(self):
        from stable_ts_tpu.models.whisper.timing import (_matrices_to_jumps,
                                                         _matrix_to_jumps)
        rng = np.random.default_rng(14)
        mats = [rng.random((n, m)).astype(np.float32)
                for n, m in [(9, 50), (14, 72), (6, 31)]]
        batched = _matrices_to_jumps(mats)
        single = [_matrix_to_jumps(m) for m in mats]
        for got, want in zip(batched, single):
            assert (got == want).all()


class TestDTWTieBreaking:
    """whisper dtw_cpu resolves ties with strict <: equal costs move LEFT
    (t=2), and when c0 == c1 < c2 the accumulated cost takes c2 — a known
    quirk of the reference DP that flat regions (silence, cropped columns)
    depend on. Fixture paths below were derived from that exact rule."""

    FIXTURES = [
        (np.zeros((3, 5)),
         [0, 1, 2, 2, 2, 2, 2], [0, 0, 0, 1, 2, 3, 4]),
        (np.array([[0., 0., 1., 1.],
                   [0., 0., 1., 1.],
                   [1., 1., 0., 0.]]),
         [0, 1, 1, 2, 2], [0, 0, 1, 2, 3]),
        (np.ones((3, 3)),
         [0, 1, 2], [0, 1, 2]),
    ]

    @pytest.mark.parametrize('case', range(len(FIXTURES)))
    def test_numpy_matches_whisper_rule(self, case):
        x, want_t, want_f = self.FIXTURES[case]
        ti, fi = dtw_numpy(x)
        assert ti.tolist() == want_t
        assert fi.tolist() == want_f

    @pytest.mark.parametrize('case', range(len(FIXTURES)))
    def test_device_traceback_matches_fixtures(self, case):
        x, want_t, want_f = self.FIXTURES[case]
        ti, fi = dtw(x, device=True)
        assert ti.tolist() == want_t
        assert fi.tolist() == want_f

    def test_quirky_cost_accumulation(self):
        # c0 == c1 < c2 at (2,2): whisper's rule takes c2, not the minimum.
        x = np.array([[0., 5.],
                      [0., 1.]])
        from stable_ts_tpu.ops.dtw import _traceback_from_trace  # noqa: F401
        ti, fi = dtw_numpy(x)
        assert ti[0] == 0 and fi[0] == 0  # still a valid corner-to-corner path


class TestDeviceTraceback:
    """dtw_jumps_device must reproduce the host traceback's jump frames
    (same strict-< tie order) for every window of a padded batch."""

    def test_matches_host_jumps(self):
        import jax
        import jax.numpy as jnp
        from stable_ts_tpu.ops.dtw import dtw_cost_jax, dtw_jumps_device
        from stable_ts_tpu.models.whisper.timing import _jumps_from_cost

        rng = np.random.default_rng(0)
        dims = [(40, 300), (12, 90), (7, 7), (1, 50), (33, 200)]
        R = max(n for n, _ in dims)
        F = max(m for _, m in dims)
        batch = np.zeros((len(dims), R, F), np.float32)
        for b, (n, m) in enumerate(dims):
            batch[b, :n, :m] = -rng.random((n, m)).astype(np.float32)
            batch[b, :n, m // 3:m // 3 + 5] = 0.0  # flat ties
        cost = np.asarray(jax.vmap(dtw_cost_jax)(jnp.asarray(batch)))
        jumps = np.asarray(dtw_jumps_device(
            jnp.asarray(cost), jnp.array([n for n, _ in dims]),
            jnp.array([m for _, m in dims])))
        for b, (n, m) in enumerate(dims):
            host = _jumps_from_cost(cost[b, :n + 1, :m + 1].astype(np.float64))
            assert np.array_equal(jumps[b, :n], host), f'window {b}'
