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


class TestSelectiveCapture:
    """Selective QK capture (only the alignment heads' rows) must produce
    bit-identical word timings to the full-capture path."""

    def test_capture_table_layout(self):
        from stable_ts_tpu.models.whisper.timing import (
            build_head_capture_table, gather_captured_heads)
        heads = [(0, 3), (2, 1), (2, 4), (3, 0)]
        table, slots = build_head_capture_table(heads, n_layers=4)
        assert table.shape == (4, 2)
        assert slots == [(0, 0), (2, 0), (2, 1), (3, 0)]
        # gather returns rows in the original (layer, head) pair order
        rng = np.random.default_rng(0)
        qks = rng.standard_normal((4, 2, 5, 7)).astype(np.float32)
        rows = gather_captured_heads(qks, slots)
        assert rows.shape == (4, 5, 7)
        np.testing.assert_array_equal(rows[1], qks[2, 0])
        np.testing.assert_array_equal(rows[2], qks[2, 1])

    def test_find_alignment_selective_matches_full(self, model):
        import jax.numpy as jnp
        from stable_ts_tpu.ops.mel import log_mel_spectrogram
        from stable_ts_tpu.models.whisper.timing import find_alignment
        rng = np.random.default_rng(17)
        audio = (rng.standard_normal(16000 * 6) * 0.2).astype(np.float32)
        mel = log_mel_spectrogram(
            np.pad(audio, (0, 30 * 16000 - audio.shape[0])),
            model.dims.n_mels)
        tokenizer = model.get_tokenizer()
        tokens = tokenizer.encode(' quick brown fox jumps')
        heads = [(0, 1), (1, 0), (1, 3)]
        selective = find_alignment(
            model.params, model.dims, tokenizer, tokens, jnp.asarray(mel),
            16000 * 6, alignment_heads=heads)
        # force the full-capture path by precomputing all-head QKs
        from stable_ts_tpu.models.whisper.timing import compute_qks_and_probs
        qks, probs, _ = compute_qks_and_probs(
            model.params, model.dims, tokenizer, tokens, mel=jnp.asarray(mel))
        full = find_alignment(
            model.params, model.dims, tokenizer, tokens, None, 16000 * 6,
            alignment_heads=heads, precomputed=(qks, probs))
        assert len(selective) == len(full)
        for a, b in zip(selective, full):
            assert a.word == b.word
            assert abs(a.start - b.start) < 1e-6
            assert abs(a.end - b.end) < 1e-6

    def test_batched_transcribe_with_heads_matches_schema(self, model):
        """transcribe_batched with known alignment heads (selective capture
        in the batched timing pass) still produces a full result."""
        model.alignment_heads = [(0, 0), (1, 2)]
        try:
            rng = np.random.default_rng(23)
            audio = (rng.standard_normal(16000 * 45) * 0.15).astype(np.float32)
            res = model.transcribe_batched(audio, verbose=None)
            for seg in res.segments:
                for w in seg.words:
                    assert w.end <= 45.5
        finally:
            model.alignment_heads = None

    def test_device_timing_path_matches_host(self, model, monkeypatch):
        """Batched timing: the on-device weights+DTW fast path must produce
        the same words as reference-order host math (crop to real frames
        FIRST, then softmax/normalize/median-filter per window) — for full
        30-s windows AND the short tail window, which rides the same device
        path via the reflect-continuation gather."""
        model.alignment_heads = [(0, 0), (1, 2), (1, 5)]
        try:
            rng = np.random.default_rng(31)
            # 50 s -> one full 30-s window + one 20-s short tail window
            audio = (rng.standard_normal(16000 * 50) * 0.15).astype(np.float32)

            res_fast = model.transcribe_batched(audio, verbose=None,
                                                regroup=False)

            # swap the device weights kernel for per-window host-order math
            import jax.numpy as jnp
            import stable_ts_tpu.models.whisper.timing as T

            def host_order(sel, qk_lens, row_counts, sot_len, qk_scale,
                           medfilt_width):
                sel_np = np.asarray(sel).astype(np.float32)
                lens = np.asarray(qk_lens)
                rows = np.asarray(row_counts)
                n_sel, b, t, f = sel_np.shape
                out = np.zeros((b, t - sot_len - 1, f), np.float32)
                for i in range(b):
                    qk = sel_np[:, i, :sot_len + rows[i] + 1]
                    w = _legacy_head_weights_host(
                        qk, int(lens[i]), sot_len, qk_scale, medfilt_width)
                    out[i, :rows[i], :lens[i]] = w.mean(axis=0)
                return jnp.asarray(out)

            monkeypatch.setattr(T, 'legacy_weights_batched', host_order)
            res_host = model.transcribe_batched(audio, verbose=None,
                                                regroup=False)

            fast = [(w.word, w.start, w.end) for s in res_fast.segments
                    for w in s.words]
            host = [(w.word, w.start, w.end) for s in res_host.segments
                    for w in s.words]
            assert [w[0] for w in fast] == [w[0] for w in host]
            assert len(fast) > 0
            for (_, fs, fe), (_, hs, he) in zip(fast, host):
                assert abs(fs - hs) <= 0.021 and abs(fe - he) <= 0.021, \
                    (fs, hs, fe, he)
        finally:
            model.alignment_heads = None

    def test_short_window_weights_device_matches_host_crop_first(self):
        """The reflect-continuation gather must make the full-width device
        kernel equal the reference's crop-first host math on every kept
        column, for a SHORT window."""
        import jax.numpy as jnp
        rng = np.random.default_rng(41)
        qks = _fake_qks(rng, T=10, F=1500)
        sel = qks[[0, 1], [1, 2]]
        max_qk_len = 400
        dev = np.asarray(legacy_head_weights(
            jnp.asarray(sel), max_qk_len, sot_len=2, qk_scale=1.0,
            medfilt_width=7))
        host = _legacy_head_weights_host(sel, max_qk_len, sot_len=2,
                                         qk_scale=1.0, medfilt_width=7)
        assert dev.shape[-1] == 1500  # full width; kept columns must match
        np.testing.assert_allclose(dev[..., :max_qk_len], host,
                                   rtol=2e-4, atol=2e-5)

    def test_short_window_new_aligner_device_matches_host(self):
        import jax.numpy as jnp
        rng = np.random.default_rng(43)
        qks = _fake_qks(rng, T=10, F=1500)
        max_qk_len = 250
        dev = np.asarray(new_aligner_matrix(
            jnp.asarray(qks), max_qk_len, sot_len=2, qk_scale=1.0,
            medfilt_width=7, topk=4, w_colnorm=1.0, w_rownorm=1.0,
            w_coverage=0.5))
        host = _new_aligner_matrix_host(
            qks, max_qk_len, sot_len=2, qk_scale=1.0, medfilt_width=7,
            topk=4, w_colnorm=1.0, w_rownorm=1.0, w_coverage=0.5)
        np.testing.assert_allclose(dev[..., :max_qk_len], host,
                                   rtol=2e-4, atol=2e-5)
