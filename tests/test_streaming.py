"""Streaming AudioLoader: bounded memory, eager-equivalence, backward seeks."""
import wave

import numpy as np
import pytest

from stable_ts_tpu.audio.loader import AudioLoader
from stable_ts_tpu.audio.streaming import (ChunkedResampler, WavStreamReader,
                                           open_stream_reader)


def write_wav(path, audio, sr, sampwidth=2, channels=1):
    x = np.asarray(audio, np.float32)
    if channels > 1:
        x = np.stack([x] * channels, axis=1)
    pcm = (np.clip(x, -1, 1) * 32767).astype('<i2')
    with wave.open(str(path), 'wb') as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


@pytest.fixture(scope='module')
def audio_16k():
    rng = np.random.default_rng(0)
    # keep inside [-1, 1): the s16 WAV writer clips anything beyond
    return np.clip(rng.standard_normal(16000 * 45) * 0.3,
                   -0.99, 0.99).astype(np.float32)


class TestChunkedResampler:
    @pytest.mark.parametrize('in_sr', [44100, 48000, 22050, 8000, 16000])
    def test_bit_exact_vs_one_shot(self, in_sr):
        from scipy.signal import resample_poly
        rng = np.random.default_rng(1)
        x = (rng.standard_normal(in_sr * 2 + 331) * 0.3).astype(np.float32)
        g = np.gcd(in_sr, 16000)
        ref = resample_poly(x, 16000 // g, in_sr // g).astype(np.float32)
        rs = ChunkedResampler(in_sr, 16000)
        outs, pos = [], 0
        while pos < x.size:
            n = int(rng.integers(700, 9000))
            outs.append(rs.feed(x[pos:pos + n]))
            pos += n
        outs.append(rs.feed(None, final=True))
        y = np.concatenate(outs)
        assert y.size == ref.size
        assert np.abs(y - ref).max() < 1e-6


class TestWavReader:
    def test_chunk_reads_match_full(self, tmp_path, audio_16k):
        p = tmp_path / 'a.wav'
        write_wav(p, audio_16k[:16000 * 3], 16000)
        r = WavStreamReader(str(p))
        chunks = []
        while True:
            c = r.read(7000)
            if c is None:
                break
            chunks.append(c)
        got = np.concatenate(chunks)
        assert got.size == 16000 * 3
        assert np.abs(got - audio_16k[:16000 * 3]).max() < 1e-3

    def test_stereo_downmix(self, tmp_path, audio_16k):
        p = tmp_path / 's.wav'
        write_wav(p, audio_16k[:16000], 16000, channels=2)
        r = WavStreamReader(str(p))
        got = r.read(16000)
        assert np.abs(got - audio_16k[:16000]).max() < 1e-3


class TestStreamingLoader:
    def test_stream_matches_eager(self, tmp_path, audio_16k):
        p = tmp_path / 'long.wav'
        write_wav(p, audio_16k, 16000)
        eager = AudioLoader(str(p), stream=False, verbose=None)
        streamed = AudioLoader(str(p), stream=True, verbose=None)
        assert streamed.stream and not eager.stream
        seek = 0
        while True:
            a = eager.next_chunk(seek, 16000 * 7)
            b = streamed.next_chunk(seek, 16000 * 7)
            assert (a is None) == (b is None)
            if a is None:
                break
            assert a.shape == b.shape
            assert np.abs(a - b).max() < 1e-4
            seek += a.size

    def test_stream_resampled_matches_eager(self, tmp_path):
        rng = np.random.default_rng(3)
        src = (rng.standard_normal(22050 * 20) * 0.3).astype(np.float32)
        p = tmp_path / 'r.wav'
        write_wav(p, src, 22050)
        eager = AudioLoader(str(p), stream=False, verbose=None)
        streamed = AudioLoader(str(p), stream=True, verbose=None)
        a = eager.next_chunk(0, None)
        b_parts, seek = [], 0
        while True:
            b = streamed.next_chunk(seek, 16000 * 6)
            if b is None:
                break
            b_parts.append(b)
            seek += b.size
        b = np.concatenate(b_parts)
        n = min(a.size, b.size)
        assert abs(a.size - b.size) <= 2
        assert np.abs(a[:n] - b[:n]).max() < 1e-3

    def test_bounded_memory(self, tmp_path, audio_16k):
        p = tmp_path / 'mem.wav'
        write_wav(p, audio_16k, 16000)
        loader = AudioLoader(str(p), stream=True, verbose=None,
                             buffer_size=16000 * 5)
        seek = 0
        while True:
            c = loader.next_chunk(seek, 16000 * 2)
            if c is None:
                break
            seek += c.size
            assert loader._buf.size <= 16000 * 5 + 16000 * 2 + 16000 * 4 + 512
        assert loader._buf_start > 0  # old samples were actually dropped

    def test_backward_seek_within_buffer(self, tmp_path, audio_16k):
        p = tmp_path / 'bk.wav'
        write_wav(p, audio_16k, 16000)
        loader = AudioLoader(str(p), stream=True, verbose=None)
        c1 = loader.next_chunk(16000 * 10, 16000 * 2)
        c2 = loader.next_chunk(16000 * 9, 16000 * 2)  # 1s back: buffered
        # chunk sizes are divisor-aligned; compare the overlapping second
        assert np.abs(c2[16000:32000] - c1[:16000]).max() < 1e-6

    def test_backward_seek_restart(self, tmp_path, audio_16k):
        p = tmp_path / 'rs.wav'
        write_wav(p, audio_16k, 16000)
        loader = AudioLoader(str(p), stream=True, verbose=None,
                             buffer_size=16000 * 2)
        loader.next_chunk(16000 * 40, 16000)
        early = loader.next_chunk(0, 16000)  # long jump back -> restart
        assert np.abs(early[:16000] - audio_16k[:16000]).max() < 1e-3

    def test_duration_known_for_wav(self, tmp_path, audio_16k):
        p = tmp_path / 'd.wav'
        write_wav(p, audio_16k, 16000)
        loader = AudioLoader(str(p), stream=True, verbose=None)
        assert loader.get_duration(2) == pytest.approx(45.0, abs=0.01)

    def test_transcribe_streaming_end_to_end(self, tmp_path, audio_16k):
        import jax
        from stable_ts_tpu.loaders import load_test_model
        p = tmp_path / 'e2e.wav'
        write_wav(p, audio_16k[:16000 * 35], 16000)
        model = load_test_model()
        eager = model.transcribe(str(p), verbose=None, stream=False)
        streamed = model.transcribe(str(p), verbose=None, stream=True)
        assert streamed.text == eager.text
