"""URL sources (file://, yt-dlp shim) and the metadata probe."""
import os
import stat
import struct
import sys
import wave

import numpy as np
import pytest

from stable_ts_tpu.audio.source import is_url, is_ytdlp_available, load_source
from stable_ts_tpu.audio.utils import get_metadata, get_samplerate


def _write_wav(path, seconds=1.0, sr=16000):
    t = np.arange(int(seconds * sr)) / sr
    pcm = (np.sin(2 * np.pi * 440 * t) * 0.4 * 32767).astype('<i2')
    with wave.open(str(path), 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return pcm


class TestFileUrl:
    def test_load_source_resolves_path(self, tmp_path):
        wav = tmp_path / 'a b.wav'  # space exercises percent-decoding
        _write_wav(wav)
        url = 'file://' + str(wav).replace(' ', '%20')
        assert load_source(url) == str(wav)

    def test_audio_loader_accepts_file_url(self, tmp_path):
        from stable_ts_tpu.audio.loader import AudioLoader
        wav = tmp_path / 'tone.wav'
        _write_wav(wav, seconds=2.0)
        loader = AudioLoader('file://' + str(wav), verbose=None)
        chunk = loader.next_chunk(0, 16000)
        # chunk sizes round up to the VAD divisor (512)
        assert chunk is not None and chunk.shape[-1] == 16384
        assert abs(loader.get_duration() - 2.0) < 0.01

    def test_prep_audio_accepts_file_url(self, tmp_path):
        from stable_ts_tpu.audio import prep_audio
        wav = tmp_path / 'tone.wav'
        _write_wav(wav, seconds=0.5)
        audio = prep_audio('file://' + str(wav))
        assert audio.shape[-1] == 8000

    def test_return_dict_for_file_url(self, tmp_path):
        wav = tmp_path / 'tone.wav'
        _write_wav(wav, seconds=1.5)
        info = load_source('file://' + str(wav), return_dict=True)
        assert info['path'] == str(wav)
        assert abs(info['duration'] - 1.5) < 0.01
        assert info['is_live'] is False


@pytest.fixture
def fake_ytdlp(tmp_path, monkeypatch):
    """A yt-dlp shim: prints media info to stderr, streams a WAV to stdout."""
    wav = tmp_path / 'media.wav'
    _write_wav(wav, seconds=1.0)
    shim = tmp_path / 'bin' / 'yt-dlp'
    shim.parent.mkdir()
    shim.write_text(
        '#!%s\nimport sys\n'
        'args = sys.argv[1:]\n'
        'if "--print" in args:\n'
        '    sys.stderr.write("Fake Title\\n42\\nFalse\\n")\n'
        '    sys.stderr.flush()\n'
        'sys.stdout.buffer.write(open(%r, "rb").read())\n'
        % (sys.executable, str(wav)))
    shim.chmod(shim.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv('PATH', f"{shim.parent}{os.pathsep}{os.environ['PATH']}")
    return wav


class TestYtdlp:
    def test_detection(self, fake_ytdlp):
        assert is_ytdlp_available()

    def test_download_returns_bytes(self, fake_ytdlp):
        data = load_source('https://example.com/watch?v=x', verbose=None)
        assert isinstance(data, bytes)
        assert data == fake_ytdlp.read_bytes()

    def test_return_dict_handshake(self, fake_ytdlp, capsys):
        info = load_source('https://example.com/v', return_dict=True,
                           verbose=True)
        assert info['title'] == 'Fake Title'
        assert info['duration'] == 42
        assert info['is_live'] is False
        assert info['popen'] is not None
        info['popen'].communicate()
        assert 'Media Info (YT-DLP)' in capsys.readouterr().out

    def test_loader_decodes_downloaded_bytes(self, fake_ytdlp):
        from stable_ts_tpu.audio.loader import AudioLoader
        loader = AudioLoader('https://example.com/clip', verbose=None)
        assert abs(loader.get_duration() - 1.0) < 0.01

    def test_only_ffmpeg_skips_ytdlp(self, fake_ytdlp):
        url = 'https://example.com/direct.wav'
        assert load_source(url, only_ffmpeg=True) == url


class TestNoYtdlp:
    def test_warns_and_passes_url_through(self, tmp_path, monkeypatch):
        monkeypatch.setenv('PATH', str(tmp_path))  # nothing on PATH
        url = 'https://example.com/direct.mp3'
        with pytest.warns(UserWarning, match='yt-dlp'):
            assert load_source(url) == url

    def test_non_url_passthrough(self):
        assert not is_url('plain.wav')
        assert load_source('plain.wav') == 'plain.wav'
        assert load_source(b'bytes') == b'bytes'


class TestMetadata:
    def test_ndarray(self):
        meta = get_metadata(np.zeros(32000, np.float32))
        assert meta == dict(sr=16000, duration=2.0)

    def test_wav_header_probe(self, tmp_path):
        wav = tmp_path / 't.wav'
        _write_wav(wav, seconds=3.0, sr=22050)
        meta = get_metadata(str(wav))
        assert meta['sr'] == 22050
        assert abs(meta['duration'] - 3.0) < 0.01
        assert get_samplerate(str(wav)) == 22050

    def test_flac_header_probe(self):
        jfk = '/root/reference/test/jfk.flac'
        if not os.path.isfile(jfk):
            pytest.skip('no FLAC fixture')
        meta = get_metadata(jfk)
        assert meta['sr'] in (16000, 44100, 48000)
        assert meta['duration'] and 5 < meta['duration'] < 60

    def test_ffmpeg_banner_fallback(self, tmp_path, monkeypatch):
        """Non-WAV container: duration comes from the ffmpeg -i banner."""
        shim = tmp_path / 'bin' / 'ffmpeg'
        shim.parent.mkdir()
        banner = ('Input #0, mp3, from \'x.mp3\':\\n'
                  '  Duration: 00:10:03.50, start: 0.0, bitrate: 128 kb/s\\n'
                  '  Stream #0:0: Audio: mp3, 44100 Hz, stereo\\n')
        shim.write_text('#!%s\nimport sys\nsys.stderr.write("%s")\n'
                        % (sys.executable, banner))
        shim.chmod(shim.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv('PATH',
                           f"{shim.parent}{os.pathsep}{os.environ['PATH']}")
        fake_mp3 = tmp_path / 'x.mp3'
        fake_mp3.write_bytes(b'\xff\xfb' + b'\x00' * 64)
        meta = get_metadata(str(fake_mp3))
        assert meta['sr'] == 44100
        assert meta['duration'] == 603.5

    def test_no_ffmpeg_graceful(self, tmp_path, monkeypatch):
        monkeypatch.setenv('PATH', str(tmp_path))
        fake = tmp_path / 'mystery.ogg'
        fake.write_bytes(b'OggS' + b'\x00' * 32)
        assert get_metadata(str(fake)) == dict(sr=None, duration=None)
