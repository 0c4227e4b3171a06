"""CLI surface tests: parser compatibility and option wiring (no model)."""
import os

import pytest

from stable_ts_tpu.cli import build_parser


@pytest.fixture(scope='module')
def parser():
    return build_parser()


class TestReferenceFlagSurface:
    """Every reference CLI flag parses (reference cli.py:124-391)."""

    REFERENCE_FLAGS = [
        ['--model', 'base'], ['--model_dir', '/tmp'], ['--output', 'o.srt'],
        ['--output_dir', '/tmp'], ['--output_format', 'srt'],
        ['--verbose', '2'], ['--task', 'translate'], ['--language', 'en'],
        ['--temperature', '0.2'], ['--best_of', '5'], ['--beam_size', '5'],
        ['--patience', '1.0'], ['--length_penalty', '0.5'],
        ['--suppress_tokens', '-1'], ['--initial_prompt', 'hi'],
        ['--condition_on_previous_text', 'true'],
        ['--temperature_increment_on_fallback', '0.2'],
        ['--compression_ratio_threshold', '2.4'],
        ['--logprob_threshold', '-1.0'], ['--no_speech_threshold', '0.6'],
        ['--word_timestamps', 'true'], ['--regroup', 'cm_sg=.5'],
        ['--suppress_silence', 'true'], ['--suppress_word_ts', 'true'],
        ['--suppress_ts_tokens', 'false'], ['--vad', 'true'],
        ['--vad_threshold', '0.35'], ['--q_levels', '20'], ['--k_size', '5'],
        ['--min_word_dur', '0.1'], ['--nonspeech_error', '0.1'],
        ['--gap_padding', ' ...'], ['--prepend_punctuations', '"'],
        ['--append_punctuations', '.'], ['--denoiser', 'spectral_gate'],
        ['--only_voice_freq'], ['--segment_level', 'true'],
        ['--word_level', 'true'], ['--min_dur', '0.02'],
        ['--tag', '<b>', '</b>'], ['--font', 'Arial'], ['--font_size', '48'],
        ['--karaoke', 'true'], ['--strip', 'true'],
        # compat group
        ['--device', 'cpu'], ['--fp16', 'true'], ['--cpu_preload', 'true'],
        ['--threads', '4'], ['--demucs', 'true'],
        ['--demucs_option', 'shifts=1'], ['--denoiser_option', 'a=1'],
        ['--denoiser_output', '/tmp/x.wav'], ['--only_ffmpeg'],
        ['--mel_first'], ['--no_stream'], ['--reverse_text', 'true'],
        ['--vad_onnx', 'false'], ['--time_scale', '1.0'], ['--ts_num', '1'],
        ['--ts_noise', '0.1'], ['--faster_whisper'],
        ['--huggingface_whisper'], ['--mlx_whisper'],
        ['--save_unfinished'], ['--resume_input', 'x.json'],
        ['--delete_resume'], ['--dynamic_quantization'],
        ['--persist'], ['--overwrite'], ['--debug'],
    ]

    @pytest.mark.parametrize('flag', REFERENCE_FLAGS,
                             ids=[f[0] for f in REFERENCE_FLAGS])
    def test_flag_parses(self, parser, flag):
        parser.parse_args(['in.wav'] + flag)

    def test_resume_aliases(self, parser):
        a = parser.parse_args(['in.wav', '--resume_input', 'r.json'])
        b = parser.parse_args(['in.wav', '--resume', 'r.json'])
        assert a.resume == b.resume == 'r.json'

    def test_short_flags(self, parser):
        a = parser.parse_args(['in.wav', '-dq', '-su', '-dr', '-y', '-p',
                               '-ovf', '-fw'])
        assert a.dynamic_quantization and a.save_unfinished
        assert a.delete_resume and a.overwrite and a.persist
        assert a.only_voice_freq and a.faster_whisper


class TestCompatBehavior:
    def test_unsupported_backends_raise(self, parser, tmp_path):
        from stable_ts_tpu.cli import _run_once
        args = parser.parse_args([str(tmp_path / 'x.wav'), '-fw'])
        with pytest.raises(NotImplementedError, match='transcribe_any'):
            _run_once(args, {})

    def test_deprecated_flags_warn(self, parser, tmp_path, monkeypatch):
        from stable_ts_tpu import cli as cli_mod
        from stable_ts_tpu import loaders as loaders_mod
        args = parser.parse_args([str(tmp_path / 'x.wav'),
                                  '--time_scale', '2.0'])

        # stop before any model loading (cli imports load_model from
        # .loaders inside _run_once, so patch it at its source)
        def boom(**kw):
            raise RuntimeError('stop-before-load')
        monkeypatch.setattr(loaders_mod, 'load_model', boom)
        with pytest.warns(UserWarning, match='time_scale'):
            with pytest.raises(RuntimeError, match='stop-before-load'):
                cli_mod._run_once(args, {})


def _word(word, start, end, prob=0.9):
    return dict(word=word, start=start, end=end, probability=prob)


def _mini_result(words=None, unfinished=-1.0):
    from stable_ts_tpu.result import WhisperResult
    words = words or [_word(' hello', 0.0, 0.4), _word(' world', 0.5, 0.9)]
    res = WhisperResult([words])
    res.unfinished_start = unfinished
    return res


class _FakeModel:
    """Stands in for WhisperTPU: records calls, returns canned results."""

    def __init__(self, result_factory=None):
        self.calls = []
        self._factory = result_factory or (lambda **kw: _mini_result())

    def transcribe(self, **kwargs):
        self.calls.append(('transcribe', kwargs))
        return self._factory(**kwargs)

    transcribe_minimal = transcribe_batched = transcribe

    def refine(self, **kwargs):
        self.calls.append(('refine', kwargs))
        return kwargs['result']


@pytest.fixture
def fake_model(monkeypatch):
    from stable_ts_tpu import loaders as loaders_mod
    model = _FakeModel()
    monkeypatch.setattr(loaders_mod, 'load_model',
                        lambda **kw: model)
    return model


def _wav(path, seconds=1.0):
    import wave
    import numpy as np
    pcm = (np.zeros(int(16000 * seconds)) * 32767).astype('<i2')
    with wave.open(str(path), 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    return str(path)


class TestOutputMapping:
    """Multi-input -> multi-output path mapping (reference cli.py:582)."""

    def test_default_stem_mapping(self, tmp_path):
        from stable_ts_tpu.cli import _finalize_outputs
        ins = [str(tmp_path / 'a.wav'), str(tmp_path / 'sub' / 'b.flac')]
        outs = _finalize_outputs(ins, None, None, None)
        assert outs == [[str(tmp_path / 'a.srt')],
                        [str(tmp_path / 'sub' / 'b.srt')]]

    def test_output_dir_redirects(self, tmp_path):
        from stable_ts_tpu.cli import _finalize_outputs
        outs = _finalize_outputs(['/x/a.wav'], None, str(tmp_path),
                                 ['srt', 'json'])
        assert outs == [[str(tmp_path / 'a.srt'), str(tmp_path / 'a.json')]]

    def test_explicit_outputs_one_per_input(self):
        from stable_ts_tpu.cli import _finalize_outputs
        outs = _finalize_outputs(['a.wav', 'b.wav'], ['x.srt', 'y.vtt'],
                                 None, None)
        assert outs == [['x.srt'], ['y.vtt']]

    def test_explicit_outputs_with_formats_fan_out(self):
        from stable_ts_tpu.cli import _finalize_outputs
        outs = _finalize_outputs(['a.wav'], ['out.srt'], None, ['srt', 'ass'])
        assert outs == [['out.srt', 'out.ass']]

    def test_count_mismatch_raises(self):
        from stable_ts_tpu.cli import _finalize_outputs
        with pytest.raises(ValueError, match='2 input'):
            _finalize_outputs(['a.wav', 'b.wav'], ['only.srt'], None, None)

    def test_bad_output_format_rejected(self, parser, tmp_path, fake_model):
        from stable_ts_tpu.cli import _run_once
        args = parser.parse_args([_wav(tmp_path / 'a.wav'), '-f', 'mkv'])
        with pytest.raises(NotImplementedError, match='mkv'):
            _run_once(args, {})


class TestJsonReprocessing:
    """A .json input is reprocessed without transcription or model load
    (reference cli.py:702-703)."""

    def _saved_json(self, tmp_path):
        path = str(tmp_path / 'res.json')
        _mini_result().save_as_json(path)
        return path

    def test_json_to_srt_without_model(self, tmp_path, parser, monkeypatch):
        from stable_ts_tpu import loaders as loaders_mod
        from stable_ts_tpu.cli import _run_once

        def no_load(**kw):
            raise AssertionError('model must not load for JSON input')
        monkeypatch.setattr(loaders_mod, 'load_model', no_load)
        src = self._saved_json(tmp_path)
        out = str(tmp_path / 'res.srt')
        args = parser.parse_args([src, '-o', out, '-y', '-v', '0'])
        _run_once(args, {})
        text = open(out).read()
        assert 'hello' in text and '-->' in text

    def test_json_multi_format(self, tmp_path, parser):
        src = self._saved_json(tmp_path)
        args = parser.parse_args([src, '-f', 'srt,vtt,txt', '-y', '-v', '0',
                                  '-d', str(tmp_path / 'out')])
        from stable_ts_tpu.cli import _run_once
        _run_once(args, {})
        for ext in ('srt', 'vtt', 'txt'):
            assert (tmp_path / 'out' / f'res.{ext}').exists()

    def test_json_with_regroup_string(self, tmp_path, parser):
        src = self._saved_json(tmp_path)
        out = str(tmp_path / 'r.json')
        args = parser.parse_args([src, '-o', out, '-y', '-v', '0'])
        from stable_ts_tpu.cli import _run_once
        _run_once(args, {})
        import json as json_mod
        saved = json_mod.load(open(out))
        assert saved['segments']


class TestResumeFlow:
    """-UNFINISHED saving and --resume_input wiring (reference cli.py:771)."""

    def test_unfinished_result_saved(self, tmp_path, parser, monkeypatch):
        from stable_ts_tpu import loaders as loaders_mod
        from stable_ts_tpu.cli import _run_once
        model = _FakeModel(lambda **kw: _mini_result(unfinished=30.0))
        monkeypatch.setattr(loaders_mod, 'load_model', lambda **kw: model)
        wav = _wav(tmp_path / 'long.wav')
        args = parser.parse_args([wav, '-su', '-y', '-v', '0',
                                  '-d', str(tmp_path)])
        _run_once(args, {})
        unfinished = tmp_path / 'long-UNFINISHED.json'
        assert unfinished.exists()
        # the ordinary output must NOT be written for an unfinished result
        assert not (tmp_path / 'long.srt').exists()

    def test_resume_passed_to_transcribe_and_deleted(self, tmp_path, parser,
                                                     fake_model):
        from stable_ts_tpu.cli import _run_once
        resume_path = str(tmp_path / 'long-UNFINISHED.json')
        _mini_result(unfinished=30.0).save_as_json(resume_path)
        wav = _wav(tmp_path / 'long.wav')
        args = parser.parse_args([wav, '--resume_input', resume_path, '-dr',
                                  '-y', '-v', '0', '-d', str(tmp_path)])
        _run_once(args, {})
        kwargs = fake_model.calls[0][1]
        assert kwargs['resume'] == resume_path
        assert not os.path.exists(resume_path)  # --delete_resume
        assert (tmp_path / 'long.srt').exists()

    def test_resume_kept_without_delete_flag(self, tmp_path, parser, fake_model):
        from stable_ts_tpu.cli import _run_once
        resume_path = str(tmp_path / 'r-UNFINISHED.json')
        _mini_result(unfinished=30.0).save_as_json(resume_path)
        wav = _wav(tmp_path / 'r.wav')
        args = parser.parse_args([wav, '--resume', resume_path,
                                  '-y', '-v', '0', '-d', str(tmp_path)])
        _run_once(args, {})
        assert os.path.exists(resume_path)


class TestModelCacheAndOptions:
    def test_model_cached_across_runs(self, tmp_path, parser, monkeypatch):
        from stable_ts_tpu import loaders as loaders_mod
        from stable_ts_tpu.cli import _run_once
        loads = []

        def load(**kw):
            loads.append(kw)
            return _FakeModel()
        monkeypatch.setattr(loaders_mod, 'load_model', load)
        wav = _wav(tmp_path / 'a.wav')
        cache = {}
        args = parser.parse_args([wav, '-y', '-v', '0', '-d', str(tmp_path)])
        _run_once(args, cache)
        _run_once(args, cache)  # persist-REPL reuse
        assert len(loads) == 1
        args2 = parser.parse_args([wav, '-y', '-v', '0', '-d', str(tmp_path),
                                   '--model', 'other'])
        _run_once(args2, cache)
        assert len(loads) == 2  # model change reloads

    def test_transcribe_option_escape_hatch(self, tmp_path, parser, fake_model):
        from stable_ts_tpu.cli import _run_once
        wav = _wav(tmp_path / 'a.wav')
        args = parser.parse_args([wav, '-y', '-v', '0', '-d', str(tmp_path),
                                  '--transcribe_option', 'nonspeech_skip=5.0'])
        _run_once(args, {})
        assert fake_model.calls[0][1]['nonspeech_skip'] == 5.0

    def test_multiple_inputs_each_transcribed(self, tmp_path, parser, fake_model):
        from stable_ts_tpu.cli import _run_once
        wavs = [_wav(tmp_path / 'a.wav'), _wav(tmp_path / 'b.wav')]
        args = parser.parse_args(wavs + ['-y', '-v', '0', '-d', str(tmp_path)])
        _run_once(args, {})
        assert [c[0] for c in fake_model.calls] == ['transcribe', 'transcribe']
        assert (tmp_path / 'a.srt').exists() and (tmp_path / 'b.srt').exists()

    def test_refine_applied_after_transcribe(self, tmp_path, parser, fake_model):
        from stable_ts_tpu.cli import _run_once
        wav = _wav(tmp_path / 'a.wav')
        args = parser.parse_args([wav, '-r', '-y', '-v', '0',
                                  '-d', str(tmp_path)])
        _run_once(args, {})
        assert [c[0] for c in fake_model.calls] == ['transcribe', 'refine']


def test_batched_method_forwards_stabilization_options(tmp_path, fake_model):
    """--transcribe_method transcribe_batched must forward the shared
    stabilization/decode options and --batch_size (round-3 option parity)."""
    from stable_ts_tpu.cli import cli
    wav = _wav(tmp_path / 'a.wav')
    cli([wav, '-y', '-v', '0', '-d', str(tmp_path),
         '--transcribe_method', 'transcribe_batched',
         '--batch_size', '4', '--max_instant_words', '0.7',
         '--suppress_ts_tokens', 'True',
         '--nonspeech_skip', '4.5', '--beam_size', '2'])
    kwargs = fake_model.calls[0][1]
    assert kwargs['batch_size'] == 4
    assert kwargs['max_instant_words'] == 0.7
    assert kwargs['suppress_ts_tokens'] is True
    assert kwargs['nonspeech_skip'] == 4.5
    assert kwargs['beam_size'] == 2
    # resume is supported by the batched driver too (round 3)
    assert 'resume' in kwargs and kwargs['resume'] is None
