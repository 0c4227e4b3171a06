"""CLI surface tests: parser compatibility and option wiring (no model)."""
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
