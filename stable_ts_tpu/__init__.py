"""stable_ts_tpu: TPU-native word-level timestamp stabilization for Whisper.

A from-scratch JAX/XLA/Pallas framework with the capabilities of stable-ts
(reference: jianfch/stable-ts v2.19.1): reliable word-level timestamps from
Whisper-family models plus silence suppression, a programmable regrouping
engine, forced alignment, timestamp refinement, word localization, and
subtitle output — designed TPU-first (batched fixed-shape windows, pjit
sharding over a device mesh, a Pallas DTW kernel and an XLA-fused
STFT+mel front end for the hot paths).
"""
from ._version import __version__
from .utils import tune_host_allocator as _tune_host_allocator

# Large-buffer allocator hygiene before any pipeline allocation happens
# (see utils.tune_host_allocator — multi-second page-fault overhead
# otherwise on hosts with slow memory fault-in).
_tune_host_allocator()
from .result import WhisperResult, Segment, WordTiming
from .text_output import (result_to_srt_vtt, result_to_ass, result_to_tsv,
                          result_to_txt, save_as_json, load_result)
from .options import AllOptions

_LAZY = {
    'load_model': 'stable_ts_tpu.loaders',
    'load_hf_whisper': 'stable_ts_tpu.loaders',
    'load_faster_whisper': 'stable_ts_tpu.loaders',
    'load_mlx_whisper': 'stable_ts_tpu.loaders',
    'transcribe_any': 'stable_ts_tpu.non_whisper',
    'Aligner': 'stable_ts_tpu.non_whisper.alignment',
    'Refiner': 'stable_ts_tpu.non_whisper.refinement',
    'NonSpeechPredictor': 'stable_ts_tpu.stabilization',
    'visualize_suppression': 'stable_ts_tpu.stabilization',
    'modify_model': 'stable_ts_tpu.loaders',
    'load_test_model': 'stable_ts_tpu.loaders',
    'encode_video_comparison': 'stable_ts_tpu.video_output',
    'IS_WHISPERLESS_VERSION': 'stable_ts_tpu.constants',
}

__all__ = ['WhisperResult', 'Segment', 'WordTiming', 'AllOptions',
           'result_to_srt_vtt', 'result_to_ass', 'result_to_tsv', 'result_to_txt',
           'save_as_json', 'load_result', '__version__', *_LAZY]


def __getattr__(name):
    # Heavy modules (JAX/model code) load lazily so the result/output core
    # stays importable in milliseconds.
    if name in _LAZY:
        import importlib
        module = importlib.import_module(_LAZY[name])
        return getattr(module, name)
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')


def __dir__():
    return sorted(set(globals()) | set(_LAZY))
