"""Silence detection and timestamp stabilization.

Host-side orchestration of the silence detectors (loudness-based non-VAD,
Silero-style VAD plugin, or exact zero-sample masks) plus the timestamp
clipping rule. Counterpart of /root/reference/stable_whisper/stabilization/.
"""
from typing import Callable, List, Optional, Tuple, Union

import numpy as np

from .nonvad import NONVAD_SAMPLE_RATES, audio2loudness, audio2timings, wav2mask, visualize_mask
from .silence import suppress_silence
from .silero_vad import (VAD_SAMPLE_RATES, assert_sr_window, compute_vad_probs,
                         load_silero_vad_model, onnx_param_update)
from .utils import (filter_timings, is_ascending_sequence, mask2timing, timing2mask,
                    valid_ts)
from ..constants import FRAMES_PER_SECOND, N_SAMPLES_PER_TOKEN, SAMPLE_RATE
from ..defaults import get_min_word_dur

__all__ = ['NonSpeechPredictor', 'suppress_silence', 'get_vad_silence_func',
           'visualize_suppression', 'mask2timing', 'timing2mask', 'filter_timings',
           'wav2mask', 'audio2timings', 'audio2loudness', 'valid_ts',
           'VAD_SAMPLE_RATES', 'NONVAD_SAMPLE_RATES']


class NonSpeechPredictor:
    """Per-chunk silence prediction with streaming accumulation.

    Strategy dispatch mirrors the reference (stabilization/__init__.py:69-72):
    ``vad=None`` -> exact zero-sample mask; ``vad=False`` -> loudness non-VAD;
    ``vad=True``/dict -> Silero-style VAD plugin.
    """

    def __init__(
            self,
            vad: Optional[Union[bool, dict]] = False,
            mask_pad_func: Optional[Callable] = None,
            get_mask: bool = False,
            min_word_dur: Optional[float] = None,
            q_levels: int = 20,
            k_size: int = 5,
            vad_threshold: float = 0.35,
            vad_onnx: bool = False,
            vad_window: Optional[int] = None,
            sampling_rate: Optional[int] = None,
            verbose: Optional[bool] = True,
            store_timings: bool = False,
            ignore_is_silent: bool = False,
            stream: bool = False,
            units_per_seconds: Optional[int] = None,
            min_silence_dur: Optional[float] = None,
    ):
        min_word_dur = get_min_word_dur(min_word_dur)
        self.min_silence_dur = min_silence_dur
        if isinstance(vad, str):
            if vad != 'energy':
                raise ValueError(f"unknown VAD name: {vad!r}; use 'energy', "
                                 f"True (Silero), a dict, False, or None")
            from .energy_vad import EnergyVAD
            vad = {'model': EnergyVAD()}
        vad_options = onnx_param_update(vad, vad_onnx)
        self.vad = None if vad is None else (vad_options is not False)
        self._vad_options = vad_options if self.vad and isinstance(vad_options, dict) else {}
        self.mask_pad_func = mask_pad_func
        self.get_mask = get_mask
        self.q_levels = q_levels
        self.k_size = k_size
        self.vad_threshold = vad_threshold
        self.verbose = verbose
        self.store_timings = store_timings
        self.ignore_is_silent = ignore_is_silent
        self._stream = stream
        self._nonspeech_timings = None
        self.vad_window = 512 if vad_window is None else vad_window
        self.sampling_rate = SAMPLE_RATE if sampling_rate is None else sampling_rate
        self.min_samples_per_word = round(min_word_dur * self.sampling_rate)
        if units_per_seconds is None:
            units_per_seconds = FRAMES_PER_SECOND
        self.min_frames_per_word = max(round(min_word_dur * units_per_seconds), 1)
        if self.vad:
            assert_sr_window(self.sampling_rate, self.vad_window)
        self.min_chunks_per_word = round(min_word_dur * self.sampling_rate / self.vad_window)
        self.second_per_prob = self.vad_window / self.sampling_rate
        self.vad_model = None
        self._default_probs: List[float] = []
        self._prev_speech_probs: List[float] = []
        self._using_callback = False
        self._load_vad_model()
        if self.vad is None:
            self._predict = self.predict_with_samples
        else:
            self._predict = self.predict_with_vad if self.vad else self.predict_with_nonvad

    @property
    def nonspeech_timings(self):
        return self._nonspeech_timings

    def predict(self, audio: np.ndarray, offset: Optional[float] = None) -> dict:
        pred = self._predict(audio, offset)
        if self.min_silence_dur:
            pred['timings'] = filter_timings(pred['timings'], self.min_silence_dur)
        return pred

    def _load_vad_model(self):
        if self.vad:
            options = dict(self._vad_options)
            model = options.pop('model', None)
            if model is None:
                model = load_silero_vad_model(**options)[0]
            self.vad_model = model
            self.reset()

    def reset(self):
        if self.vad_model is not None and hasattr(self.vad_model, 'reset_states'):
            self.vad_model.reset_states()
        self._prev_speech_probs = []

    # -- shared helpers ------------------------------------------------------------

    def _silent_mask_test(self, mask, min_unit_per_word) -> bool:
        if self.ignore_is_silent or mask is None:
            return False
        non_silent = mask.shape[-1] - int(np.count_nonzero(mask))
        return non_silent < min_unit_per_word

    def _append_timings(self, timings):
        if not self.store_timings or timings is None or not len(timings[0]):
            return
        starts, ends = np.asarray(timings[0]).tolist(), np.asarray(timings[1]).tolist()
        if not self._nonspeech_timings:
            self._nonspeech_timings = (starts, ends)
            return
        if starts:
            self._nonspeech_timings[0].extend(starts)
            self._nonspeech_timings[1].extend(ends)

    def finalize_timings(self):
        """Sort and recursively merge overlapping accumulated silence sections."""
        if self._nonspeech_timings is None:
            return

        def merge(starts: np.ndarray, ends: np.ndarray):
            if len(starts) <= 1:
                return starts, ends
            valid = starts[1:] >= ends[:-1]
            if np.all(valid):
                return starts, ends
            starts = starts[np.concatenate(([True], valid))]
            ends = ends[np.concatenate((valid, [True]))]
            return merge(starts, ends)

        s, e = self._nonspeech_timings
        s, e = np.sort(np.array(s)), np.sort(np.array(e))
        s, e = merge(s, e)
        self._nonspeech_timings = s.tolist(), e.tolist()

    def pad_mask(self, mask):
        if mask is None:
            return None
        if self.mask_pad_func is None:
            return mask
        return self.mask_pad_func(mask, 1501)

    # -- VAD path -------------------------------------------------------------------

    def compute_vad_probs(self, audio: np.ndarray) -> List[float]:
        return compute_vad_probs(
            model=self.vad_model,
            audio=audio,
            sampling_rate=self.sampling_rate,
            window=self.vad_window,
            progress=self.verbose is not None,
        )

    def _nonstream_prep_callback(self, prepped_audio, **kwargs):
        if self._default_probs:
            return
        self._default_probs = self.compute_vad_probs(prepped_audio)

    def _stream_prep_callback(self, prepped_audio, **kwargs):
        self._default_probs.extend(self.compute_vad_probs(prepped_audio))

    def get_on_prep_callback(self, stream: Optional[bool] = None):
        if not self.vad:
            return None
        self._using_callback = True
        if stream is not None:
            self._stream = stream
        return self._stream_prep_callback if self._stream else self._nonstream_prep_callback

    def _vad_probs(self, audio: np.ndarray, offset: Optional[float] = None):
        if self._default_probs:
            assert offset is not None, 'offset is required for default probs'
            sample_offset = offset * self.sampling_rate
            s = int(np.floor(sample_offset / self.vad_window))
            e = int(np.ceil((sample_offset + audio.shape[-1]) / self.vad_window))
            new_offset = s * self.vad_window / self.sampling_rate
            return self._default_probs[s:e], new_offset
        assert not self._using_callback
        return self.compute_vad_probs(audio), offset

    def _vad_timings_mask(self, speech_probs: List[float], threshold: float,
                          offset: float, min_start: Optional[float] = None,
                          max_end: Optional[float] = None, get_mask: bool = False):
        mask = None
        prob_mask = np.less(speech_probs, threshold)
        is_silent = self._silent_mask_test(prob_mask, self.min_chunks_per_word)
        timings = mask2timing(
            prob_mask,
            time_offset=offset,
            second_per_unit=self.second_per_prob,
            min_start=min_start,
            max_end=max_end,
        )
        if timings is not None:
            if get_mask:
                mask = timing2mask(*timings, time_offset=offset, size=1501)
            timings = np.stack((timings[0], timings[1]), axis=0)
        return timings, mask, is_silent

    def predict_with_vad(self, audio: np.ndarray, offset: Optional[float] = None) -> dict:
        if offset is None:
            offset = 0
        max_end = round(offset + audio.shape[-1] / self.sampling_rate, 3)
        speech_probs, new_offset = self._vad_probs(audio, offset=offset)
        timings, mask, is_silent = self._vad_timings_mask(
            speech_probs, self.vad_threshold, new_offset,
            min_start=offset, max_end=max_end, get_mask=self.get_mask)
        self._append_timings(timings)
        self._prev_speech_probs = speech_probs
        return dict(timings=timings, mask=mask, is_silent=is_silent)

    # -- non-VAD path --------------------------------------------------------------------

    def predict_with_nonvad(self, audio: np.ndarray, offset: Optional[float] = None) -> dict:
        mask = wav2mask(audio, q_levels=self.q_levels, k_size=self.k_size,
                        sr=self.sampling_rate)
        timings = mask2timing(mask, time_offset=offset)
        if timings is not None:
            timings = np.stack(timings, axis=0)
        is_silent = self._silent_mask_test(mask, self.min_frames_per_word)
        if mask is not None:
            mask = self.pad_mask(mask)
        self._append_timings(timings)
        return dict(timings=timings, mask=mask, is_silent=is_silent)

    # -- exact-sample path ------------------------------------------------------------------

    def predict_with_samples(self, audio: np.ndarray, offset: Optional[float] = None) -> dict:
        if self.get_mask:
            extra = audio.shape[-1] % N_SAMPLES_PER_TOKEN
            if extra:
                audio = np.pad(audio, (0, N_SAMPLES_PER_TOKEN - extra))
            mask = np.all(audio.reshape(-1, N_SAMPLES_PER_TOKEN) == 0, axis=-1)
            min_unit_per_word = self.min_frames_per_word
        else:
            mask = audio == 0
            min_unit_per_word = self.min_samples_per_word
        is_silent = self._silent_mask_test(mask, min_unit_per_word)
        return dict(timings=None,
                    mask=self.pad_mask(mask) if self.get_mask else None,
                    is_silent=is_silent)


def get_vad_silence_func(onnx: bool = False, verbose: Optional[bool] = False, **kwargs):
    """Return ``f(audio, speech_threshold, sr, time_offset) -> (starts, ends)``."""
    predictor = NonSpeechPredictor(
        vad_onnx=kwargs.pop('vad_onnx', False),
        vad=dict(onnx=onnx, **kwargs),
        verbose=verbose,
    )

    def vad_silence_timing(audio, speech_threshold: float = .35,
                           sr: Optional[int] = None,
                           time_offset: Optional[float] = None):
        from ..audio import prep_audio
        predictor.sampling_rate = sr or predictor.sampling_rate
        predictor.vad_threshold = speech_threshold
        audio = prep_audio(audio)
        return predictor.predict_with_vad(audio=audio, offset=time_offset)['timings']

    return vad_silence_timing


def visualize_suppression(
        audio,
        output: Optional[str] = None,
        q_levels: int = 20,
        k_size: int = 5,
        vad_threshold: float = 0.35,
        vad: Union[bool, dict] = False,
        max_width: int = 1500,
        height: int = 200,
        **kwargs,
):
    """Render detected-silence regions over the waveform to a PNG."""
    from ..audio.utils import audio_to_numpy_resample
    audio = audio_to_numpy_resample(audio)
    max_n_samples = None if max_width == -1 else round(max_width * N_SAMPLES_PER_TOKEN)
    if max_n_samples is not None:
        audio = audio[:max_n_samples]
    loudness = audio2loudness(audio)
    if loudness is None:
        raise NotImplementedError('Audio is too short and cannot be visualized.')
    if max_n_samples is None:
        max_width = loudness.shape[-1]
    width = min(max_width, loudness.shape[-1])
    if vad:
        silence_timings = get_vad_silence_func(
            **(vad if isinstance(vad, dict) else {}))(audio, vad_threshold, **kwargs)
        silence_mask = (None if silence_timings is None
                        else timing2mask(*silence_timings, size=loudness.shape[0]))
    else:
        silence_mask = wav2mask(audio, q_levels=q_levels, k_size=k_size, **kwargs)
    visualize_mask(loudness, silence_mask, width=width, height=height, output=output)
