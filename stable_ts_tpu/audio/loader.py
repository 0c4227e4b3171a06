"""Chunked audio loading with preprocessing callbacks.

Counterpart of the reference ``AudioLoader`` (audio/__init__.py:152): a
unified source (path / bytes / ndarray), chunked reads aligned to a divisor,
per-chunk preprocessing (denoise, voice-band filter) with a post-prep
callback (used by the VAD to accumulate probabilities), ``load_sections``
(clip timestamps) with negation, and duration metadata.

This implementation keeps the decoded waveform in host memory (decoding is
self-contained — no ffmpeg pipe); true disk-streaming of long files arrives
with the native decoder's frame-level API.
"""
import warnings
from typing import Callable, List, Optional, Tuple, Union

import numpy as np

from .utils import audio_to_numpy_resample, voice_freq_filter
from ..constants import SAMPLE_RATE


class AudioLoader:

    def __init__(
            self,
            source: Union[str, bytes, np.ndarray],
            buffer_size: Optional[int] = None,
            stream: Optional[bool] = None,
            sr: Optional[int] = None,
            denoiser: Optional[str] = None,
            denoiser_options: Optional[dict] = None,
            only_voice_freq: bool = False,
            only_ffmpeg: bool = False,
            verbose: Optional[bool] = True,
            new_chunk_divisor: Optional[int] = 512,
            save_path: Optional[str] = None,
            load_sections: Optional[List[Tuple[Optional[float], Optional[float]]]] = None,
            negate_load: bool = False,
            post_prep_callback: Optional[Callable] = None,
    ):
        self._src = source
        self.verbose = verbose
        self.chunk_divisor = new_chunk_divisor
        self._denoiser = denoiser
        self._denoiser_options = denoiser_options or {}
        self._only_voice_freq = only_voice_freq
        self._post_prep_callback = post_prep_callback
        self._prev_seek = 0
        self._finished = False

        audio = audio_to_numpy_resample(source, sr, SAMPLE_RATE)
        self._sr = SAMPLE_RATE
        self._raw = audio
        self._prepped: Optional[np.ndarray] = None
        self._load_mask: Optional[np.ndarray] = None
        if load_sections:
            self._load_mask = self._sections_to_mask(load_sections, negate_load,
                                                     len(audio))
        elif negate_load:
            raise ValueError('``negate_load=True`` requires ``load_sections``')
        if save_path:
            self._save(save_path)

    # -- sections -----------------------------------------------------------------

    def _sections_to_mask(self, sections, negate: bool, n: int) -> np.ndarray:
        mask = np.zeros(n, dtype=bool)
        for start, end in sections:
            s = 0 if start is None else max(int(round(start * self._sr)), 0)
            e = n if end is None else min(int(round(end * self._sr)), n)
            if e > s:
                mask[s:e] = True
        return ~mask if negate else mask

    # -- preprocessing ----------------------------------------------------------------

    def _prep(self) -> np.ndarray:
        if self._prepped is None:
            audio = self._raw
            if self._denoiser:
                from .denoiser import apply_denoiser
                audio = apply_denoiser(self._denoiser, audio,
                                       **self._denoiser_options)
            if self._only_voice_freq:
                audio = voice_freq_filter(audio, self._sr)
            self._prepped = audio
            if self._post_prep_callback is not None:
                self._post_prep_callback(self._prepped)
        return self._prepped

    def update_post_prep_callback(self, callback: Optional[Callable]):
        self._post_prep_callback = callback
        if callback is not None and self._prepped is not None:
            callback(self._prepped)

    # -- reading ---------------------------------------------------------------------------

    @property
    def stream(self) -> bool:
        return False

    @property
    def sr(self) -> int:
        return self._sr

    def get_duration(self, ndigits: Optional[int] = None) -> float:
        dur = len(self._raw) / self._sr
        return round(dur, ndigits) if ndigits is not None else dur

    def next_chunk(self, seek: int, size: Optional[int] = None) -> Optional[np.ndarray]:
        """Samples [seek, seek+size); None at EOF. Size aligned to divisor."""
        audio = self._prep()
        if seek >= len(audio):
            self._finished = True
            return None
        if size is None:
            size = len(audio) - seek
        if self.chunk_divisor:
            size = int(np.ceil(size / self.chunk_divisor) * self.chunk_divisor)
        chunk = audio[seek:seek + size]
        if chunk.size == 0:
            self._finished = True
            return None
        return chunk

    def next_valid_chunk(self, seek: int, size: Optional[int] = None
                         ) -> Tuple[Optional[np.ndarray], int]:
        """Like next_chunk but skips samples excluded by load_sections.

        Returns (chunk, adjusted_seek).
        """
        if self._load_mask is None:
            return self.next_chunk(seek, size), seek
        n = len(self._raw)
        while seek < n and not self._load_mask[seek]:
            nxt = np.flatnonzero(self._load_mask[seek:])
            if len(nxt) == 0:
                return None, seek
            seek = seek + int(nxt[0])
        if seek >= n:
            return None, seek
        chunk = self.next_chunk(seek, size)
        if chunk is None:
            return None, seek
        # Trim the chunk at the end of the current valid section.
        section = self._load_mask[seek:seek + len(chunk)]
        invalid = np.flatnonzero(~section)
        if len(invalid):
            chunk = chunk[:invalid[0]]
            if chunk.size == 0:
                return None, seek
        return chunk, seek

    def _save(self, path: str):
        from .output import save_audio
        save_audio(self._prep(), path, self._sr)

    def terminate(self):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.terminate()
