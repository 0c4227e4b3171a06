"""Segment: an ordered list of words plus decode metadata.

Behavioral counterpart of the reference ``Segment``
(/root/reference/stable_whisper/result.py:277-926). When a segment has words,
its start/end/text/tokens are *derived properties* of the words; otherwise the
stored defaults are used. Also provides the split-index finders used by the
regroup engine (gaps, punctuation, even length/duration splitting).
"""
import re
import warnings
from copy import deepcopy
from itertools import chain
from typing import List, Optional, Tuple, TYPE_CHECKING, Union

import numpy as np

from ._common import combine_attr, group_words_by_lock, round_timestamp
from .word import WordTiming
from ..defaults import get_append_punctuations, get_min_word_dur
from ..stabilization.silence import suppress_silence as _suppress_silence
from ..utils import format_timestamp

if TYPE_CHECKING:  # pragma: no cover
    from .whisper_result import WhisperResult

# Words that look like initials/abbreviations/numbers ("U.S.", "Mr.", "3.")
# rather than sentence-final periods.
_SPECIAL_PERIOD_START = re.compile('^[A-Z0-9]')
_SPECIAL_PERIOD_STRIP = re.compile('[.A-Z0-9]')


class Segment:

    def __init__(
            self,
            start: Optional[float] = None,
            end: Optional[float] = None,
            text: Optional[str] = None,
            seek: Optional[float] = None,
            tokens: Optional[List[int]] = None,
            temperature: Optional[float] = None,
            avg_logprob: Optional[float] = None,
            compression_ratio: Optional[float] = None,
            no_speech_prob: Optional[float] = None,
            words: Optional[Union[List[WordTiming], List[dict]]] = None,
            id: Optional[int] = None,
            result: Optional['WhisperResult'] = None,
            round_ts: bool = True,
            ignore_unused_args: bool = False,
    ):
        if words:
            if ignore_unused_args:
                start = end = text = tokens = None
            else:
                if (start or end) is not None:
                    warnings.warn('``start``/``end`` are ignored: with ``words`` present they '
                                  'derive from the first and last word.', stacklevel=2)
                if text is not None:
                    warnings.warn('``text`` is ignored: with ``words`` present it is the '
                                  'concatenation of word texts.', stacklevel=2)
                if tokens is not None:
                    warnings.warn('``tokens`` is ignored: with ``words`` present it is the '
                                  'concatenation of word tokens.', stacklevel=2)
        self.round_ts = round_ts
        self._default_start = self.round(start) if start else 0.0
        self._default_end = self.round(end) if end else 0.0
        self._default_text = text or ''
        self._default_tokens = tokens or []
        self.seek = seek
        self.temperature = temperature
        self.avg_logprob = avg_logprob
        self.compression_ratio = compression_ratio
        self.no_speech_prob = no_speech_prob
        self.words = words
        if self.words and isinstance(self.words[0], dict):
            self.words = [
                WordTiming(**w, segment=self, round_ts=self.round_ts, ignore_unused_args=True)
                for w in self.words
            ]
        self.id = id
        self.result = result

    # -- core protocol -------------------------------------------------------

    def __repr__(self):
        return f'Segment(start={self.start}, end={self.end}, text="{self.text}")'

    def __getitem__(self, index: int) -> WordTiming:
        if self.words is None:
            raise ValueError('segment contains no words')
        return self.words[index]

    def __delitem__(self, index: int):
        if self.words is None:
            raise ValueError('segment contains no words')
        del self.words[index]
        self.reassign_ids(index)

    def __deepcopy__(self, memo=None):
        return self.copy(copy_words=True, copy_tokens=True)

    def __copy__(self):
        return self.copy()

    def copy(
            self,
            new_words: Optional[List[WordTiming]] = None,
            keep_result: bool = False,
            copy_words: bool = False,
            copy_tokens: bool = False,
    ) -> 'Segment':
        if new_words is None:
            if self.has_words:
                words = ([w.copy(copy_tokens=copy_tokens) for w in self.words]
                         if copy_words else self.words)
            else:
                words = None
            defaults = (self._default_start, self._default_end,
                        self._default_text, self._default_tokens)
        else:
            words = ([w.copy(copy_tokens=copy_tokens) for w in new_words]
                     if copy_words else new_words)
            defaults = (None, None, None, None)
        new_seg = Segment(
            start=defaults[0],
            end=defaults[1],
            text=defaults[2],
            seek=self.seek,
            tokens=defaults[3],
            temperature=self.temperature,
            avg_logprob=self.avg_logprob,
            compression_ratio=self.compression_ratio,
            no_speech_prob=self.no_speech_prob,
            words=words,
            id=self.id,
            result=self.result if keep_result else None,
            round_ts=self.round_ts,
            ignore_unused_args=True,
        )
        return new_seg

    def round(self, timestamp: float) -> float:
        if not self.round_ts:
            return timestamp
        return round_timestamp(timestamp)

    # -- word-derived properties ----------------------------------------------

    @property
    def has_words(self) -> bool:
        return bool(self.words)

    @property
    def ori_has_words(self) -> bool:
        return self.words is not None

    @property
    def start(self) -> float:
        return self.words[0].start if self.has_words else self._default_start

    @start.setter
    def start(self, val: float):
        if self.has_words:
            self.words[0].start = val
        else:
            self._default_start = self.round(val)

    @property
    def end(self) -> float:
        return self.words[-1].end if self.has_words else self._default_end

    @end.setter
    def end(self, val: float):
        if self.has_words:
            self.words[-1].end = val
        else:
            self._default_end = self.round(val)

    @property
    def text(self) -> str:
        if self.has_words:
            return ''.join(w.word for w in self.words)
        return self._default_text

    @property
    def tokens(self) -> List[int]:
        if self.has_words and self.words[0].tokens:
            return list(chain.from_iterable(w.tokens for w in self.words))
        return self._default_tokens

    @property
    def duration(self) -> float:
        return self.end - self.start

    def word_count(self) -> int:
        return len(self.words) if self.has_words else -1

    def char_count(self) -> int:
        if self.has_words:
            return sum(len(w) for w in self.words)
        return len(self.text)

    # -- merging ----------------------------------------------------------------

    def add(self, other: 'Segment', copy_words: bool = False, newline: bool = False,
            reassign_ids: bool = True) -> 'Segment':
        if self.ori_has_words != other.ori_has_words:
            self_state = 'with' if self.ori_has_words else 'without'
            other_state = 'with' if other.ori_has_words else 'without'
            raise ValueError(f"Can't merge segment {self_state} words "
                             f'and a segment {other_state} words.')
        words = (self.words + other.words) if self.ori_has_words else None
        merged = self.copy(words, copy_words=copy_words)
        combine_attr(merged, other, 'temperature')
        combine_attr(merged, other, 'avg_logprob')
        combine_attr(merged, other, 'compression_ratio')
        combine_attr(merged, other, 'no_speech_prob')
        merged._default_end = other._default_end
        merged._default_text += other._default_text
        merged._default_tokens += other._default_tokens
        if newline:
            if merged.has_words:
                boundary_word = merged.words[len(self.words) - 1]
                if not boundary_word.word.endswith('\n'):
                    boundary_word.word += '\n'
            else:
                split_at = len(self.text)
                if merged.text[split_at - 1] != '\n':
                    merged._default_text = (merged.text[:split_at] + '\n'
                                            + merged.text[split_at:])
        if reassign_ids:
            merged.reassign_ids()
        return merged

    def __add__(self, other: 'Segment') -> 'Segment':
        return self.add(other, copy_words=True)

    def add_words(self, index0: int, index1: int, inplace: bool = False) -> Optional[WordTiming]:
        if not self.has_words:
            return None
        new_word = self.words[index0] + self.words[index1]
        if inplace:
            i0, i1 = sorted([index0, index1])
            self.words[i0] = new_word
            del self.words[i1]
        return new_word

    def apply_min_dur(self, min_dur: float, inplace: bool = False) -> 'Segment':
        """Merge words shorter than ``min_dur`` into their shorter-side neighbor."""
        segment = self if inplace else deepcopy(self)
        if not self.has_words:
            return segment
        max_i = len(segment.words) - 1
        if max_i == 0:
            return segment
        for i in reversed(range(len(segment.words))):
            if max_i == 0:
                break
            if segment.words[i].duration < min_dur:
                if i == max_i:
                    segment.add_words(i - 1, i, inplace=True)
                elif i == 0:
                    segment.add_words(i, i + 1, inplace=True)
                elif segment.words[i + 1].duration < segment.words[i - 1].duration:
                    segment.add_words(i - 1, i, inplace=True)
                else:
                    segment.add_words(i, i + 1, inplace=True)
                max_i -= 1
        return segment

    # -- bulk word ops ------------------------------------------------------------

    def _word_operations(self, operation: str, *args, **kwargs):
        if self.has_words:
            for w in self.words:
                getattr(w, operation)(*args, **kwargs)

    def offset_time(self, offset_seconds: float):
        if self.seek is not None:
            self.seek += offset_seconds
        if self.has_words:
            self._word_operations('offset_time', offset_seconds)
        else:
            self.start = self.start + offset_seconds
            self.end = self.end + offset_seconds

    def rescale_time(self, scale_factor: float):
        if self.seek is not None:
            self.seek *= scale_factor
        if self.has_words:
            self._word_operations('rescale_time', scale_factor)
        else:
            self.start = self.start * scale_factor
            self.end = self.end * scale_factor

    def suppress_silence(
            self,
            silent_starts: np.ndarray,
            silent_ends: np.ndarray,
            min_word_dur: Optional[float] = None,
            word_level: bool = True,
            nonspeech_error: float = 0.3,
            use_word_position: bool = True,
    ) -> 'Segment':
        min_word_dur = get_min_word_dur(min_word_dur)
        if self.has_words:
            ending_punctuations = get_append_punctuations()
            words = (self.words if word_level or len(self.words) == 1
                     else [self.words[0], self.words[-1]])
            for i, w in enumerate(words, 1):
                if use_word_position:
                    keep_end = not (w.word[-1] in ending_punctuations or i == len(words))
                else:
                    keep_end = None
                w.suppress_silence(silent_starts, silent_ends, min_word_dur,
                                   nonspeech_error, keep_end)
        else:
            _suppress_silence(self, silent_starts, silent_ends, min_word_dur,
                              nonspeech_error)
        return self

    # -- locks ----------------------------------------------------------------------

    @property
    def left_locked(self) -> bool:
        return self.words[0].left_locked if self.has_words else False

    @property
    def right_locked(self) -> bool:
        return self.words[-1].right_locked if self.has_words else False

    def lock_left(self):
        if self.has_words:
            self.words[0].lock_left()

    def lock_right(self):
        if self.has_words:
            self.words[-1].lock_right()

    def lock_both(self):
        self.lock_left()
        self.lock_right()

    def unlock_all_words(self):
        self._word_operations('unlock_both')

    def get_locked_indices(self) -> List[int]:
        """Indices i such that the boundary between word i and i+1 is locked."""
        return [i for i, (nxt, cur) in enumerate(zip(self.words[1:], self.words[:-1]))
                if nxt.left_locked or cur.right_locked]

    def words_by_lock(self, only_text: bool = True, include_single: bool = False):
        return group_words_by_lock(self.words, only_text=only_text,
                                   include_single=include_single)

    # -- split-index finders (for the regroup engine) --------------------------------

    def get_gaps(self, as_ndarray: bool = False):
        if self.has_words:
            starts = np.array([w.start for w in self.words])
            ends = np.array([w.end for w in self.words])
            gaps = starts[1:] - ends[:-1]
            return gaps if as_ndarray else gaps.tolist()
        return []

    def get_gap_indices(self, max_gap: float = 0.1) -> List[int]:
        if not self.has_words or len(self.words) < 2:
            return []
        if max_gap is None:
            max_gap = 0
        indices = np.flatnonzero(self.get_gaps(True) > max_gap).tolist()
        return sorted(set(indices) - set(self.get_locked_indices()))

    def get_punctuation_indices(
            self, punctuation: Union[List[str], List[Tuple[str, str]], str]) -> List[int]:
        if not self.has_words or len(self.words) < 2:
            return []
        if isinstance(punctuation, str):
            punctuation = [punctuation]
        indices = []
        for p in punctuation:
            if isinstance(p, str):
                for i, w in enumerate(self.words[:-1]):
                    if w.word.endswith(p):
                        indices.append(i)
                    elif i != 0 and w.word.startswith(p):
                        indices.append(i - 1)
            else:
                ending, beginning = p
                indices.extend(
                    i for i, (w0, w1) in enumerate(zip(self.words[:-1], self.words[1:]))
                    if w0.word.endswith(ending) and w1.word.startswith(beginning)
                )
        return sorted(set(indices) - set(self.get_locked_indices()))

    def _get_special_period_indices(self, extra_indices: Optional[List[int]] = None) -> List[int]:
        indices = [
            i for i, word in enumerate(self.words)
            if _SPECIAL_PERIOD_START.search(word.word) is not None
            and not word.word.endswith('..')
            and len(_SPECIAL_PERIOD_STRIP.sub('', word.word)) < 3
        ]
        if extra_indices:
            indices = sorted(set(indices + extra_indices))
        return indices

    def _get_even_split_indices(
            self,
            cumsum: np.ndarray,
            parts_per_split: float,
            splits: float,
            excluded_indices: Optional[List[int]] = None,
    ) -> List[int]:
        """Pick split points closest to ideal even-split targets in ``cumsum``."""
        if excluded_indices:
            cumsum = np.array(cumsum)
            cumsum_idxs = np.arange(len(cumsum))
            max_word_i = len(self.words) - 1
            for i in sorted(set(excluded_indices)):
                if i == max_word_i:
                    break
                cumsum[i] = cumsum[i + 1]
                cumsum_idxs[i] = cumsum_idxs[i + 1]
            indices = sorted(set(
                int(cumsum_idxs[np.abs(cumsum - (k * parts_per_split)).argmin()])
                for k in range(1, int(splits))
            ))
        else:
            indices = [int(np.abs(cumsum - (k * parts_per_split)).argmin())
                       for k in range(1, int(splits))]
        return indices

    def get_length_indices(
            self,
            max_chars: Optional[int] = None,
            max_words: Optional[int] = None,
            even_split: bool = True,
            include_lock: bool = False,
            ignore_special_periods: bool = False,
    ) -> List[int]:
        if not self.has_words or (max_chars is None and max_words is None):
            return []
        assert max_chars != 0 and max_words != 0, \
            f'max_chars and max_words must be greater than 0, but got {max_chars} and {max_words}'
        if len(self.words) < 2:
            return []
        indices: List[int] = []
        locked_indices = self.get_locked_indices() if include_lock else []
        if ignore_special_periods:
            locked_indices = self._get_special_period_indices(locked_indices)
        if even_split:
            char_count = -1 if max_chars is None else sum(map(len, self.words))
            word_count = -1 if max_words is None else len(self.words)
            exceed_chars = max_chars is not None and char_count > max_chars
            exceed_words = max_words is not None and word_count > max_words
            if exceed_chars:
                splits = np.ceil(char_count / max_chars)
                chars_per_split = char_count / splits
                cum_chars = np.cumsum([len(w.word) for w in self.words[:-1]])
                indices = self._get_even_split_indices(
                    cum_chars, chars_per_split, splits, locked_indices)
                if max_words is not None:
                    exceed_words = any(
                        j - i + 1 > max_words
                        for i, j in zip([0] + indices, indices + [len(self.words)])
                    )
            if exceed_words:
                splits = np.ceil(word_count / max_words)
                words_per_split = word_count / splits
                cum_words = np.arange(1, len(self.words) + 1)
                indices = self._get_even_split_indices(
                    cum_words, words_per_split, splits, locked_indices)
        else:
            curr_words = 0
            curr_chars = 0
            for i, word in enumerate(self.words):
                curr_words += 1
                curr_chars += len(word)
                if i != 0 and (
                        (max_chars is not None and curr_chars > max_chars)
                        or (max_words is not None and curr_words > max_words)
                ) and i - 1 not in locked_indices:
                    indices.append(i - 1)
                    curr_words = 1
                    curr_chars = len(word)
        return indices

    def get_duration_indices(
            self,
            max_dur: float,
            even_split: bool = True,
            include_lock: bool = False,
            ignore_special_periods: bool = False,
    ) -> List[int]:
        if not self.has_words:
            return []
        total_duration = float(np.sum([w.duration for w in self.words]))
        if total_duration <= max_dur:
            return []
        locked_indices = self.get_locked_indices() if include_lock else []
        if ignore_special_periods:
            locked_indices = self._get_special_period_indices(locked_indices)
        if even_split:
            splits = np.ceil(total_duration / max_dur)
            dur_per_split = total_duration / splits
            cum_dur = np.cumsum([w.duration for w in self.words[:-1]])
            return self._get_even_split_indices(cum_dur, dur_per_split, splits, locked_indices)
        indices = []
        curr_total = 0.0
        for i, word in enumerate(self.words):
            curr_total += word.duration
            if i != 0 and curr_total > max_dur and i - 1 not in locked_indices:
                indices.append(i - 1)
                curr_total = word.duration
        return indices

    def split(self, indices: List[int], reassign_ids: bool = True) -> List['Segment']:
        """Split after each word index in ``indices`` into new segments."""
        if len(indices) == 0:
            return []
        if indices[-1] != len(self.words) - 1:
            indices.append(len(self.words) - 1)
        pieces = []
        prev_i = 0
        for i in indices:
            i += 1
            new_words = self.words[prev_i:i]
            if new_words:
                new_seg = self.copy(new_words, copy_words=False)
                pieces.append(new_seg)
                if reassign_ids:
                    new_seg.reassign_ids()
            prev_i = i
        return pieces

    # -- bookkeeping ---------------------------------------------------------------

    def reassign_ids(self, start: Optional[int] = None):
        if self.has_words:
            for i, word in enumerate(self.words[start:], start or 0):
                word.segment = self
                word.id = i

    def convert_to_segment_level(self):
        if not self.has_words:
            return
        self._default_text = self.text
        self._default_start = self.start
        self._default_end = self.end
        self._default_tokens = self.tokens
        self.words = None

    # -- deprecated shims (reference result.py:674-679 etc.) ---------------------------

    def round_all_timestamps(self):
        import warnings
        warnings.warn('``.round_all_timestamps()`` is deprecated. Use '
                      '``round_ts=True`` instead.', stacklevel=2)
        self.round_ts = True
        for word in self.words or ():
            word.round_ts = True

    def update_seg_with_words(self):
        import warnings
        warnings.warn('Segment attributes are word-derived properties; '
                      '``update_seg_with_words()`` is deprecated. Use '
                      '``.reassign_ids()`` to update ids.', stacklevel=2)
        self.reassign_ids()

    def set_result(self, result):
        import warnings
        warnings.warn('``.set_result()`` is deprecated. Use '
                      '``.result = ...`` instead.', stacklevel=2)
        self.result = result

    def get_result(self):
        import warnings
        warnings.warn('``.get_result()`` is deprecated. Use ``.result`` '
                      'instead.', stacklevel=2)
        return self.result

    # -- serialization ----------------------------------------------------------------

    def _reversed_words(self, prepend_punctuations: Optional[str] = None,
                        append_punctuations: Optional[str] = None):
        """Word dicts in CHRONOLOGICAL order with per-word punctuation swapped
        for RTL rendering (reference result.py:562-607 ``_to_reverse_text``).
        The renderer (text_output.words2segments) reverses display order via
        the ``reversed_text`` marker; word timestamps stay chronological."""
        from ..defaults import get_append_punctuations, get_prepend_punctuations
        prepend = get_prepend_punctuations(prepend_punctuations)
        if prepend and ' ' not in prepend:
            prepend += ' '
        append = get_append_punctuations(append_punctuations)
        words = (self.words if self.has_words else
                 [WordTiming(word=w, start=0, end=1, probability=0)
                  for w in self.text.split(' ')])
        out = []
        for word in words:
            text = word.word
            new_append = ''
            while text and text[0] in prepend:
                new_append += text[0]
                text = text[1:]
            new_prepend = ''
            while text and text[-1] in append:
                new_prepend += text[-1]
                text = text[:-1]
            d = word.to_dict()
            d['word'] = f'{new_prepend}{text}{new_append[::-1]}'
            out.append(d)
        return out

    def to_dict(self, reverse_text: Union[bool, tuple] = False) -> dict:
        seg_dict = dict(
            start=self.start,
            end=self.end,
            text=self.text,
            seek=self.seek,
            tokens=None if self.tokens is None else list(self.tokens),
            temperature=self.temperature,
            avg_logprob=self.avg_logprob,
            compression_ratio=self.compression_ratio,
            no_speech_prob=self.no_speech_prob,
        )
        if reverse_text:
            args = reverse_text if isinstance(reverse_text, tuple) else ()
            rwords = self._reversed_words(*args)
            seg_dict['text'] = ''.join(w['word'] for w in reversed(rwords))
            if self.has_words:
                seg_dict['words'] = rwords
            elif self.ori_has_words:
                seg_dict['words'] = []
            seg_dict['reversed_text'] = True
            return seg_dict
        if self.has_words:
            seg_dict['words'] = [w.to_dict() for w in self.words]
        elif self.ori_has_words:
            seg_dict['words'] = []
        return seg_dict

    def to_display_str(self, only_segment: bool = False) -> str:
        line = f'[{format_timestamp(self.start)} --> {format_timestamp(self.end)}] "{self.text}"'
        if self.has_words and not only_segment:
            line += '\n' + '\n'.join(f'-{w.to_display_str()}' for w in self.words) + '\n'
        return line
