"""WhisperResult: the mutable word/segment tree plus the regroup engine.

Behavioral counterpart of the reference ``WhisperResult``
(/root/reference/stable_whisper/result.py:928-3102): holds the pristine
``ori_dict``, the live segment list, nonspeech sections, and a replayable
``regroup_history``; exposes 20+ chainable split/merge/edit operations and the
compact regroup DSL (``sg=.5_sp=,* /，++++50_sl=70_cm`` ...).
"""
import re
import warnings
from copy import deepcopy
from itertools import chain
from typing import Callable, List, Optional, Tuple, Union

import numpy as np

from ._common import ContentCache, group_words_by_lock, round_timestamp
from .segment import Segment
from .word import WordTiming
from ..defaults import get_min_word_dur
from ..text_output import (load_result, result_to_ass, result_to_srt_vtt,
                           result_to_tsv, result_to_txt, save_as_json)
from ..utils import UnsortedException, str_to_valid_type, format_timestamp

__all__ = ['WhisperResult']

# Default regroup chain (reference result.py:3008).
DEFAULT_REGROUP_ALGO = 'isp_cm_sp=.* /。/?/？_sg=.5_sp=,* /，++++50_sl=70_cm'


class WhisperResult:

    def __init__(
            self,
            result: Union[str, dict, list],
            force_order: bool = False,
            check_sorted: Union[bool, str] = True,
            show_unsorted: bool = True,
    ):
        result, self.path = self._standardize_result(result)
        self.ori_dict = result.get('ori_dict') or result
        self.language = self.ori_dict.get('language')
        self._regroup_history = result.get('regroup_history', '')
        self._nonspeech_sections = result.get('nonspeech_sections') or []
        self.unfinished_start: float = result.get('unfinished', -1.0)
        segments = (result.get('segments', self.ori_dict.get('segments')) or {}).copy()
        self.segments = ([Segment(**s, ignore_unused_args=True) for s in segments]
                         if segments else [])
        self._forced_order = force_order
        if self._forced_order:
            self.force_order()
        self.raise_for_unsorted(check_sorted, show_unsorted)
        self.remove_no_word_segments(any(seg.has_words for seg in self.segments))
        self._ignore_special_periods = False
        self._content_cache = ContentCache()

    # -- construction ---------------------------------------------------------

    @staticmethod
    def _standardize_result(result) -> Tuple[dict, Optional[str]]:
        """Accept a JSON path, a result dict, a list of segment dicts, or a
        list of lists of word dicts; normalize to a result dict."""
        path = None
        if isinstance(result, str):
            path = result
            result = load_result(path)
        if isinstance(result, dict):
            return result, path
        if not isinstance(result, list):
            raise TypeError(f'Expected result to be list but got {type(result)}')
        if not result or not result[0]:
            return {}, path
        if isinstance(result[0], list):
            if not isinstance(result[0][0], dict):
                raise NotImplementedError(
                    f'Got list of list of {type(result[0][0])} but expected dicts')
            result = dict(segments=[
                dict(
                    start=words[0]['start'],
                    end=words[-1]['end'],
                    text=''.join(w['word'] for w in words),
                    words=words,
                )
                for words in result if words
            ])
        elif isinstance(result[0], dict):
            result = dict(segments=result)
        else:
            raise NotImplementedError(
                f'Got list of {type(result[0])} but expected list of list/dict')
        return result, path

    # -- core protocol -----------------------------------------------------------

    def __getitem__(self, index: int) -> Segment:
        return self.segments[index]

    def __delitem__(self, index: int):
        del self.segments[index]
        self.reassign_ids(True, start=index)

    def __len__(self):
        return len(self.segments)

    @property
    def duration(self) -> float:
        if not self.segments:
            return 0.0
        return round_timestamp(self.segments[-1].end - self.segments[0].start)

    @property
    def text(self) -> str:
        return ''.join(s.text for s in self.segments)

    @property
    def regroup_history(self) -> str:
        return self._regroup_history

    @property
    def nonspeech_sections(self) -> List[dict]:
        return self._nonspeech_sections

    @property
    def has_words(self) -> bool:
        return bool(self.segments) and all(seg.has_words for seg in self.segments)

    # -- ordering guards ------------------------------------------------------------

    def force_order(self):
        """Repair out-of-order timestamps from untrusted backends in place."""
        prev_ts_end = 0
        timestamps = self.all_words_or_segments()
        for i, ts in enumerate(timestamps, 1):
            if ts.start < prev_ts_end:
                ts.start = prev_ts_end
            if ts.start > ts.end:
                if prev_ts_end > ts.end:
                    warnings.warn('Multiple consecutive timestamps are out of order. '
                                  'Some parts will have no duration.')
                    ts.start = ts.end
                    for j in range(i - 2, -1, -1):
                        if timestamps[j].end > ts.end:
                            timestamps[j].end = ts.end
                        if timestamps[j].start > ts.end:
                            timestamps[j].start = ts.end
                elif ts.start != prev_ts_end:
                    ts.start = prev_ts_end
                else:
                    ts.end = ts.start if i == len(timestamps) else timestamps[i].start
            prev_ts_end = ts.end

    def raise_for_unsorted(self, check_sorted: Union[bool, str] = True,
                           show_unsorted: bool = True):
        """Raise (or dump diagnostics to a JSON path) if timestamps regress."""
        if check_sorted is False:
            return
        all_parts = self.all_words_or_segments()
        if not all_parts:
            return
        is_word = isinstance(all_parts[0], WordTiming)
        timestamps = np.array(list(chain.from_iterable((p.start, p.end)
                                                       for p in all_parts)))
        if len(timestamps) < 2:
            return
        unsorted_mask = timestamps[:-1] > timestamps[1:]
        if not unsorted_mask.any():
            return
        if show_unsorted:
            def part_info(idx):
                part = all_parts[idx]
                seg_id = part.segment_id if is_word else part.id
                word_id_str = f'Word ID: {part.id}\n' if is_word else ''
                return (
                    f'Segment ID: {seg_id}\n{word_id_str}'
                    f'Start: {part.start}\nEnd: {part.end}\n'
                    f'Text: "{part.word if is_word else part.text}"'
                ), part.start, part.end

            for i, unsorted in enumerate(unsorted_mask, 2):
                if not unsorted:
                    continue
                part_idx = i // 2 - 1
                info, start, end = part_info(part_idx)
                if i % 2 == 1:
                    next_info, next_start, _ = part_info(part_idx + 1)
                    info += f'\nConflict: end ({end}) > next start ({next_start})\n{next_info}'
                else:
                    info += f'\nConflict: start ({start}) > end ({end})'
                print(info, end='\n\n')

        data = self.to_dict()
        if check_sorted is True:
            raise UnsortedException(data=data)
        warnings.warn('Timestamps are not in ascending order. If data is produced by '
                      'this library, please submit an issue with the saved data.')
        save_as_json(data, check_sorted)

    # -- bookkeeping -------------------------------------------------------------------

    def reassign_ids(self, only_segments: bool = False, start: Optional[int] = None):
        for i, s in enumerate(self.segments[start:], start or 0):
            s.id = i
            s.result = self
            if not only_segments:
                s.reassign_ids()

    def remove_no_word_segments(self, ignore_ori: bool = False, reassign_ids: bool = True):
        for i in reversed(range(len(self.segments))):
            if (ignore_ori or self.segments[i].ori_has_words) and not self.segments[i].has_words:
                del self.segments[i]
        if reassign_ids:
            self.reassign_ids()

    def update_nonspeech_sections(self, silent_starts, silent_ends, overwrite: bool = True):
        sections = [dict(start=round(float(s), 3), end=round(float(e), 3))
                    for s, e in zip(silent_starts, silent_ends)]
        if overwrite:
            self._nonspeech_sections = sections
        else:
            self._nonspeech_sections.extend(sections)

    def _update_history(self, changes: str):
        if not changes:
            return
        if self._regroup_history:
            self._regroup_history += '_'
        self._regroup_history += changes

    # -- accessors -----------------------------------------------------------------------

    def all_words(self) -> List[WordTiming]:
        return list(chain.from_iterable(s.words for s in self.segments))

    def all_words_or_segments(self):
        return self.all_words() if self.has_words else self.segments

    def all_words_by_lock(self, only_text: bool = True, by_segment: bool = False,
                          include_single: bool = False):
        if by_segment:
            return [seg.words_by_lock(only_text=only_text, include_single=include_single)
                    for seg in self.segments]
        return group_words_by_lock(self.all_words(), only_text=only_text,
                                   include_single=include_single)

    def all_tokens(self) -> List[int]:
        return list(chain.from_iterable(w.tokens for w in self.all_words()))

    def get_content_by_time(
            self,
            time: Union[float, Tuple[float, float], dict],
            within: bool = False,
            segment_level: bool = False,
    ):
        """Return words (or segments) overlapping / within the ``time`` range."""
        if not segment_level and not self.has_words:
            raise ValueError('Missing word timestamps in result. '
                             'Use ``segment_level=True`` instead.')
        contents = self.segments if segment_level else self.all_words()
        if isinstance(time, (float, int)):
            time = (time, time)
        elif isinstance(time, dict):
            time = (time['start'], time['end'])
        start, end = time
        if within:
            return [c for c in contents if start <= c.start and end >= c.end]
        return [c for c in contents if start <= c.end and end >= c.start]

    def get_locked_indices(self) -> List[int]:
        return [i for i, (nxt, cur) in enumerate(zip(self.segments[1:], self.segments[:-1]))
                if nxt.left_locked or cur.right_locked]

    def get_gaps(self, as_ndarray: bool = False):
        starts = np.array([s.start for s in self.segments])
        ends = np.array([s.end for s in self.segments])
        gaps = starts[1:] - ends[:-1]
        return gaps if as_ndarray else gaps.tolist()

    def get_gap_indices(self, min_gap: float = 0.1) -> List[int]:
        if len(self.segments) < 2:
            return []
        if min_gap is None:
            min_gap = 0
        indices = np.flatnonzero(self.get_gaps(True) <= min_gap).tolist()
        return sorted(set(indices) - set(self.get_locked_indices()))

    def get_punctuation_indices(self, punctuation) -> List[int]:
        if len(self.segments) < 2:
            return []
        if isinstance(punctuation, str):
            punctuation = [punctuation]
        indices = []
        for p in punctuation:
            if isinstance(p, str):
                for i, s in enumerate(self.segments[:-1]):
                    if s.text.endswith(p):
                        indices.append(i)
                    elif i != 0 and s.text.startswith(p):
                        indices.append(i - 1)
            else:
                ending, beginning = p
                indices.extend(
                    i for i, (s0, s1) in enumerate(zip(self.segments[:-1], self.segments[1:]))
                    if s0.text.endswith(ending) and s1.text.startswith(beginning)
                )
        return sorted(set(indices) - set(self.get_locked_indices()))

    # -- time adjustment -----------------------------------------------------------------

    def offset_time(self, offset_seconds: float):
        for s in self.segments:
            s.offset_time(offset_seconds)

    def rescale_time(self, scale_factor: float):
        for s in self.segments:
            s.rescale_time(scale_factor)

    def apply_min_dur(self, min_dur: float, inplace: bool = False) -> 'WhisperResult':
        """Merge words/segments shorter than ``min_dur`` with neighbors."""
        result = self if inplace else deepcopy(self)
        max_i = len(result.segments) - 1
        if max_i == 0:
            return result
        for i in reversed(range(len(result.segments))):
            if max_i == 0:
                break
            if result.segments[i].duration < min_dur:
                if i == max_i:
                    result.add_segments(i - 1, i, inplace=True, reassign_ids=False)
                elif i == 0:
                    result.add_segments(i, i + 1, inplace=True, reassign_ids=False)
                elif result.segments[i + 1].duration < result.segments[i - 1].duration:
                    result.add_segments(i - 1, i, inplace=True, reassign_ids=False)
                else:
                    result.add_segments(i, i + 1, inplace=True, reassign_ids=False)
                max_i -= 1
        result.reassign_ids()
        for s in result.segments:
            s.apply_min_dur(min_dur, inplace=True)
        return result

    def suppress_silence(
            self,
            silent_starts: np.ndarray,
            silent_ends: np.ndarray,
            min_word_dur: Optional[float] = None,
            word_level: bool = True,
            nonspeech_error: float = 0.3,
            use_word_position: bool = True,
            verbose: bool = True,
    ) -> 'WhisperResult':
        """Snap start/end timestamps off the given silent sections."""
        min_word_dur = get_min_word_dur(min_word_dur)
        for s in self.segments:
            s.suppress_silence(
                silent_starts, silent_ends, min_word_dur,
                word_level=word_level,
                nonspeech_error=nonspeech_error,
                use_word_position=use_word_position,
            )
        return self

    def adjust_by_silence(
            self,
            audio,
            vad: Union[bool, dict] = False,
            *,
            verbose: Optional[bool] = False,
            sample_rate: Optional[int] = None,
            vad_onnx: bool = False,
            vad_threshold: float = 0.35,
            q_levels: int = 20,
            k_size: int = 5,
            min_word_dur: Optional[float] = None,
            min_silence_dur: Optional[float] = None,
            word_level: bool = True,
            nonspeech_error: float = 0.3,
            use_word_position: bool = True,
    ) -> 'WhisperResult':
        """Detect silence in ``audio`` then :meth:`suppress_silence` with it."""
        from ..stabilization import get_vad_silence_func
        from ..stabilization.nonvad import audio2timings
        from ..stabilization.utils import filter_timings
        min_word_dur = get_min_word_dur(min_word_dur)
        if vad is not False:
            silent_timings = get_vad_silence_func(
                **(vad if isinstance(vad, dict) else {}),
                verbose=verbose,
            )(audio, speech_threshold=vad_threshold, sr=sample_rate)
        else:
            silent_timings = audio2timings(audio, q_levels=q_levels, k_size=k_size,
                                           sr=sample_rate)
        if silent_timings is None:
            return self
        if min_silence_dur:
            silent_timings = filter_timings(silent_timings, min_silence_dur)
        self.suppress_silence(
            *silent_timings,
            min_word_dur=min_word_dur,
            word_level=word_level,
            nonspeech_error=nonspeech_error,
            use_word_position=use_word_position,
            verbose=verbose is not None,
        )
        self.update_nonspeech_sections(*silent_timings)
        return self

    def adjust_by_result(self, other_result: 'WhisperResult',
                         min_word_dur: Optional[float] = None, verbose: bool = False):
        """Shrink word spans to their intersection with ``other_result``'s words."""
        if not (self.has_words and other_result.has_words):
            raise NotImplementedError(
                'This operation requires results with word timestamps')
        assert [w.word for w in self.all_words()] == \
               [w.word for w in other_result.all_words()], \
               'The words in [other_result] do not match the current words.'
        min_word_dur = get_min_word_dur(min_word_dur)
        for word, other_word in zip(self.all_words(), other_result.all_words()):
            if word.end > other_word.start:
                new_start = max(word.start, other_word.start)
                new_end = min(word.end, other_word.end)
                if new_end - new_start >= min_word_dur:
                    line = ''
                    if word.start != new_start:
                        if verbose:
                            line += f'[Start:{word.start:.3f}->{new_start:.3f}] '
                        word.start = new_start
                    if word.end != new_end:
                        if verbose:
                            line += f'[End:{word.end:.3f}->{new_end:.3f}]  '
                        word.end = new_end
                    if line:
                        print(f'{line}"{word.word}"')

    # -- structural editing: splitting / merging -------------------------------------------

    def add_segments(self, index0: int, index1: int, inplace: bool = False,
                     lock: bool = False, newline: bool = False,
                     reassign_ids: bool = True) -> Segment:
        new_seg = self.segments[index0].add(self.segments[index1], copy_words=False,
                                            newline=newline, reassign_ids=reassign_ids)
        if lock and self.segments[index0].has_words:
            lock_idx = len(self.segments[index0].words)
            new_seg.words[lock_idx - 1].lock_right()
            if lock_idx < len(new_seg.words):
                new_seg.words[lock_idx].lock_left()
        if inplace:
            i0, i1 = sorted([index0, index1])
            self.segments[i0] = new_seg
            del self.segments[i1]
            if reassign_ids:
                self.reassign_ids(True)
        return new_seg

    def split_segment_by_index(self, segment: Union[int, Segment],
                               indices: Union[int, List[int]],
                               reassign_ids: bool = True):
        if not self.has_words:
            return
        if isinstance(indices, int):
            indices = [indices]
        elif not indices:
            return
        oor = [i for i in indices if i < 0 or i > len(segment.words)]
        if oor:
            raise IndexError(f'got out of split range indices: {oor}')
        seg_idx = segment if isinstance(segment, int) else segment.id
        new_segments = self.segments[seg_idx].split(indices, reassign_ids=reassign_ids)
        del self.segments[seg_idx]
        for seg in reversed(new_segments):
            self.segments.insert(seg_idx, seg)
        if reassign_ids:
            self.reassign_ids(True)

    def _remove_special_period_indices(self, indices: List[int], segment_idx: int):
        segment = self.segments[segment_idx]
        for i in range(len(indices) - 1, -1, -1):
            word_idx = indices[i]
            if not segment[word_idx].word.endswith('.'):
                continue
            word = segment[word_idx].word.strip()
            if re.search('^[A-Z0-9]', word) is None:
                continue
            if len(re.sub('[.A-Z0-9]', '', word)) < 3:
                indices.pop(i)

    def _split_segments(self, get_indices, args: Optional[list] = None, *,
                        lock: bool = False, newline: bool = False,
                        ignore_special_periods: bool = False):
        if args is None:
            args = []
        no_words = False
        for i in reversed(range(len(self.segments))):
            no_words = no_words or not self.segments[i].has_words
            indices = sorted(set(get_indices(self.segments[i], *args)))
            if ignore_special_periods:
                self._remove_special_period_indices(indices, i)
            if not indices:
                continue
            if newline:
                if indices[-1] == len(self.segments[i].words) - 1:
                    del indices[-1]
                    if not indices:
                        continue
                for word_idx in indices:
                    if self.segments[i].words[word_idx].word.endswith('\n'):
                        continue
                    self.segments[i].words[word_idx].word += '\n'
                    if lock:
                        self.segments[i].words[word_idx].lock_right()
                        if word_idx + 1 < len(self.segments[i].words):
                            self.segments[i].words[word_idx + 1].lock_left()
            else:
                new_segments = self.segments[i].split(indices, reassign_ids=False)
                if lock:
                    for s in new_segments:
                        if s is new_segments[0]:
                            s.lock_right()
                        elif s is new_segments[-1]:
                            s.lock_left()
                        else:
                            s.lock_both()
                del self.segments[i]
                for s in reversed(new_segments):
                    self.segments.insert(i, s)
        if no_words:
            warnings.warn('Found segment(s) without word timings. '
                          'These segment(s) cannot be split.')
        self.remove_no_word_segments()

    def _merge_segments(self, indices: List[int], *,
                        max_words: Optional[int] = None,
                        max_chars: Optional[int] = None,
                        is_sum_max: bool = False,
                        lock: bool = False, newline: bool = False):
        if len(indices) == 0:
            return
        for i in reversed(indices):
            seg = self.segments[i]
            nxt = self.segments[i + 1]
            if max_words and seg.has_words:
                exceeds = (seg.word_count() + nxt.word_count() > max_words) if is_sum_max \
                    else (seg.word_count() > max_words and nxt.word_count() > max_words)
                if exceeds:
                    continue
            if max_chars:
                exceeds = (seg.char_count() + nxt.char_count() > max_chars) if is_sum_max \
                    else (seg.char_count() > max_chars and nxt.char_count() > max_chars)
                if exceeds:
                    continue
            self.add_segments(i, i + 1, inplace=True, lock=lock, newline=newline,
                              reassign_ids=False)
        self.remove_no_word_segments()

    # -- regroup operations (DSL-visible; signatures define positional DSL args) ----------

    def ignore_special_periods(self, enable: bool = True) -> 'WhisperResult':
        """Default all ``ignore_special_periods`` options to ``enable``."""
        self._ignore_special_periods = enable
        self._update_history(f'isp={int(enable)}')
        return self

    def split_by_gap(self, max_gap: float = 0.1, lock: bool = False,
                     newline: bool = False,
                     ignore_special_periods: bool = False) -> 'WhisperResult':
        """Split segments at word gaps greater than ``max_gap`` seconds."""
        ignore_special_periods = self._ignore_special_periods or ignore_special_periods
        self._split_segments(lambda x: x.get_gap_indices(max_gap), lock=lock,
                             newline=newline,
                             ignore_special_periods=ignore_special_periods)
        self._update_history(
            f'sg={max_gap}+{int(lock)}+{int(newline)}+{int(ignore_special_periods)}')
        return self

    def merge_by_gap(self, min_gap: float = 0.1, max_words: Optional[int] = None,
                     max_chars: Optional[int] = None, is_sum_max: bool = False,
                     lock: bool = False, newline: bool = False) -> 'WhisperResult':
        """Merge adjacent segments whose gap is at most ``min_gap`` seconds."""
        indices = self.get_gap_indices(min_gap)
        self._merge_segments(indices, max_words=max_words, max_chars=max_chars,
                             is_sum_max=is_sum_max, lock=lock, newline=newline)
        self._update_history(
            f'mg={min_gap}+{max_words or ""}+{max_chars or ""}'
            f'+{int(is_sum_max)}+{int(lock)}+{int(newline)}')
        return self

    def split_by_punctuation(self, punctuation, lock: bool = False,
                             newline: bool = False,
                             min_words: Optional[int] = None,
                             min_chars: Optional[int] = None,
                             min_dur: Optional[float] = None,
                             ignore_special_periods: bool = False) -> 'WhisperResult':
        """Split segments at words that start/end with ``punctuation``."""
        def over_max(x: Segment):
            return ((min_words and len(x.words) >= min_words)
                    or (min_chars and x.char_count() >= min_chars)
                    or (min_dur and x.duration >= min_dur))

        indices = (set(s.id for s in self.segments if over_max(s))
                   if any((min_words, min_chars, min_dur)) else None)

        def get_indices(x: Segment):
            return (x.get_punctuation_indices(punctuation)
                    if indices is None or x.id in indices else [])

        ignore_special_periods = self._ignore_special_periods or ignore_special_periods
        self._split_segments(get_indices, lock=lock, newline=newline,
                             ignore_special_periods=ignore_special_periods)
        punct_str = '/'.join(p if isinstance(p, str) else '*'.join(p) for p in punctuation)
        self._update_history(
            f'sp={punct_str}+{int(lock)}+{int(newline)}+{min_words or ""}'
            f'+{min_chars or ""}+{min_dur or ""}+{int(ignore_special_periods)}')
        return self

    def merge_by_punctuation(self, punctuation, max_words: Optional[int] = None,
                             max_chars: Optional[int] = None, is_sum_max: bool = False,
                             lock: bool = False, newline: bool = False) -> 'WhisperResult':
        """Merge adjacent segments joined by ``punctuation``."""
        indices = self.get_punctuation_indices(punctuation)
        self._merge_segments(indices, max_words=max_words, max_chars=max_chars,
                             is_sum_max=is_sum_max, lock=lock, newline=newline)
        punct_str = '/'.join(p if isinstance(p, str) else '*'.join(p) for p in punctuation)
        self._update_history(
            f'mp={punct_str}+{max_words or ""}+{max_chars or ""}'
            f'+{int(is_sum_max)}+{int(lock)}+{int(newline)}')
        return self

    def merge_all_segments(self, record: bool = True) -> 'WhisperResult':
        """Collapse every segment into one."""
        if not self.segments:
            return self
        if self.has_words:
            new_seg = self.segments[0].copy(self.all_words(), keep_result=True,
                                            copy_words=False)
        else:
            new_seg = self.segments[0]
            new_seg._default_text = ''.join(s.text for s in self.segments)
            if all(s.tokens is not None for s in self.segments):
                new_seg._default_tokens = list(chain.from_iterable(
                    s.tokens for s in self.segments))
            new_seg.end = self.segments[-1].end
        self.segments = [new_seg]
        self.reassign_ids()
        if record:
            self._update_history('ms')
        return self

    def split_by_length(self, max_chars: Optional[int] = None,
                        max_words: Optional[int] = None, even_split: bool = True,
                        force_len: bool = False, lock: bool = False,
                        include_lock: bool = False, newline: bool = False,
                        ignore_special_periods: bool = False) -> 'WhisperResult':
        """Split segments exceeding ``max_chars``/``max_words``."""
        if force_len:
            self.merge_all_segments(record=False)
        ignore_special_periods = self._ignore_special_periods or ignore_special_periods
        self._split_segments(
            lambda x: x.get_length_indices(
                max_chars=max_chars, max_words=max_words,
                even_split=even_split, include_lock=include_lock),
            lock=lock, newline=newline,
            ignore_special_periods=ignore_special_periods)
        self._update_history(
            f'sl={max_chars or ""}+{max_words or ""}+{int(even_split)}+{int(force_len)}'
            f'+{int(lock)}+{int(include_lock)}+{int(newline)}+{int(ignore_special_periods)}')
        return self

    def split_by_duration(self, max_dur: float, even_split: bool = True,
                          force_len: bool = False, lock: bool = False,
                          include_lock: bool = False, newline: bool = False,
                          ignore_special_periods: bool = False) -> 'WhisperResult':
        """Split segments exceeding ``max_dur`` seconds."""
        if force_len:
            self.merge_all_segments(record=False)
        ignore_special_periods = self._ignore_special_periods or ignore_special_periods
        self._split_segments(
            lambda x: x.get_duration_indices(
                max_dur=max_dur, even_split=even_split, include_lock=include_lock),
            lock=lock, newline=newline,
            ignore_special_periods=ignore_special_periods)
        self._update_history(
            f'sd={max_dur}+{int(even_split)}+{int(force_len)}'
            f'+{int(lock)}+{int(include_lock)}+{int(newline)}+{int(ignore_special_periods)}')
        return self

    def clamp_max(self, medium_factor: float = 2.5, max_dur: Optional[float] = None,
                  clip_start: Optional[bool] = None,
                  verbose: bool = False) -> 'WhisperResult':
        """Clamp word durations above ``medium_factor`` * per-segment median or ``max_dur``."""
        if not (medium_factor or max_dur):
            raise ValueError('At least one of ``medium_factor``/``max_dur`` must be non-zero')
        if not self.has_words:
            warnings.warn('Cannot clamp due to missing/no word-timestamps')
            return self
        for seg in self.segments:
            curr_max_dur = None
            if medium_factor and len(seg.words) > 1:
                durations = np.sort([w.duration for w in seg.words])
                curr_max_dur = medium_factor * durations[len(durations) // 2]
            if max_dur and (not curr_max_dur or curr_max_dur > max_dur):
                curr_max_dur = max_dur
            if not curr_max_dur:
                continue
            if clip_start is None:
                seg.words[0].clamp_max(curr_max_dur, clip_start=True, verbose=verbose)
                seg.words[-1].clamp_max(curr_max_dur, clip_start=False, verbose=verbose)
            else:
                for word in seg.words:
                    word.clamp_max(curr_max_dur, clip_start=clip_start, verbose=verbose)
        self._update_history(
            f'cm={medium_factor}+{max_dur or ""}+{clip_start or ""}+{int(verbose)}')
        return self

    def lock(self, startswith: Union[str, List[str], None] = None,
             endswith: Union[str, List[str], None] = None,
             right: bool = True, left: bool = False,
             case_sensitive: bool = False, strip: bool = True) -> 'WhisperResult':
        """Lock words/segments matching prefixes/suffixes against splits/merges."""
        assert startswith is not None or endswith is not None, \
            'Must specify [startswith] or/and [endswith].'
        startswith = ([] if startswith is None
                      else [startswith] if isinstance(startswith, str) else startswith)
        endswith = ([] if endswith is None
                    else [endswith] if isinstance(endswith, str) else endswith)
        if not case_sensitive:
            startswith = [t.lower() for t in startswith]
            endswith = [t.lower() for t in endswith]
        if strip:
            startswith = [t.strip() for t in startswith]
            endswith = [t.strip() for t in endswith]
        for part in self.all_words_or_segments():
            text = part.word if hasattr(part, 'word') else part.text
            if not case_sensitive:
                text = text.lower()
            if strip:
                text = text.strip()
            for prefix in startswith:
                if text.startswith(prefix):
                    if right:
                        part.lock_right()
                    if left:
                        part.lock_left()
            for suffix in endswith:
                if text.endswith(suffix):
                    if right:
                        part.lock_right()
                    if left:
                        part.lock_left()
        self._update_history(
            f'l={"/".join(startswith)}+{"/".join(endswith)}'
            f'+{int(right)}+{int(left)}+{int(case_sensitive)}+{int(strip)}')
        return self

    def unlock_all_segments(self) -> 'WhisperResult':
        for s in self.segments:
            s.unlock_all_words()
        return self

    def pad(self, start_pad: Optional[float] = None, end_pad: Optional[float] = None,
            max_dur: Optional[float] = None, max_end: Optional[float] = None,
            word_level: bool = False) -> 'WhisperResult':
        """Extend start/end timestamps without crossing neighbors or ``max_end``."""
        if not (start_pad or end_pad):
            warnings.warn('No ``start_pad`` or ``end_pad`` given.', stacklevel=2)
            return self
        if word_level and not self.has_words:
            word_level = False
        parts = self.all_words() if word_level else self.segments
        assert not start_pad or start_pad > 0, '``start_pad`` must be positive'
        assert not end_pad or end_pad > 0, '``end_pad`` must be positive'
        assert max_dur is None or max_dur > 0, '``max_dur`` must be greater than 0'
        assert max_end is None or max_end > 0, '``max_end`` must be greater than 0'
        for i, part in enumerate(parts, 1):
            if max_dur and part.end - part.start > max_dur:
                continue
            if start_pad:
                new_start = part.start - start_pad
                new_start = max(0 if i == 1 else parts[i - 2].end, new_start)
                part.start = new_start
            if end_pad:
                new_end = part.end + end_pad
                temp_max_end = max_end
                if i != len(parts):
                    temp_max_end = min(max_end, parts[i].start) if max_end else parts[i].start
                if temp_max_end and temp_max_end < new_end:
                    new_end = temp_max_end
                if new_end > part.end:
                    part.end = new_end
        self._update_history(
            f'p={start_pad or ""}+{end_pad or ""}+{max_dur or ""}'
            f'+{max_end or ""}+{int(word_level)}')
        return self

    # -- content removal / repair --------------------------------------------------------

    def remove_word(self, word: Union[WordTiming, Tuple[int, int]],
                    reassign_ids: bool = True, verbose: bool = True,
                    record: bool = True) -> 'WhisperResult':
        """Remove a word by instance or (segment index, word index)."""
        if isinstance(word, WordTiming):
            if self[word.segment_id][word.id] is not word:
                self.reassign_ids()
                if self[word.segment_id][word.id] is not word:
                    raise ValueError('word not in result')
            seg_id, word_id = word.segment_id, word.id
        else:
            seg_id, word_id = map(int, word.split(',')) if isinstance(word, str) else word
        if verbose:
            print(f'Removed: {self[seg_id][word_id].to_dict()}')
        del self.segments[seg_id].words[word_id]
        if not reassign_ids:
            return self
        if self[seg_id].has_words:
            self[seg_id].reassign_ids()
        else:
            self.remove_no_word_segments()
        if record:
            self._update_history(f'rw={seg_id},{word_id}+{int(reassign_ids)}+{int(verbose)}')
        return self

    def remove_segment(self, segment: Union[Segment, int], reassign_ids: bool = True,
                       verbose: bool = True, record: bool = True) -> 'WhisperResult':
        """Remove a segment by instance or index."""
        if isinstance(segment, Segment):
            if self[segment.id] is not segment:
                self.reassign_ids()
                if self[segment.id] is not segment:
                    raise ValueError('segment not in result')
            segment = segment.id
        if verbose:
            print(f'Removed: [id:{self[segment].id}] {self[segment].to_display_str(True)}')
        del self.segments[segment]
        if not reassign_ids:
            return self
        self.reassign_ids(True, start=segment)
        if record:
            self._update_history(f'rs={segment}+{int(reassign_ids)}+{int(verbose)}')
        return self

    def remove_repetition(self, max_words: int = 1, case_sensitive: bool = False,
                          strip: bool = True, ignore_punctuations: str = "\"',.?!",
                          extend_duration: bool = True,
                          verbose: bool = True) -> 'WhisperResult':
        """Collapse consecutively repeating runs of up to ``max_words`` words."""
        if not self.has_words:
            return self
        for count in range(1, max_words + 1):
            all_words = self.all_words()
            if len(all_words) < 2:
                return self
            keys = [w.word for w in all_words]
            if strip:
                keys = [w.strip() for w in keys]
            if ignore_punctuations:
                ptn = f'[{ignore_punctuations}]+$'
                keys = [re.sub(ptn, '', w) for w in keys]
            if not case_sensitive:
                keys = [w.lower() for w in keys]
            next_i = None
            changes = []
            for i in reversed(range(count * 2, len(keys) + 1)):
                if next_i is not None:
                    if next_i != i:
                        continue
                    next_i = None
                s = i - count
                if keys[s - count:s] != keys[s:i]:
                    continue
                next_i = s
                if extend_duration:
                    all_words[s - 1].end = all_words[i - 1].end
                temp_changes = []
                for j in reversed(range(s, i)):
                    if verbose:
                        temp_changes.append(f'- {all_words[j].to_dict()}')
                    self.remove_word(all_words[j], False, verbose=False, record=False)
                if temp_changes:
                    changes.append(
                        f'Remove: [{format_timestamp(all_words[s].start)} -> '
                        f'{format_timestamp(all_words[i - 1].end)}] '
                        + ''.join(w.word for w in all_words[s:i]) + '\n'
                        + '\n'.join(reversed(temp_changes)) + '\n'
                    )
                # Keep the longer-text twin of each removed word.
                for i0, i1 in zip(range(s - count, s), range(s, i)):
                    if len(all_words[i0].word) < len(all_words[i1].word):
                        all_words[i1].start = all_words[i0].start
                        all_words[i1].end = all_words[i0].end
                        sid, wid = all_words[i0].segment_id, all_words[i0].id
                        self.segments[sid].words[wid] = all_words[i1]
            if changes:
                print('\n'.join(reversed(changes)))
            self.remove_no_word_segments(reassign_ids=False)
        self.reassign_ids()
        self._update_history(
            f'rp={max_words}+{int(case_sensitive)}+{int(strip)}'
            f'+{ignore_punctuations}+{int(extend_duration)}+{int(verbose)}')
        return self

    def remove_words_by_str(self, words: Union[str, List[str], None],
                            case_sensitive: bool = False, strip: bool = True,
                            ignore_punctuations: str = "\"',.?!",
                            min_prob: Optional[float] = None,
                            filters: Optional[Callable] = None,
                            verbose: bool = True) -> 'WhisperResult':
        """Remove words matching ``words`` (optionally gated by probability/filter)."""
        if not self.has_words:
            return self
        if isinstance(words, str):
            words = [words]
        elif words == 0:
            words = None
        filters = self._content_cache.resolve(filters)
        all_words = self.all_words()
        keys = [w.word for w in all_words]
        if strip:
            keys = [w.strip() for w in keys]
            if words is not None:
                words = [w.strip() for w in words]
        if ignore_punctuations:
            ptn = f'[{ignore_punctuations}]+$'
            keys = [re.sub(ptn, '', w) for w in keys]
            if words is not None:
                words = [re.sub(ptn, '', w) for w in words]
        if not case_sensitive:
            keys = [w.lower() for w in keys]
            if words is not None:
                words = [w.lower() for w in words]
        changes = []
        for i, w in reversed(list(enumerate(keys))):
            if not (words is None or any(w == _w for _w in words)):
                continue
            prob_gate = (min_prob is None or all_words[i].probability is None
                         or min_prob > all_words[i].probability)
            if prob_gate and (filters is None or filters(all_words[i])):
                if verbose:
                    changes.append(f'Removed: {all_words[i].to_dict()}')
                self.remove_word(all_words[i], False, verbose=False, record=False)
        if changes:
            print('\n'.join(reversed(changes)))
        self.remove_no_word_segments()
        words_str = 0 if words is None else '/'.join(words)
        self._update_history(
            f'rws={words_str}+{int(case_sensitive)}+{int(strip)}'
            f'+{ignore_punctuations}+{min_prob}'
            f'+{self._content_cache.store(filters)}+{int(verbose)}')
        return self

    def fill_in_gaps(self, other_result: Union['WhisperResult', str],
                     min_gap: float = 0.1, case_sensitive: bool = False,
                     strip: bool = True, ignore_punctuations: str = "\"',.?!",
                     verbose: bool = True) -> 'WhisperResult':
        """Fill gaps larger than ``min_gap`` with overlapping content from another result."""
        if len(self.segments) < 2:
            return self
        other_result = self._content_cache.resolve(other_result)
        if isinstance(other_result, str):
            other_path = other_result
            other_result = WhisperResult(other_result)
        else:
            other_path = self._content_cache.store(other_result)

        def norm(w: str) -> str:
            if strip:
                w = w.strip()
            if ignore_punctuations:
                w = re.sub(f'[{ignore_punctuations}]+$', '', w)
            if not case_sensitive:
                w = w.lower()
            return w

        seg_pairs = list(enumerate(zip(self.segments[:-1], self.segments[1:])))
        seg_pairs.insert(0, (-1, (None, self.segments[0])))
        seg_pairs.append((seg_pairs[-1][0] + 1, (self.segments[-1], None)))

        changes = []
        for i, (seg0, seg1) in reversed(seg_pairs):
            first_word = None if seg0 is None else seg0.words[-1]
            last_word = None if seg1 is None else seg1.words[0]
            start = other_result[0].start if first_word is None else first_word.end
            end = other_result[-1].end if last_word is None else last_word.start
            if end - start <= min_gap:
                continue
            gap_words = other_result.get_content_by_time((start, end))
            if first_word is not None and gap_words and \
                    norm(first_word.word) == norm(gap_words[0].word):
                first_word.end = gap_words[0].end
                gap_words = gap_words[1:]
            if last_word is not None and gap_words and \
                    norm(last_word.word) == norm(gap_words[-1].word):
                last_word.start = gap_words[-1].start
                gap_words = gap_words[:-1]
            if not gap_words:
                continue
            if last_word is not None and last_word.start < gap_words[-1].end:
                last_word.start = gap_words[-1].end
            new_segments = [other_result[gap_words[0].segment_id].copy([])]
            for j, new_word in enumerate(gap_words):
                word_copy = new_word.copy(copy_tokens=True)
                if j == 0 and first_word is not None and first_word.end > gap_words[0].start:
                    word_copy.start = first_word.end
                if new_segments[-1].id != new_word.segment_id:
                    new_segments.append(other_result[new_word.segment_id].copy([]))
                new_segments[-1].words.append(word_copy)
            if verbose:
                changes.append('\n'.join('Added: ' + s.to_display_str(True)
                                         for s in new_segments))
            self.segments = self.segments[:i + 1] + new_segments + self.segments[i + 1:]
        if changes:
            print('\n'.join(reversed(changes)))
        self.reassign_ids()
        self._update_history(
            f'fg={other_path}+{min_gap}+{int(case_sensitive)}+{int(strip)}'
            f'+{ignore_punctuations}+{int(verbose)}')
        return self

    def adjust_gaps(self, duration_threshold: float = 0.75,
                    one_section: bool = False) -> 'WhisperResult':
        """Snap segment edges at gaps onto overlapping ``nonspeech_sections``."""
        if duration_threshold > 1:
            raise ValueError('``duration_threshold`` must be at most 1.0 '
                             f'but got {duration_threshold}')
        ns_idx = 0
        for seg_idx in range(-1, len(self.segments)):
            curr_part = None if seg_idx == -1 else self.segments[seg_idx]
            next_part = (None if curr_part is self.segments[-1]
                         else self.segments[seg_idx + 1])
            curr_start = curr_end = next_start = next_end = None
            if self.has_words:
                if curr_part is None:
                    word_duration = np.median([w.duration for w in next_part]) * 2
                    curr_start = curr_end = max(next_part.start - word_duration, 0)
                if next_part is None:
                    med_duration = np.median([w.duration for w in curr_part]) * 2
                    next_start = next_end = curr_part.end + med_duration
                if curr_part is not None:
                    curr_part = curr_part[-1]
                if next_part is not None:
                    next_part = next_part[0]
            else:
                if curr_part is None:
                    curr_start = curr_end = max(next_part.start - next_part.duration, 0)
                if next_part is None:
                    next_start = next_end = curr_part.end + curr_part.duration

            if curr_start is None:
                curr_start = curr_part.start
            if curr_end is None:
                curr_end = curr_part.end
            if next_start is None:
                next_start = next_part.start
            if next_end is None:
                next_end = next_part.end

            candidates: List[Tuple[float, float]] = []
            for ns_idx in range(ns_idx, len(self.nonspeech_sections)):
                section = self.nonspeech_sections[ns_idx]
                ns_start, ns_end = section['start'], section['end']
                valid_start = curr_start < (ns_end if curr_part is None else ns_start)
                valid_end = (ns_start if next_part is None else ns_end) < next_end
                if valid_start and valid_end:
                    candidates.append((ns_start, ns_end))
                if next_start < ns_start:
                    break
            if not candidates:
                continue
            durations = np.array([e - s for s, e in candidates])
            order = np.argsort(durations)
            pct = durations[order] / durations[order][-1]
            valid = pct >= duration_threshold
            if not np.any(valid):
                continue
            order = order[valid]
            curr_scores = np.array([abs(candidates[i][0] - curr_end) for i in order])
            next_scores = np.array([abs(candidates[i][1] - next_start) for i in order])
            if one_section:
                k = np.argmin(curr_scores + next_scores)
                best_curr = best_next = order[k]
            else:
                best_curr = order[np.argmin(curr_scores)]
                best_next = order[np.argmin(next_scores)]
                if best_curr > best_next:
                    k = np.argmin(curr_scores + next_scores)
                    best_curr = best_next = order[k]
            new_end = candidates[best_curr][0]
            if curr_part is not None and curr_start < new_end:
                curr_part.end = new_end
            new_start = candidates[best_next][1]
            if next_part is not None and new_start < next_end:
                next_part.start = new_start
        self._update_history(f'ag={duration_threshold}+{int(one_section)}')
        return self

    def convert_to_segment_level(self) -> 'WhisperResult':
        """Drop all word-level data, keeping segment text/timestamps."""
        for seg in self.segments:
            seg.convert_to_segment_level()
        self._update_history('csl')
        return self

    # -- custom operation mini rule engine ------------------------------------------------

    _CUSTOM_METHODS = ('mergeleft', 'mergeright', 'merge',
                       'lockright', 'lockleft', 'lock',
                       'splitright', 'splitleft', 'split', 'remove')

    def custom_operation(self, key: str, operator: Union[str, Callable], value,
                         method: Union[str, Callable],
                         word_level: Optional[bool] = None) -> 'WhisperResult':
        """Apply ``method`` to every word/segment where ``key <operator> value`` holds.

        See the reference docstring (result.py:2653-2717) for the mini-language:
        built-in operators ``==, >, >=, <, <=, is, in, start, end``; built-in
        methods merge/lock/split/remove with left/right variants; ``len=`` key
        prefix; ``any=``/``all=`` multi-value strings.
        """
        if self.has_words:
            if word_level is None:
                word_level = True
        elif word_level:
            raise ValueError('result is missing word timestamps and is not '
                             'compatible with ``word_level=True``')

        value = self._content_cache.resolve(value, strict=False)
        method = self._content_cache.resolve(method)
        is_builtin = isinstance(method, str)
        if is_builtin:
            if method not in self._CUSTOM_METHODS:
                raise ValueError(f"invalid method: '{method}'. "
                                 f'Valid methods: {self._CUSTOM_METHODS}')
        elif not callable(method):
            raise TypeError(f"'{type(method)}' object is not callable")

        key = key.replace(' ', '_')
        operator = self._content_cache.resolve(operator)
        if isinstance(operator, str):
            operators = {
                '==': lambda a, b: a == b,
                '>': lambda a, b: a > b,
                '>=': lambda a, b: a >= b,
                '<': lambda a, b: a < b,
                '<=': lambda a, b: a <= b,
                'is': lambda a, b: a is b,
                'in': lambda a, b: a in b,
                'start': str.startswith,
                'end': str.endswith,
            }
            if operator not in operators:
                raise ValueError(f"invalid operator: '{operator}'. "
                                 f'Valid operators: {tuple(operators)}')
            operator_str = operator
            operator = operators[operator]
        else:
            operator_str = self._content_cache.store(operator)

        method_str = method
        if not is_builtin:
            method_str = self._content_cache.store(method)
            action = method
        elif method.startswith('merge'):
            def left_pairs(result, seg_idx, word_idx=None):
                if seg_idx == 0 or (word_idx is not None and word_idx != 0):
                    return []
                return [(seg_idx - 1, seg_idx)]

            def right_pairs(result, seg_idx, word_idx=None):
                if (seg_idx + 1 >= len(result.segments)
                        or (word_idx is not None
                            and word_idx != len(result[seg_idx].words) - 1)):
                    return []
                return [(seg_idx, seg_idx + 1)]

            if method == 'mergeright':
                pairs = right_pairs
            elif method == 'mergeleft':
                pairs = left_pairs
            else:
                def pairs(*args):
                    return right_pairs(*args) + left_pairs(*args)

            def action(result, seg_idx, word_idx=None):
                for idxs in pairs(result, seg_idx, word_idx):
                    result.add_segments(*idxs, inplace=True, reassign_ids=False)

        elif method.startswith('lock'):
            do_right = method in ('lockright', 'lock')
            do_left = method in ('lockleft', 'lock')

            def action(result, seg_idx, word_idx=None):
                target = result[seg_idx] if word_idx is None else result[seg_idx][word_idx]
                if do_right:
                    target.lock_right()
                if do_left:
                    target.lock_left()

        elif method.startswith('split'):
            if word_level is None:
                raise ValueError('Segment-level result is not compatible with split actions.')
            if not word_level:
                raise ValueError('``word_level=False`` is not compatible with split actions.')
            if method == 'splitright':
                def action(result, seg_idx, word_idx=None):
                    if word_idx == len(result[seg_idx].words) + 1:
                        return
                    result.split_segment_by_index(result[seg_idx], word_idx,
                                                  reassign_ids=False)
            elif method == 'splitleft':
                def action(result, seg_idx, word_idx=None):
                    if word_idx == 0:
                        return
                    result.split_segment_by_index(result[seg_idx], word_idx - 1,
                                                  reassign_ids=False)
            else:
                def action(result, seg_idx, word_idx=None):
                    indices = []
                    if word_idx != 0:
                        indices.append(word_idx - 1)
                    if word_idx < len(result[seg_idx].words) + 1:
                        indices.append(word_idx)
                    result.split_segment_by_index(result[seg_idx], indices,
                                                  reassign_ids=False)
        else:  # remove
            def action(result, seg_idx, word_idx=None):
                if word_idx is None:
                    result.remove_segment(result[seg_idx], reassign_ids=False, record=False)
                else:
                    result.remove_word(result[seg_idx][word_idx], reassign_ids=False,
                                       record=False)

        if key.startswith('len='):
            attr = key[4:]

            def get_value(obj):
                return len(getattr(obj, attr))
        elif key == '':
            def get_value(obj):
                return obj
        else:
            def get_value(obj):
                return getattr(obj, key)

        if isinstance(value, str) and (value.startswith('all=') or value.startswith('any=')):
            check = any if value.startswith('any=') else all
            values = [v.replace('\\,', ',') for v in re.split(r'(?<!\\),', value[4:])]

            def is_satisfied(obj):
                return check(operator(get_value(obj), v) for v in values)
        else:
            def is_satisfied(obj):
                return operator(get_value(obj), value)

        if word_level:
            for seg_i in range(len(self.segments) - 1, -1, -1):
                for word_i in range(len(self.segments[seg_i].words) - 1, -1, -1):
                    if is_satisfied(self[seg_i][word_i]):
                        action(self, seg_i, word_i)
        else:
            for seg_i in range(len(self.segments) - 1, -1, -1):
                if is_satisfied(self[seg_i]):
                    action(self, seg_i, None)

        self.reassign_ids()
        if isinstance(value, bool) or not isinstance(value, (str, int, float)):
            value = f'<{value}>' if isinstance(value, bool) else self._content_cache.store(value)
        self._update_history(
            f'co={key.replace("_", " ")}+{operator_str}+{value}+{method_str}+{int(word_level)}')
        return self

    # -- regroup DSL ------------------------------------------------------------------------

    def regroup(self, regroup_algo: Union[str, bool, None] = None,
                verbose: bool = False, only_show: bool = False) -> 'WhisperResult':
        """Run a chain of regroup operations parsed from ``regroup_algo``.

        ``True``/``None`` use the default algorithm ('da'); ``False`` is a no-op.
        """
        if regroup_algo is False:
            return self
        if regroup_algo is None or regroup_algo is True:
            regroup_algo = 'da'
        for method, kwargs, msg in self.parse_regroup_algo(
                regroup_algo, include_str=verbose or only_show):
            if msg:
                print(msg)
            if not only_show:
                method(**kwargs)
        return self

    def parse_regroup_algo(self, regroup_algo: str,
                           include_str: bool = True) -> List[Tuple[Callable, dict, str]]:
        """Parse a regroup DSL string into (bound method, kwargs, display) triples."""
        import inspect
        methods = dict(
            sg=self.split_by_gap,
            sp=self.split_by_punctuation,
            sl=self.split_by_length,
            sd=self.split_by_duration,
            mg=self.merge_by_gap,
            mp=self.merge_by_punctuation,
            ms=self.merge_all_segments,
            cm=self.clamp_max,
            us=self.unlock_all_segments,
            l=self.lock,
            rw=self.remove_word,
            rs=self.remove_segment,
            rp=self.remove_repetition,
            rws=self.remove_words_by_str,
            fg=self.fill_in_gaps,
            p=self.pad,
            ag=self.adjust_gaps,
            csl=self.convert_to_segment_level,
            co=self.custom_operation,
            isp=self.ignore_special_periods,
        )
        if not regroup_algo:
            return []
        calls = regroup_algo.split('_')
        if 'da' in calls:
            default_calls = DEFAULT_REGROUP_ALGO.split('_')
            calls = list(chain.from_iterable(
                default_calls if c == 'da' else [c] for c in calls))
        operations = []
        for call in calls:
            name, args = call.split('=', maxsplit=1) if '=' in call else (call, '')
            if name not in methods:
                raise NotImplementedError(
                    f'{name} is not one of the available methods: {tuple(methods)}')
            args = [] if len(args) == 0 else [str_to_valid_type(a) for a in args.split('+')]
            param_names = list(inspect.signature(methods[name]).parameters)
            # the reference zips args onto __code__.co_varnames, so a non-None
            # arg past the real parameter list lands on a local variable name
            # and raises TypeError at call time (result.py:3016) — mirror that
            # instead of silently dropping it
            for extra in args[len(param_names):]:
                if extra is not None:
                    raise TypeError(
                        f'{methods[name].__name__}() got more positional '
                        f'values than parameters: {extra!r}')
            kwargs = {k: v for k, v in zip(param_names, args) if v is not None}
            if include_str:
                kwargs_str = ', '.join(
                    f'{k}="{v}"' if isinstance(v, str) else f'{k}={v}'
                    for k, v in kwargs.items())
                op_str = f'{methods[name].__name__}({kwargs_str})'
            else:
                op_str = None
            operations.append((methods[name], kwargs, op_str))
        return operations

    def show_regroup_history(self):
        if not self._regroup_history:
            print('Result has no history.')
        for *_, msg in self.parse_regroup_algo(self._regroup_history):
            print(f'.{msg}')

    # -- search --------------------------------------------------------------------------

    def find(self, pattern: str, word_level: bool = True, flags=None):
        """Regex search over the (word- or segment-level) text with timestamps."""
        from .find import WhisperResultMatches
        return WhisperResultMatches(self).find(pattern, word_level=word_level, flags=flags)

    # -- persistence ------------------------------------------------------------------------

    def to_dict(self, keep_orig: bool = True) -> dict:
        ori_dict = self.ori_dict if keep_orig else {}
        return dict(text=self.text,
                    segments=self.segments_to_dicts(),
                    language=self.language,
                    ori_dict=ori_dict,
                    regroup_history=self._regroup_history,
                    nonspeech_sections=self._nonspeech_sections,
                    unfinished=self.unfinished_start)

    def segments_to_dicts(self, reverse_text: Union[bool, tuple] = False) -> List[dict]:
        if reverse_text:
            # deprecated upstream too, but still honored for RTL rendering
            # (reference result.py:609-636)
            warnings.warn('``reverse_text=True`` is deprecated. RTL playback '
                          'issues are usually caused by the player '
                          'mis-parsing word-level tags.',
                          DeprecationWarning, stacklevel=2)
        return [s.to_dict(reverse_text=reverse_text) for s in self.segments]

    def update_all_segs_with_words(self):
        # deprecated shim (reference result.py:1058-1063)
        warnings.warn('Segment attributes are word-derived properties; '
                      '``update_all_segs_with_words()`` is deprecated. Use '
                      '``.reassign_ids()`` to update ids.', stacklevel=2)
        self.reassign_ids()

    def set_current_as_orig(self, keep_orig: bool = False):
        """Overwrite ``ori_dict`` with the current state."""
        self.ori_dict = self.to_dict(keep_orig=keep_orig)

    def reset(self):
        """Restore the state captured in ``ori_dict`` (drops regroup history)."""
        self.language = self.ori_dict.get('language')
        self._regroup_history = ''
        segments = self.ori_dict.get('segments')
        self.segments = ([Segment(**s, ignore_unused_args=True) for s in segments]
                         if segments else [])
        if self._forced_order:
            self.force_order()
        self.remove_no_word_segments(any(seg.has_words for seg in self.segments))

    # Output-format methods.
    to_srt_vtt = result_to_srt_vtt
    to_ass = result_to_ass
    to_tsv = result_to_tsv
    to_txt = result_to_txt
    save_as_json = save_as_json
