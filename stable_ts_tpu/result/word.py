"""Word-level timing record.

Behavioral counterpart of the reference ``WordTiming``
(/root/reference/stable_whisper/result.py:74-257): a mutable record of one
word's text, [start, end] span, decode probability, source tokens, and lock
flags that protect its boundaries from regrouping edits. Timestamps are
rounded to 3 decimals on assignment when ``round_ts`` is enabled.
"""
import warnings
from typing import List, Optional, TYPE_CHECKING

import numpy as np

from ._common import combine_attr, round_timestamp
from ..utils import format_timestamp
from ..stabilization.silence import suppress_silence as _suppress_silence

if TYPE_CHECKING:  # pragma: no cover
    from .segment import Segment


class WordTiming:
    __slots__ = ('round_ts', 'word', '_start', '_end', 'probability', 'tokens',
                 'left_locked', 'right_locked', 'segment', 'id')

    def __init__(
            self,
            word: str,
            start: float,
            end: float,
            probability: Optional[float] = None,
            tokens: Optional[List[int]] = None,
            left_locked: bool = False,
            right_locked: bool = False,
            segment_id: Optional[int] = None,
            id: Optional[int] = None,
            segment: Optional['Segment'] = None,
            round_ts: bool = True,
            ignore_unused_args: bool = False,
    ):
        if not ignore_unused_args and segment_id is not None:
            warnings.warn('``segment_id`` is ignored; pass the owning segment via ``segment``.',
                          stacklevel=2)
        self.round_ts = round_ts
        self.word = word
        self._start = self.round(start)
        self._end = self.round(end)
        self.probability = probability
        self.tokens = tokens
        self.left_locked = left_locked
        self.right_locked = right_locked
        self.segment = segment
        self.id = id

    # -- core protocol -----------------------------------------------------

    def __repr__(self):
        return f'WordTiming(start={self.start}, end={self.end}, word="{self.word}")'

    def __len__(self):
        return len(self.word)

    def __add__(self, other: 'WordTiming') -> 'WordTiming':
        merged = WordTiming(
            word=self.word + other.word,
            start=min(self.start, other.start),
            end=max(self.end, other.end),
            probability=self.probability,
            tokens=None if self.tokens is None else list(self.tokens),
            left_locked=self.left_locked or other.left_locked,
            right_locked=self.right_locked or other.right_locked,
            id=self.id,
            segment=self.segment,
        )
        combine_attr(merged, other, 'probability')
        combine_attr(merged, other, 'tokens')
        return merged

    def __deepcopy__(self, memo=None):
        return self.copy(copy_tokens=True)

    def __copy__(self):
        return self.copy()

    def copy(self, keep_segment: bool = False, copy_tokens: bool = False) -> 'WordTiming':
        tokens = self.tokens
        if tokens is not None and copy_tokens:
            tokens = list(tokens)
        return WordTiming(
            word=self.word,
            start=self.start,
            end=self.end,
            probability=self.probability,
            tokens=tokens,
            left_locked=self.left_locked,
            right_locked=self.right_locked,
            id=self.id,
            segment=self.segment if keep_segment else None,
            round_ts=self.round_ts,
        )

    # -- timestamps ---------------------------------------------------------

    def round(self, timestamp: float) -> float:
        if not self.round_ts:
            return timestamp
        return round_timestamp(timestamp)

    @property
    def start(self) -> float:
        return self._start

    @start.setter
    def start(self, val: float):
        self._start = self.round(val)

    @property
    def end(self) -> float:
        return self._end

    @end.setter
    def end(self, val: float):
        self._end = self.round(val)

    @property
    def duration(self) -> float:
        return self.round(self.end - self.start)

    @property
    def segment_id(self) -> Optional[int]:
        return None if self.segment is None else self.segment.id

    def offset_time(self, offset_seconds: float):
        self.start = self.start + offset_seconds
        self.end = self.end + offset_seconds

    def rescale_time(self, scale_factor: float):
        self.start = self.start * scale_factor
        self.end = self.end * scale_factor

    def clamp_max(self, max_dur: float, clip_start: bool = False, verbose: bool = False):
        """Shrink duration to ``max_dur`` by moving one boundary."""
        if self.duration <= max_dur:
            return
        if clip_start:
            new_start = round(self.end - max_dur, 3)
            if verbose:
                print(f'Start: {self.start} -> {new_start}\nEnd: {self.end}\nText:"{self.word}"\n')
            self.start = new_start
        else:
            new_end = round(self.start + max_dur, 3)
            if verbose:
                print(f'Start: {self.start}\nEnd: {self.end} -> {new_end}\nText:"{self.word}"\n')
            self.end = new_end

    def suppress_silence(
            self,
            silent_starts: np.ndarray,
            silent_ends: np.ndarray,
            min_word_dur: Optional[float] = None,
            nonspeech_error: float = 0.3,
            keep_end: Optional[bool] = True,
    ) -> 'WordTiming':
        _suppress_silence(self, silent_starts, silent_ends, min_word_dur,
                          nonspeech_error, keep_end)
        return self

    # -- locks ---------------------------------------------------------------

    def lock_left(self):
        self.left_locked = True

    def lock_right(self):
        self.right_locked = True

    def lock_both(self):
        self.lock_left()
        self.lock_right()

    def unlock_both(self):
        self.left_locked = False
        self.right_locked = False

    # -- deprecated shims (reference result.py:185-257) ------------------------

    def round_all_timestamps(self):
        import warnings
        warnings.warn('``.round_all_timestamps()`` is deprecated. Use '
                      '``round_ts=True`` instead.', stacklevel=2)
        self.round_ts = True

    def set_segment(self, segment):
        import warnings
        warnings.warn('``.set_segment()`` is deprecated. Use '
                      '``.segment = ...`` instead.', stacklevel=2)
        self.segment = segment

    def get_segment(self):
        import warnings
        warnings.warn('``.get_segment()`` is deprecated. Use ``.segment`` '
                      'instead.', stacklevel=2)
        return self.segment

    # -- serialization --------------------------------------------------------

    def to_dict(self) -> dict:
        return dict(
            word=self.word,
            start=self.start,
            end=self.end,
            probability=self.probability,
            tokens=None if self.tokens is None else list(self.tokens),
        )

    def to_display_str(self) -> str:
        return f'[{format_timestamp(self.start)}] -> [{format_timestamp(self.end)}] "{self.word}"'
