"""Regex search over results with timestamp-mapped matches.

Behavioral counterpart of ``SegmentMatch`` / ``WhisperResultMatches``
(/root/reference/stable_whisper/result.py:3105-3256).
"""
import re
import warnings
from itertools import chain
from typing import List, Optional, Tuple, Union

from .segment import Segment
from .whisper_result import WhisperResult


class SegmentMatch:

    def __init__(
            self,
            segments: Union[List[Segment], Segment],
            _word_indices: Optional[List[List[int]]] = None,
            _text_match: Optional[str] = None,
    ):
        self.segments = [segments] if isinstance(segments, Segment) else segments
        self.word_indices = [] if _word_indices is None else _word_indices
        self.words = [self.segments[i].words[j]
                      for i, indices in enumerate(self.word_indices)
                      for j in indices]
        if self.words:
            self.text = ''.join(w.word for w in self.words)
        else:
            self.text = ''.join(seg.text for seg in self.segments)
        self.text_match = _text_match

    @property
    def start(self):
        if self.words:
            return self.words[0].start
        return self.segments[0].start if self.segments else None

    @property
    def end(self):
        if self.words:
            return self.words[-1].end
        return self.segments[-1].end if self.segments else None

    def __len__(self):
        return len(self.segments)

    def __repr__(self):
        return self.__dict__.__repr__()

    def __str__(self):
        return self.__dict__.__str__()


class WhisperResultMatches:
    """A set of matches; supports chained ``find`` over previous match spans."""

    def __init__(
            self,
            matches: Union[List[SegmentMatch], WhisperResult],
            _segment_indices: Optional[List[List[int]]] = None,
    ):
        if isinstance(matches, WhisperResult):
            self.matches = list(map(SegmentMatch, matches.segments))
            self._segment_indices = [[i] for i in range(len(matches.segments))]
        else:
            self.matches = matches
            assert _segment_indices is not None
            assert len(self.matches) == len(_segment_indices)
            assert all(len(m.segments) == len(_segment_indices[i])
                       for i, m in enumerate(self.matches))
            self._segment_indices = _segment_indices

    @property
    def segment_indices(self):
        return self._segment_indices

    def _curr_seg_groups(self) -> List[List[Tuple[int, Segment]]]:
        """Group the current segments into runs of consecutive indices."""
        seg_groups, curr_segs = [], []
        curr_max = -1
        for seg_indices, match in zip(self._segment_indices, self.matches):
            for i, seg in zip(sorted(seg_indices), match.segments):
                if i > curr_max:
                    curr_segs.append((i, seg))
                    if i - 1 != curr_max:
                        seg_groups.append(curr_segs)
                        curr_segs = []
                    curr_max = i
        if curr_segs:
            seg_groups.append(curr_segs)
        return seg_groups

    def find(self, pattern: str, word_level: bool = True, flags=None) -> 'WhisperResultMatches':
        seg_groups = self._curr_seg_groups()
        matches: List[SegmentMatch] = []
        match_seg_indices: List[List[int]] = []
        if word_level:
            if not all(all(seg.has_words for seg in match.segments)
                       for match in self.matches):
                warnings.warn('Cannot perform word-level search with segment(s) '
                              'missing word timestamps.')
                word_level = False

        for segs in seg_groups:
            if word_level:
                idxs = list(chain.from_iterable(
                    [(i, j)] * len(word.word)
                    for (i, seg) in segs for j, word in enumerate(seg.words)
                ))
                text = ''.join(word.word for (_, seg) in segs for word in seg.words)
            else:
                idxs = list(chain.from_iterable(
                    [(i, None)] * len(seg.text) for (i, seg) in segs))
                text = ''.join(seg.text for (_, seg) in segs)
            assert len(idxs) == len(text)
            for curr_match in re.finditer(pattern, text, flags=flags or 0):
                start, end = curr_match.span()
                curr_idxs = idxs[start:end]
                curr_seg_idxs = sorted(set(i for i, _ in curr_idxs))
                if word_level:
                    curr_word_idxs = [
                        sorted(set(j for i, j in curr_idxs if i == seg_idx))
                        for seg_idx in curr_seg_idxs
                    ]
                else:
                    curr_word_idxs = None
                matches.append(SegmentMatch(
                    segments=[s for i, s in segs if i in curr_seg_idxs],
                    _word_indices=curr_word_idxs,
                    _text_match=curr_match.group(),
                ))
                match_seg_indices.append(curr_seg_idxs)
        return WhisperResultMatches(matches, match_seg_indices)

    def __len__(self):
        return len(self.matches)

    def __bool__(self):
        return len(self) != 0

    def __getitem__(self, idx):
        return self.matches[idx]
