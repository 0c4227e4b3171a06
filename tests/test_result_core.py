"""Unit tests for the result data model (WordTiming/Segment/WhisperResult)."""
import copy

import numpy as np
import pytest

from stable_ts_tpu.result import Segment, WhisperResult, WordTiming
from stable_ts_tpu.utils import UnsortedException


def make_word(word, start, end, prob=0.9, tokens=None):
    return dict(word=word, start=start, end=end, probability=prob,
                tokens=tokens if tokens is not None else [1])


def make_result(word_specs, language='en'):
    """word_specs: list of list of (word, start, end) tuples."""
    segments = []
    for words in word_specs:
        segments.append(dict(words=[make_word(*w) for w in words]))
    return WhisperResult(dict(segments=segments, language=language))


BASIC = [
    [(' Hello', 0.0, 0.5), (' world.', 0.6, 1.0)],
    [(' How', 1.5, 1.8), (' are', 1.9, 2.0), (' you?', 2.1, 2.5)],
]


class TestWordTiming:
    def test_rounding(self):
        w = WordTiming(' hi', 0.123456, 0.98765)
        assert w.start == 0.123
        assert w.end == 0.988
        w.start = 1.23456789
        assert w.start == 1.235

    def test_add_merges(self):
        a = WordTiming(' foo', 1.0, 2.0, probability=0.8, tokens=[1, 2])
        b = WordTiming('bar', 0.5, 1.5, probability=0.4, tokens=[3])
        c = a + b
        assert c.word == ' foobar'
        assert c.start == 0.5 and c.end == 2.0
        assert c.probability == pytest.approx(0.6)
        assert c.tokens == [1, 2, 3]

    def test_add_locks_or(self):
        a = WordTiming('a', 0, 1, left_locked=True)
        b = WordTiming('b', 1, 2, right_locked=True)
        c = a + b
        assert c.left_locked and c.right_locked

    def test_clamp_max(self):
        w = WordTiming('x', 0.0, 5.0)
        w.clamp_max(1.0)
        assert w.end == 1.0
        w = WordTiming('x', 0.0, 5.0)
        w.clamp_max(1.0, clip_start=True)
        assert w.start == 4.0

    def test_duration_and_len(self):
        w = WordTiming(' four', 1.0, 2.25)
        assert w.duration == 1.25
        assert len(w) == 5


class TestSegment:
    def test_derived_properties(self):
        seg = Segment(words=[make_word(' a', 0, 1, tokens=[5]),
                             make_word(' b', 1, 2, tokens=[6, 7])])
        assert seg.text == ' a b'
        assert seg.start == 0 and seg.end == 2
        assert seg.tokens == [5, 6, 7]
        assert seg.word_count() == 2
        assert seg.char_count() == 4

    def test_start_end_setters_delegate_to_words(self):
        seg = Segment(words=[make_word(' a', 0, 1), make_word(' b', 1, 2)])
        seg.start = 0.5
        seg.end = 1.5
        assert seg.words[0].start == 0.5
        assert seg.words[-1].end == 1.5

    def test_wordless_defaults(self):
        seg = Segment(start=1.0, end=2.0, text='hello', tokens=[1, 2])
        assert not seg.has_words
        assert seg.text == 'hello'
        assert seg.start == 1.0 and seg.end == 2.0

    def test_add_segments(self):
        s1 = Segment(words=[make_word(' a', 0, 1)])
        s2 = Segment(words=[make_word(' b', 1, 2)])
        merged = s1 + s2
        assert merged.text == ' a b'
        assert merged.start == 0 and merged.end == 2

    def test_add_mixed_words_raises(self):
        s1 = Segment(words=[make_word(' a', 0, 1)])
        s2 = Segment(start=1, end=2, text='b')
        with pytest.raises(ValueError):
            s1.add(s2)

    def test_split(self):
        seg = Segment(words=[make_word(' a', 0, 1), make_word(' b', 1, 2),
                             make_word(' c', 2, 3)])
        parts = seg.split([0])
        assert len(parts) == 2
        assert parts[0].text == ' a'
        assert parts[1].text == ' b c'

    def test_apply_min_dur_merges_short_words(self):
        seg = Segment(words=[make_word(' a', 0, 1), make_word(' b', 1, 1.01),
                             make_word(' c', 1.01, 2)])
        out = seg.apply_min_dur(0.1)
        assert out.word_count() == 2
        # original untouched
        assert seg.word_count() == 3

    def test_gap_indices(self):
        seg = Segment(words=[make_word(' a', 0, 1), make_word(' b', 1.5, 2),
                             make_word(' c', 2.05, 3)])
        assert seg.get_gap_indices(0.1) == [0]
        assert seg.get_gap_indices(0.01) == [0, 1]

    def test_gap_indices_respect_locks(self):
        seg = Segment(words=[make_word(' a', 0, 1), make_word(' b', 1.5, 2)])
        seg.words[0].lock_right()
        assert seg.get_gap_indices(0.1) == []

    def test_punctuation_indices(self):
        seg = Segment(words=[make_word(' a.', 0, 1), make_word(' b', 1, 2),
                             make_word(' c,', 2, 3), make_word(' d', 3, 4)])
        assert seg.get_punctuation_indices('.') == [0]
        assert seg.get_punctuation_indices([('.', ' ')]) == [0]
        assert seg.get_punctuation_indices([',']) == [2]

    def test_length_indices_even_split(self):
        words = [make_word(f' w{i}', i, i + 1) for i in range(10)]
        seg = Segment(words=words)
        indices = seg.get_length_indices(max_words=5)
        assert indices == [4]

    def test_duration_indices(self):
        words = [make_word(f' w{i}', i, i + 1) for i in range(10)]
        seg = Segment(words=words)
        indices = seg.get_duration_indices(max_dur=5)
        assert indices == [4]

    def test_locks_by_group(self):
        seg = Segment(words=[make_word(' a', 0, 1), make_word(' b', 1, 2),
                             make_word(' c', 2, 3)])
        seg.words[0].lock_right()
        groups = seg.words_by_lock(only_text=True)
        assert groups == [[' a', ' b']]


class TestWhisperResult:
    def test_init_from_dict(self):
        result = make_result(BASIC)
        assert len(result) == 2
        assert result.text == ' Hello world. How are you?'
        assert result.language == 'en'
        assert result.has_words

    def test_init_from_segment_list(self):
        result = WhisperResult([dict(words=[make_word(' a', 0, 1)])])
        assert result.text == ' a'

    def test_init_from_nested_word_lists(self):
        result = WhisperResult([[make_word(' a', 0, 1)], [make_word(' b', 1, 2)]])
        assert len(result) == 2

    def test_ids_assigned(self):
        result = make_result(BASIC)
        assert [s.id for s in result.segments] == [0, 1]
        assert [w.id for w in result[1].words] == [0, 1, 2]
        assert result[1][2].segment_id == 1

    def test_unsorted_raises(self):
        bad = dict(segments=[dict(words=[make_word(' a', 1.0, 0.5)])])
        with pytest.raises(UnsortedException):
            WhisperResult(bad, show_unsorted=False)

    def test_force_order_repairs(self):
        bad = dict(segments=[dict(words=[make_word(' a', 0, 1),
                                         make_word(' b', 0.5, 1.5)])])
        result = WhisperResult(bad, force_order=True)
        words = result.all_words()
        assert words[0].end <= words[1].start

    def test_split_by_gap(self):
        result = make_result([[(' a', 0, 1), (' b', 2, 3), (' c', 3.05, 4)]])
        result.split_by_gap(0.5)
        assert len(result) == 2
        assert result[0].text == ' a'
        assert result[1].text == ' b c'
        assert 'sg=0.5' in result.regroup_history

    def test_merge_by_gap(self):
        result = make_result([[(' a', 0, 1)], [(' b', 1.05, 2)], [(' c', 5, 6)]])
        result.merge_by_gap(0.1)
        assert len(result) == 2
        assert result[0].text == ' a b'

    def test_split_by_punctuation(self):
        result = make_result([[(' a.', 0, 1), (' b', 1, 2)]])
        result.split_by_punctuation(['.'])
        assert len(result) == 2

    def test_merge_by_punctuation(self):
        result = make_result([[(' a,', 0, 1)], [(' b', 1, 2)]])
        result.merge_by_punctuation([','])
        assert len(result) == 1

    def test_merge_all_segments(self):
        result = make_result(BASIC)
        result.merge_all_segments()
        assert len(result) == 1
        assert result.text == ' Hello world. How are you?'

    def test_split_by_length(self):
        words = [(f' {"x" * 5}', i, i + 1) for i in range(8)]
        result = make_result([words])
        result.split_by_length(max_words=4)
        assert len(result) == 2
        assert all(s.word_count() <= 4 for s in result.segments)

    def test_split_by_duration(self):
        words = [(f' w{i}', i, i + 1) for i in range(8)]
        result = make_result([words])
        result.split_by_duration(4)
        assert len(result) == 2

    def test_clamp_max(self):
        result = make_result([[(' a', 0, 10), (' b', 10, 10.5), (' c', 10.5, 11),
                               (' d', 11, 11.4)]])
        result.clamp_max(medium_factor=2.5)
        assert result[0][0].duration <= 2.5 * 0.5 + 1e-9

    def test_lock_by_suffix(self):
        result = make_result([[(' Mr.', 0, 1), (' Smith', 1, 2)]])
        result.lock(endswith='Mr.', right=True)
        assert result[0][0].right_locked
        result.split_by_gap(0.0)
        assert len(result) == 1  # lock prevented the split

    def test_unlock_all_segments(self):
        result = make_result([[(' a.', 0, 1), (' b', 1, 2)]])
        result.lock(endswith='.', right=True)
        result.unlock_all_segments()
        assert not result[0][0].right_locked

    def test_remove_word(self):
        result = make_result(BASIC)
        result.remove_word((0, 0), verbose=False)
        assert result[0].text == ' world.'

    def test_remove_segment(self):
        result = make_result(BASIC)
        result.remove_segment(0, verbose=False)
        assert len(result) == 1
        assert result[0].id == 0

    def test_remove_repetition(self):
        result = make_result([[(' the', 0, 1), (' the', 1, 2), (' cat', 2, 3)]])
        result.remove_repetition(verbose=False)
        assert result.text == ' the cat'
        assert result[0][0].end == 2  # duration extended

    def test_remove_words_by_str(self):
        result = make_result([[(' um,', 0, 1), (' hello', 1, 2)]])
        result.remove_words_by_str('um', verbose=False)
        assert result.text == ' hello'

    def test_pad(self):
        result = make_result([[(' a', 1.0, 2.0)], [(' b', 3.0, 4.0)]])
        result.pad(start_pad=0.5, end_pad=0.5, max_end=4.2)
        assert result[0].start == 0.5
        assert result[0].end == 2.5
        assert result[1].start == 2.5
        assert result[1].end == 4.2

    def test_fill_in_gaps(self):
        main = make_result([[(' a', 0, 1)], [(' d', 5, 6)]])
        other = make_result([[(' b', 2, 3), (' c', 3, 4)]])
        main.fill_in_gaps(other, verbose=False)
        assert main.text == ' a b c d'

    def test_adjust_gaps(self):
        result = make_result([[(' a', 0, 1.2)], [(' b', 2.2, 3)]])
        result.update_nonspeech_sections([1.0], [2.0])
        result.adjust_gaps()
        assert result[0].end == 1.0
        assert result[1].start == 2.0

    def test_convert_to_segment_level(self):
        result = make_result(BASIC)
        result.convert_to_segment_level()
        assert not result.has_words
        assert result.text == ' Hello world. How are you?'
        assert result[0].start == 0.0 and result[0].end == 1.0

    def test_custom_operation_remove(self):
        result = make_result([[(' keep', 0, 1), (' drop', 1, 2)]])
        result.custom_operation('word', '==', ' drop', 'remove', word_level=True)
        assert result.text == ' keep'

    def test_custom_operation_merge_on_len(self):
        result = make_result([[(' abc', 0, 1)], [(' defghij', 1, 2)]])
        result.custom_operation('len=text', '<', 5, 'mergeright', word_level=False)
        assert len(result) == 1

    def test_get_content_by_time(self):
        result = make_result(BASIC)
        words = result.get_content_by_time((0.55, 1.6))
        assert [w.word for w in words] == [' world.', ' How']
        within = result.get_content_by_time((0.55, 1.6), within=True)
        assert [w.word for w in within] == [' world.']

    def test_suppress_silence_moves_starts(self):
        # First word (keep_end=True since not last, no ending punctuation):
        # silence covering its start snaps the start forward.
        result = make_result([[(' a', 0.0, 1.0), (' b', 1.0, 2.0)]])
        result.suppress_silence(np.array([0.0]), np.array([0.4]), verbose=False)
        assert result[0][0].start == 0.4

    def test_adjust_by_result(self):
        a = make_result([[(' x', 0.0, 2.0)]])
        b = make_result([[(' x', 0.5, 1.0)]])
        a.adjust_by_result(b)
        assert a[0][0].start == 0.5
        assert a[0][0].end == 1.0

    def test_to_dict_roundtrip(self):
        result = make_result(BASIC)
        result.split_by_gap(0.5)
        d = result.to_dict()
        restored = WhisperResult(d)
        assert restored.text == result.text
        assert restored.regroup_history == result.regroup_history
        assert len(restored) == len(result)

    def test_reset_restores_original(self):
        result = make_result(BASIC)
        original_count = len(result)
        result.merge_all_segments()
        assert len(result) == 1
        result.reset()
        assert len(result) == original_count
        assert result.regroup_history == ''

    def test_deepcopy_independent(self):
        result = make_result(BASIC)
        clone = copy.deepcopy(result[0])
        clone.words[0].word = ' changed'
        assert result[0].words[0].word == ' Hello'

    def test_duration(self):
        result = make_result(BASIC)
        assert result.duration == 2.5


class TestRegroupDSL:
    def test_parse_positional_args(self):
        result = make_result(BASIC)
        ops = result.parse_regroup_algo('sg=.5+1', include_str=True)
        assert len(ops) == 1
        method, kwargs, msg = ops[0]
        assert method.__name__ == 'split_by_gap'
        assert kwargs == {'max_gap': 0.5, 'lock': 1}

    def test_parse_nested_punctuation(self):
        result = make_result(BASIC)
        ops = result.parse_regroup_algo('sp=.* /。/?/？+1')
        method, kwargs, _ = ops[0]
        assert kwargs['punctuation'] == [['.', ' '], '。', '?', '？']
        assert kwargs['lock'] == 1

    def test_default_algo_expansion(self):
        result = make_result(BASIC)
        ops = result.parse_regroup_algo('da')
        names = [m.__name__ for m, _, _ in ops]
        assert names == ['ignore_special_periods', 'clamp_max', 'split_by_punctuation',
                         'split_by_gap', 'split_by_punctuation', 'split_by_length',
                         'clamp_max']

    def test_regroup_default_runs(self):
        result = make_result(BASIC)
        result.regroup(True)
        assert result.regroup_history  # recorded
        assert result.text == ' Hello world. How are you?'

    def test_regroup_false_noop(self):
        result = make_result(BASIC)
        result.regroup(False)
        assert result.regroup_history == ''

    def test_history_replay(self):
        result = make_result([[(' a', 0, 1), (' b', 2, 3), (' c.', 3, 4), (' d', 5, 6)]])
        result.split_by_gap(0.5)
        history = result.regroup_history
        text_after = result.text
        count_after = len(result)
        result.reset()
        result.regroup(history)
        assert result.text == text_after
        assert len(result) == count_after

    def test_unknown_method_raises(self):
        result = make_result(BASIC)
        with pytest.raises(NotImplementedError):
            result.parse_regroup_algo('zz=1')

    def test_skipped_args_use_defaults(self):
        result = make_result(BASIC)
        ops = result.parse_regroup_algo('mg=.2+10+++1')
        _, kwargs, _ = ops[0]
        assert kwargs == {'min_gap': 0.2, 'max_words': 10, 'lock': 1}


class TestFind:
    def test_find_word_level(self):
        result = make_result(BASIC)
        matches = result.find(r'world')
        assert len(matches) == 1
        assert matches[0].text_match == 'world'
        assert matches[0].start == 0.6
        assert matches[0].end == 1.0

    def test_find_chained(self):
        result = make_result(BASIC)
        matches = result.find(r'How are you').find(r'are')
        assert len(matches) == 1
        assert matches[0].words[0].word == ' are'

    def test_find_no_match(self):
        result = make_result(BASIC)
        assert not result.find(r'zebra')
