"""Output-format tests: SRT/VTT/ASS/TSV/TXT/JSON byte-level structure."""
import json

import pytest

from stable_ts_tpu.result import WhisperResult
from stable_ts_tpu.text_output import load_result


def make_result():
    return WhisperResult(dict(
        language='en',
        segments=[
            dict(words=[
                dict(word=' Hello', start=0.0, end=0.5, probability=0.9, tokens=[1]),
                dict(word=' world.', start=0.6, end=1.0, probability=0.9, tokens=[2]),
            ]),
            dict(words=[
                dict(word=' Bye.', start=2.0, end=2.5, probability=0.9, tokens=[3]),
            ]),
        ],
    ))


class TestSrt:
    def test_segment_level_only(self):
        srt = make_result().to_srt_vtt(word_level=False)
        blocks = srt.split('\n\n')
        assert blocks[0] == '1\n00:00:00,000 --> 00:00:01,000\nHello world.'
        assert blocks[1] == '2\n00:00:02,000 --> 00:00:02,500\nBye.'

    def test_word_level_only(self):
        srt = make_result().to_srt_vtt(segment_level=False)
        blocks = srt.split('\n\n')
        assert blocks[0] == '1\n00:00:00,000 --> 00:00:00,500\nHello'

    def test_word_highlight_tags(self):
        srt = make_result().to_srt_vtt()
        assert '<font color="#00ff00">Hello</font> world.' in srt
        # gap filler block between words
        assert '00:00:00,500 --> 00:00:00,600' in srt

    def test_comma_decimal_marker(self):
        srt = make_result().to_srt_vtt(word_level=False, vtt=False)
        assert ',' in srt and '.' not in srt.replace('world.', '').replace('Bye.', '')


class TestVtt:
    def test_header_and_inline_tags(self):
        vtt = make_result().to_srt_vtt(vtt=True)
        assert vtt.startswith('WEBVTT\n\n')
        # Inline timestamp tags for word-level timing.
        assert '<00:00:00.500> <00:00:00.600>' in vtt

    def test_segment_level(self):
        vtt = make_result().to_srt_vtt(vtt=True, word_level=False)
        assert '00:00:00.000 --> 00:00:01.000\nHello world.' in vtt


class TestAss:
    def test_structure(self):
        ass = make_result().to_ass()
        assert '[Script Info]' in ass
        assert '[V4+ Styles]' in ass
        assert '[Events]' in ass
        # ASS second field is not zero-padded (matches reference formatting).
        assert 'Dialogue: 0,0:00:0.00,0:00:1.00,Default' in ass

    def test_karaoke_tags(self):
        ass = make_result().to_ass(karaoke=True)
        assert r'{\kf50}' in ass  # 0.5 s = 50 centiseconds

    def test_plain_k_tags(self):
        ass = make_result().to_ass()
        assert r'{\k50}' in ass


class TestTsv:
    def test_milliseconds(self):
        tsv = make_result().to_tsv()
        lines = tsv.split('\n\n')
        assert lines[0] == '0\t1000\tHello world.'
        assert lines[1] == '2000\t2500\tBye.'

    def test_word_level(self):
        tsv = make_result().to_tsv(segment_level=False, word_level=True)
        assert tsv.split('\n\n')[0] == '0\t500\tHello'


class TestTxt:
    def test_lines(self):
        txt = make_result().to_txt()
        assert txt == 'Hello world.\nBye.'


class TestJson:
    def test_roundtrip(self, tmp_path):
        result = make_result()
        result.split_by_gap(0.05)
        path = str(tmp_path / 'out.json')
        result.save_as_json(path)
        data = load_result(path)
        assert 'segments' in data and 'ori_dict' in data
        assert data['regroup_history'] == result.regroup_history
        restored = WhisperResult(path)
        assert restored.text == result.text
        assert restored.path == path

    def test_reset_from_ori_dict_after_load(self, tmp_path):
        result = make_result()
        result.merge_all_segments()
        path = str(tmp_path / 'out.json')
        result.save_as_json(path)
        restored = WhisperResult(path)
        assert len(restored) == 1
        restored.reset()
        assert len(restored) == 2


class TestMinDur:
    def test_short_words_merged_on_output(self):
        result = WhisperResult(dict(segments=[dict(words=[
            dict(word=' a', start=0.0, end=0.005, probability=0.9, tokens=[1]),
            dict(word=' b', start=0.005, end=1.0, probability=0.9, tokens=[2]),
        ])]))
        srt = result.to_srt_vtt(word_level=False, min_dur=0.02)
        # words merged into one block spanning the full duration
        assert '00:00:00,000 --> 00:00:01,000' in srt
        # original untouched
        assert result[0].word_count() == 2


class TestReverseText:
    def test_punctuation_swap_keeps_chronological_order(self):
        r = make_result()
        segs = r.segments_to_dicts(reverse_text=True)
        words = segs[0]['words']
        # words stay CHRONOLOGICAL (reference result.py:609-636 — display
        # order is reversed only at render time via the reversed_text
        # marker); leading spaces count as prepend-punctuation and flip to
        # the end of each word
        assert [w['word'] for w in words] == ['Hello ', '.world ']
        assert segs[0]['reversed_text'] is True
        assert words[0]['start'] == 0.0 and words[1]['start'] == 0.6
        # segment text is the reversed join (what an RTL line should read)
        assert segs[0]['text'] == '.world Hello '

    def test_render_reverses_display_order_not_timestamps(self):
        from stable_ts_tpu.text_output import words2segments
        r = make_result()
        segs = r.segments_to_dicts(reverse_text=True)
        rendered = words2segments(segs[0]['words'], ('<b>', '</b>'),
                                  reverse_text=segs[0]['reversed_text'])
        # cue times remain ascending; only the tag position within the
        # concatenated text moves
        times = [(s['start'], s['end']) for s in rendered]
        assert times == sorted(times)

    def test_srt_render_with_reverse_text(self):
        r = make_result()
        srt = r.to_srt_vtt(reverse_text=True, word_level=True,
                           segment_level=True)
        assert '-->' in srt  # renders without crashing, tags present
        assert '<font' in srt

    def test_plain_to_dict_unchanged(self):
        r = make_result()
        segs = r.segments_to_dicts()
        assert [w['word'] for w in segs[0]['words']] == [' Hello', ' world.']
        assert 'reversed_text' not in segs[0]
