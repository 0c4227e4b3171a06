"""Subtitle / text serialization: SRT, VTT, ASS, TSV, TXT, JSON.

Behavioral counterpart of /root/reference/stable_whisper/text_output.py with
the same byte-level output formats, including the word-level tag renderings:
SRT per-word highlight segments, VTT inline ``<ts>`` tags, and ASS ``{\\k}``
karaoke tags.
"""
import json
import os
import warnings
from itertools import chain
from typing import Callable, List, Optional, Tuple, Union

from .stabilization.utils import valid_ts

__all__ = ['result_to_srt_vtt', 'result_to_ass', 'result_to_tsv', 'result_to_txt',
           'save_as_json', 'load_result']

SUPPORTED_FORMATS = ('srt', 'vtt', 'ass', 'tsv', 'txt')


# -- time renderers ------------------------------------------------------------

def sec2hhmmss(seconds: Union[float, int]):
    mm, ss = divmod(seconds, 60)
    hh, mm = divmod(mm, 60)
    return hh, mm, ss


def sec2milliseconds(seconds: Union[float, int]) -> int:
    return round(seconds * 1000)


def sec2centiseconds(seconds: Union[float, int]) -> int:
    return round(seconds * 100)


def sec2vtt(seconds: Union[float, int]) -> str:
    hh, mm, ss = sec2hhmmss(seconds)
    return f'{hh:0>2.0f}:{mm:0>2.0f}:{ss:0>6.3f}'


def sec2srt(seconds: Union[float, int]) -> str:
    return sec2vtt(seconds).replace('.', ',')


def sec2ass(seconds: Union[float, int]) -> str:
    hh, mm, ss = sec2hhmmss(seconds)
    return f'{hh:0>1.0f}:{mm:0>2.0f}:{ss:0>2.2f}'


# -- block renderers ---------------------------------------------------------------

def finalize_text(text: str, strip: bool = True) -> str:
    if not strip:
        return text
    return text.strip().replace('\n ', '\n')


def segment2vttblock(segment: dict, strip: bool = True) -> str:
    return (f'{sec2vtt(segment["start"])} --> {sec2vtt(segment["end"])}\n'
            f'{finalize_text(segment["text"], strip)}')


def segment2srtblock(segment: dict, idx: int, strip: bool = True) -> str:
    return (f'{idx}\n{sec2srt(segment["start"])} --> {sec2srt(segment["end"])}\n'
            f'{finalize_text(segment["text"], strip)}')


def segment2assblock(segment: dict, idx: int, strip: bool = True) -> str:
    return (f'Dialogue: {idx},{sec2ass(segment["start"])},{sec2ass(segment["end"])},'
            f'Default,,0,0,0,,{finalize_text(segment["text"], strip)}')


def segment2tsvblock(segment: dict, strip: bool = True) -> str:
    text = segment['text'].strip() if strip else segment['text']
    return (f'{sec2milliseconds(segment["start"])}'
            f'\t{sec2milliseconds(segment["end"])}'
            f'\t{text}')


# -- word-level renderings ----------------------------------------------------------

def words2segments(words: List[dict], tag: Tuple[str, str],
                   reverse_text: bool = False) -> List[dict]:
    """One sub-segment per word (plus gap fillers), with ``tag`` highlighting it."""
    def render(highlight_idx: int) -> str:
        parts = []
        for idx, w in idx_filled_words:
            if w['word'] not in ('', ' ') and idx == highlight_idx:
                if w['word'].startswith(' '):
                    parts.append(f" {tag[0]}{w['word'][1:]}{tag[1]}")
                else:
                    parts.append(f"{tag[0]}{w['word']}{tag[1]}")
            else:
                parts.append(w['word'])
        return ''.join(parts)

    filled_words = []
    for i, word in enumerate(words):
        curr_end = round(word['end'], 3)
        filled_words.append(dict(word=word['word'], start=round(word['start'], 3), end=curr_end))
        if word != words[-1]:
            next_start = round(words[i + 1]['start'], 3)
            if next_start - curr_end != 0:
                filled_words.append(dict(word='', start=curr_end, end=next_start))
    idx_filled_words = list(enumerate(filled_words))
    if reverse_text:
        idx_filled_words = list(reversed(idx_filled_words))

    return [dict(text=render(i), start=filled_words[i]['start'], end=filled_words[i]['end'])
            for i in range(len(filled_words))]


def to_word_level_segments(segments: List[dict], tag: Tuple[str, str]) -> List[dict]:
    return list(chain.from_iterable(
        words2segments(s['words'], tag, reverse_text=s.get('reversed_text'))
        for s in segments
    ))


def to_vtt_word_level_segments(segments: List[dict],
                               tag: Optional[Tuple[str, str]] = None) -> List[dict]:
    """VTT inline cue timestamps: ``word<00:00:01.000> next``."""
    def render(segment: dict) -> str:
        out = ''
        prev_end = 0
        for i, word in enumerate(segment['words']):
            if i != 0:
                curr_start = word['start']
                if prev_end == curr_start:
                    out += f'<{sec2vtt(curr_start)}>'
                else:
                    if out.endswith(' '):
                        out = out[:-1]
                    elif segment['words'][i]['word'].startswith(' '):
                        segment['words'][i]['word'] = segment['words'][i]['word'][1:]
                    out += f'<{sec2vtt(prev_end)}> <{sec2vtt(curr_start)}>'
            out += word['word']
            prev_end = word['end']
        return out

    return [dict(text=render(s), start=s['start'], end=s['end']) for s in segments]


def to_ass_word_level_segments(segments: List[dict], tag: Tuple[str, str],
                               karaoke: bool = False) -> List[dict]:
    r"""ASS ``{\k<centisec>}`` (or ``{\kf}`` for progressive fill) word timing tags."""
    def render(segment: dict) -> str:
        out = ''
        for word in segment['words']:
            if word['word'].startswith(' '):
                curr_word, space = word['word'][1:], ' '
            else:
                curr_word, space = word['word'], ''
            duration_cs = sec2centiseconds(word['end'] - word['start'])
            out += (space + r'{\k' + ('f' if karaoke else '') + f'{duration_cs}' + r'}'
                    + curr_word)
        return out

    return [dict(text=render(s), start=s['start'], end=s['end']) for s in segments]


def to_word_level(segments: List[dict]) -> List[dict]:
    return [dict(text=w['word'], start=w['start'], end=w['end'])
            for s in segments for w in s['words']]


# -- dispatch ------------------------------------------------------------------------

def _save_as_file(content: str, path: str):
    with open(path, 'w', encoding='utf-8') as f:
        f.write(content)
    print(f'Saved: {os.path.abspath(path)}')


def _get_segments(result, min_dur: float, reverse_text: Union[bool, tuple] = False):
    if isinstance(result, dict):
        if reverse_text:
            warnings.warn('``reverse_text=True`` only applies to WhisperResult '
                          f'but result is {type(result)}')
        return result.get('segments')
    if not isinstance(result, list) and callable(getattr(result, 'segments_to_dicts', None)):
        return result.apply_min_dur(min_dur, inplace=False).segments_to_dicts(
            reverse_text=reverse_text)
    return result


def _confirm_word_level(segments: List[dict]) -> bool:
    if not all(bool(s.get('words')) for s in segments):
        warnings.warn('Result is missing word timestamps. Word-level timing cannot be '
                      'exported. Use ``word_level=False`` to avoid this warning.')
        return False
    return True


def result_to_any(result,
                  filepath: Optional[str] = None,
                  filetype: Optional[str] = None,
                  segments2blocks: Optional[Callable] = None,
                  segment_level: bool = True,
                  word_level: bool = True,
                  min_dur: float = 0.02,
                  tag: Optional[Tuple[str, str]] = None,
                  default_tag: Optional[Tuple[str, str]] = None,
                  strip: bool = True,
                  reverse_text: Union[bool, tuple] = False,
                  to_word_level_string_callback: Optional[Callable] = None):
    """Render ``result`` to a subtitle/text format; save if ``filepath`` given."""
    assert segment_level or word_level, '`segment_level` or `word_level` must be True'
    segments = _get_segments(result, min_dur, reverse_text=reverse_text)
    if word_level:
        word_level = _confirm_word_level(segments)

    if filetype is None:
        filetype = os.path.splitext(filepath)[-1][1:] or 'srt'
    if filetype.lower() not in SUPPORTED_FORMATS:
        raise NotImplementedError(f'{filetype} not supported')
    if filepath and not filepath.lower().endswith(f'.{filetype}'):
        filepath += f'.{filetype}'

    if word_level and segment_level:
        if tag is None:
            if default_tag is None:
                tag = (('<font color="#00ff00">', '</font>') if filetype == 'srt'
                       else ('<u>', '</u>'))
            else:
                tag = default_tag
        if to_word_level_string_callback is None:
            to_word_level_string_callback = to_word_level_segments
        segments = to_word_level_string_callback(segments, tag)
    elif word_level:
        segments = to_word_level(segments)

    if not valid_ts(segments, warn=False):
        warnings.warn('Result contains out of order timestamp(s). '
                      'Output file may not playback properly.')

    if segments2blocks is None:
        sub_str = '\n\n'.join(segment2srtblock(s, i, strip=strip)
                              for i, s in enumerate(segments, 1))
    else:
        sub_str = segments2blocks(segments)

    if filepath:
        _save_as_file(sub_str, filepath)
        return None
    return sub_str


def result_to_srt_vtt(result,
                      filepath: Optional[str] = None,
                      segment_level: bool = True,
                      word_level: bool = True,
                      min_dur: float = 0.02,
                      tag: Optional[Tuple[str, str]] = None,
                      vtt: Optional[bool] = None,
                      strip: bool = True,
                      reverse_text: Union[bool, tuple] = False):
    """Generate SRT/VTT subtitles with optional word-level highlighting."""
    is_srt = (filepath is None or not filepath.lower().endswith('.vtt')) if vtt is None else not vtt
    if is_srt:
        segments2blocks = None
        to_word_level_string_callback = None
    else:
        def segments2blocks(segments):
            return 'WEBVTT\n\n' + '\n\n'.join(segment2vttblock(s, strip=strip)
                                              for s in segments)
        to_word_level_string_callback = to_vtt_word_level_segments if tag is None else None

    return result_to_any(
        result=result,
        filepath=filepath,
        filetype=('vtt', 'srt')[is_srt],
        segments2blocks=segments2blocks,
        segment_level=segment_level,
        word_level=word_level,
        min_dur=min_dur,
        tag=tag,
        strip=strip,
        reverse_text=reverse_text,
        to_word_level_string_callback=to_word_level_string_callback,
    )


def result_to_tsv(result,
                  filepath: Optional[str] = None,
                  segment_level: Optional[bool] = None,
                  word_level: Optional[bool] = None,
                  min_dur: float = 0.02,
                  strip: bool = True,
                  reverse_text: Union[bool, tuple] = False):
    """Generate TSV (start-ms, end-ms, text) lines."""
    if segment_level is None and word_level is None:
        segment_level = True
    assert word_level is not segment_level, \
        '[word_level] and [segment_level] cannot be the same since [tag] is not supported'

    def segments2blocks(segments):
        return '\n\n'.join(segment2tsvblock(s, strip=strip) for s in segments)

    return result_to_any(
        result=result,
        filepath=filepath,
        filetype='tsv',
        segments2blocks=segments2blocks,
        segment_level=segment_level,
        word_level=word_level,
        min_dur=min_dur,
        strip=strip,
        reverse_text=reverse_text,
    )


_ASS_DEFAULT_STYLE = {
    'Name': 'Default', 'Fontname': 'Arial', 'Fontsize': '48',
    'PrimaryColour': '&Hffffff', 'SecondaryColour': '&Hffffff',
    'OutlineColour': '&H0', 'BackColour': '&H0', 'Bold': '0', 'Italic': '0',
    'Underline': '0', 'StrikeOut': '0', 'ScaleX': '100', 'ScaleY': '100',
    'Spacing': '0', 'Angle': '0', 'BorderStyle': '1', 'Outline': '1',
    'Shadow': '0', 'Alignment': '2', 'MarginL': '10', 'MarginR': '10',
    'MarginV': '10', 'Encoding': '0',
}


def result_to_ass(result,
                  filepath: Optional[str] = None,
                  segment_level: bool = True,
                  word_level: bool = True,
                  min_dur: float = 0.02,
                  tag: Union[Tuple[str, str], int, None] = None,
                  font: Optional[str] = None,
                  font_size: int = 24,
                  strip: bool = True,
                  highlight_color: Optional[str] = None,
                  karaoke: bool = False,
                  reverse_text: Union[bool, tuple] = False,
                  **kwargs):
    """Generate an Advanced SubStation Alpha (ASS) subtitle file."""
    if tag == ['-1']:  # CLI passes tags as string lists
        tag = -1
    if highlight_color is None:
        highlight_color = '00ff00'

    def segments2blocks(segments):
        style = dict(_ASS_DEFAULT_STYLE)
        for k in list(kwargs):
            if 'colour' in k.lower() and not str(kwargs[k]).startswith('&H'):
                kwargs[k] = f'&H{kwargs[k]}'
        style.update((k, v) for k, v in kwargs.items() if k in style)
        if tag is None and 'PrimaryColour' not in kwargs:
            style['PrimaryColour'] = (highlight_color if highlight_color.startswith('&H')
                                      else f'&H{highlight_color}')
        if font:
            style['Fontname'] = font
        if font_size:
            style['Fontsize'] = font_size

        fmts = f'Format: {", ".join(map(str, style.keys()))}'
        styles = f'Style: {",".join(map(str, style.values()))}'
        sub_str = (
            '[Script Info]\nScriptType: v4.00+\nPlayResX: 384\nPlayResY: 288\n'
            'ScaledBorderAndShadow: yes\n\n'
            f'[V4+ Styles]\n{fmts}\n{styles}\n\n'
            '[Events]\nFormat: Layer, Start, End, Style, Name, MarginL, MarginR, '
            'MarginV, Effect, Text\n\n'
        )
        sub_str += '\n'.join(segment2assblock(s, i, strip=strip)
                             for i, s in enumerate(segments))
        return sub_str

    if tag is not None and karaoke:
        warnings.warn('``tag`` is not supported for ``karaoke=True``; it will be ignored.')

    return result_to_any(
        result=result,
        filepath=filepath,
        filetype='ass',
        segments2blocks=segments2blocks,
        segment_level=segment_level,
        word_level=word_level,
        min_dur=min_dur,
        tag=None if tag == -1 else tag,
        default_tag=(r'{\1c' + f'{highlight_color}&' + '}', r'{\r}'),
        strip=strip,
        reverse_text=reverse_text,
        to_word_level_string_callback=(
            (lambda s, t: to_ass_word_level_segments(s, t, karaoke=karaoke))
            if karaoke or (word_level and segment_level and tag is None)
            else None
        ),
    )


def result_to_txt(result,
                  filepath: Optional[str] = None,
                  min_dur: float = 0.02,
                  strip: bool = True,
                  reverse_text: Union[bool, tuple] = False):
    """Generate plain text (one segment per line, no timestamps)."""
    def segments2blocks(segments) -> str:
        return '\n'.join(s['text'].strip() if strip else s['text'] for s in segments)

    return result_to_any(
        result=result,
        filepath=filepath,
        filetype='txt',
        segments2blocks=segments2blocks,
        segment_level=True,
        word_level=False,
        min_dur=min_dur,
        strip=strip,
        reverse_text=reverse_text,
    )


def save_as_json(result, path: str, ensure_ascii: bool = False, **kwargs):
    """Serialize ``result`` (dict or WhisperResult) to a JSON file."""
    if not isinstance(result, dict) and callable(getattr(result, 'to_dict')):
        result = result.to_dict()
    if not path.lower().endswith('.json'):
        path += '.json'
    _save_as_file(json.dumps(result, allow_nan=True, ensure_ascii=ensure_ascii, **kwargs),
                  path)


def load_result(json_path: str) -> dict:
    """Load a result dict previously saved with :func:`save_as_json`."""
    with open(json_path, 'r', encoding='utf-8') as f:
        return json.load(f)
