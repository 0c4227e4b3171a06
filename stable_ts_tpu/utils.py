"""Small cross-cutting helpers (reference: stable_whisper/utils.py)."""
import inspect
import sys
from typing import Optional

_SYS_ENCODING = sys.getdefaultencoding()


def make_safe(string: str) -> str:
    """Replace characters unrepresentable in the console encoding with '?'."""
    if _SYS_ENCODING == 'utf-8':
        return string
    return string.encode(_SYS_ENCODING, errors='replace').decode(_SYS_ENCODING)


def safe_print(msg: str, _print=None):
    if msg:
        (_print or print)(make_safe(msg))


def str_to_valid_type(val: str):
    """Parse a regroup-DSL argument string into None/list/int/float/str.

    Mirrors the reference parser (utils.py:20-30): empty string -> None;
    '/' splits into a list whose items may be '*'-split into nested lists;
    otherwise numeric if possible ('.' selects float), else the raw string.
    """
    if len(val) == 0:
        return None
    if '/' in val:
        return [item.split('*') if '*' in item else item for item in val.split('/')]
    try:
        return float(val) if '.' in val else int(val)
    except ValueError:
        return val


def get_func_parameters(func):
    return inspect.signature(func).parameters.keys()


def isolate_useful_options(options: dict, method, pop: bool = False) -> dict:
    getter = dict.pop if pop else dict.get
    return {k: getter(options, k) for k in get_func_parameters(method) if k in options}


def update_options(_options: Optional[dict] = None, _reversed: bool = False, **kwargs) -> dict:
    if _options is None:
        _options = {}
    if _reversed:
        _options, kwargs = kwargs, _options
    _options.update(kwargs)
    return _options


def format_timestamp(seconds: float, always_include_hours: bool = False,
                     decimal_marker: str = '.') -> str:
    """Render seconds as [HH:]MM:SS.mmm (reference: utils.py:47-65)."""
    assert seconds >= 0, 'non-negative timestamp expected'
    ms = round(seconds * 1000.0)
    hours, ms = divmod(ms, 3_600_000)
    minutes, ms = divmod(ms, 60_000)
    secs, ms = divmod(ms, 1_000)
    hours_marker = f'{hours:02d}:' if always_include_hours or hours > 0 else ''
    return f'{hours_marker}{minutes:02d}:{secs:02d}{decimal_marker}{ms:03d}'


def exact_div(x: int, y: int) -> int:
    assert x % y == 0
    return x // y


class UnsortedException(Exception):
    """Raised when a result's timestamps are not in ascending order."""

    def __init__(self, message: Optional[str] = None, data: Optional[dict] = None):
        if not message:
            message = ('Timestamps are not in ascending order. '
                       'If data is produced by this library, please submit an issue.')
        super().__init__(message)
        self.data = data

    def get_data(self):
        return self.data
