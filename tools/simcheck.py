#!/usr/bin/env python
"""Normalized line-level similarity vs the reference.

Usage: python tools/simcheck.py <repo_file> <reference_file>

Normalization: tokenize-based — comments and docstrings removed, code
lines whitespace-collapsed. Reports both the difflib sequence ratio and
the fraction of repo lines that appear verbatim in the reference
(line-identity), plus the longest common block.
"""
import difflib
import io
import re
import sys
import tokenize


def norm_lines(path):
    src = open(path, 'rb').read()
    toks = list(tokenize.tokenize(io.BytesIO(src).readline))
    drop_lines = set()
    keep = {}
    prev_significant = None
    for tok in toks:
        if tok.type == tokenize.COMMENT:
            continue
        if tok.type == tokenize.STRING:
            # docstring heuristic: a STRING token that starts a logical
            # line (expression statement) — previous significant token is
            # NEWLINE/INDENT/DEDENT or nothing
            if prev_significant in (None, tokenize.NEWLINE,
                                    tokenize.INDENT, tokenize.DEDENT):
                for ln in range(tok.start[0], tok.end[0] + 1):
                    drop_lines.add(ln)
                prev_significant = tokenize.NEWLINE
                continue
        if tok.type not in (tokenize.NL, tokenize.NEWLINE,
                            tokenize.INDENT, tokenize.DEDENT,
                            tokenize.ENCODING, tokenize.ENDMARKER):
            for ln in range(tok.start[0], tok.end[0] + 1):
                keep.setdefault(ln, True)
            prev_significant = tok.type
        elif tok.type in (tokenize.NEWLINE, tokenize.INDENT,
                          tokenize.DEDENT):
            prev_significant = tok.type
    lines = src.decode('utf-8', errors='replace').splitlines()
    out = []
    for i, line in enumerate(lines, 1):
        if i in drop_lines or i not in keep:
            continue
        s = re.sub(r'\s+', ' ', line.split('#')[0].strip())
        if s:
            out.append(s)
    return out


def report(a, b):
    la, lb = norm_lines(a), norm_lines(b)
    sm = difflib.SequenceMatcher(a=la, b=lb, autojunk=False)
    ratio = sm.ratio()
    ident = sum(1 for s in la if s in set(lb))
    blocks = [m.size for m in sm.get_matching_blocks() if m.size >= 6]
    return ratio, ident, len(la), len(lb), blocks


if __name__ == '__main__':
    r, ident, na, nb, blocks = report(sys.argv[1], sys.argv[2])
    print(f'{sys.argv[1]}: ratio {r:.3f}  line-identical {ident}/{na} '
          f'(ref {nb})  blocks>=6: {blocks[:10]}')
