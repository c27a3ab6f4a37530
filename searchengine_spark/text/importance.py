"""Important-token extraction — code-corpus analogue of the reference's
HTML tag priorities (SURVEY.md P2; makeindex.py:159-174, lib/params.py:9-19).

The reference assigns each token the priority of the first matching
"important" tag (title > h1 > ... > mark).  For source code the analogue
(SURVEY.md P2) is: tokens from the file path rank like <title>; tokens on
definition lines (def/class/function signatures) rank like headers.

NOTE (parity): the reference's indexer has a load-bearing typo
(makeindex.py:234 assigns a local ``importance`` instead of ``important``)
so every posting it writes carries important=0 and the query-time
multiplier is a constant that cancels in ranking (SURVEY.md P13).  The
engine reproduces that by default — ``make_analyze_partition`` emits 0 —
and this module is the working implementation a non-bug-compatible
deployment can switch on (pass ``importance_fn`` to the analyze UDF).
"""

import re

# priority slots mirror the reference tag list order (lib/params.py:9-19):
# index 1 = title-analogue (path tokens), 2 = h1-analogue (def/class), ...
PATH_PRIORITY = 1
DEF_PRIORITY = 2
SIG_PRIORITY = 5

_DEF_LINE = re.compile(
    r"^\s*(def|class|function|struct|interface|public|protected|private)\b",
    re.IGNORECASE,
)
_SIG_LINE = re.compile(r"^\s*(static|void|const|export|module)\b",
                       re.IGNORECASE)
_PATH_SPLIT = re.compile(r"[a-z0-9]+")


TITLE_TOKENS = 8


def extract_importance_text(content: str, path: str = "",
                            n_title: int = TITLE_TOKENS) -> dict:
    """Plain-text variant: the document's first ``n_title`` tokens rank
    like ``<title>`` (the reference's highest tag) in addition to the
    code-corpus rules — untagged prose has no markup, but its opening
    tokens play the title's role.  Min priority wins, as everywhere."""
    out = extract_importance(content, path)
    for tok in _PATH_SPLIT.findall(content.lower())[:n_title]:
        if tok not in out or PATH_PRIORITY < out[tok]:
            out[tok] = PATH_PRIORITY
    return out


def extract_importance(content: str, path: str = "") -> dict:
    """token → 4-bit priority (first match wins, makeindex.py:229-235).

    Lower index = more important, matching the reference's tag order;
    tokens not found anywhere important map to 0 (absent from the dict).
    """
    out = {}
    for tok in _PATH_SPLIT.findall(path.lower()):
        out.setdefault(tok, PATH_PRIORITY)
    # line = '\n'-separated, pinned: the SQL oracle mirrors this with
    # string_split(content, chr(10)), and str.splitlines() would also
    # split on \r \v \f  … — a doc with a lone \r before 'def'
    # would then diverge between the engines
    for line in content.split("\n"):
        if _DEF_LINE.match(line):
            pr = DEF_PRIORITY
        elif _SIG_LINE.match(line):
            pr = SIG_PRIORITY
        else:
            continue
        for tok in _PATH_SPLIT.findall(line.lower()):
            if tok not in out or pr < out[tok]:
                out[tok] = pr
    return out
