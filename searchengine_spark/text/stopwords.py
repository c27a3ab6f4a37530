"""Stopword set (analogue of reference lib/stopwords.py:6-22).

174-word list shipped verbatim from the reference's rsrc/stopwords.txt.
"""

from pathlib import Path

_RSRC = Path(__file__).resolve().parent.parent / "rsrc" / "stopwords.txt"

STOPWORDS = frozenset(
    w.strip() for w in _RSRC.read_text().splitlines() if w.strip()
)


def is_stopword(word):
    return word in STOPWORDS
