"""Deterministic regex tokenizer.

Role: analogue of the reference's Treebank span tokenizer + lowercase/strip
(reference lib/tokenize.py:16-45).  NLTK is unavailable here, so the engine
pins its own tokenizer spec — chosen to be expressible identically in Spark
(``regexp_extract_all``), DuckDB (``regexp_extract_all`` + ``unnest``) and
pure Python (``re.findall``), which is what makes the driver's DuckDB
oracle checks byte-exact:

    token := maximal run of [a-z0-9] over the lowercased text
    position := 1-based token index within the document

This handles the reference's code-literal fixture
(``print("Hello world!")`` → ``print hello world`` — TEST.txt:301-316)
without emitting punctuation tokens.
"""

import re

TOKEN_PATTERN = r"[a-z0-9]+"
_TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokenize(text):
    """Lowercase the text and return the list of tokens."""
    return _TOKEN_RE.findall(text.lower())


def tokenize_with_positions(text):
    """Return list of (token, position) with 1-based positions."""
    return [(t, i) for i, t in enumerate(tokenize(text), 1)]


def ngrams(tokens, n):
    """Build n-grams joined by a single space, analogue of the reference's
    n-gram extension (lib/tokenize.py:33-43, 48-54 — dead path, n=1 default).
    """
    if n <= 1 or len(tokens) < n:
        return []
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
