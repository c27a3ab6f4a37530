"""Document analysis chain: tokenize → (optionally) stem → count with
positions.

This is the single shared implementation used by BOTH the Spark pandas
UDFs (searchengine_spark/text/udfs.py) and the single-node oracle
(searchengine_spark/oracle), so engine and oracle are term-identical by
construction.  Mirrors the reference chain tokenize → stem_tokens →
word_count (makeindex.py:216-224, lib/tokenize.py:16-62,
lib/word_count.py:6-16).
"""

from .tokenizer import tokenize
from .porter import porter_stem


def analyze(text, stem=True, _memo=None):
    """Return the list of analyzed terms in document order.

    ``_memo`` lets callers share a stem cache across a batch of documents
    (the stemmer is a pure function, so memoization is sound).
    """
    tokens = tokenize(text)
    if not stem:
        return tokens
    memo = _memo if _memo is not None else {}
    out = []
    for t in tokens:
        s = memo.get(t)
        if s is None:
            s = porter_stem(t)
            memo[t] = s
        out.append(s)
    return out


def analyze_counts(text, stem=True, _memo=None):
    """Return ``{term: (tf, [positions...])}`` with 1-based positions.

    Per-doc TF is computed here, map-side, so the Spark pipeline never
    shuffles raw token occurrences (the reference builds the same per-doc
    counts in-memory, lib/word_count.py:6-16); only the already-aggregated
    (doc, term, tf, positions) rows move.
    """
    counts = {}
    for pos, term in enumerate(analyze(text, stem=stem, _memo=_memo), 1):
        ent = counts.get(term)
        if ent is None:
            counts[term] = [1, [pos]]
        else:
            ent[0] += 1
            ent[1].append(pos)
    return {t: (tf, ps) for t, (tf, ps) in counts.items()}
