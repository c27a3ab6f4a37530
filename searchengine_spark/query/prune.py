"""Query-side term pruning heuristics (reference lib/queryproc.py:165-233).

Shared verbatim by the single-node oracle and the Spark engine — query
strings are tiny, so this stage legitimately runs driver-side in both;
sharing one implementation makes engine/oracle prune behavior identical
by construction.

Semantics (all cited to the reference):
 - iterate unique query terms in sorted order (lib/queryproc.py:195)
 - df == 0 → drop the term; alphanumeric drops count toward
   ``prune_count`` weighted by query tf (lib/queryproc.py:198-201)
 - abort (return None) when prune_count > 2 * valid_count
   (lib/queryproc.py:219)
 - stopwords are removed, pushed on a heap ordered (df, tf, term)
   (lib/queryproc.py:205-214); when stopwords are significant
   (n_stop >= 0.4 * n_unique_valid) the k = floor(log2(n_stop))
   least-df ones are readmitted (lib/queryproc.py:226-230)
"""

import math
from collections import defaultdict

from ..params import PRUNE_ABORT_RATIO, STOPWORD_SIGNIFICANCE
from ..text.analyze import analyze
from ..text.stopwords import is_stopword


def analyze_query(query, _memo=None, stem=True):
    """Query string → {stemmed term: tf} (reference lib/queryproc.py:172-174).

    ``stem=False`` is the SQL-oracle-able variant: raw regex tokens, so
    DuckDB can mirror the whole query pipeline (no Porter offline).
    """
    freq = defaultdict(int)
    for t in analyze(query, stem=stem, _memo=_memo):
        freq[t] += 1
    return dict(freq)


def prune_query_terms(frequencies, df_lookup):
    """Apply unknown-term and stopword pruning.

    :param frequencies: {term: query tf}
    :param df_lookup: callable term -> corpus document frequency
    :return: final {term: tf} (possibly empty) or None when the query
             aborts on the pruned>2*valid heuristic
    """
    frequencies = dict(frequencies)
    prune_count = 0
    valid_count = 0
    num_valid_tokens = 0
    stop_heap = []

    for token in sorted(frequencies):
        dfv = df_lookup(token)
        if dfv == 0:
            if token.isalnum():
                prune_count += frequencies[token]
            del frequencies[token]
            continue
        num_valid_tokens += 1
        valid_count += frequencies[token]
        if is_stopword(token):
            stop_heap.append((dfv, frequencies[token], token))
            del frequencies[token]

    if prune_count > valid_count * PRUNE_ABORT_RATIO:
        return None

    n_stop = len(stop_heap)
    if n_stop > 0 and not (n_stop < num_valid_tokens * STOPWORD_SIGNIFICANCE):
        stop_heap.sort()
        for _dfv, tf, token in stop_heap[: int(math.log2(n_stop))]:
            frequencies[token] = tf

    return frequencies
