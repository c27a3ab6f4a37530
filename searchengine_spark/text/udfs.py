"""Vectorized (Arrow-batched) UDFs for the ingest pipeline.

Per the input_hint: pandas/Arrow batching throughout, no per-row Python
UDFs in the hot path.  Each function here is a ``mapInPandas`` iterator
(batch-in, batch-out) so token explosion happens inside the worker without
ever shuffling raw token occurrences — per-doc TF/positions are computed
map-side (the reference builds the same per-doc counts in memory,
lib/word_count.py:6-16, makeindex.py:223-243).
"""

import pandas as pd

from .analyze import analyze_counts
from .simhash import simhash32
from .tokenizer import tokenize

# output schema of analyze_partition (postings rows, pre-aggregated per doc)
POSTINGS_SCHEMA = (
    "docid long, term string, tf int, positions array<int>, "
    "important tinyint, total_tokens int"
)

SIMHASH_SCHEMA = "docid long, fingerprint long"


def make_analyze_partition(stem=True):
    """Build a mapInPandas fn: (docid, content) batches → postings rows.

    Emits one row per (doc, distinct term) with tf, 1-based positions, the
    constant important=0 field (reference quirk, makeindex.py:229-241 —
    SURVEY.md P13), and the doc's total_tokens (distinct-term count,
    makeindex.py:223-224 quirk) denormalized onto every row so the docs
    table derives without a second content scan.

    ``stem=False`` is the SQL-mirrorable variant (DuckDB has no Porter
    stemmer) used by the driver-checked flat index path.
    """

    def analyze_partition(batches):
        memo = {}
        for pdf in batches:
            out = {
                "docid": [], "term": [], "tf": [], "positions": [],
                "important": [], "total_tokens": [],
            }
            for docid, content in zip(pdf["docid"], pdf["content"]):
                counts = analyze_counts(content, stem=stem, _memo=memo)
                nterms = len(counts)
                for term, (tf, positions) in counts.items():
                    out["docid"].append(docid)
                    out["term"].append(term)
                    out["tf"].append(tf)
                    out["positions"].append(positions)
                    out["important"].append(0)
                    out["total_tokens"].append(nterms)
            yield pd.DataFrame(out)

    return analyze_partition


analyze_partition = make_analyze_partition(stem=True)


def simhash_partition(batches):
    """mapInPandas: (docid, content) → 32-bit simhash fingerprints.

    Fingerprint is over UNSTEMMED token counts, matching the reference's
    ordering (simhash at makeindex.py:201 runs before stemming at :221).
    """
    for pdf in batches:
        docids, fps = [], []
        for docid, content in zip(pdf["docid"], pdf["content"]):
            wc = {}
            for t in tokenize(content):
                wc[t] = wc.get(t, 0) + 1
            docids.append(docid)
            fps.append(simhash32(wc))
        yield pd.DataFrame({"docid": docids, "fingerprint": fps})
