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


def make_analyze_partition(stem=True, importance_fn=None):
    """Build a mapInPandas fn: (docid, content [, path]) batches →
    postings rows.

    Emits one row per (doc, distinct term) with tf, 1-based positions,
    the important field, and the doc's total_tokens (distinct-term
    count, makeindex.py:223-224 quirk) denormalized onto every row so
    the docs table derives without a second content scan.

    ``important`` defaults to the constant 0 — the reference's
    load-bearing indexer typo (makeindex.py:229-241, SURVEY.md P13).
    Pass ``importance_fn`` (e.g. text.importance.extract_importance) to
    enable the working P2 analogue; it receives (content, path) and the
    input batch must then carry a ``path`` column.

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
            paths = pdf["path"] if importance_fn is not None else None
            for i, (docid, content) in enumerate(
                zip(pdf["docid"], pdf["content"])
            ):
                counts = analyze_counts(content, stem=stem, _memo=memo)
                nterms = len(counts)
                imp = None
                if importance_fn is not None:
                    raw = importance_fn(content, paths.iloc[i])
                    if stem:
                        # align with the stemmed term space (first/min
                        # priority wins when stems collide)
                        from .porter import porter_stem

                        imp = {}
                        for w, pr in raw.items():
                            s = memo.get(w)
                            if s is None:
                                s = memo[w] = porter_stem(w)
                            if s not in imp or pr < imp[s]:
                                imp[s] = pr
                    else:
                        imp = raw
                for term, (tf, positions) in counts.items():
                    out["docid"].append(docid)
                    out["term"].append(term)
                    out["tf"].append(tf)
                    out["positions"].append(positions)
                    out["important"].append(
                        imp.get(term, 0) if imp is not None else 0
                    )
                    out["total_tokens"].append(nterms)
            yield pd.DataFrame(out)

    return analyze_partition


analyze_partition = make_analyze_partition(stem=True)


def make_analyze_partition_arrow(stem=True, importance_fn=None):
    """Arrow-native analyze for ``mapInArrow`` — the hot-path variant.

    Same values as make_analyze_partition (asserted by
    tests/test_text.py::test_arrow_analyze_equivalence); the difference
    is purely mechanical: output columns are built as flat buffers +
    list offsets and handed to pyarrow directly, skipping the
    pandas-object-column → Arrow inference pass, which dominates the
    stage cost at ~130 output rows per document.

    ``importance_fn`` mirrors make_analyze_partition: when set, the
    input batch must carry a ``path`` column and the ``important``
    field carries the extracted per-term priority instead of the
    reference-parity constant 0.
    """
    import numpy as np
    import pyarrow as pa

    out_schema = pa.schema([
        ("docid", pa.int64()),
        ("term", pa.string()),
        ("tf", pa.int32()),
        ("positions", pa.list_(pa.int32())),
        ("important", pa.int8()),
        ("total_tokens", pa.int32()),
    ])

    def analyze_partition_arrow(batches):
        memo = {}
        for rb in batches:
            docids_in = rb.column(rb.schema.get_field_index("docid")).to_pylist()
            contents = rb.column(rb.schema.get_field_index("content")).to_pylist()
            paths = (
                rb.column(rb.schema.get_field_index("path")).to_pylist()
                if importance_fn is not None
                else None
            )
            docids, terms, tfs, tot, imps = [], [], [], [], []
            pos_flat, pos_off = [], [0]
            for i, (docid, content) in enumerate(zip(docids_in, contents)):
                counts = analyze_counts(content, stem=stem, _memo=memo)
                nterms = len(counts)
                imp = None
                if importance_fn is not None:
                    raw = importance_fn(content, paths[i])
                    if stem:
                        from .porter import porter_stem

                        imp = {}
                        for w, pr in raw.items():
                            s = memo.get(w)
                            if s is None:
                                s = memo[w] = porter_stem(w)
                            if s not in imp or pr < imp[s]:
                                imp[s] = pr
                    else:
                        imp = raw
                for term, (tf, positions) in counts.items():
                    docids.append(docid)
                    terms.append(term)
                    tfs.append(tf)
                    pos_flat.extend(positions)
                    pos_off.append(len(pos_flat))
                    tot.append(nterms)
                    if imp is not None:
                        imps.append(imp.get(term, 0))
            n = len(docids)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(docids, pa.int64()),
                    pa.array(terms, pa.string()),
                    pa.array(tfs, pa.int32()),
                    pa.ListArray.from_arrays(
                        pa.array(pos_off, pa.int32()),
                        pa.array(pos_flat, pa.int32()),
                    ),
                    pa.array(imps, pa.int8())
                    if importance_fn is not None
                    else pa.array(np.zeros(n, dtype=np.int8)),
                    pa.array(tot, pa.int32()),
                ],
                schema=out_schema,
            )

    return analyze_partition_arrow


def make_simhash_partition(bits=32):
    """mapInPandas factory: (docid, content) → simhash fingerprints.

    Fingerprint is over UNSTEMMED token counts, matching the reference's
    ordering (simhash at makeindex.py:201 runs before stemming at :221).
    bits=32 is reference parity; bits=64 is the scale variant
    (text/simhash.py).  64-bit fingerprints are emitted as signed int64
    (two's complement) — band extraction uses shiftrightunsigned, so the
    sign does not matter.

    Output is ONLY (docid, fingerprint): content crosses the Arrow pipe
    into the Python worker once and is never copied back out — the
    consumer (index/pipeline._dedup_simhash) persists the 16 B/doc
    result and joins it where needed.
    """
    from collections import Counter

    import numpy as np

    from .simhash import _simhash_from_arrays, crc64

    if bits == 32:
        def hfn(w):
            return crc64(w.encode("utf-8")) % (1 << 32)
    else:
        def hfn(w):
            return crc64(w.encode("utf-8"))

    def simhash_partition(batches):
        memo = {}  # word → hash, shared across the batch (Zipf reuse)
        for pdf in batches:
            docids, fps = [], []
            for docid, content in zip(pdf["docid"], pdf["content"]):
                wc = Counter(tokenize(content))
                n = len(wc)
                hashes = np.empty(n, dtype=np.uint64)
                counts = np.empty(n, dtype=np.int64)
                for i, (w, c) in enumerate(wc.items()):
                    h = memo.get(w)
                    if h is None:
                        h = memo[w] = hfn(w)
                    hashes[i] = h
                    counts[i] = c
                fp = _simhash_from_arrays(hashes, counts, bits)
                if fp >= 1 << 63:
                    fp -= 1 << 64
                docids.append(docid)
                fps.append(fp)
            yield pd.DataFrame(
                {"docid": docids,
                 "fingerprint": pd.array(fps, dtype="int64")}
            )

    return simhash_partition


simhash_partition = make_simhash_partition(32)
