"""Streaming percolation: standing-query alerts on arriving documents.

The batch operator (ops/search.percolate) matches a registered-query
table against a corpus — right for backfills.  The alerting deployment
is the other way around (Elasticsearch percolator / Lucene Monitor):
the standing queries are a fixed artifact, so they ship to every
executor once and each arriving document is checked STATELESSLY — no
shuffle, no state store, the stream stays append-only and
embarrassingly parallel (the decon-gate shape, streaming/decon.py).
The broadcast structure is a term → qid INVERTED index (Lucene
Monitor's QueryIndex / the ES percolator design, InvertedQueryIndex
below): per-doc cost is Σ_{t ∈ doc} |queries containing t| — the
posting lists of the doc's own terms — not O(|queries|), so the gate
holds at 10⁶ standing queries where a query-list loop would scan all
of them for every document (pinned by the 10⁴-query work-bound test
in tests/test_streaming_percolate.py).

Semantics are pinned to the batch operator: same tokenizer spec, a doc
alerts query qid iff it contains ALL of qid's terms (conjunctive);
alerts are (qid, doc_id) rows appended exactly-once per input file via
the checkpoint (tests assert stream alerts == the batch op over the
same docs, and that an availableNow restart appends nothing).
"""

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..ops.search import PERC_QUERIES
from ..text.tokenizer import tokenize
from .decon import DOCS_SCHEMA


class InvertedQueryIndex:
    """Standing conjunctive queries inverted into term → qid posting
    lists (Lucene Monitor's QueryIndex): matching a document touches
    only the qids of terms the doc actually contains.

    ``match(tokens)`` returns the qids whose DISTINCT-term set is
    fully contained in ``tokens`` — identical to the naive
    every-query containment loop (pinned in
    tests/test_streaming_percolate.py), but per-doc work is
    Σ_{t ∈ tokens} len(postings[t]) instead of O(|queries|): at 10⁶
    standing queries a doc touching a handful of indexed terms costs
    a handful of bincount increments.  ``touched(tokens)`` reports
    that work bound for the test harness."""

    def __init__(self, queries):
        import numpy as np

        self.nq = len(queries)
        self.need = np.empty(self.nq, dtype=np.int64)
        postings: dict = {}
        for qi, q in enumerate(queries):
            terms = frozenset(q)
            if not terms:
                raise ValueError(f"empty standing query at qid {qi}")
            self.need[qi] = len(terms)
            for t in terms:
                postings.setdefault(t, []).append(qi)
        self.postings = {
            t: np.asarray(qids, dtype=np.int64)
            for t, qids in postings.items()
        }

    def touched(self, tokens) -> int:
        """Number of (term, qid) posting entries a match visits."""
        p = self.postings
        return sum(len(p[t]) for t in set(tokens) if t in p)

    def match(self, tokens) -> list:
        import numpy as np

        p = self.postings
        hit = [p[t] for t in set(tokens) if t in p]
        if not hit:
            return []
        counts = np.bincount(
            np.concatenate(hit), minlength=self.nq
        )
        return np.flatnonzero(counts == self.need).tolist()


class SlotQueryIndex:
    """OR-slot generalization of :class:`InvertedQueryIndex` (the
    percolate_or gate): each standing query is a list of SLOTS, a
    slot is satisfied by ANY of its member terms, and the query
    alerts iff every slot is satisfied — bare terms are singleton
    slots, so with no OR groups this degenerates to the conjunctive
    index exactly.

    Every slot gets a global requirement id; postings map
    term → rid array, and matching unions the doc's hit rids,
    DEDUPES them (two members of one slot count once — the property
    a plain per-term count cannot express), and bincounts per qid.
    Per-doc work stays Σ_{t ∈ doc} len(postings[t]) — the Lucene
    Monitor bound — regardless of the OR structure."""

    def __init__(self, slot_queries):
        import numpy as np

        self.nq = len(slot_queries)
        self.need = np.empty(self.nq, dtype=np.int64)
        req_qid: list = []
        postings: dict = {}
        rid = 0
        for qi, slots in enumerate(slot_queries):
            if not slots:
                raise ValueError(f"empty standing query at qid {qi}")
            self.need[qi] = len(slots)
            for slot in slots:
                members = frozenset(slot)
                if not members:
                    raise ValueError(f"empty slot at qid {qi}")
                for t in members:
                    postings.setdefault(t, []).append(rid)
                req_qid.append(qi)
                rid += 1
        self.req_qid = np.asarray(req_qid, dtype=np.int64)
        self.postings = {
            t: np.asarray(rids, dtype=np.int64)
            for t, rids in postings.items()
        }

    def touched(self, tokens) -> int:
        """Number of (term, rid) posting entries a match visits."""
        p = self.postings
        return sum(len(p[t]) for t in set(tokens) if t in p)

    def match(self, tokens) -> list:
        import numpy as np

        p = self.postings
        hit = [p[t] for t in set(tokens) if t in p]
        if not hit:
            return []
        reqs = np.unique(np.concatenate(hit))
        counts = np.bincount(self.req_qid[reqs], minlength=self.nq)
        return np.flatnonzero(counts == self.need).tolist()


def percolate_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    queries=PERC_QUERIES,
) -> None:
    """Drain pending doc files (availableNow), append one (qid,
    doc_id) alert row per standing query each doc satisfies.  Call
    again as new files land."""
    import pandas as pd

    bc = spark.sparkContext.broadcast(InvertedQueryIndex(queries))

    @F.pandas_udf("array<long>")
    def _match(texts: pd.Series) -> pd.Series:
        qidx = bc.value

        def hits(t):
            return qidx.match(tokenize(t)) if t is not None else []

        return texts.map(hits)

    src = spark.readStream.schema(DOCS_SCHEMA).parquet(src_dir)
    alerts = src.select(
        "doc_id", F.explode(_match(F.col("text"))).alias("qid")
    ).select("qid", "doc_id")
    q = (
        alerts.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("percolate stream did not drain in 600s")


def percolate_rich_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    queries=None,
) -> None:
    """The rich-query gate (ops/search.percolate_rich semantics —
    bare/phrase/-not, same parser): stateless broadcast matcher, one
    (qid, doc_id) alert row per satisfied standing query, exactly-once
    per input file via the checkpoint.  Stage 1 is the SAME inverted
    term→qid prune as the lean gate (lossless: required-term
    containment is necessary for an alert), so per-doc work scales
    with the doc's matched terms, not |queries|; stage 2 verifies
    phrase adjacency on the space-joined token string (exact: tokens
    contain no spaces) and -not absence for the CANDIDATE qids only —
    identical to the batch op's two-stage rule."""
    import pandas as pd

    from ..ops.search import PERC_RICH_QUERIES, _parse_perc_rich

    parsed = _parse_perc_rich(
        PERC_RICH_QUERIES if queries is None else queries
    )
    verify = {
        qi: (tuple(phs), tuple(nots))
        for qi, req, phs, nots in parsed
    }
    qidx = InvertedQueryIndex(
        [frozenset(req) for _, req, _, _ in parsed]
    )
    bc = spark.sparkContext.broadcast((qidx, verify))

    @F.pandas_udf("array<long>")
    def _match(texts: pd.Series) -> pd.Series:
        idx, ver = bc.value

        def hits(t):
            toks = tokenize(t) if t is not None else []
            cands = idx.match(toks)
            if not cands:
                return []
            joined = " " + " ".join(toks) + " "
            return [
                qi for qi in cands
                if all(f" {ph} " in joined for ph in ver[qi][0])
                and not any(f" {x} " in joined for x in ver[qi][1])
            ]

        return texts.map(hits)

    src = spark.readStream.schema(DOCS_SCHEMA).parquet(src_dir)
    alerts = src.select(
        "doc_id", F.explode(_match(F.col("text"))).alias("qid")
    ).select("qid", "doc_id")
    q = (
        alerts.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("percolate stream did not drain in 600s")


def percolate_or_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    queries=None,
) -> None:
    """The OR-capable gate (ops/search.percolate_or semantics —
    bare / phrase / -not / a|b slots, same parser): stage 1 is the
    requirement-id inverted index (SlotQueryIndex — every slot needs
    >= 1 member, dedup per slot), stage 2 verifies phrases/-nots on
    the candidate qids only; alert-identical to the batch op on the
    same docs, exactly-once per input file via the checkpoint."""
    import pandas as pd

    from ..ops.search import PERC_OR_QUERIES, _parse_perc_or

    parsed = _parse_perc_or(
        PERC_OR_QUERIES if queries is None else queries
    )
    verify = {
        qi: (tuple(phs), tuple(nots))
        for qi, _, phs, nots in parsed
    }
    qidx = SlotQueryIndex([slots for _, slots, _, _ in parsed])
    bc = spark.sparkContext.broadcast((qidx, verify))

    @F.pandas_udf("array<long>")
    def _match(texts: pd.Series) -> pd.Series:
        idx, ver = bc.value

        def hits(t):
            toks = tokenize(t) if t is not None else []
            cands = idx.match(toks)
            if not cands:
                return []
            joined = " " + " ".join(toks) + " "
            return [
                qi for qi in cands
                if all(f" {ph} " in joined for ph in ver[qi][0])
                and not any(f" {x} " in joined for x in ver[qi][1])
            ]

        return texts.map(hits)

    src = spark.readStream.schema(DOCS_SCHEMA).parquet(src_dir)
    alerts = src.select(
        "doc_id", F.explode(_match(F.col("text"))).alias("qid")
    ).select("qid", "doc_id")
    q = (
        alerts.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("percolate stream did not drain in 600s")
