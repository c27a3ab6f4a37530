"""Streaming percolation: standing-query alerts on arriving documents.

The batch operator (ops/search.percolate) matches a registered-query
table against a corpus — right for backfills.  The alerting deployment
is the other way around (Elasticsearch percolator / Lucene Monitor):
the standing queries are a fixed, tiny artifact, so they ship to every
executor once and each arriving document is checked STATELESSLY — no
shuffle, no state store, the stream stays append-only and
embarrassingly parallel (the decon-gate shape, streaming/decon.py).
At millions of standing queries the broadcast list becomes a term →
query inverted index executor-side (Lucene Monitor's QueryIndex);
same plumbing, swap the membership structure.

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

    qlist = [(qi, frozenset(q)) for qi, q in enumerate(queries)]
    bc = spark.sparkContext.broadcast(qlist)

    @F.pandas_udf("array<long>")
    def _match(texts: pd.Series) -> pd.Series:
        qs = bc.value

        def hits(t):
            toks = set(tokenize(t)) if t is not None else set()
            return [qi for qi, need in qs if need <= toks]

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
    per input file via the checkpoint.  Phrase adjacency is checked on
    the space-joined token string (exact: tokens contain no spaces),
    identical to the batch op's verify stage."""
    import pandas as pd

    from ..ops.search import PERC_RICH_QUERIES, _parse_perc_rich

    parsed = _parse_perc_rich(
        PERC_RICH_QUERIES if queries is None else queries
    )
    qlist = [
        (qi, frozenset(req), tuple(phs), tuple(nots))
        for qi, req, phs, nots in parsed
    ]
    bc = spark.sparkContext.broadcast(qlist)

    @F.pandas_udf("array<long>")
    def _match(texts: pd.Series) -> pd.Series:
        qs = bc.value

        def hits(t):
            toks = tokenize(t) if t is not None else []
            tset = set(toks)
            joined = " " + " ".join(toks) + " "
            return [
                qi for qi, need, phs, nots in qs
                if need <= tset
                and all(f" {ph} " in joined for ph in phs)
                and not any(f" {x} " in joined for x in nots)
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
