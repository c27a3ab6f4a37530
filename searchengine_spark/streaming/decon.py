"""Decontamination-on-arrival: the streaming gate for ops/mix.decontaminate.

Batch decontamination (ops/mix.py) is a shuffle join keyed on the
n-gram — right for auditing an existing corpus.  At ingest time the
standard deployment (GPT-3 appendix C shape) is the other way around:
the EVAL set's n-grams are a fixed, relatively small artifact, so they
ship to every executor once (a broadcast set here; a Bloom filter at
billions of n-grams — same plumbing, swap the membership structure)
and each arriving document is checked statelessly.  No shuffle, no
state store: the stream stays append-only and embarrassingly parallel,
which is what lets the gate ride an unbounded 10^12-doc ingest.

Semantics are pinned to the batch operator: same tokenizer regex, same
n, a doc is contaminated iff it shares >= 1 distinct n-token shingle
with the eval set (tests assert the surviving set equals the batch
op's survivors on the same data).
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops.mix import DECON_EVAL_MOD, DECON_MAX_SHINGLE_DF, DECON_NGRAM
from ..text.tokenizer import ngrams, tokenize

DOCS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def text_shingles(text: str, n: int = DECON_NGRAM):
    """Distinct n-token shingles of one text — composed from the pinned
    tokenizer spec (text/tokenizer.py), the same functions every other
    pure-Python surface uses, so a tokenizer change can't silently
    diverge here."""
    return set(ngrams(tokenize(text), n))


def eval_shingle_set(docs: DataFrame, n: int = DECON_NGRAM,
                     eval_mod: int = DECON_EVAL_MOD,
                     train_docs: DataFrame | None = None,
                     max_shingle_df: int = DECON_MAX_SHINGLE_DF) -> set:
    """The eval slice's distinct n-grams, collected to the driver.

    The eval set is the BENCHMARK, not the corpus — bounded and known
    up front, so materializing it once is the intended shape (the
    13-gram set of every public benchmark is millions of entries, not
    trillions).  Past broadcast-comfort size, build a Bloom filter from
    this same DataFrame instead and keep everything else unchanged.

    ``train_docs``: when given, n-grams occurring in more than
    ``max_shingle_df`` of those docs are REMOVED from the eval set —
    the batch operator's hot-shingle cap expressed on the other side of
    the join (dropping a hot shingle from the train side and dropping
    it from the eval set cut the same pairs), so the stream gate built
    from a corpus snapshot matches ops/mix.decontaminate over that
    corpus exactly even when the cap fires."""
    from ..ops.dedup import doc_shingles

    sh = docs.filter(F.col("doc_id") % eval_mod == 0).select(
        "doc_id", "text"
    )
    ev = doc_shingles(sh, n=n).select("shingle").distinct()
    if train_docs is not None:
        hot = (
            doc_shingles(
                train_docs.select("doc_id", "text"), n=n
            )
            .groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_shingle_df)
            .select("shingle")
        )
        ev = ev.join(hot, "shingle", "left_anti")
    return {r["shingle"] for r in ev.collect()}


def decontaminate_stream(
    spark: SparkSession,
    src_dir: str,
    shingles: set,
    out_dir: str,
    checkpoint_dir: str,
    n: int = DECON_NGRAM,
) -> None:
    """Drain pending doc files (availableNow), drop every contaminated
    doc, append survivors to ``out_dir`` parquet.  Exactly-once per
    input file via the checkpoint; stateless, so a restart needs no
    state-store recovery.  Call again as new files land."""
    import pandas as pd

    bc = spark.sparkContext.broadcast(shingles)

    @F.pandas_udf("boolean")
    def _clean(texts: pd.Series) -> pd.Series:
        ev = bc.value
        # null text = shingle-free = clean (batch parity: doc_shingles
        # maps NULL to an empty shingle set)
        return texts.map(
            lambda t: t is None
            or not any(s in ev for s in text_shingles(t, n))
        )

    src = spark.readStream.schema(DOCS_SCHEMA).parquet(src_dir)
    q = (
        src.filter(_clean(F.col("text")))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise RuntimeError("decontaminate stream did not drain in 600s")
