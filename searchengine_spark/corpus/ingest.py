"""Adapters from external tables to the input_hint corpus shape.

The engine's canonical input is the Iceberg-style table
``(repo, path, commit, lang, content)`` (BASELINE.json input_hint).  The
driver's ``documents`` parquet is mapped onto that shape here; any other
(id, text) table can go through index.light instead.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map the driver's documents table to (repo, path, commit, lang,
    content); commit = content-derived sha prefix (deterministic)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.substring(
            F.sha2(F.concat_ws("|", "source", "doc_id"), 256), 1, 40
        ).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def table_as_corpus(df: DataFrame, id_col: str, text_col: str,
                    source_col: str | None = None,
                    lang_col: str | None = None) -> DataFrame:
    """Map ANY (id, text[, source, lang]) DataFrame onto the corpus
    shape — the generic source adapter behind documents_as_corpus.
    commit = content-addressed sha prefix over (source, id), the same
    deterministic derivation, so downstream dedup/docid assignment
    behaves identically whatever the source format."""
    source = (F.col(source_col) if source_col
              else F.lit("src")).cast("string")
    lang = (F.col(lang_col) if lang_col else F.lit("")).cast("string")
    idc = F.col(id_col).cast("string")
    return df.select(
        source.alias("repo"),
        F.concat(F.lit("doc/"), idc).alias("path"),
        F.substring(
            F.sha2(F.concat_ws("|", source, idc), 256), 1, 40
        ).alias("commit"),
        lang.alias("lang"),
        F.col(text_col).cast("string").alias("content"),
    )


def jsonl_as_corpus(spark: SparkSession, path: str,
                    id_col: str = "id", text_col: str = "text",
                    **kw) -> DataFrame:
    """JSON-lines source → corpus shape (spark.read.json infers the
    schema; one JSON object per line, the common crawl-dump format)."""
    return table_as_corpus(spark.read.json(path), id_col, text_col,
                           **kw)


def csv_as_corpus(spark: SparkSession, path: str,
                  id_col: str = "id", text_col: str = "text",
                  **kw) -> DataFrame:
    """Headered-CSV source → corpus shape (multiline-quoted text
    supported — escaped quotes per RFC 4180)."""
    df = spark.read.csv(path, header=True, multiLine=True, escape='"')
    return table_as_corpus(df, id_col, text_col, **kw)


def multiply_corpus(corpus: DataFrame, m: int) -> DataFrame:
    """Deterministically amplify a corpus ×m for throughput benchmarks.

    Each copy k gets a distinct repo suffix and a heavily weighted salt
    token UNIQUE to the (doc, copy) pair.  simhash is a sign-sum of
    count-weighted term hash vectors (lib/duphash.py:117-133 semantics):
    a dominant *shared* salt would converge all fingerprints (collapsing
    the corpus to one near-dup cluster), while a dominant *unique* salt
    scatters them — every amplified row survives dedup as a distinct
    document, so row count scales exactly ×m.  Bench-only: the salt
    perturbs df/avgdl statistics, irrelevant for throughput measurement.
    """
    if m <= 1:
        return corpus
    copies = F.explode(
        F.sequence(F.lit(0), F.lit(m - 1))
    ).alias("copy_k")
    salt = F.repeat(
        F.concat(
            F.lit(" ctk"),
            F.lower(F.hex(F.xxhash64("repo", "path", "commit", "copy_k"))),
        ),
        24,
    )
    return (
        corpus.select("*", copies)
        .select(
            F.concat_ws("#", "repo", F.col("copy_k").cast("string")).alias(
                "repo"
            ),
            "path",
            "commit",
            "lang",
            F.concat(F.col("content"), salt).alias("content"),
        )
    )
