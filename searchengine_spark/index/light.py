"""Flat index builder: any (id, text) DataFrame → IndexTables.

The full pipeline (pipeline.py) implements the reference's entire filter
chain over the input_hint corpus shape.  This module is the minimal
path — no dedup, no graph, ids taken as given — used by

 * the driver's ``wand_topk`` oracle entry (unstemmed so DuckDB can
   mirror it),
 * ad-hoc indexing of arbitrary tables (any dataset with an id and a
   text column can be served by the same on-disk index + WAND engine).
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..text.udfs import POSTINGS_SCHEMA, make_analyze_partition_arrow
from .pipeline import IndexTables


def build_flat_tables(
    spark: SparkSession,
    df: DataFrame,
    docid_col: str = "doc_id",
    text_col: str = "text",
    stem: bool = False,
) -> IndexTables:
    """Tokenize/aggregate ``df`` into postings + docs + stats tables."""
    src = df.select(
        F.col(docid_col).cast("long").alias("docid"),
        F.col(text_col).alias("content"),
    )
    postings_full = src.mapInArrow(
        make_analyze_partition_arrow(stem=stem), schema=POSTINGS_SCHEMA
    ).persist()
    postings = postings_full.select(
        "term", "docid", "tf", "positions", "important"
    )
    docs = (
        src.select("docid")
        .join(
            postings_full.select("docid", "total_tokens").distinct(),
            "docid",
            "left",
        )
        .withColumn("total_tokens", F.coalesce("total_tokens", F.lit(0)))
        .withColumn("pr_quality", F.lit(1.0))
        .withColumn("hub_quality", F.lit(1.0))
        .withColumn("auth_quality", F.lit(1.0))
    )
    # stats over docs with >=1 token only — the flat path's SQL oracle
    # derives N/avgdl from the tf table (which token-less docs never
    # reach), so counting them here would skew idf/avgdl on any corpus
    # containing an empty-token document
    srow = docs.filter(F.col("total_tokens") > 0).agg(
        F.count("*").alias("n"), F.avg("total_tokens").alias("avgdl")
    ).first()
    stats = {
        "n_total": srow["n"],
        "n_survivors": srow["n"],
        "avgdl": float(srow["avgdl"] or 0.0),
    }
    termdict = postings.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    return IndexTables(
        postings=postings, docs=docs, termdict=termdict, stats=stats
    )
