"""End-to-end training-data preparation: the composed pipeline a
large-scale corpus-curation job runs before tokenizer training /
pre-training, built from the engine's first-class operators.

    documents (doc_id, lang, text)
      → exact dedup        sha256, keep lowest doc_id   (ops parity with
                           index/pipeline._dedup_exact)
      → near-dup dedup     MinHash+LSH candidate pairs, local-min rule
                           (ops/dedup.py determinism contract)
      → one token pass     n_tokens, stopword ratio, language-marker
                           scores, BPE-ish piece estimate — a SINGLE
                           groupBy over the exploded tokens, not four
      → quality gate       n_tokens >= min, stopword_ratio <= max
                           (lang_pred rides along as an output label —
                           the synthetic corpus has no marker tokens,
                           so a lang gate would be vacuous there)
      → token-budget cut   order docs best-first (stopword_ratio asc,
                           doc_id asc), keep the prefix whose cumulative
                           piece count fits floor(budget_frac · total)

Every stage is a hash-shuffle on a key (sha256 / LSH band / doc_id) or a
columnar expression; the only global-order step is the budget prefix
sum, implemented as a two-phase distributed scan (range partition →
per-partition totals → offset broadcast → intra-partition cumsum), the
same shape as index/pipeline.assign_docids — NO single-partition window.
The cumulative values are a pure function of the (stopword_ratio,
doc_id) total order, so they are partition-count invariant even though
the range partitioner samples boundaries.

The whole chain is ANSI-SQL expressible (the driver's DuckDB oracle
runs the identical composition, __spark_entry__.oracle_sql
['training_data_prep']), which makes this the end-to-end correctness
check for the dedup + text-analysis operator family in one query.

Reference analogue: the ingest gauntlet makeindex.py:108-193 (dedup →
filter → analyze); the budget cut and quality gates are [NORTH-EXT]
training-pipeline surface the reference lacks.
"""

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..text.tokenizer import TOKEN_PATTERN
from .dedup import minhash_star_edges
from .textops import (
    QUALITY_STOPWORDS,
    bpe_pieces_agg,
    documents,
    lang_marker_aggs,
    lang_pred_expr,
)

# pinned pipeline parameters, interpolated into the DuckDB oracle
# (__spark_entry__.oracle_sql) — change Spark and SQL together
PREP_MIN_TOKENS = 30
PREP_MAX_STOPWORD_RATIO = 0.30
PREP_BUDGET_FRAC = 0.5


def _dedup_exact_min(docs: DataFrame) -> DataFrame:
    """Keep the lowest doc_id per sha256(text).  The rank window runs
    over a narrow (doc_id, sha) projection; content-width rows are
    anti-joined on doc_id (AQE broadcasts the drop set at typical dup
    rates — the same plan shape as index/pipeline._dedup_exact)."""
    hashed = docs.withColumn("_sha", F.sha2(F.col("text"), 256))
    w = Window.partitionBy("_sha").orderBy("doc_id")
    dropped = (
        hashed.select("doc_id", "_sha")
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") > 1)
        .select("doc_id")
    )
    return hashed.join(dropped, "doc_id", "left_anti").drop("_sha")


def _prefix_sum(df: DataFrame, val_col: str, order_cols: list,
                n_parts: int | None = None):
    """Add ``cum_tokens`` = running sum of ``val_col`` over the total
    order ``order_cols`` — two-phase, cluster-size independent:
    range-partition on the order, collect the P per-partition subtotals,
    broadcast the exclusive prefix offsets back, finish with an
    intra-partition window.  One pass over the data + a P-row collect;
    never a single-partition global window.

    Returns ``(out_df, grand_total)`` — the subtotal collect already
    knows Σval, so callers that need the total (the budget cut) take it
    here instead of paying a second scan of the upstream plan.

    ``df`` is persisted under the hood (the subtotal collect and the
    final read share the range-partitioned data); the cached blocks are
    narrow feature rows, evictable under memory pressure — the same
    persist contract as index/pipeline.assign_docids."""
    spark = df.sparkSession
    if n_parts is None:
        n_parts = max(spark.sparkContext.defaultParallelism, 8)
    part = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    subtotals = {
        r["_pid"]: r["s"]
        for r in part.groupBy("_pid").agg(F.sum(val_col).alias("s")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(subtotals):
        offsets.append((pid, acc))
        acc += subtotals[pid]
    off_df = spark.createDataFrame(offsets, "_pid int, _off long")
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        part.join(F.broadcast(off_df), "_pid")
        .withColumn(
            "cum_tokens",
            (F.col("_off") + F.sum(val_col).over(w)).cast("long"),
        )
        .drop("_pid", "_off")
    )
    return out, int(acc)


def training_data_prep(
    spark: SparkSession,
    sf_dir: str,
    min_tokens: int = PREP_MIN_TOKENS,
    max_stopword_ratio: float = PREP_MAX_STOPWORD_RATIO,
    budget_frac: float = PREP_BUDGET_FRAC,
) -> DataFrame:
    """(doc_id, lang_pred, n_tokens, n_pieces_bpe, stopword_ratio,
    cum_tokens) — the curated training subset, ordered by the selection
    order (stopword_ratio asc, doc_id asc).  See module docstring."""
    d = documents(spark, sf_dir).select("doc_id", "text")

    alive = _dedup_exact_min(d)
    # drop rule: a doc with ANY smaller-id LSH-bucket-mate is dropped,
    # i.e. every doc that is not the min of all its buckets — exactly
    # minhash_star_edges' `b` column, LINEAR per bucket (the all-pairs
    # minhash_pairs form squares template clusters; see its docstring).
    # Same set, value-identical to the all-pairs-stated DuckDB oracle.
    near = (
        minhash_star_edges(alive.select("doc_id", "text"))
        .select(F.col("b").alias("doc_id"))
        .distinct()
    )
    alive = alive.join(near, "doc_id", "left_anti")

    # one token pass: every per-doc feature in a single groupBy
    toks = alive.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), 0)
        ).alias("term"),
    )
    feat = toks.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(
            F.sum(
                F.when(F.col("term").isin(QUALITY_STOPWORDS), 1).otherwise(0)
            )
            / F.count("*"),
            6,
        ).alias("stopword_ratio"),
        bpe_pieces_agg().alias("n_pieces_bpe"),
        *lang_marker_aggs(),
    )
    kept = (
        feat.withColumn(
            "lang_pred", F.coalesce(lang_pred_expr(), F.lit("unknown"))
        )
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("stopword_ratio") <= max_stopword_ratio)
        )
        .select(
            "doc_id", "lang_pred", "n_tokens", "n_pieces_bpe",
            "stopword_ratio",
        )
    )

    # budget = floor(frac · total pieces of the gated set); the grand
    # total rides the prefix-sum's subtotal collect — a separate agg
    # over `kept` would re-execute the whole dedup + token-pass upstream
    cum, total = _prefix_sum(
        kept, "n_pieces_bpe", ["stopword_ratio", "doc_id"]
    )
    budget = int(math.floor(total * budget_frac))
    return (
        cum.filter(F.col("cum_tokens") <= F.lit(budget))
        .select(
            "doc_id", "lang_pred",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_pieces_bpe").cast("long").alias("n_pieces_bpe"),
            "stopword_ratio", "cum_tokens",
        )
        # no global orderBy: the output SET is deterministic and the
        # prefix-sum stage already left rows range-partitioned + sorted
        # within partitions — a total sort of the curated corpus would
        # be a pure-overhead exchange at 100 TB
    )


# pinned packing parameter, interpolated into the DuckDB oracle —
# change Spark and SQL together
PACK_SEQ_LEN = 512


def pack_sequences_df(docs: DataFrame,
                      seq_len: int = PACK_SEQ_LEN) -> DataFrame:
    """GPT-style sample packing: concatenate every doc's token stream
    in doc_id order and cut fixed ``seq_len``-token training sequences
    — one row per sequence with how many docs it touches, its token
    count (= seq_len except the tail), and its first/last doc.  This
    is the pretraining batch-construction step that turns a curated
    corpus into equal-length samples; the per-sequence doc counts are
    the attention-mask boundary statistics a packing-aware loader
    needs.

    Scale shape: one narrow token-count projection, the two-phase
    range-partition prefix sum (_prefix_sum — partition-count
    invariant, never a single-partition window), then a PER-DOC
    arithmetic explode of the <= n/seq_len + 1 sequences the doc
    spans, aggregated on seq_id.  Zero-token docs pack nothing and are
    excluded up front.  ``docs`` is any (doc_id, text) DataFrame — the
    deploy job packs the CURATED corpus, the driver entry the raw
    table."""
    counts = docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), 0)
        ).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    cum, _total = _prefix_sum(counts, "n_tokens", ["doc_id"])
    spanned = cum.select(
        "doc_id",
        "cum_tokens",
        (F.col("cum_tokens") - F.col("n_tokens")).alias("start"),
    ).select(
        "doc_id",
        "cum_tokens",
        "start",
        F.explode(
            F.sequence(
                F.expr(f"start div {seq_len}"),
                F.expr(f"(cum_tokens - 1) div {seq_len}"),
            )
        ).alias("seq_id"),
    )
    overlap = F.least(
        F.col("cum_tokens"), (F.col("seq_id") + 1) * seq_len
    ) - F.greatest(F.col("start"), F.col("seq_id") * seq_len)
    return (
        spanned.groupBy("seq_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(overlap).cast("long").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .select("seq_id", "n_docs", "n_tokens", "first_doc", "last_doc")
        .orderBy("seq_id")
    )


def pack_sequences(spark: SparkSession, sf_dir: str,
                   seq_len: int = PACK_SEQ_LEN) -> DataFrame:
    """pack_sequences_df over the sf_dir documents table."""
    return pack_sequences_df(documents(spark, sf_dir), seq_len)


def pack_sequences_oracle_sql(seq_len: int = PACK_SEQ_LEN) -> str:
    return f"""
        WITH c AS (
          SELECT doc_id,
                 len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT
                   AS n
          FROM documents
        ),
        nz AS (SELECT doc_id, n FROM c WHERE n > 0),
        cum AS (SELECT doc_id, n,
                       sum(n) OVER (ORDER BY doc_id)::BIGINT AS cum
                FROM nz),
        sp AS (
          SELECT doc_id, cum, cum - n AS start,
                 unnest(generate_series((cum - n) // {seq_len},
                                        (cum - 1) // {seq_len})) AS seq_id
          FROM cum
        )
        SELECT seq_id::BIGINT AS seq_id, count(*)::BIGINT AS n_docs,
               sum(least(cum, (seq_id + 1) * {seq_len})
                   - greatest(start, seq_id * {seq_len}))::BIGINT
                 AS n_tokens,
               min(doc_id) AS first_doc, max(doc_id) AS last_doc
        FROM sp GROUP BY seq_id ORDER BY seq_id
    """
