"""Batch top-k BM25 scoring over the index tables.

Re-expresses the reference's interactive query loop
(lib/queryproc.py:165-270) as one declarative DAG per query *batch*:

  query strings ──(driver: analyze + prune, shared with the oracle)──►
  qterms (qid, term, qtf, idf)  [tiny → broadcast]
    ⋈ postings on term          (broadcast hash join, no shuffle of postings)
    ⋈ docs on docid             (dl + quality columns)
    → groupBy(qid, docid)       (partial agg map-side; THE one shuffle)
    → conjunctive filter        nmatch == n_query_terms (lib/queryproc.py:33)
    → per-qid candidate norms   (groupBy(qid) agg + broadcast join back —
                                 NOT a window, so partial aggregation works
                                 and a hot qid never pins one partition)
    → blend (params.py weights) → two-phase top-k

Scoring math is float64 throughout and mirrors the oracle term for term
(searchengine_spark/oracle/oracle.py — the executable spec).
"""

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..params import (
    AUTH_FACTOR,
    BM25_B,
    BM25_K1,
    COSINE_FACTOR,
    COSINE_GATE,
    HUB_FACTOR,
    NET_RELEVANCE_FACTOR,
    PR_FACTOR,
    QUALITY_FACTOR,
    TFIDF_FACTOR,
)
from .prune import analyze_query, prune_query_terms

TOPK_SALT_BUCKETS = 64


def plan_query_terms(queries, df_lookup, n_docs, stem=True):
    """Driver-side query planning (tiny data by nature).

    :param queries: list of (qid, text)
    :param df_lookup: callable term -> corpus df
    :param n_docs: survivor count N
    :param stem: False = unstemmed (SQL-oracle-able) query analysis
    :return: (qterm_rows, qmeta) where qterm_rows is a list of
             (qid, term, qweight, idf) and qmeta maps qid ->
             {"nterms": int, "qnorm": float}
    """
    rows, meta = [], {}
    for qid, text in queries:
        freq = prune_query_terms(analyze_query(text, stem=stem), df_lookup)
        if not freq:  # aborted (None) or empty
            continue
        qlen = sum(freq.values())
        qnorm2 = 0.0
        for term in sorted(freq):
            dfv = df_lookup(term)
            idf = math.log((n_docs - dfv + 0.5) / (dfv + 0.5) + 1.0)
            qw = (freq[term] / qlen) * idf
            rows.append((qid, term, float(qw), float(idf)))
            qnorm2 += qw * qw
        meta[qid] = {"nterms": len(freq), "qnorm": math.sqrt(qnorm2)}
    return rows, meta


def score_candidates(
    spark: SparkSession,
    qterms: DataFrame,
    qmeta: DataFrame,
    postings: DataFrame,
    docs: DataFrame,
    avgdl: float,
    k: int = 10,
    importance: bool = False,
) -> DataFrame:
    """Score and rank candidates given planned query terms.

    qterms: (qid, term, qweight, idf); qmeta: (qid, nterms, qnorm).
    postings needs (term, docid, tf); docs needs (docid, total_tokens,
    pr_quality, hub_quality, auth_quality).
    Returns (qid, rank, docid, score).

    ``importance=True`` (BM25F-style field weights): each hit's BM25
    contribution is multiplied by params.IMPORTANCE[important] — the
    reference's per-tag multiplier (lib/queryproc.py:74), live instead
    of constant-0 (postings must carry a real ``important`` column:
    build_tables(importance_fn=...)).  The multiplied value flows into
    the accumulation AND the doc-vector cosine, exactly like the
    reference's doc_tfidfs.
    """
    cols = ["qid", "term", "docid", "tf", "qweight", "idf"] + (
        ["important"] if importance else []
    )
    hits = postings.join(F.broadcast(qterms), "term").select(*cols)
    hits = hits.join(
        docs.select(
            "docid", "total_tokens", "pr_quality", "hub_quality", "auth_quality"
        ),
        "docid",
    )
    dl_norm = F.lit(BM25_K1) * (
        F.lit(1 - BM25_B)
        + F.lit(BM25_B) * F.col("total_tokens").cast("double") / F.lit(avgdl)
    )
    bm25 = (
        F.col("idf")
        * F.col("tf").cast("double")
        * F.lit(BM25_K1 + 1)
        / (F.col("tf").cast("double") + dl_norm)
    )
    if importance:
        from ..params import importance_mult_col

        # shared multiplier rule (params.importance_mult_col): out-of-
        # table priorities fall back to the untagged multiplier —
        # matching the SQL oracle's CASE ... ELSE, never a NULL that
        # would silently drop the term while nmatch still counts it
        bm25 = bm25 * importance_mult_col(F.col("important"))
    per_doc = (
        hits.withColumn("bm25", bm25)
        .groupBy("qid", "docid")
        .agg(
            F.count("*").alias("nmatch"),
            F.sum("bm25").alias("bm25_sum"),
            F.sum(F.col("bm25") * F.col("qweight")).alias("dot"),
            F.sum(F.col("bm25") ** 2).alias("dnorm2"),
            F.first("pr_quality").alias("pr"),
            F.first("hub_quality").alias("hub"),
            F.first("auth_quality").alias("auth"),
        )
    )
    cand = per_doc.join(F.broadcast(qmeta), "qid").filter(
        F.col("nmatch") == F.col("nterms")
    )
    cand = cand.withColumn(
        "cosine",
        F.col("dot") / (F.sqrt(F.col("dnorm2")) * F.col("qnorm")),
    )

    # cross-candidate L2 norms per qid (lib/queryproc.py:101-151) as a
    # shuffle agg + broadcast join back — scales past a hot qid
    norms = cand.groupBy("qid").agg(
        F.sqrt(F.sum(F.col("bm25_sum") ** 2)).alias("sum_norm"),
        F.sqrt(F.sum(F.col("cosine") ** 2)).alias("cos_norm"),
        F.sqrt(F.sum(F.col("pr") ** 2)).alias("pr_norm"),
        F.sqrt(F.sum(F.col("hub") ** 2)).alias("hub_norm"),
        F.sqrt(F.sum(F.col("auth") ** 2)).alias("auth_norm"),
    )
    cand = cand.join(F.broadcast(norms), "qid")

    def _safe(num, den):
        return F.when(F.col(den) > 0, F.col(num) / F.col(den)).otherwise(
            F.lit(0.0)
        )

    rel = F.when(
        F.col("cosine") > COSINE_GATE,
        F.lit(TFIDF_FACTOR) * _safe("bm25_sum", "sum_norm")
        + F.lit(COSINE_FACTOR) * _safe("cosine", "cos_norm"),
    ).otherwise(F.lit(0.0))
    qual = (
        F.lit(PR_FACTOR) * _safe("pr", "pr_norm")
        + F.lit(HUB_FACTOR) * _safe("hub", "hub_norm")
        + F.lit(AUTH_FACTOR) * _safe("auth", "auth_norm")
    )
    scored = cand.withColumn(
        "score",
        F.lit(NET_RELEVANCE_FACTOR) * rel + F.lit(QUALITY_FACTOR) * qual,
    )

    # two-phase top-k: per-(qid, salt) local top-k bounds any partition to
    # k rows before the per-qid final ranking (hot-qid safe at scale)
    salted = scored.withColumn(
        "_salt", F.pmod(F.col("docid"), F.lit(TOPK_SALT_BUCKETS))
    )
    w1 = Window.partitionBy("qid", "_salt").orderBy(
        F.desc("score"), F.asc("docid")
    )
    local = salted.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= k
    )
    w2 = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("docid"))
    return (
        local.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "docid", "score")
    )


def score_queries(spark, queries, tables, k=10, stem=True,
                  importance: bool = False) -> DataFrame:
    """End-to-end batch scoring against in-memory IndexTables.

    :param queries: list of (qid, text)
    :param stem: must match the analyzer the tables were built with
    :param importance: BM25F field weights (see score_candidates);
        requires tables built with ``importance_fn``.  In-memory path
        only — the compressed block payload deliberately does not carry
        the field bits (the reference's on-disk format doesn't either:
        its indexer writes important=0 always, SURVEY.md P13).
    """
    terms_needed = set()
    analyzed = {qid: analyze_query(text, stem=stem) for qid, text in queries}
    for freq in analyzed.values():
        terms_needed.update(freq)
    df_map = {
        r["term"]: r["df"]
        for r in tables.termdict.filter(
            F.col("term").isin(list(terms_needed))
        ).collect()
    }
    df_lookup = lambda t: df_map.get(t, 0)  # noqa: E731

    rows, meta = plan_query_terms(
        queries, df_lookup, tables.stats["n_survivors"], stem=stem
    )
    if not rows:
        return spark.createDataFrame(
            [], "qid int, rank int, docid long, score double"
        )
    qterms = spark.createDataFrame(
        rows, "qid int, term string, qweight double, idf double"
    )
    qmeta = spark.createDataFrame(
        [(qid, m["nterms"], m["qnorm"]) for qid, m in meta.items()],
        "qid int, nterms int, qnorm double",
    )
    return score_candidates(
        spark,
        qterms,
        qmeta,
        tables.postings,
        tables.docs,
        tables.stats["avgdl"],
        k=k,
        importance=importance,
    )


def score_queries_ondisk(spark, queries, shards, k=10, stem=True,
                         importance: bool = False) -> DataFrame:
    """Full blended scorer served from the on-disk index (SURVEY.md §7
    step 4): broadcast termdict lookup → bucket-pruned shard reads →
    decode UDF → the same score_candidates DAG as the in-memory path.

    Rank-identical to :func:`score_queries` over the tables the index
    was written from (asserted in tests/test_rank_identity.py).

    ``importance=True`` (BM25F): the index must carry the importance
    payload (write_index(store_importance=True) — checked via
    mergeinfo); postings decode with the per-posting field priority
    and score exactly like the in-memory BM25F path.
    """
    from ..index.shards import fetch_postings

    if importance and not shards.stats.get("importance_payload"):
        raise ValueError(
            "importance=True needs an importance-payload index"
            " (write_index(store_importance=True))"
        )

    terms_needed = set()
    for _, text in queries:
        terms_needed.update(analyze_query(text, stem=stem))
    df_map = {
        r["term"]: r["df"]
        for r in shards.termdict.filter(
            F.col("term").isin(list(terms_needed))
        ).collect()
    }
    rows, meta = plan_query_terms(
        queries, lambda t: df_map.get(t, 0), shards.stats["n_survivors"],
        stem=stem,
    )
    if not rows:
        return spark.createDataFrame(
            [], "qid int, rank int, docid long, score double"
        )
    qterms = spark.createDataFrame(
        rows, "qid int, term string, qweight double, idf double"
    )
    qmeta = spark.createDataFrame(
        [(qid, m["nterms"], m["qnorm"]) for qid, m in meta.items()],
        "qid int, nterms int, qnorm double",
    )
    postings = fetch_postings(
        shards, sorted({r[1] for r in rows}),
        with_importance=importance,
    )
    return score_candidates(
        spark,
        qterms,
        qmeta,
        postings,
        shards.docs,
        shards.stats["avgdl"],
        k=k,
        importance=importance,
    )
