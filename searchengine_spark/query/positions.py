"""Positions-payload query surfaces over ANY IndexShards handle.

phrase_match_indexed / proximity_topk (ops/textops.py) were born bound
to the driver benchmark's throwaway flat index; these are the same
operators generalized to whatever ``load_index`` / ``load_segments``
returns — monolithic or segment-union, stemmed or flat — so a
production index can be phrase/proximity-searched from the Spark batch
tier exactly like it is from the local serving tier
(serve_local.phrase_topk / proximity_topk, which mirror these
semantics and are rank-identity-tested against them).

Both take PRE-ANALYZED terms: the caller owns the analyzer choice
(raw tokens for a flat index, text.analyze output for a stemmed one),
the same contract as wand_topk's ``analyzer``.

Liveness: segment unions keep tombstoned docs' postings physically in
blocks until merge (index/segments.py), so both operators join against
``sh.docs`` — the serving view with tombstones already removed — the
same rule every other on-disk query path follows.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.shards import IndexShards, fetch_postings


def phrase_topk_shards(
    spark: SparkSession, sh: IndexShards, terms, k: int = 20
) -> DataFrame:
    """Exact-phrase search from stored positions: a doc matches where
    the terms appear at consecutive positions.  (doc_id, n_occurrences)
    ordered occurrences desc, doc_id asc.

    fetch_postings prunes shard buckets + parquet row groups down to
    the phrase's terms, positions explode per phrase slot i as
    (docid, pos - i), and an equi-join on (docid, p0) keeps exactly
    the positions where every slot lines up consecutively.
    """
    terms = list(terms)
    posts = fetch_postings(sh, sorted(set(terms)))
    cur = None
    for i, term in enumerate(terms):
        p = (
            posts.filter(F.col("term") == term)
            .select("docid", F.explode("positions").alias("pos"))
            .select("docid", (F.col("pos") - i).alias("p0"))
        )
        cur = p if cur is None else cur.join(p, ["docid", "p0"])
    return (
        cur.join(sh.docs.select("docid"), "docid")  # tombstone liveness
        .groupBy("docid")
        .agg(F.count("*").alias("n_occurrences"))
        .select(F.col("docid").alias("doc_id"), "n_occurrences")
        .orderBy(F.desc("n_occurrences"), F.asc("doc_id"))
        .limit(k)
    )


def slop_topk_shards(
    spark: SparkSession, sh: IndexShards, terms, slop: int = 3,
    k: int = 20
) -> DataFrame:
    """Sloppy ordered phrase from stored positions: count of ordered
    pairs (pa, pb) with 0 < pb − pa <= slop + 1 per doc (slop=0 =
    exact adjacency).  (doc_id, n_windows), n_windows desc, doc_id asc.

    Same shape as proximity_topk_shards: one bucket-pruned fetch per
    term, the two posting rows meet in ONE row per doc, and the window
    count is a vectorized double-searchsorted over the sorted position
    arrays (ops/textops.ordered_window_count_udf) — O((tf_a+tf_b) log),
    never a position×position explode.  The docs join masks tombstoned
    docids (segment-union liveness rule).
    """
    terms = list(terms)
    if len(terms) != 2 or terms[0] == terms[1]:
        raise ValueError(
            "slop_topk counts ordered pairs of two DISTINCT terms"
        )
    from ..ops.textops import ordered_window_count_udf

    sides = [
        fetch_postings(sh, [t]).select(
            "docid", F.col("positions").alias(f"pos_{s}")
        )
        for s, t in zip(("a", "b"), terms)
    ]
    wc = ordered_window_count_udf(slop)
    return (
        sides[0]
        .join(sides[1], "docid")
        .join(sh.docs.select("docid"), "docid")  # tombstone liveness
        .withColumn("n_windows", wc("pos_a", "pos_b"))
        .filter(F.col("n_windows") > 0)
        .select(F.col("docid").alias("doc_id"), "n_windows")
        .orderBy(F.desc("n_windows"), F.asc("doc_id"))
        .limit(k)
    )


def span_near_topk_shards(
    spark: SparkSession, sh: IndexShards, terms, k: int = 10
) -> DataFrame:
    """Unordered span-near ranking from stored positions (the k-ary
    sibling of proximity_topk_shards — Lucene SpanNearQuery with
    inOrder=false): BM25 over docs containing ALL terms, boosted by
    len(terms)/min_win where min_win is the minimal covering window
    (smallest token span holding one occurrence of every term; the
    boost is 1.0 exactly when the terms are perfectly clustered and
    decays with spread).  (doc_id, min_win, score), score desc,
    doc_id asc, round-6.

    Same scale shape as proximity: one bucket-pruned fetch per term,
    the k posting rows meet in ONE row per doc (k-way equi-join on
    docid — conjunctive eligibility for free), and the window is the
    vectorized anchor-searchsorted kernel
    (ops/textops.min_cover_window_udf) — never a position explode.
    The docs join supplies BM25 length and masks tombstones in one
    step; df/idf come from the handle's tombstone-corrected termdict.
    """
    from ..ops.textops import min_cover_window_udf
    from ..params import BM25_B, BM25_K1
    from .wand import bm25_idf

    terms = list(terms)
    if len(terms) < 2 or len(set(terms)) != len(terms):
        raise ValueError(
            "span_near_topk ranks >= 2 DISTINCT terms"
        )
    n = sh.stats["n_survivors"]
    avgdl = sh.stats["avgdl"] or 1.0
    dfmap = {
        r["term"]: r["df"]
        for r in sh.termdict.filter(F.col("term").isin(terms)).collect()
    }
    if any(t not in dfmap for t in terms):
        return spark.createDataFrame(
            [], "doc_id long, min_win long, score double"
        )
    sides = [
        fetch_postings(sh, [t]).select(
            "docid",
            F.col("tf").alias(f"tf_{i}"),
            F.col("positions").alias(f"pos_{i}"),
        )
        for i, t in enumerate(terms)
    ]
    both = sides[0]
    for s in sides[1:]:
        both = both.join(s, "docid")
    both = both.join(sh.docs.select("docid", "total_tokens"), "docid")

    def w8(tf_col):
        return (
            F.col(tf_col).cast("double") * F.lit(BM25_K1 + 1.0)
            / (
                F.col(tf_col).cast("double")
                + F.lit(BM25_K1)
                * (
                    F.lit(1.0 - BM25_B)
                    + F.lit(BM25_B)
                    * F.col("total_tokens").cast("double") / F.lit(avgdl)
                )
            )
        )

    s = None
    for i, t in enumerate(terms):
        part = F.lit(bm25_idf(n, dfmap[t])) * w8(f"tf_{i}")
        s = part if s is None else s + part
    cover = min_cover_window_udf()
    return (
        both.withColumn(
            "min_win", cover(*[F.col(f"pos_{i}") for i in range(len(terms))])
        )
        .select(
            F.col("docid").alias("doc_id"),
            "min_win",
            F.round(
                s
                + F.lit(float(len(terms)))
                / F.col("min_win").cast("double"),
                6,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def proximity_topk_shards(
    spark: SparkSession, sh: IndexShards, terms, k: int = 10
) -> DataFrame:
    """Proximity-boosted conjunctive ranking from stored positions:
    BM25 over docs containing BOTH terms plus a 1/(1+min_distance)
    boost.  (doc_id, min_dist, score) ordered score desc, doc_id asc.

    The min distance is a merge scan over the two sorted position
    arrays joined side by side — one row per doc, O(tf_a+tf_b), never
    a position×position explode (see ops/textops.min_pair_distance_udf
    for why that matters at scale).  df/idf come from the handle's
    termdict and stats, which for segment unions are already
    tombstone-corrected (index/segments.load_segments).
    """
    from ..params import BM25_B, BM25_K1
    from .wand import bm25_idf

    terms = list(terms)
    if len(terms) != 2 or terms[0] == terms[1]:
        raise ValueError(
            "proximity_topk ranks the closest pair of two DISTINCT terms"
        )
    n = sh.stats["n_survivors"]
    avgdl = sh.stats["avgdl"] or 1.0
    dfmap = {
        r["term"]: r["df"]
        for r in sh.termdict.filter(F.col("term").isin(terms)).collect()
    }
    if any(t not in dfmap for t in terms):
        return spark.createDataFrame(
            [], "doc_id long, min_dist long, score double"
        )
    # one bucket-pruned fetch PER term: each side's scan decodes only
    # its own term's blocks (a single shared fetch would be scanned
    # twice, doubling the decode, unless persisted — and a persist here
    # would leak executor cache across driver invocations)
    sides = [
        fetch_postings(sh, [t]).select(
            "docid",
            F.col("tf").alias(f"tf_{s}"),
            F.col("positions").alias(f"pos_{s}"),
        )
        for s, t in zip(("a", "b"), terms)
    ]
    # conjunctive: one row per doc containing BOTH terms, posting rows
    # side by side (tf + sorted positions); the docs join supplies the
    # BM25 length AND masks tombstoned docids in one step
    both = (
        sides[0]
        .join(sides[1], "docid")
        .join(sh.docs.select("docid", "total_tokens"), "docid")
    )

    def w8(tf_col):
        return (
            F.col(tf_col).cast("double") * F.lit(BM25_K1 + 1.0)
            / (
                F.col(tf_col).cast("double")
                + F.lit(BM25_K1)
                * (
                    F.lit(1.0 - BM25_B)
                    + F.lit(BM25_B)
                    * F.col("total_tokens").cast("double") / F.lit(avgdl)
                )
            )
        )

    from ..ops.textops import min_pair_distance_udf

    s = (
        F.lit(bm25_idf(n, dfmap[terms[0]])) * w8("tf_a")
        + F.lit(bm25_idf(n, dfmap[terms[1]])) * w8("tf_b")
    )
    mind = min_pair_distance_udf()
    return (
        both.withColumn("min_dist", mind("pos_a", "pos_b"))
        .select(
            F.col("docid").alias("doc_id"),
            "min_dist",
            F.round(
                s + F.lit(1.0) / (F.lit(1) + F.col("min_dist")), 6
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
