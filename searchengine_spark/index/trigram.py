"""Persisted trigram index — Zoekt's shard, expressed as parquet.

ops/textops.substring_search proves the semantics (trigram-coverage
candidate pruning + exact containment verify, brute-force-oracled) but
inlines the trigram build per query.  This module is the deployment
shape: build the (trigram, doc_id) table ONCE, partitioned by a
deterministic trigram bucket, and serve substring queries from
partition-pruned reads — the same build/serve split as the postings
shards (index/shards.py) and the persisted IVF (ops/vectors.py).

Layout under ``index_dir``::

    cells/tb=<bucket>/*.parquet   (tg string, doc_id long)
    trigram_index.json            manifest, written LAST — the
                                  completeness marker (cells alone
                                  mean a crashed build)

The index stores NO text: verification joins the caller's documents
table on the candidate ids only (candidates ≪ corpus by construction),
so the corpus is never duplicated.  Buckets use the SAME xxhash64 rule
as the postings shards (index/xxhash64.term_bucket parity-tested vs
Spark's F.xxhash64), so the Python-side query planner prunes the same
partitions the build wrote.

Scale: the build is one explode + one partitioned write (trigram
cardinality is bounded — ≤ ~1 M distinct printable trigrams — so
every bucket is dense and the per-bucket files stay wide); a query
reads only its ≤ len(q)−2 trigrams' buckets with In(tg) pushed to
parquet (plan-asserted in tests/test_ops.py).
"""

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .xxhash64 import term_bucket

TRIGRAM_BUCKETS = 64
MANIFEST = "trigram_index.json"


def _trigrams_col():
    """In-row-distinct character trigrams of lowercased ``text`` — the
    ONE definition shared with ops/textops.substring_search."""
    return F.array_distinct(
        F.expr(
            "transform(sequence(1, greatest(length(text) - 2, 0)),"
            " i -> substring(lower(text), i, 3))"
        )
    )


def build_trigram_index(spark: SparkSession, docs: DataFrame,
                        index_dir: str,
                        n_buckets: int = TRIGRAM_BUCKETS) -> str:
    """Build the trigram shard from a (doc_id, text) DataFrame.
    Manifest written last = completeness marker; rebuild-in-place is
    crash-safe the same way (cells overwritten first, manifest swapped
    after all data is down)."""
    tri = docs.select(
        "doc_id", F.explode(_trigrams_col()).alias("tg")
    ).withColumn(
        "tb",
        F.pmod(F.xxhash64("tg"), F.lit(n_buckets)).cast("int"),
    )
    tri.write.mode("overwrite").partitionBy("tb").parquet(
        os.path.join(index_dir, "cells")
    )
    n_docs = docs.count()
    tmp = os.path.join(index_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(
            {"version": 1, "n_buckets": n_buckets, "n_docs": n_docs}, f
        )
    os.replace(tmp, os.path.join(index_dir, MANIFEST))
    return index_dir


def _query_trigrams(ql: str, require: bool) -> list:
    """Distinct trigrams of a lowercased literal; < 3 chars raises
    when ``require`` (substring search has nothing to prune with)."""
    if len(ql) < 3:
        if require:
            raise ValueError("substring search needs len(q) >= 3")
        return []
    return sorted({ql[i:i + 3] for i in range(len(ql) - 2)})


def _shard_candidates(spark: SparkSession, index_dir: str, need):
    """Candidate docids covering ALL ``need`` trigrams, from bucket-
    and trigram-pruned cell reads; None when ``need`` is empty (no
    pruning possible — caller falls back to a full verify scan)."""
    mpath = os.path.join(index_dir, MANIFEST)
    if not os.path.exists(mpath):
        raise ValueError(f"no committed trigram index at {index_dir}")
    if not need:
        return None
    with open(mpath) as f:
        n_buckets = int(json.load(f)["n_buckets"])
    tbs = sorted({term_bucket(t, n_buckets) for t in need})
    cells = spark.read.parquet(os.path.join(index_dir, "cells"))
    return (
        cells.filter(F.col("tb").isin(tbs) & F.col("tg").isin(need))
        .groupBy("doc_id")
        .agg(F.count("*").alias("ncov"))
        .filter(F.col("ncov") == len(need))
        .select("doc_id")
    )


def regex_topk_ondisk(spark: SparkSession, index_dir: str,
                      docs: DataFrame, pattern: str,
                      k: int = 20) -> DataFrame:
    """Regex search from the persisted shard: candidates pruned by the
    trigrams of the pattern's longest guaranteed literal run
    (ops/textops.regex_literal_runs), verified with regexp_count —
    ops/textops.regex_search's contract served shard-side (a pattern
    with no >= 3-char literal run falls back to a full verify scan,
    correct but unpruned)."""
    from ..ops.textops import regex_literal_runs

    pl = pattern.lower()
    runs = [r for r in regex_literal_runs(pl) if len(r) >= 3]
    need = (
        _query_trigrams(max(runs, key=len), require=False)
        if runs else []
    )
    cand = _shard_candidates(spark, index_dir, need)
    d = docs if cand is None else docs.join(cand, "doc_id")
    return (
        d.withColumn(
            "n_matches",
            F.regexp_count(F.lower("text"), F.lit(pl)).cast("long"),
        )
        .filter(F.col("n_matches") > 0)
        .select("doc_id", "n_matches")
        .orderBy(F.desc("n_matches"), F.asc("doc_id"))
        .limit(k)
    )


def substring_topk_ondisk(spark: SparkSession, index_dir: str,
                          docs: DataFrame, q: str,
                          k: int = 20) -> DataFrame:
    """Serve one substring query from the persisted shard: bucket- and
    trigram-pruned cell read → coverage count == |trigrams(q)| →
    verify candidates by exact containment against ``docs`` (the same
    (doc_id, text) table the index was built from) → occurrence count.
    Identical output contract to ops/textops.substring_search
    ((doc_id, n_occurrences), n desc / doc_id asc, top k) — value-
    identical by the same losslessness argument, pinned in
    tests/test_ops.py."""
    cand = _shard_candidates(
        spark, index_dir,
        _query_trigrams(q.lower(), require=True),
    )
    ql = q.lower()
    lt = F.lower(F.col("text"))
    return (
        docs.join(cand, "doc_id")
        .withColumn(
            "n_occurrences",
            (
                (F.length(lt) - F.length(F.replace(lt, F.lit(ql))))
                / F.lit(len(ql))
            ).cast("long"),
        )
        .filter(F.col("n_occurrences") > 0)
        .select("doc_id", "n_occurrences")
        .orderBy(F.desc("n_occurrences"), F.asc("doc_id"))
        .limit(k)
    )
