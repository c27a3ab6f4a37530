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
    cells_g<N>/tb=<bucket>/...    append generations (append_trigram;
                                  readers union them — a doc_id lives
                                  in exactly one generation, keeping
                                  coverage counts exact)
    trigram_index.json            manifest (generation list, batch
                                  tags, n_docs), written LAST — the
                                  completeness marker (cells alone
                                  mean a crashed build); every append
                                  commits by atomic manifest swap

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


def _gens(manifest: dict) -> list:
    """Generation dirs, oldest first — pre-generation manifests (v1)
    mean the single ``cells`` dir."""
    return manifest.get("generations", ["cells"])


def append_trigram(spark: SparkSession, docs: DataFrame,
                   index_dir: str, batch_tag: str | None = None) -> int:
    """Append new (doc_id, text) rows as a fresh cells generation —
    the incremental half of the Zoekt story (build once, keep
    indexing): readers union the generation dirs, and coverage counts
    stay exact because a doc_id lives in EXACTLY ONE generation
    (already-indexed ids are anti-joined out, so replayed or
    overlapping batches cannot double a doc's trigram rows — the
    coverage == |need| rule depends on per-doc distinctness).

    ``batch_tag`` gives streaming idempotence (the append_ivf
    contract): a committed tag no-ops, and an append whose every doc
    is already indexed (or tokenless) commits its tag WITHOUT a
    generation (an empty partitionBy dir is schema-less and would
    poison the union read).  Commit = one atomic manifest swap AFTER
    the data is down.

    :return: number of newly indexed docs.
    """
    mpath = os.path.join(index_dir, MANIFEST)
    if not os.path.exists(mpath):
        raise ValueError(f"no committed trigram index at {index_dir}")
    with open(mpath) as f:
        manifest = json.load(f)
    if batch_tag and batch_tag in manifest.get("tags", []):
        return 0
    gens = _gens(manifest)
    from functools import reduce

    existing = (
        reduce(
            lambda a, b: a.unionByName(b),
            [
                spark.read.parquet(os.path.join(index_dir, g))
                for g in gens
            ],
        )
        .select("doc_id")
        .distinct()
    )
    fresh = docs.join(existing, "doc_id", "left_anti")
    tri = fresh.select(
        "doc_id", F.explode(_trigrams_col()).alias("tg")
    ).withColumn(
        "tb",
        F.pmod(
            F.xxhash64("tg"), F.lit(int(manifest["n_buckets"]))
        ).cast("int"),
    )
    # n_new counts docs that PRODUCE trigram rows: a tokenless doc
    # (len(text) < 3) lands in no generation, so the anti-join can
    # never exclude a replay of it — counting it would drift n_docs
    # (and overstate the return) on every untagged re-send
    n_new = tri.select("doc_id").distinct().count()
    gen = f"cells_g{len(gens)}"
    if n_new:
        tri.write.mode("overwrite").partitionBy("tb").parquet(
            os.path.join(index_dir, gen)
        )
        manifest["generations"] = gens + [gen]
    manifest["n_docs"] = int(manifest.get("n_docs", 0)) + int(n_new)
    if batch_tag:
        manifest.setdefault("tags", []).append(batch_tag)
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, mpath)
    return int(n_new)


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
        manifest = json.load(f)
    n_buckets = int(manifest["n_buckets"])
    tbs = sorted({term_bucket(t, n_buckets) for t in need})
    # per-generation reads unioned (one spark.read over sibling
    # partitioned dirs trips CONFLICTING_DIRECTORY_STRUCTURES);
    # pruning survives the union — the test_segments plan precedent
    from functools import reduce

    cells = reduce(
        lambda a, b: a.unionByName(b),
        [
            spark.read.parquet(os.path.join(index_dir, g))
            for g in _gens(manifest)
        ],
    )
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
    per-branch trigram plan (ops/textops.regex_anchor_sets — top-level
    alternation = UNION of each branch's coverage candidates),
    verified with regexp_count — ops/textops.regex_search's contract
    served shard-side (a pattern where any branch lacks a >= 3-char
    literal run falls back to a full verify scan, correct but
    unpruned)."""
    from functools import reduce

    from ..ops.textops import regex_anchor_sets

    pl = pattern.lower()
    need_sets = regex_anchor_sets(pl)
    cand = None
    if need_sets:
        parts = [
            _shard_candidates(spark, index_dir, s) for s in need_sets
        ]
        cand = reduce(lambda a, b: a.unionByName(b), parts).distinct()
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
