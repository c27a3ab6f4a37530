"""Incremental segmented index (Lucene-style generations).

The reference's only incremental mode is resume-from-checkpoint of a
single monolithic build (lib/writer.py:40-57); a web-scale corpus is
never done arriving.  This module adds generation segments on top of
the unchanged writer: every generation is a COMPLETE index directory
(written by shards.write_index with its own manifest, so each append is
independently resumable and byte-deterministic), and readers serve the
union:

    index_dir/
      segments.json          ordered generation list
      seg=0/  docs/ termdict/ postings/ mergeinfo.json _manifest.json
      seg=1/  ...

Append semantics:
 * new docids continue the dense space (docid_offset = Σ prior n_total),
   so segment docid ranges are disjoint and ascending — WAND's
   sorted-block invariants hold across the union for free;
 * exact dedup runs within the new batch AND against all prior
   segments (sha256 anti-join on the stored docs.sha256 column); a doc
   already present consumes its id and is dropped, the same rule as
   every other filter stage;
 * cross-segment NEAR-dup (simhash) is deliberately not an append-time
   filter — at 100 TB that re-comparison is its own job:
   ``compact_near_dups`` runs the banded self-join over the stored
   fingerprints of all generations and tombstones the losers, without
   rewriting a single segment.

Query-side: ``load_segments`` returns the same IndexShards handle the
single-index reader produces — blocks/docs are lazy unions (parquet
scans still prune per segment via bucket/term pushdown) and the
termdict re-aggregates lazily, so score_queries_ondisk / wand_topk /
fetch_postings work unchanged.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .shards import IndexShards, load_index, write_index

SEGMENTS_FILE = "segments.json"
TOMBSTONES_DIR = "tombstones"


def _read_meta(index_dir: str) -> dict:
    p = os.path.join(index_dir, SEGMENTS_FILE)
    if not os.path.exists(p):
        return {"version": 1, "segments": []}
    with open(p) as f:
        return json.load(f)


def _save_meta(index_dir: str, meta: dict) -> None:
    p = os.path.join(index_dir, SEGMENTS_FILE)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, p)  # atomic: readers see old or new list, never half


def _read_segments(index_dir: str) -> list[str]:
    return _read_meta(index_dir)["segments"]


def _save_segments(index_dir: str, segs: list[str]) -> None:
    meta = _read_meta(index_dir)
    meta["segments"] = segs
    _save_meta(index_dir, meta)


def init_segmented(spark: SparkSession, tables, index_dir: str) -> str:
    """Write the first generation from built IndexTables."""
    os.makedirs(index_dir, exist_ok=True)
    if _read_segments(index_dir):
        raise ValueError(f"{index_dir} already has segments")
    name = "seg=0"
    write_index(spark, tables, os.path.join(index_dir, name))
    _save_segments(index_dir, [name])
    return name


def append_segment(
    spark: SparkSession,
    index_dir: str,
    corpus: DataFrame,
    **build_kwargs,
) -> str:
    """Build a new generation from ``corpus`` and commit it.

    The new segment's docids start after every existing segment's
    (dense space continues); content whose sha256 already exists in any
    prior segment is dropped.  ``build_kwargs`` pass through to
    build_tables (stem/simhash_bits/id_order/compute_quality...).
    """
    from .pipeline import build_tables

    segs = _read_segments(index_dir)
    if not segs:
        raise ValueError(f"{index_dir} has no segments; init_segmented first")
    cur = load_segments(spark, index_dir, cache_meta=False)
    known = (
        cur.docs.select("sha256") if "sha256" in cur.docs.columns else None
    )
    tables = build_tables(
        spark,
        corpus,
        docid_offset=int(cur.stats["n_total"]),
        known_sha=known,
        **build_kwargs,
    )
    name = f"seg={len(segs)}"
    write_index(spark, tables, os.path.join(index_dir, name))
    _save_segments(index_dir, segs + [name])
    return name


def load_segments(spark: SparkSession, index_dir: str,
                  cache_meta: bool = True) -> IndexShards:
    """Open all generations as ONE IndexShards handle."""
    segs = _read_segments(index_dir)
    if not segs:
        raise ValueError(f"{index_dir} has no segments")
    parts = [
        load_index(spark, os.path.join(index_dir, s), cache_meta=False)
        for s in segs
    ]
    if len(parts) == 1:
        one = parts[0]
        blocks, termdict, docs = one.blocks, one.termdict, one.docs
        stats = dict(one.stats)
    else:
        blocks = parts[0].blocks
        docs = parts[0].docs
        for p in parts[1:]:
            blocks = blocks.unionByName(p.blocks)
            docs = docs.unionByName(p.docs)
        from functools import reduce

        termdict = (
            reduce(
                lambda a, b2: a.unionByName(b2),
                (p.termdict for p in parts),
            )
            .groupBy("term")
            .agg(
                F.first("bucket").alias("bucket"),
                F.sum("df").cast("long").alias("df"),
                F.sum("cf").cast("long").alias("cf"),
                F.sum("n_blocks").cast("int").alias("n_blocks"),
                F.max("max_weight").alias("max_weight"),
            )
        )
        n_total = sum(p.stats["n_total"] for p in parts)
        n_surv = sum(p.stats["n_survivors"] for p in parts)
        # exact global mean: per-segment avgdl weighted by survivor count
        avgdl = (
            sum(p.stats["avgdl"] * p.stats["n_survivors"] for p in parts)
            / n_surv
            if n_surv
            else 0.0
        )
        stats = {
            "n_total": n_total,
            "n_survivors": n_surv,
            "avgdl": avgdl,
            "n_terms": None,  # unknown without an agg job; unused by queries
            "posting_block": parts[0].stats.get("posting_block"),
            "n_buckets": parts[0].stats.get("n_buckets"),
        }
    meta = _read_meta(index_dir)
    n_tomb = int(meta.get("n_tombstones", 0))
    if n_tomb:
        tombs = spark.read.parquet(
            os.path.join(index_dir, TOMBSTONES_DIR)
        )
        docs = docs.join(tombs, "docid", "left_anti")
        n_before = stats["n_survivors"]
        n_after = n_before - n_tomb
        stats["avgdl"] = (
            (stats["avgdl"] * n_before - meta.get("tomb_tokens", 0))
            / n_after
            if n_after
            else 0.0
        )
        stats["n_survivors"] = n_after
    if cache_meta:
        from pyspark import StorageLevel

        termdict = termdict.persist(StorageLevel.MEMORY_AND_DISK)
        docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
    return IndexShards(
        blocks=blocks, termdict=termdict, docs=docs, stats=stats
    )


def compact_near_dups(spark: SparkSession, index_dir: str,
                      bits: int = 64) -> int:
    """Cross-segment near-dup compaction from STORED fingerprints.

    Build-time simhash dedup is per-segment (append_segment docstring);
    this job closes the cross-generation gap: the banded LSH self-join +
    local-min rule (pipeline.simhash_dropped) runs over the fingerprint
    column of every surviving doc across ALL generations, and newly
    caught docs land in a tombstone list — removed from serving (every
    query path joins postings against docs, so their postings become
    inert) without rewriting any segment.  Stats are adjusted exactly
    (survivor count and token sum of the tombstoned docs).

    ``bits`` must match what the segments were built with (64 = scale
    default).  Idempotent: already-tombstoned docs are invisible to the
    next run.  NOTE vs a monolithic rebuild: comparisons see surviving
    docs only — a chain A~B(dropped at build), B~C, A≁C keeps C where
    the monolithic pass might not; the standard segmented tradeoff.

    :return: number of newly tombstoned docs.
    """
    from .pipeline import simhash_dropped

    cur = load_segments(spark, index_dir, cache_meta=False)
    if "fingerprint" not in cur.docs.columns:
        raise ValueError("segments were built without fingerprints")
    fps = cur.docs.filter(F.col("fingerprint").isNotNull()).select(
        "docid", "fingerprint"
    )
    dropped = simhash_dropped(fps, bits).persist()
    row = (
        cur.docs.join(dropped, "docid")
        .agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum("total_tokens"), F.lit(0)).alias("tok"),
        )
        .first()
    )
    n_new = int(row["n"])
    if n_new:
        # old tombstones are already excluded from cur.docs, so the new
        # set is disjoint — append is safe
        dropped.write.mode("append").parquet(
            os.path.join(index_dir, TOMBSTONES_DIR)
        )
        meta = _read_meta(index_dir)
        meta["n_tombstones"] = int(meta.get("n_tombstones", 0)) + n_new
        meta["tomb_tokens"] = int(meta.get("tomb_tokens", 0)) + int(
            row["tok"]
        )
        _save_meta(index_dir, meta)
    dropped.unpersist()
    return n_new
