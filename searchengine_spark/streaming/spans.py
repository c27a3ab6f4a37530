"""Streaming span-level dedup — ops/dedup.strip_dup_spans lifted to
arrival order, with a persisted shingle store.

Rule: a shingle's canonical occurrence lives in the FIRST micro-batch
where it appeared, at the smallest (doc_id, start) within that batch
(the batch op's argmin, scoped to the batch); every other occurrence —
later batch, or non-argmin within the first batch — strips its w token
positions.  When micro-batches partition a corpus in doc_id order this
is EXACTLY the batch op on the union: a shingle's first-arrival batch
then contains its global (doc_id, start) argmin (tested in
tests/test_streaming_spans.py).  Re-feeding the same corpus under a
fresh checkpoint double-dedups by design — the same text arriving
again IS duplicated text (first-arrival semantics, the
streaming/dedup.py contract).

Store: ``store_dir/shingles_b{batch}/`` parquet generations of
md5(shingle) hex (narrow, deterministic; the raw w-gram never needs to
come back), listed by ``manifest.json`` — written LAST by atomic
rename, the completeness marker (the append_ivf pattern): a crash
mid-batch leaves orphan dirs the manifest never lists, and the replay
rewrites them deterministically.  Batch tags are namespaced by the
checkpoint's query id (``stream:{id}:{batch}``) so a fresh checkpoint
never collides with a committed tag while a crash replay no-ops.
Cleaned docs land in ``out_dir/batch={id}`` with overwrite (replay
lands on the same path — exactly-once output, streaming/dedup.py's
sink rule).

Scale: per micro-batch work is the batch op's shuffle-on-key shape
plus one semi/anti join against the store (shuffle on the 16-byte md5
key; the store is never collected).  State is O(distinct shingles) in
parquet on shared storage — not in executor RAM and not in the state
store, because span state is corpus-sized and outlives any single
stream.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops.dedup import SPAN_W
from ..text.tokenizer import TOKEN_PATTERN

DOC_SCHEMA = "doc_id long, text string"


def stream_documents(spark: SparkSession, input_dir: str,
                     max_files_per_trigger: int | None = None) -> DataFrame:
    r = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(input_dir)


def _read_manifest(store_dir: str) -> dict:
    p = os.path.join(store_dir, "manifest.json")
    if not os.path.exists(p):
        return {"generations": [], "tags": []}
    with open(p) as f:
        return json.load(f)


def _commit_manifest(store_dir: str, manifest: dict) -> None:
    os.makedirs(store_dir, exist_ok=True)
    tmp = os.path.join(store_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(store_dir, "manifest.json"))


def _windows(docs: DataFrame, w: int) -> DataFrame:
    """(doc_id, s, h) — 1-based window starts + md5 of the w-gram."""
    toks = F.regexp_extract_all(
        F.lower(F.col("text")), F.lit(TOKEN_PATTERN), 0
    )
    sh = F.when(
        F.size("t") >= w,
        F.transform(
            F.sequence(F.lit(0), F.size("t") - w),
            lambda i: F.md5(F.array_join(F.slice("t", i + 1, w), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select("doc_id", toks.alias("t"))
        .select("doc_id", F.posexplode(sh).alias("p0", "h"))
        .select("doc_id", (F.col("p0") + 1).alias("s"), "h")
    )


def strip_spans_batch(batch: DataFrame, store: DataFrame,
                      w: int = SPAN_W) -> tuple[DataFrame, DataFrame]:
    """One micro-batch under the arrival rule.  Returns
    ``(cleaned, new_shingles)``: cleaned = (doc_id, n_tokens,
    n_removed, clean_text); new_shingles = distinct md5 h this batch
    adds to the store (every batch-new shingle, occ >= 2 or not — its
    NEXT sighting must strip)."""
    toks = F.regexp_extract_all(
        F.lower(F.col("text")), F.lit(TOKEN_PATTERN), 0
    )
    base = batch.select("doc_id", toks.alias("t"))
    tokpos = base.select(
        "doc_id", F.posexplode("t").alias("p0", "term")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "term")
    wins = _windows(batch, w)

    seen = wins.join(store, "h", "left_semi").select("doc_id", "s")
    fresh = wins.join(store, "h", "left_anti")
    firsts = (
        fresh.groupBy("h")
        .agg(
            F.count("*").alias("occ"),
            F.min(F.struct("doc_id", "s")).alias("first"),
        )
    )
    new_sh = firsts.select("h")
    marked_new = (
        fresh.join(firsts.filter(F.col("occ") >= 2), "h")
        .filter(
            ~(
                (F.col("doc_id") == F.col("first.doc_id"))
                & (F.col("s") == F.col("first.s"))
            )
        )
        .select("doc_id", "s")
    )
    rem = (
        seen.unionByName(marked_new)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("s"), F.col("s") + F.lit(w - 1))
            ).alias("p"),
        )
        .distinct()
    )
    kept = tokpos.join(rem, ["doc_id", "p"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "term"))),
                lambda x: x["term"],
            ),
            " ",
        ).alias("clean_text"),
    )
    n_tok = F.size("t").cast("long")
    cleaned = (
        base.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            n_tok.alias("n_tokens"),
            (
                n_tok - F.coalesce(F.col("n_kept"), F.lit(0).cast("long"))
            ).alias("n_removed"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )
    return cleaned, new_sh


def _load_store(spark: SparkSession, store_dir: str,
                manifest: dict) -> DataFrame:
    gens = [os.path.join(store_dir, g) for g in manifest["generations"]]
    if not gens:
        return spark.createDataFrame([], "h string")
    return spark.read.parquet(*gens).select("h")


def incremental_span_dedup(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    w: int = SPAN_W,
    max_files_per_trigger: int | None = None,
):
    """Drain newly-arrived document files through cross-batch span
    dedup (availableNow — call again after new files land).  Outputs
    cleaned docs under ``out_dir/batch={id}``; grows the shingle store
    under ``store_dir``.  Exactly-once composition: checkpoint replay
    covers everything before the batch; within the batch, outputs and
    the generation dir are (over)written BEFORE the manifest commit
    carrying the batch tag, so a committed tag proves the whole batch
    landed and the replay no-ops."""
    stream = stream_documents(spark, input_dir, max_files_per_trigger)

    def _stream_id() -> str:
        with open(os.path.join(checkpoint_dir, "metadata")) as f:
            return json.load(f)["id"]

    def process_batch(batch_df: DataFrame, batch_id: int):
        tag = f"stream:{_stream_id()}:{batch_id}"
        manifest = _read_manifest(store_dir)
        if tag in manifest["tags"]:
            return  # crash replay after manifest commit: fully landed
        store = _load_store(spark, store_dir, manifest)
        cleaned, new_sh = strip_spans_batch(batch_df, store, w)
        cleaned.write.mode("overwrite").parquet(
            f"{out_dir}/batch={batch_id}"
        )
        gen = f"shingles_b{batch_id}"
        gen_path = os.path.join(store_dir, gen)
        new_sh.write.mode("overwrite").parquet(gen_path)
        # an all-seen/empty batch adds no generation (keep the store
        # free of empty dirs); the tag still commits for idempotence
        has_new = bool(
            spark.read.parquet(gen_path).limit(1).take(1)
        )
        if has_new:
            if gen not in manifest["generations"]:
                manifest["generations"].append(gen)
        manifest["tags"].append(tag)
        _commit_manifest(store_dir, manifest)

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
