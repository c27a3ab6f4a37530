"""Streaming sequence packing — ops/prep.pack_sequences lifted to
arrival order, with a persisted token-offset cursor.

Training-sample production is never done: curated documents keep
arriving, and the packer must continue the SAME global token stream
without re-reading what it already packed.  Rule: the concatenated
stream orders docs by (arrival batch, doc_id within batch) — on
doc_id-ordered waves this is EXACTLY the batch op's doc_id order, so
``read_packed`` equals ``pack_sequences`` on the union (tested in
tests/test_streaming_pack.py).

State: ``out_dir/manifest.json`` (atomic-rename commit, written LAST —
the spans/append_ivf pattern) carries the generation list, the
query-id-namespaced batch tags (``stream:{id}:{batch}`` — replays
no-op, fresh checkpoints never collide), and the CURSOR: the total
token count packed so far, which offsets the next batch's prefix sum.
Each generation dir ``pack_b{batch}`` holds that batch's PARTIAL
per-sequence aggregates — a sequence straddling batches has partial
rows in each — and ``read_packed`` re-aggregates on seq_id, so
partials compose exactly (sums/min/max are associative).  A batch
with no tokens commits its tag + cursor only (no generation — an
empty dir stays out of the store).

Scale: per batch, the two-phase range-partition prefix sum over the
batch's token counts (ops/prep._prefix_sum — never a single-partition
window) plus the constant-factor sequence-span explode; the manifest
holds two integers and a name list, never data.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops.prep import PACK_SEQ_LEN, _prefix_sum
from ..text.tokenizer import TOKEN_PATTERN
from .spans import DOC_SCHEMA, stream_documents

__all__ = ["incremental_pack", "read_packed"]


def _read_manifest(out_dir: str) -> dict:
    p = os.path.join(out_dir, "manifest.json")
    if not os.path.exists(p):
        return {"generations": [], "tags": [], "cursor": 0}
    with open(p) as f:
        return json.load(f)


def _commit_manifest(out_dir: str, manifest: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))


def _pack_batch(batch: DataFrame, cursor: int, seq_len: int):
    """(partial per-sequence rows, batch token total) — the batch op's
    spanned-explosion arithmetic with the global cursor offsetting the
    batch-local prefix sum."""
    counts = batch.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit(TOKEN_PATTERN), 0)
        ).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    cum, total = _prefix_sum(counts, "n_tokens", ["doc_id"])
    spanned = cum.select(
        "doc_id",
        (F.col("cum_tokens") + cursor).alias("cum"),
        (F.col("cum_tokens") + cursor - F.col("n_tokens")).alias("start"),
    ).select(
        "doc_id",
        "cum",
        "start",
        F.explode(
            F.sequence(
                F.expr(f"start div {seq_len}"),
                F.expr(f"(cum - 1) div {seq_len}"),
            )
        ).alias("seq_id"),
    )
    overlap = F.least(
        F.col("cum"), (F.col("seq_id") + 1) * seq_len
    ) - F.greatest(F.col("start"), F.col("seq_id") * seq_len)
    rows = spanned.groupBy("seq_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(overlap).cast("long").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )
    return rows, int(total)


def incremental_pack(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    seq_len: int = PACK_SEQ_LEN,
    max_files_per_trigger: int | None = None,
):
    """Drain newly-arrived document files into packed-sequence partial
    aggregates (availableNow — call again after new files land)."""
    stream = stream_documents(spark, input_dir, max_files_per_trigger)

    def _stream_id() -> str:
        with open(os.path.join(checkpoint_dir, "metadata")) as f:
            return json.load(f)["id"]

    def process_batch(batch_df: DataFrame, batch_id: int):
        tag = f"stream:{_stream_id()}:{batch_id}"
        manifest = _read_manifest(out_dir)
        if tag in manifest["tags"]:
            return  # crash replay after manifest commit: fully landed
        rows, total = _pack_batch(
            batch_df, int(manifest["cursor"]), seq_len
        )
        if total:
            gen = f"pack_b{batch_id}"
            rows.write.mode("overwrite").parquet(
                os.path.join(out_dir, gen)
            )
            if gen not in manifest["generations"]:
                manifest["generations"].append(gen)
            manifest["cursor"] = int(manifest["cursor"]) + total
        manifest["tags"].append(tag)
        _commit_manifest(out_dir, manifest)

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def read_packed(spark: SparkSession, out_dir: str) -> DataFrame:
    """The packed-sequence table: partial per-batch aggregates
    re-aggregated on seq_id (sums/min/max compose exactly across the
    straddle boundaries).  Reads ONLY manifest-listed generations —
    orphans from a crashed batch are invisible."""
    manifest = _read_manifest(out_dir)
    gens = manifest["generations"]
    if not gens:
        return spark.createDataFrame(
            [], "seq_id long, n_docs long, n_tokens long,"
                " first_doc long, last_doc long"
        )
    df = spark.read.parquet(
        *[os.path.join(out_dir, g) for g in gens]
    )
    return (
        df.groupBy("seq_id")
        .agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.min("first_doc").alias("first_doc"),
            F.max("last_doc").alias("last_doc"),
        )
        .orderBy("seq_id")
    )
