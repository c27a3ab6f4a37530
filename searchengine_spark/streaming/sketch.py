"""Streaming count-min sketch store — ops/mix.cms_heavy_hitters
lifted to arrival order.

The point of a CMS is that it is MERGEABLE: counter arrays add.  This
module demonstrates exactly that property on a stream: each
micro-batch folds ITS OWN documents into a partial d×w counter array
(one tiny parquet per batch, the pack.py generation pattern), and the
reader re-aggregates counters across generations — so the assembled
sketch equals the batch op's sketch over the union of all arrived
docs EXACTLY, under ANY micro-batch split (counter addition is
associative and commutative; no ordered-waves caveat is needed,
unlike the order-sensitive pack/spans twins).  Heavy-hitter queries
then run against the assembled sketch plus the candidate terms seen
so far (stored as per-batch distinct-term generations the same way).

State: ``out_dir/manifest.json`` (atomic-rename commit, written LAST)
carries generation names, query-id-namespaced batch tags
(``stream:{id}:{batch}`` — replays no-op), and the running token
TOTAL (the support threshold's denominator input, an exact integer).
A batch with no tokens commits its tag only.

Scale: per batch the same two shuffle aggs as the batch op (term
counts map-side combined, then d×w counters); the store holds d×w
rows per generation — constant per batch — plus the growing distinct
candidate set; the manifest holds integers and names, never data.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ops.mix import CMS_D, CMS_PHI_DEN, CMS_W, kmv_u32_sql
from ..text.tokenizer import TOKEN_PATTERN
from .spans import DOC_SCHEMA, stream_documents

__all__ = ["incremental_cms", "read_cms_heavy_hitters"]


def _read_manifest(out_dir: str) -> dict:
    p = os.path.join(out_dir, "manifest.json")
    if not os.path.exists(p):
        return {"generations": [], "tags": [], "total": 0}
    with open(p) as f:
        return json.load(f)


def _commit_manifest(out_dir: str, manifest: dict) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))


def _batch_sketch(batch: DataFrame, d: int, w: int):
    """(counters_df, terms_df, total): this batch's partial d×w
    counter rows, its distinct terms with counts, and its token
    total — the exact arithmetic of ops/mix.cms_heavy_hitters."""
    spark = batch.sparkSession
    tf = (
        batch.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower("text"), F.lit(TOKEN_PATTERN), 0
                )
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("n"))
    )
    rows_d = spark.range(d).select(F.col("id").alias("r"))
    keyed = tf.crossJoin(F.broadcast(rows_d)).select(
        "term", "n", "r",
        F.pmod(
            F.expr(kmv_u32_sql("concat(r, ':', term)")), F.lit(w)
        ).alias("bucket"),
    )
    counters = keyed.groupBy("r", "bucket").agg(
        F.sum("n").cast("long").alias("cnt")
    )
    total = tf.agg(F.coalesce(F.sum("n"), F.lit(0))).first()[0]
    return counters, tf, int(total or 0)


def incremental_cms(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    d: int = CMS_D,
    w: int = CMS_W,
    max_files_per_trigger: int | None = None,
):
    """Drain newly-arrived document files into partial CMS counter
    generations (availableNow — call again after new files land)."""
    stream = stream_documents(spark, input_dir, max_files_per_trigger)

    def _stream_id() -> str:
        with open(os.path.join(checkpoint_dir, "metadata")) as f:
            return json.load(f)["id"]

    def process_batch(batch_df: DataFrame, batch_id: int):
        tag = f"stream:{_stream_id()}:{batch_id}"
        manifest = _read_manifest(out_dir)
        if tag in manifest["tags"]:
            return  # crash replay after manifest commit: fully landed
        counters, terms, total = _batch_sketch(batch_df, d, w)
        if total:
            cgen = f"cms_b{batch_id}"
            tgen = f"terms_b{batch_id}"
            counters.write.mode("overwrite").parquet(
                os.path.join(out_dir, cgen)
            )
            terms.write.mode("overwrite").parquet(
                os.path.join(out_dir, tgen)
            )
            if cgen not in manifest["generations"]:
                manifest["generations"].append(cgen)
            manifest["total"] = int(manifest["total"]) + total
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


def read_cms_heavy_hitters(spark: SparkSession, out_dir: str,
                           phi_den: int = CMS_PHI_DEN) -> DataFrame:
    """(term, n_est, n_exact, err) — heavy hitters from the ASSEMBLED
    sketch: per-batch counters summed on (r, bucket) (the mergeability
    property), candidate terms = the union's distinct terms with their
    exact summed counts (the evaluation column, as in the batch op),
    threshold from the manifest's exact integer total.  Equals
    ops/mix.cms_heavy_hitters over the union of all arrived docs under
    ANY micro-batch split (tested)."""
    manifest = _read_manifest(out_dir)
    gens = manifest["generations"]
    if not gens:
        return spark.createDataFrame(
            [], "term string, n_est long, n_exact long, err long"
        )
    counters = (
        spark.read.parquet(
            *[os.path.join(out_dir, g) for g in gens]
        )
        .groupBy("r", "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    tf = (
        spark.read.parquet(*[
            os.path.join(out_dir, g.replace("cms_", "terms_"))
            for g in gens
        ])
        .groupBy("term")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    w = CMS_W
    keyed = tf.crossJoin(
        F.broadcast(
            spark.range(CMS_D).select(F.col("id").alias("r"))
        )
    ).select(
        "term", "n", "r",
        F.pmod(
            F.expr(kmv_u32_sql("concat(r, ':', term)")), F.lit(w)
        ).alias("bucket"),
    )
    est = (
        keyed.join(F.broadcast(counters), ["r", "bucket"])
        .groupBy("term")
        .agg(
            F.min("cnt").cast("long").alias("n_est"),
            F.max("n").cast("long").alias("n_exact"),
        )
    )
    thr = (int(manifest["total"]) + phi_den - 1) // phi_den
    return (
        est.filter(F.col("n_est") >= F.lit(thr))
        .select(
            "term", "n_est", "n_exact",
            (F.col("n_est") - F.col("n_exact")).cast("long")
            .alias("err"),
        )
        .orderBy(F.desc("n_est"), "term")
    )
